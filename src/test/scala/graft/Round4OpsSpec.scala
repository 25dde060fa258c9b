package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomJoin
import graft.streaming.StreamingOps

/** Unit tests for the round-4 operators: bloom-pruned semi join, SCD
  * Type-2 history build, CDC changelog op classification. */
class Round4OpsSpec extends SparkSpec {

  test("bloomSemiJoin equals the plain semi join (no false negatives)") {
    import spark.implicits._
    val probe = (1L to 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = Seq(3L, 500L, 999L, 1500L).toDF("bk")
    val got = BloomJoin.bloomSemiJoin(probe, "k", build, "bk", expectedItems = 100L)
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 500L, 999L)) // 1500 not in probe
  }

  test("bloom mightContain has no false negatives and prunes most misses") {
    import spark.implicits._
    val build = (1L to 100L).toDF("k")
    val bf = BloomJoin.bloomFilterFor(build, col("k"), 100L)
    val probe = (1L to 10000L).toDF("k")
    val kept = probe.where(BloomJoin.mightContain(bf, col("k")))
      .as[Long].collect().toSet
    assert((1L to 100L).forall(kept), "a bloom filter must never drop a present key")
    // fpp at this sizing is ~3%; allow 10× slack before calling it broken
    assert(kept.size < 100 + 0.3 * 9900, s"bloom pruned too little: ${kept.size}")
  }

  test("scd2History chains half-open intervals and flags one current row per key") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, 100L, 5.0), (1L, 11L, 200L, 7.0), (1L, 12L, 300L, 7.0),
      (2L, 20L, 150L, 1.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val h = StreamingOps.scd2History(changes)
      .orderBy("user_id", "version")
      .select("user_id", "event_id", "valid_from", "valid_to", "version", "is_current")
      .collect()
    assert(h.length == 4)
    val u1 = h.filter(_.getLong(0) == 1L)
    // valid_to of version n is valid_from of version n+1; last row open
    assert(u1.map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq ==
      Seq((100L, 200L), (200L, 300L), (300L, -1L)))
    assert(h.count(_.getBoolean(5)) == 2, "exactly one current row per key")
  }

  test("changelogOps classifies insert / update / idempotent replay") {
    import spark.implicits._
    val ev = Seq(
      (7L, 1L, 100L, 3.0),  // first sighting -> I
      (7L, 2L, 200L, 3.0),  // same value     -> N
      (7L, 3L, 300L, 4.0),  // changed        -> U
      (8L, 4L, 100L, 9.0)   // new key        -> I
    ).toDF("user_id", "event_id", "ts", "value")
    val ops = StreamingOps.changelogOps(ev).orderBy("event_id")
      .select("op").collect().map(_.getString(0)).toSeq
    assert(ops == Seq("I", "N", "U", "I"))
  }
}
