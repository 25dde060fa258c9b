package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{ChangeEvent, ChangeOp, StateEvent, EdgeOut}

/** Round-19 streaming hardening: RocksDB state-store runs for the
  * stateful mirrors beyond statefulEma (provider portability of the
  * state schemas), and the torn-swap crash window of the incremental
  * cosine top-k view (crash BETWEEN the view swap and the ledger append
  * — the one replay window the ledger guard cannot see). */
class Round19StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Run `f` with the RocksDB state-store provider — the provider that
    * makes 100 TB-scale keyed state feasible (spillable, incremental
    * snapshots); HDFSBackedStateStore holds every key on-heap. */
  private def withRocksDb(f: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("changelog stream I/U/N classification runs on the RocksDB " +
      "state store with state carried across micro-batches") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChangeEvent]
    val q = StreamingOps.changelogStream(mem.toDS())
      .writeStream.format("memory").queryName("chg_rocks")
      .outputMode("append").start()
    mem.addData(ChangeEvent(1L, 10L, 100L, 5.0), ChangeEvent(1L, 11L, 200L, 5.0))
    q.processAllAvailable()
    mem.addData(ChangeEvent(1L, 12L, 300L, 6.0), ChangeEvent(2L, 20L, 100L, 1.0))
    q.processAllAvailable()
    val got = spark.table("chg_rocks").as[ChangeOp].collect()
      .sortBy(r => (r.key, r.eventId)).map(r => (r.key, r.op, r.oldValue)).toSeq
    q.stop()
    assert(got == Seq(
      (1L, "I", None), (1L, "N", Some(5.0)), (1L, "U", Some(5.0)),
      (2L, "I", None)))
  }}

  test("stateful transition edges run on the RocksDB state store — " +
      "cross-batch boundary edges still emitted") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StateEvent]
    val q = StreamingOps.statefulTransitionEdges(mem.toDS())
      .writeStream.format("memory").queryName("edges_rocks")
      .outputMode("append").start()
    mem.addData(StateEvent(1L, 0L, 0L, 10L), StateEvent(1L, 1L, 0L, 20L))
    q.processAllAvailable()
    // the (20 → 30) edge straddles the batch boundary: only carried state
    // can see it
    mem.addData(StateEvent(1L, 2L, 0L, 30L), StateEvent(2L, 0L, 0L, 7L))
    q.processAllAvailable()
    val got = spark.table("edges_rocks").as[EdgeOut].collect()
      .map(e => (e.user, e.src, e.dst)).toSet
    q.stop()
    assert(got == Set((1L, 10L, 20L), (1L, 20L, 30L)))
  }}

  private def jittered(rnd: scala.util.Random, base: Array[Float]) =
    base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)

  private def viewEqualsBatch(view: String,
                              acc: Seq[(Long, Array[Float])]): Unit = {
    val expect = ops.Similarity.cosineNearDupTopK(
        acc.toDF("vec_id", "embedding"), "vec_id", "embedding",
        threshold = 0.9, bits = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rows = spark.read.parquet(view)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.size == rows.toSet.size,
      s"duplicate view rows: ${rows.groupBy(identity).filter(_._2.size > 1).keys}")
    assert(rows.toSet == expect,
      s"view diverged: extra=${rows.toSet diff expect} missing=${expect diff rows.toSet}")
  }

  test("incremental cosine top-k ledger mirror runs under the RocksDB " +
      "provider — view ≡ batch operator per micro-batch") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_ctk_rocks").toString
    val rnd = new scala.util.Random(191)
    val cone = Array(1.0f, 0.9f, 0.8f, 0.7f)
    val b1 = Seq.tabulate(4)(i => (i.toLong, jittered(rnd, cone)))
    val b2 = Seq.tabulate(3)(i => (10L + i, jittered(rnd, cone)))
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.incrementalCosineTopK(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$root/ledger", s"$root/view", s"$root/ckpt",
      threshold = 0.9, bits = 4, k = 2)
    mem.addData(b1: _*); q.processAllAvailable()
    viewEqualsBatch(s"$root/view", b1)
    mem.addData(b2: _*); q.processAllAvailable()
    viewEqualsBatch(s"$root/view", b1 ++ b2)
    q.stop()
  }}

  test("incremental cosine top-k survives a crash BETWEEN the view swap " +
      "and the ledger append: redelivered pairs merge idempotently") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("graft_ctk_crash").toString
    val (ledger, view) = (s"$root/ledger", s"$root/view")
    def copyDir(from: String, to: String): Unit = {
      Files.createDirectories(Paths.get(to))
      Files.list(Paths.get(from)).forEach { p =>
        Files.copy(p, Paths.get(to, p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
    }
    def clearDir(dir: String): Unit =
      Files.list(Paths.get(dir)).forEach(p => Files.delete(p))
    val rnd = new scala.util.Random(192)
    val cone = Array(1.0f, 0.9f, 0.8f, 0.7f)
    val b1 = Seq.tabulate(4)(i => (i.toLong, jittered(rnd, cone)))
    val b2 = Seq.tabulate(3)(i => (10L + i, jittered(rnd, cone)))
    val mem1 = MemoryStream[(Long, Array[Float])]
    val q1 = StreamingOps.incrementalCosineTopK(
      mem1.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      ledger, view, s"$root/ckpt1", threshold = 0.9, bits = 4, k = 2)
    mem1.addData(b1: _*); q1.processAllAvailable()
    copyDir(ledger, s"$root/ledger_snap") // pre-b2 ledger state
    mem1.addData(b2: _*); q1.processAllAvailable()
    q1.stop()
    // TORN SWAP: the view holds b2's merge result but the ledger append
    // never committed — roll the ledger back to the pre-b2 snapshot
    clearDir(ledger); copyDir(s"$root/ledger_snap", ledger)
    // redelivery: b2 arrives again (fresh checkpoint = the replayed
    // batch); its ids are NOT in the ledger, so the anti-join guard
    // cannot suppress them — the merge itself must be idempotent
    val mem2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamingOps.incrementalCosineTopK(
      mem2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      ledger, view, s"$root/ckpt2", threshold = 0.9, bits = 4, k = 2)
    mem2.addData(b2: _*); q2.processAllAvailable()
    q2.stop()
    // view equals the batch operator (no duplicated (id, neighbor) slots
    // evicting legitimate neighbors), ledger holds each id exactly once
    viewEqualsBatch(view, b1 ++ b2)
    val ids = spark.read.parquet(ledger).groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.values.forall(_ == 1L), s"ledger re-appended a replayed id: $ids")
    assert(ids.keySet == (b1 ++ b2).map(_._1).toSet)
  }
}
