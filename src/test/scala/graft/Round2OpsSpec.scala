package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Similarity, TextOps}
import graft.streaming.StreamingOps

/** Unit coverage for the round-2 operators: TF-IDF, int8 quantization,
  * sliding windows, simhash pairs, approximate distinct. */
class Round2OpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: clamp, round-half-up, reconstruction error") {
    val df = Seq((1L, Seq(0.5f, -2.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("pos").select("q", "err").as[(Long, Double)].collect()
    assert(got(0)._1 == 64L)   // 0.5*127 = 63.5 → half-up 64
    assert(got(1)._1 == -127L) // clamped to -1
    assert(got(2)._1 == 0L)
    assert(got(3)._1 == 127L)
    assert(got(1)._2 == 0.0 && got(3)._2 == 0.0) // exact at the clamp points
    assert(got(0)._2 == math.abs(64.0 / 127.0 - 0.5))
  }

  test("tfidfTopTerms ranks corpus-rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana date date date")).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "tok").as[(Long, String)].collect().toMap
    // banana appears in every doc → idf 0; the doc-specific term wins
    assert(top == Map(1L -> "apple", 2L -> "cherry", 3L -> "date"))
  }

  test("slidingAgg: every event lands in exactly width/slide windows") {
    val base = 1704067200L * 1000000000L // ns
    val ev = Seq((1L, base, 7L, "click", 1.0, "{}"),
      (2L, base + 3600L * 1000000000L, 7L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = StreamingOps.slidingAgg(ev, "1 day", "12 hours")
      .select("w_start_us", "n").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).sum == 4) // 2 events × 2 windows each
    // both events inside [base-12h, base+12h) and [base, base+24h)
    assert(rows.map(_._1).toSet ==
      Set(1704067200000000L - 43200000000L, 1704067200000000L))
  }

  test("simhashPairs: exact duplicates collide at hamming 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different words about carrots and physics")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 16, nBands = 4, maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("splitAssign covers every row, is deterministic, and never moves a doc") {
    val docs = (1L to 500L).toDF("doc_id")
    val a = Curation.splitAssign(docs, "doc_id").as[(Long, String)].collect().toMap
    assert(a.size == 500 && a.values.toSet.subsetOf(Set("train", "val", "test")))
    // growth stability: adding rows changes no existing assignment
    val b = Curation.splitAssign((1L to 1000L).toDF("doc_id"), "doc_id")
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (id, s) => b(id) == s })
    // roughly 90/5/5 (hash noise tolerated)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 500.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.06, frac.toString)
  }

  test("stratifiedSample applies per-stratum rates, keeps a 100% stratum whole") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")
    val kept = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0, "zh" -> 100), defaultPct = 50)
      .as[(Long, String)].collect()
    assert(kept.forall(_._2 == "zh") && kept.length == 200) // en dropped, zh intact
  }

  test("packSequences: bins fill to budget, overflow by at most one doc") {
    val df = (1L to 20L).map(i => (i, "en", s"doc $i")).toDF("doc_id", "lang", "text")
    val packed = Curation.packSequences(df, "doc_id", "lang", lit(100L), 250)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // each doc is 100 tokens, budget 250 → bins of [100,100,100]=300 spans:
    // doc1,2,3 start at cum 0,100,200 (<250 → bin 0), doc4 at 300 → bin 1
    assert(packed(1L) == 0L && packed(3L) == 0L && packed(4L) == 1L)
    val binSizes = packed.groupBy(_._2).view.mapValues(_.size).toMap
    assert(binSizes.values.forall(_ <= 3))
  }

  test("approx_count_distinct lands within 5% of exact on lineitem") {
    val li = graft.sources.Tables.lineitem(spark, sf001)
    val (approx, exact) = li.agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("unpivot emits one row per (id, metric) with original values") {
    val wide = Seq((7L, 1.5, 2.5)).toDF("user_id", "a_sum", "b_sum")
    val long = wide.unpivot(Array(col("user_id")),
      Array(col("a_sum"), col("b_sum")), "metric", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(long == Set((7L, "a_sum", 1.5), (7L, "b_sum", 2.5)))
  }
}
