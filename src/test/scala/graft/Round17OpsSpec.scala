package graft

import org.apache.spark.sql.functions._
import graft.ops.AggOps

/** Round-17 hardening: skew-bounded exactQuantiles (tie short-circuit +
  * recursive re-bucket), winsorize NULL semantics, artifact claim-loop
  * failure transparency. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  /** The sort rule exactQuantiles must reproduce: value at 1-based
    * position ceil(q·n) of the sorted non-null column. */
  private def bruteQuantiles(data: Seq[(String, Double)], qs: Seq[Double]) =
    data.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      qs.map(q => (k, q) -> sorted(math.ceil(sorted.size * q).toInt.max(1) - 1))
    }

  private def check(data: Seq[(String, Double)], qs: Seq[Double],
                    buckets: Int, sortThreshold: Long, levels: Int): Unit = {
    val df = data.toDF("k", "v").repartition(7)
    val got = AggOps.exactQuantiles(df, Seq("k"), "v", qs,
        buckets = buckets, sortThreshold = sortThreshold, levels = levels)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = bruteQuantiles(data, qs)
    expect.foreach { case (key, v) =>
      assert(got.contains(key), s"$key missing from result")
      assert(got(key) == v, s"$key: got ${got(key)}, want $v")
    }
    assert(got.size == expect.size,
      s"result cardinality ${got.size} != expected ${expect.size}")
  }

  test("exactQuantiles ≡ sort rule on a 99%-constant column " +
      "(heavy-tie bucket resolves via the tie short-circuit, never a sort)") {
    val rnd = new scala.util.Random(17)
    // 99% of rows are the single value 5.0; a 1% tail spreads around it,
    // so 5.0's bucket holds ~99% of the group — the r16 single-task cliff
    val data = (1 to 3000).map { i =>
      val v = if (i % 100 == 0) rnd.nextDouble() * 10 else 5.0
      (s"g${i % 2}", v)
    }
    // sortThreshold=8 forces every multi-valued slice through the
    // re-bucket path; the dominant tied slice must exit via min<=>max
    check(data, Seq(0.05, 0.5, 0.95, 1.0), buckets = 16,
      sortThreshold = 8, levels = 3)
  }

  test("exactQuantiles ≡ sort rule on a zipfian column " +
      "(power-law concentration re-buckets recursively)") {
    val rnd = new scala.util.Random(42)
    // zipf-ish: v = 1/u^1.2 concentrates mass near the minimum — the
    // equal-width level-1 bucketing puts almost everything in bucket 0
    val data = (1 to 4000).map { i =>
      val u = rnd.nextDouble().max(1e-6)
      (s"g${i % 3}", math.pow(u, -1.2))
    }
    check(data, Seq(0.1, 0.5, 0.9, 0.99, 1.0), buckets = 8,
      sortThreshold = 16, levels = 4)
  }

  test("exactQuantiles: constant group, two-value group, ties at the " +
      "quantile positions, singleton group — all via the tie/small paths") {
    val data =
      (1 to 500).map(_ => ("const", 42.0)) ++
      (1 to 300).map(i => ("twoval", if (i <= 299) 1.0 else 2.0)) ++
      Seq(("single", 7.0)) ++
      (1 to 100).map(i => ("tiedq", math.min(i, 50).toDouble))
    check(data, Seq(0.25, 0.5, 0.75, 1.0), buckets = 4,
      sortThreshold = 2, levels = 3)
  }

  test("exactQuantiles: levels exhausted falls back to the slice sort, " +
      "still exact (adjacent-double clustering)") {
    val base = 1.0
    val eps = java.lang.Math.ulp(base)
    // values packed within a few ulps: re-bucketing cannot separate them
    // fast; with levels=1 the whole live slice goes straight to the sort
    val data = (1 to 200).map(i => ("g", base + (i % 7) * eps))
    check(data, Seq(0.5, 1.0), buckets = 16, sortThreshold = 4, levels = 1)
    check(data, Seq(0.5, 1.0), buckets = 16, sortThreshold = 4, levels = 5)
  }

  test("exactQuantiles: defaults unchanged on the r16 fixture shape " +
      "(uniform data exits at level 1)") {
    val rnd = new scala.util.Random(31)
    val data = (1 to 500).map(i => (s"g${i % 3}", rnd.nextDouble() * 100))
    check(data, Seq(0.05, 0.5, 0.9, 1.0), buckets = 16,
      sortThreshold = 1L << 16, levels = 3)
  }

  test("winsorize NULL semantics: NULLs take no part in the bounds and " +
      "pass through as NULL (r16 behavior change, pinned)") {
    // group g: values 1..10 plus three NULLs. quantile_disc semantics:
    // bounds from the 10 non-null values only — lo = ceil(10·0.2) = 2nd
    // = 2.0, hi = ceil(10·0.8) = 8th = 8.0. (The r15 window form ranked
    // NULLs FIRST: 13 positions, lo = ceil(13·0.2) = 3rd = the last
    // NULL — i.e. a NULL bound; that silent behavior change is what this
    // test pins to the new rule.)
    val data = (1 to 10).map(i => ("g", Some(i.toDouble))) ++
      Seq(("g", None), ("g", None), ("g", None)) ++
      // all-null group: bounds NULL, rows pass through NULL
      Seq(("nullgrp", None), ("nullgrp", None))
    val out = AggOps.winsorize(data.toDF("k", "v"), Seq("k"), "v", 0.2, 0.8)
      .select("k", "v", "v_w").as[(String, Option[Double], Option[Double])]
      .collect()
    val g = out.filter(_._1 == "g")
    // non-null values clamp into [2, 8] — NULLs excluded from positions
    g.collect { case (_, Some(v), w) =>
      assert(w == Some(v.max(2.0).min(8.0)), s"v=$v clamped to $w")
    }
    // NULL values stay NULL (Spark's least/greatest would clamp them to
    // the LOWER bound if the op didn't pass them through explicitly)
    g.collect { case (_, None, w) => assert(w.isEmpty, s"NULL → $w") }
    assert(g.count(_._2.isEmpty) == 3)
    out.filter(_._1 == "nullgrp").foreach { case (_, _, w) =>
      assert(w.isEmpty, "all-null group must pass through NULL")
    }
  }

  test("cosineNearDupTopK ≡ per-id top-k of the symmetric uncapped pair " +
      "set (bounded output, identical candidate generation)") {
    val rnd = new scala.util.Random(7)
    // 3 clusters of 6 jittered copies: within-cluster cosine ≈ 1 (a
    // 5-partner clique per id — more than k), across clusters lower
    val bases = Seq(Seq(1.0, 0.5, 0.25, 0.8), Seq(-0.9, 0.4, 0.7, -0.2),
      Seq(0.3, -0.8, 0.5, 0.6))
    val data = for {
      (b, c) <- bases.zipWithIndex; j <- 0 until 6
    } yield (c * 10L + j, b.map(x => x + (rnd.nextDouble() - 0.5) * 0.02))
    val df = data.toDF("vec_id", "embedding")
    val k = 3
    val capped = graft.ops.Similarity.cosineNearDupTopK(df, "vec_id",
        "embedding", threshold = 0.9, bits = 4, k = k)
      .as[(Long, Long, Double)].collect()
    val uncapped = graft.ops.Similarity.cosineNearDup(df, "vec_id",
        "embedding", threshold = 0.9, bits = 4)
      .as[(Long, Long, Double)].collect()
    // expected: symmetric-expand the uncapped pairs, rank per id by
    // (cosine desc, neighbor asc), keep k — the emitter's declared rule
    val expect = (uncapped.map(p => (p._1, p._2, p._3)) ++
        uncapped.map(p => (p._2, p._1, p._3)))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).toSeq
      }.toSet
    assert(expect.nonEmpty, "fixture produced no qualifying pairs")
    assert(capped.toSet == expect)
    capped.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length <= k, s"id $id emitted ${rows.length} > k rows")
    }
    // the clique makes the cap bite: some id must have dropped a partner
    assert(capped.length < uncapped.length * 2,
      "cap never engaged — fixture cliques too small")
  }

  test("editDistanceTopK ≡ per-id best-k of the symmetric uncapped " +
      "edit-distance join") {
    // near-clique of one-edit variants plus unrelated keys
    val keys = Seq("spark", "spa rk", "sparks", "spark!", "sprak",
      "hadoop", "hadoo", "flink", "graft", "grafty", "grift")
    val df = keys.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "key")
    val k = 2
    val capped = graft.ops.Dedup.editDistanceTopK(df, "doc_id", col("key"),
        maxDist = 2, q = 2, k = k)
      .as[(Long, Long, Long)].collect()
    val pairs = graft.ops.Dedup.editDistanceJoin(df, "doc_id", col("key"),
        maxDist = 2, q = 2)
      .select("a_id", "b_id", "dist").as[(Long, Long, Long)].collect()
    val expect = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(k).toSeq
      }.toSet
    assert(expect.nonEmpty, "fixture produced no matches")
    assert(capped.toSet == expect)
    capped.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length <= k, s"id $id emitted ${rows.length} > k rows")
    }
  }

  test("saveArtifact claim loop: a persistent create failure surfaces " +
      "the root cause instead of spinning 64 rounds") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_art_fail")
    // store is a self-referential symlink: every path resolution under it
    // fails ELOOP — a persistent IOException that is NOT already-exists.
    // (Permission-based simulation doesn't work here: tests run as root,
    // which bypasses DAC checks.) Pre-fix, the claim loop swallowed this
    // and spun 64 list-and-create rounds into a generic require message;
    // now the raw failure propagates on the first attempt.
    val store = root.resolve("store")
    Files.createSymbolicLink(store, Paths.get("store"))
    val e = intercept[java.io.IOException] {
      graft.ops.Artifacts.saveArtifact(Seq((1L, 2L)).toDF("a", "b"),
        store.toString, "ivf_centroids")
    }
    assert(!e.isInstanceOf[java.nio.file.FileAlreadyExistsException] &&
      !e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException],
      s"must be the raw ELOOP failure, not an already-exists: $e")
  }
}
