package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-7 operators: chained table-driven MLP inference and
  * trajectory-level outlier removal. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("mlpFromTables: two chained layers equal the literal-weight mlp") {
    // 3-dim input, 2→2 layers with hand-picked weights; the table-driven
    // chain must agree with ModelOps.mlp's literal fold (same math, two
    // execution strategies)
    val xs = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(-1.0, 0.5, 0.0)))
      .toDF("id", "vec")
    val w1lit = Seq(Seq(0.1, 0.2, -0.3), Seq(0.4, -0.5, 0.6))
    val b1 = Seq(0.1, -0.2)
    val w2lit = Seq(Seq(1.0, -1.0), Seq(0.5, 0.5))
    val b2 = Seq(0.0, 0.3)
    val w1 = w1lit.zipWithIndex.flatMap { case (row, j) =>
      row.zipWithIndex.map { case (w, i) => (i.toLong, j.toLong, w) }
    }.toDF("i", "j", "w")
    val w2 = w2lit.zipWithIndex.flatMap { case (row, j) =>
      row.zipWithIndex.map { case (w, i) => (i.toLong, j.toLong, w) }
    }.toDF("i", "j", "w")
    def biasOf(bs: Seq[Double]): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      j => element_at(array(bs.map(lit): _*), (j + 1).cast("int"))
    val got = ModelOps.mlpFromTables(xs, "id", "vec", Seq(
      (w1, biasOf(b1), ModelOps.relu, 9),
      (w2, biasOf(b2), ModelOps.relu, 9)))
      .as[(Long, Long, Double)].collect()
      .map { case (id, j, h) => (id, j) -> h }.toMap
    val want = xs.select(col("id"),
      posexplode(ModelOps.mlp(col("vec"), Seq(
        (w1lit, b1, ModelOps.relu), (w2lit, b2, ModelOps.relu)))))
      .select(col("id"), col("pos").cast("long"), round(col("col"), 9))
      .as[(Long, Long, Double)].collect()
      .map { case (id, j, h) => (id, j) -> h }.toMap
    assert(got.keySet == want.keySet)
    // per-layer rounding at 9 digits makes the two strategies' partial-sum
    // orders agree exactly on this tiny fixture
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-8, s"$k: $v vs ${want(k)}") }
  }

  test("dropOutlierTrajectories drops whole top-pct episodes, keeps the rest intact") {
    // episodes with total costs 1, 2, 3, 100; pct=0.25 → cutoff is the
    // 0.75-quantile (inverse ECDF → 3.0); episodes at/above it drop WHOLE
    val tr = Seq(
      (1L, 1, 0.5), (1L, 2, 0.5),          // cost 1.0
      (2L, 1, 2.0),                         // cost 2.0
      (3L, 1, 1.0), (3L, 2, 1.0), (3L, 3, 1.0), // cost 3.0 — at cutoff, drops
      (4L, 1, 100.0))                       // outlier, drops
      .toDF("episode_id", "t", "cost")
    val kept = SeqOps.dropOutlierTrajectories(tr, "episode_id", col("cost"),
      pct = 0.25, roundDigits = 1)
    val eps = kept.select("episode_id").distinct().as[Long].collect().toSet
    assert(eps == Set(1L, 2L), s"survivors: $eps")
    // every transition of a surviving episode survives, cost attached
    assert(kept.count() == 3)
    val costs = kept.select("episode_id", "episode_cost")
      .distinct().as[(Long, Double)].collect().toMap
    assert(costs == Map(1L -> 1.0, 2L -> 2.0))
  }

  test("gatherSample replicates rows for duplicate draws (with replacement)") {
    // 4-row table, 16 draws: pigeonhole forces duplicate indices; every
    // draw must land exactly one row and duplicates must materialize
    val df = (0L to 3L).map(i => (i, s"p$i")).toDF("pos", "payload")
    val got = JoinOps.gatherSample(df, "pos", nDraws = 16, seed = 7L)
      .select(col("draw_id"), col("pos")).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.length == 16, "one row per draw")
    assert(got.map(_._1).toSeq == (0L to 15L), "every draw id present exactly once")
    // reproduce the draw stream independently (minstd LCG, two rounds)
    val want = (0L to 15L).map(k => (7L + k) * 48271L % 2147483647L * 48271L % 2147483647L % 4L)
    assert(got.map(_._2).toSeq == want)
    assert(want.distinct.length < want.length, "fixture exercises replacement")
  }

  test("decontaminate drops exactly the docs sharing a bench n-gram") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),   // bench (3-grams incl "quick brown fox")
      (2L, "a quick brown fox ran away fast"),     // shares "quick brown fox" → drops
      (3L, "totally unrelated words in this doc"), // clean
      (4L, "tiny"),                                 // shorter than n → no grams, clean
      (5L, "the quick brown dog sleeps all day"))  // "the quick brown" matches → drops
      .toDF("doc_id", "text")
    val isBench = col("doc_id") === 1L
    val report = TextOps.contaminationReport(docs, "doc_id", "text", isBench, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(report.keySet == Set(2L, 5L), s"report: $report")
    assert(report(2L) >= 1 && report(5L) >= 1)
    val clean = TextOps.decontaminated(docs, "doc_id", "text", isBench, n = 3)
      .select("doc_id").as[Long].collect().toSet
    // bench doc passes through; contaminated 2 and 5 drop
    assert(clean == Set(1L, 3L, 4L), s"clean: $clean")
  }

  test("repetitionStats counts duplicate bigrams and top-token multiplicity") {
    val docs = Seq(
      (1L, "a b a b a"),   // toks 5; bigrams: ab,ba,ab,ba → 4 grams, 2 uniq, 2 dup; top tok 'a' ×3
      (2L, "x y z"),       // 3 toks, 2 grams, 0 dup, top 1
      (3L, "solo"))        // 1 tok, 0 grams, top 1
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 5L, 4L, 2L, 3L),
      (2L, 3L, 2L, 0L, 1L),
      (3L, 1L, 0L, 0L, 1L)))
  }

  test("chunkDocuments windows with stride overlap; short tail kept") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "a b c d", 4L),   // window [0,4)
      (1L, 1L, "d e f g", 4L),   // stride 3 → overlap of 1 token
      (1L, 2L, "g", 1L),         // short tail at start 6
      (2L, 0L, "x y", 2L)))      // doc shorter than a chunk; empty doc 3 absent
  }

  test("sessionAgg lengthCap keeps only the first N rows per key") {
    val df = (1 to 10).map(i => (1L, i, i.toDouble)).toDF("k", "t", "v")
    val capped = SeqOps.sessionAgg(df, "k", Seq(col("t")), col("v"),
      lengthCap = Some(3)).as[(Long, Double, Long, Double, Double)].head()
    assert(capped == ((1L, 6.0, 3L, 1.0, 3.0))) // sum 1+2+3, len 3, min 1, max 3
  }

  test("kmeansFit: two Lloyd iterations converge to the per-cluster means") {
    // two well-separated 2-D clusters; seeds are one member of each, so
    // iteration 1 already finds the right membership and iteration 2 is a
    // fixed point — the final centroids are exactly the cluster means
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (10L, Seq(10.0, 10.0)), (11L, Seq(11.0, 10.0)), (12L, Seq(10.0, 11.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansFit(pts, "vec_id", "embedding",
      seedPred = col("vec_id").isin(1L, 11L), iters = 2)
      .orderBy("cell", "pos")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // pround(1/3, 6) = floor(333333.8…)/1e6 = 0.333333
    assert(got == Seq(
      (1L, 0L, 0.333333, 3L), (1L, 1L, 0.333333, 3L),
      (11L, 0L, 10.333333, 3L), (11L, 1L, 10.333333, 3L)))
  }

  test("semanticDedup keeps the lowest id per duplicate group, within cells only") {
    // two clusters; in the first, vectors 0/1/2 are near-identical
    // directions (cosine ≈ 1) and 3 is orthogonal; the second cluster has
    // a duplicate pair (10, 11). Vector 20 duplicates 0's DIRECTION but
    // sits in the far cluster — cross-cell pairs must never be scored.
    val pts = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.99, 0.01, 0.0)),
      (2L, Seq(0.98, 0.02, 0.0)), (3L, Seq(0.0, 1.0, 0.0)),
      (10L, Seq(100.0, 100.0, 100.0)), (11L, Seq(100.0, 100.0, 100.1)),
      (20L, Seq(200.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    // centroids: 0 (origin-ish cell) and 10 (far cell); 20 is nearer 10
    val got = Similarity.semanticDedup(pts, "vec_id", "embedding",
      centroidPred = col("vec_id").isin(0L, 10L), threshold = 0.95)
      .orderBy("pid").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, false),  // representative of the 0/1/2 group
      (1L, 0L, true), (2L, 0L, true),
      (3L, 0L, false),  // same cell, below threshold
      (10L, 10L, false), (11L, 10L, true),
      (20L, 10L, false))) // duplicate direction of 0, but different cell
  }

  test("semanticDedup threshold monotonicity: raising it can only keep more") {
    val pts = (0L until 30L).map(i =>
      (i, Seq(math.cos(i.toDouble / 10), math.sin(i.toDouble / 10))))
      .toDF("vec_id", "embedding")
    def dupCount(t: Double): Long =
      Similarity.semanticDedup(pts, "vec_id", "embedding",
        centroidPred = col("vec_id") === 0L, threshold = t)
        .where(col("is_dup")).count()
    val loose = dupCount(0.9)
    val strict = dupCount(0.999)
    assert(strict <= loose, s"strict=$strict loose=$loose")
    assert(loose > 0, "fixture must produce at least one duplicate at 0.9")
  }

  test("mortonKey interleaves bits; sorting by it clusters both dimensions") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 7L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      CoreOps.mortonKey(col("x"), col("y"), 4).as("z"))
      .as[(Long, Long, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    // hand-computed interleaves: z = x bits at even positions, y at odd
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 2L)) == 12L)          // x=10b, y=10b -> 1100b
    assert(got((3L, 7L)) == 0x2FL)        // x=011b, y=111b -> 101111b
  }

  test("mortonKey is invertible (deinterleave recovers both dimensions)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), CoreOps.mortonKey(col("x"), col("y"), 12).as("z"))
      .as[(Long, Long, Long)].collect()
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until 12).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    got.foreach { case (x, y, z) => assert(deinterleave(z) == ((x, y))) }
    // distinct inputs -> distinct keys (a corollary of invertibility,
    // asserted directly so a partial-overlap bug can't hide)
    assert(got.map(_._3).distinct.length == got.map(t => (t._1, t._2)).distinct.length)
  }

  test("mortonKeyN is invertible for 3 and 4 dimensions") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(3, 4)) {
      val bits = if (n == 3) 10 else 8
      val lim = 1 << bits
      val tuples = Seq.fill(300)(Seq.fill(n)(rnd.nextInt(lim).toLong))
      val cols = (0 until n).map(j => col(s"d$j"))
      val got = tuples.map(t => Tuple1(t)).toDF("dims")
        .select((0 until n).map(j => col("dims")(j).as(s"d$j")): _*)
        .select(array(cols: _*).as("dims"), CoreOps.mortonKeyN(cols, bits).as("z"))
        .as[(Seq[Long], Long)].collect()
      def deinterleave(z: Long): Seq[Long] = {
        val out = Array.fill(n)(0L)
        (0 until bits).foreach { i =>
          (0 until n).foreach { j => out(j) |= ((z >> (i * n + j)) & 1L) << i }
        }
        out.toSeq
      }
      got.foreach { case (dims, z) =>
        assert(deinterleave(z) == dims, s"n=$n dims=$dims z=$z") }
      assert(got.map(_._2).distinct.length == got.map(_._1).distinct.length)
    }
  }

  test("mortonKeyN masks inputs to the low bits (wrap, not corrupt)") {
    // out-of-range and negative inputs must key identically to their
    // two's-complement low-bits counterparts — the documented contract
    val bits = 8
    val rows = Seq(
      (300L, 5L),          // 300 = 256 + 44 -> masks to 44
      (44L, 5L),
      (-1L, 0L),           // -1 masks to 255
      (255L, 0L))
    val got = rows.toDF("x", "y")
      .select(col("x"), CoreOps.mortonKeyN(Seq(col("x"), col("y")), bits).as("z"))
      .as[(Long, Long)].collect().toMap
    assert(got(300L) == got(44L))
    assert(got(-1L) == got(255L))
  }

  test("winsorize clamps at the ceil(q*n) positional quantiles per group") {
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("k", "v")
    val w = AggOps.winsorize(df, Seq("k"), "v", 0.1, 0.9)
      .select(col("v"), col("v_w")).as[(Double, Double)].collect().toMap
    // n=20: lo = value at ceil(2) = 2.0, hi = value at ceil(18) = 18.0
    assert(w(1.0) == 2.0 && w(2.0) == 2.0)
    assert(w(18.0) == 18.0 && w(19.0) == 18.0 && w(20.0) == 18.0)
    assert(w(10.0) == 10.0)
  }

  test("qualityGate keeps each group's top scores at its OWN bound") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 5).map(i => ("b", 100.0 + i))).toDF("g", "s")
    val kept = AggOps.qualityGate(df, Seq("g"), "s", keepTopFrac = 0.4)
      .select("g", "s").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // a: n=10 → bound at ceil(6)=6.0, kept {6..10} (n − ceil(0.6n) + 1 = 5)
    assert(kept("a") == Seq(6.0, 7.0, 8.0, 9.0, 10.0))
    // b: n=5 → bound at ceil(3)=103.0, kept {103, 104, 105} — its OWN
    // quantile, far below group a's values
    assert(kept("b") == Seq(103.0, 104.0, 105.0))
  }

  test("winsorize preserves and clamps null-keyed groups (row-preserving)") {
    val rows = (1 to 20).map(i => (Option("g"), i.toDouble)) ++
      (1 to 20).map(i => (Option.empty[String], i.toDouble + 100.0))
    val df = rows.toDF("k", "v")
    val out = AggOps.winsorize(df, Seq("k"), "v", 0.1, 0.9)
    assert(out.count() == 40L, "null-keyed rows must survive")
    val nullGroup = out.where(col("k").isNull)
      .select(col("v"), col("v_w")).as[(Double, Double)].collect().toMap
    // the null group winsorizes within ITSELF (bounds 102/118), proving
    // it got real bounds rather than a missed join
    assert(nullGroup(101.0) == 102.0 && nullGroup(120.0) == 118.0)
    assert(nullGroup(110.0) == 110.0)
  }

  test("lmPerplexityScore ranks corpus-typical word order above scrambled") {
    // 9 identical fluent docs + 1 scrambled doc with the SAME unigrams but
    // none of the corpus's frequent bigrams — the LM must rank it lower
    val docs = ((1L to 9L).map(i => (i, "the cat sat on the mat")) :+
      (10L, "mat the on sat cat the")).toDF("doc_id", "text")
    val got = TextOps.lmPerplexityScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(10L) < got(1L), s"scrambled doc must score lower: $got")
    assert((1L to 9L).map(got).distinct.size == 1, "identical docs score identically")
  }

  test("covarianceMatrix matches the closed form on a 2-D fixture") {
    // unit square corners: var = 1 on both axes, covariance 0
    val pts = Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(0.0, 2.0), Seq(2.0, 2.0))
      .map(Tuple1(_)).toDF("embedding")
    val got = Similarity.covarianceMatrix(pts, "embedding").orderBy("i", "j")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 0L, 1.0), (0L, 1L, 0.0), (1L, 1L, 1.0)))
  }

  test("pcaPowerIteration recovers the dominant direction of rank-1 data") {
    // points on the line t·(1,2): covariance is exactly rank-1, so power
    // iteration converges in one step to ±(1,2)/√5
    val pts = Seq(Seq(1.0, 2.0), Seq(-1.0, -2.0), Seq(2.0, 4.0), Seq(-2.0, -4.0))
      .map(Tuple1(_)).toDF("embedding")
    val got = Similarity.pcaPowerIteration(pts, "embedding", dim = 2, iters = 3)
      .orderBy("i").as[(Long, Double)].collect().map(_._2)
    assert(math.abs(got(0) - 1.0 / math.sqrt(5)) < 1e-5, got.toSeq.toString)
    assert(math.abs(got(1) - 2.0 / math.sqrt(5)) < 1e-5, got.toSeq.toString)
  }

  test("MisraGries: undercount bounded by N/(k+1); the heavy key survives") {
    val agg = new MisraGriesAggregator(2)
    // N = 10, k = 2 → max undercount N/(k+1) = 3.33; "a" (true count 6)
    // must survive with count in [6 − 3.33, 6]
    val xs = Seq.fill(6)("a") ++ Seq("b", "c", "d", "e")
    val sketch = xs.foldLeft(agg.zero)(agg.reduce)
    assert(sketch.contains("a"), s"heavy key lost: $sketch")
    assert(sketch("a") >= 3 && sketch("a") <= 6, s"count out of MG bound: $sketch")
    assert(sketch.size <= 2)
  }

  test("MisraGries merge applies the mergeable-summaries cut rule") {
    val agg = new MisraGriesAggregator(2)
    // pointwise sum = x:5 y:4 z:4 (3 keys > capacity 2) → subtract the
    // 3rd-largest count (4), drop non-positives → {x: 1}
    val m = agg.merge(Map("x" -> 5L, "y" -> 3L), Map("z" -> 4L, "y" -> 1L))
    assert(m == Map("x" -> 1L))
    // exact regime: merge is a plain pointwise sum, order-independent
    val e1 = agg.merge(Map("x" -> 2L), Map("y" -> 1L))
    val e2 = agg.merge(Map("y" -> 1L), Map("x" -> 2L))
    assert(e1 == e2 && e1 == Map("x" -> 2L, "y" -> 1L))
  }

  test("kmeansFit assigns an exactly-equidistant point to the lowest cell id") {
    // point 5 sits exactly between the two seeds (all distances are small
    // integers — exact in FP), so the strict-< fold keeps the first cell
    val pts = Seq(
      (1L, Seq(0.0, 0.0)), (3L, Seq(2.0, 0.0)), (5L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansFit(pts, "vec_id", "embedding",
      seedPred = col("vec_id").isin(1L, 3L), iters = 1)
      .orderBy("cell", "pos")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0.5, 2L), (1L, 1L, 0.0, 2L),
      (3L, 0L, 2.0, 1L), (3L, 1L, 0.0, 1L)))
  }
}
