package graft

import org.apache.spark.sql.functions._
import graft.ops.Artifacts

/** Round-15 surfaces: versioned trained-artifact persistence (the
  * save/load half of the reference checkpoint story, fawac.py:555-583,
  * applied to centroid/codebook/component/merge tables). */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_art_$tag").toString + "/store"

  test("artifact save/load round-trips rows, meta, and versions") {
    val root = tmpRoot("rt")
    val v1df = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cell", "cv")
    val v1 = Artifacts.saveArtifact(v1df, root, "ivf_centroids",
      Map("dim" -> "2", "iters" -> "2"))
    assert(v1 == 1L)
    val (got1, meta1) = Artifacts.loadArtifact(spark, root, "ivf_centroids")
    assert(meta1 == Artifacts.ArtifactMeta("ivf_centroids", 1L,
      Map("dim" -> "2", "iters" -> "2")))
    assert(got1.as[(Long, Seq[Double])].collect().toSet ==
      Set((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    // second save commits version 2 and becomes current; v1 stays loadable
    val v2df = Seq((0L, Seq(0.5, 0.5))).toDF("cell", "cv")
    assert(Artifacts.saveArtifact(v2df, root, "ivf_centroids") == 2L)
    val (got2, meta2) = Artifacts.loadArtifact(spark, root, "ivf_centroids")
    assert(meta2.version == 2L && got2.count() == 1L)
    val (old, _) = Artifacts.loadArtifactVersion(spark, root, 1L, "ivf_centroids")
    assert(old.count() == 2L)
    assert(Artifacts.listArtifacts(spark, root).map(_.version) == Seq(1L, 2L))
  }

  test("artifact load fails loud on wrong family, empty root, missing version") {
    val root = tmpRoot("fl")
    intercept[IllegalArgumentException] {
      Artifacts.loadArtifact(spark, root, "ivf_centroids")
    }
    Artifacts.saveArtifact(Seq((1L, 2L)).toDF("a", "b"), root, "pq_codebooks")
    val e = intercept[IllegalArgumentException] {
      Artifacts.loadArtifact(spark, root, "ivf_centroids")
    }
    assert(e.getMessage.contains("family mismatch"))
    intercept[IllegalArgumentException] {
      Artifacts.loadArtifactVersion(spark, root, 7L, "pq_codebooks")
    }
  }

  test("artifact store ignores staging residue and prunes old versions") {
    val root = tmpRoot("pr")
    val df = Seq((1L, 1.0)).toDF("k", "v")
    (1 to 4).foreach(_ => Artifacts.saveArtifact(df, root, "pca_components"))
    // a crashed save's hidden residue must not block or pollute the store
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, ".tmp-v00000000000000000099"))
    assert(Artifacts.listArtifacts(spark, root).map(_.version) == Seq(1L, 2L, 3L, 4L))
    assert(Artifacts.saveArtifact(df, root, "pca_components") == 5L)
    assert(Artifacts.pruneArtifacts(spark, root, keep = 2) == Seq(1L, 2L, 3L))
    assert(Artifacts.listArtifacts(spark, root).map(_.version) == Seq(4L, 5L))
    val (_, meta) = Artifacts.loadArtifact(spark, root, "pca_components")
    assert(meta.version == 5L)
  }

  test("simhash hot-bucket guard: degenerate template corpus stays O(n), " +
      "report names the hot bucket") {
    import graft.ops.Dedup
    // one dominant boilerplate template (300 near-identical docs — the
    // pathological corpus band width cannot defuse) plus a handful of
    // distinct docs
    val template = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = ((0L until 300L).map(i => (i, template + s" tail$i")) ++
      Seq((900L, "completely different content about spark shuffles and joins"),
        (901L, "another unrelated document mentioning vectors and parquet files")))
      .toDF("doc_id", "text")
    // the report must name the template bucket with its quadratic price
    val report = Dedup.simhashBucketReport(docs, "doc_id", "text")
      .as[(Int, Long, Long, Long)].collect()
    val hottest = report.head
    assert(hottest._3 >= 300L && hottest._4 >= 300L * 299L / 2,
      s"report must surface the template bucket: ${report.take(3).toSeq}")
    // uncapped: quadratic candidates (every template pair verifies at
    // hamming 0); capped: star per hot bucket — O(n) candidates — and the
    // template family stays fully connected through the representative
    val uncapped = Dedup.simhashPairs(docs, "doc_id", "text")
    val capped = Dedup.simhashPairs(docs, "doc_id", "text",
      maxBucketSize = Some(50))
    val up = uncapped.count(); val cp = capped.count()
    assert(up >= 300L * 299L / 2, s"degenerate corpus must be quadratic uncapped: $up")
    assert(cp <= 4 * 300L, s"capped candidates must stay O(n): $cp")
    val star = capped.as[(Long, Long, Long)].collect()
    assert(star.forall(_._1 == 0L), "star pairs anchor at the lowest-id member")
    assert(star.map(_._2).toSet == (1L until 300L).toSet,
      "every template member links to the representative")
    // a corpus with NO hot bucket is byte-identical under the guard
    val normal = docs.where(col("doc_id") >= 900L)
    val a = Dedup.simhashPairs(normal, "doc_id", "text").collect().toSet
    val b = Dedup.simhashPairs(normal, "doc_id", "text",
      maxBucketSize = Some(50)).collect().toSet
    assert(a == b)
  }

  test("OPQ-NP refinement: near-orthogonal Procrustes factor, objective non-increase") {
    import graft.ops.Similarity
    // correlated fixture misaligned with the m=2 subspace cut: dims
    // (2,3) correlate 0.8 with dims (0,1) across the cut, so independent
    // sub-quantizers waste codes on shared information — the structure
    // the Procrustes step can rotate out. Full-rank by construction
    // (0.6 fresh noise): a near-rank-deficient M is the op's documented
    // fail-loud case, not its operating point (it refines
    // already-decorrelated PCA-rotated representations).
    val rnd = new scala.util.Random(7)
    val data = (0L until 400L).map { i =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (i, Seq(a, b, 0.8 * a + 0.6 * rnd.nextGaussian(),
        0.8 * b + 0.6 * rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
    val seeds = pmod(col("vec_id"), lit(23)) === 3
    val r = Similarity.opqRefine(data, "vec_id", "embedding", m = 2, dim = 4,
      seedPred = seeds, iters = 2, powerIters = 24)
    val rm = Array.ofDim[Double](4, 4)
    r.collect().foreach(x =>
      rm(x.getLong(1).toInt)(x.getLong(0).toInt - 1) = x.getDouble(2))
    // R approximately orthogonal: ‖RᵀR − I‖∞ bounded (power-iteration +
    // rounding tolerance, not exact; near-degenerate eigen-pairs in this
    // symmetric fixture converge slowly — 24 iterations measured 2.8e-3,
    // vs 0.106 at 6)
    val maxDev = (for (i <- 0 until 4; j <- 0 until 4) yield {
      val dot = (0 until 4).map(k => rm(k)(i) * rm(k)(j)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    assert(maxDev < 0.05, s"R'R deviates from I by $maxDev")
    // the Procrustes objective itself: against the FIXED reconstructions
    // x̂ the rotation was solved for, ‖XR − X̂‖² ≤ ‖X − X̂‖² (R = I is
    // feasible, so the exact solution can only improve; the approximate
    // R gets a 0.1 % tolerance). Retrained-codebook error is reported as
    // info — re-seeding k-means after a rotation lands in a different
    // local optimum, so the paper's monotonicity claim does not transfer
    // to the retrained measurement.
    def errAgainst(df: org.apache.spark.sql.DataFrame, vecCol: String,
                   xh: org.apache.spark.sql.DataFrame): Double =
      df.select(col("vec_id").cast("long").as("pid"),
          col(vecCol).cast("array<double>").as("pv"))
        .join(xh, "pid")
        .select(expr(
          "aggregate(zip_with(pv, xhat, (a,b) -> (a-b)*(a-b)), 0D, (acc,x) -> acc+x)")
          .as("e"))
        .agg(sum(col("e"))).collect().head.getDouble(0)
    val cb = Similarity.pqTrain(data, "vec_id", "embedding", m = 2, dim = 4,
      seedPred = seeds, iters = 2)
    val xh = Similarity.pqDecode(
      Similarity.pqEncode(data, "vec_id", "embedding", m = 2, dim = 4, cb), cb)
      .cache()
    val before = errAgainst(data, "embedding", xh)
    val rotated = Similarity.pcaRotate(data, "vec_id", "embedding", r)
    val after = errAgainst(rotated, "rv", xh)
    assert(after <= before * 1.001,
      s"Procrustes step must not worsen its own objective: $before -> $after")
    info(f"fixed-reconstruction error: $before%.4f -> $after%.4f (${after / before}%.4f x)")
  }

  test("NearestCell codegen kernel ≡ the declarative HOF argmin fold") {
    import graft.ops.Similarity
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val pts = (0L until 300L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian()))).toDF("pid", "pv")
    val cents = (0L until 23L).map(c =>
      (c, Seq.fill(16)(rnd.nextGaussian()))).toDF("cell", "cv")
    def viaKernel(c: org.apache.spark.sql.DataFrame) =
      Similarity.assignCells(pts, "pid", "pv", c)
        .select("pid", "cell").as[(Long, Long)].collect().toMap
    def viaHof(c: org.apache.spark.sql.DataFrame) =
      Similarity.assignNearestCellHof(
        pts.select(col("pid"), col("pv").cast("array<double>").as("pv")),
        c.select(col("cell").cast("long").as("cell"),
          col("cv").cast("array<double>").as("cv")))
        .select("pid", "cell").as[(Long, Long)].collect().toMap
    assert(viaKernel(cents) == viaHof(cents))
    // exact tie: duplicated centroid vector under two ids → lowest wins
    val tied = Seq((7L, Seq.fill(16)(0.5)), (3L, Seq.fill(16)(0.5)))
      .toDF("cell", "cv")
    assert(viaKernel(tied).values.toSet == Set(3L))
    assert(viaKernel(tied) == viaHof(tied))
    // a length-mismatched centroid is SKIPPED by both forms (zip_with
    // null-pads → null dist loses the IF; the kernel skips explicitly)
    val mixed = cents.unionByName(
      Seq((99L, Seq(1.0, 2.0))).toDF("cell", "cv"))
    assert(viaKernel(mixed) == viaHof(mixed))
    assert(!viaKernel(mixed).values.toSet.contains(99L))
    // empty centroid table → the fold's init cell (-1) on both forms
    val empty = cents.where(col("cell") < 0)
    assert(viaKernel(empty).values.toSet == Set(-1L))
    assert(viaKernel(empty) == viaHof(empty))
  }

  test("MaxCosine codegen kernel ≡ the declarative greatest-fold (incl. mismatch, zero-norm)") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(13)
    val corpus = (0L until 200L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("doc_id", "embedding")
    val bench = ((0L until 15L).map(i => (i, Seq.fill(8)(rnd.nextGaussian()))) :+
      (99L, Seq(1.0, 2.0))) // length-mismatched bench vector: skipped
      .toDF("vec_id", "embedding")
    def collectOf(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "max_cos", "contaminated")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val kernel = collectOf(Similarity.semanticDecontaminate(
      corpus, "doc_id", "embedding", bench, "embedding", tau = 0.3))
    val hof = collectOf(Similarity.semanticDecontaminateHof(
      corpus, "doc_id", "embedding", bench, "embedding", tau = 0.3))
    assert(kernel == hof)
    // a zero-norm corpus vector FAILS LOUD on both forms (the HOF raises
    // ANSI divide-by-zero; the kernel matches rather than minting a NaN)
    val zero = Seq((900L, Seq.fill(8)(0.0))).toDF("doc_id", "embedding")
    intercept[Exception] {
      Similarity.semanticDecontaminate(
        zero, "doc_id", "embedding", bench, "embedding").collect()
    }
    intercept[Exception] {
      Similarity.semanticDecontaminateHof(
        zero, "doc_id", "embedding", bench, "embedding").collect()
    }
  }

  test("OPQ eigenvalue allocation: zig-zag on a descending spectrum, scale-invariant") {
    import graft.ops.Similarity
    // (comp, i, loading, eigenvalue) — loadings don't matter for the
    // permutation; eigenvalues ALL < 1 (the case where the literal
    // 'smallest product, empty = 1' greedy degenerates to consecutive
    // pairing)
    def comps(lams: Seq[Double]) = lams.zipWithIndex.flatMap { case (l, c) =>
      (0 until 4).map(i => ((c + 1).toLong, i.toLong, 0.1, l))
    }.toDF("comp", "i", "loading", "eigenvalue")
    val small = comps(Seq(0.5, 0.2, 0.1, 0.04, 0.02, 0.01, 0.005, 0.001))
    val got = Similarity.opqAllocate(small, m = 4)
      .select("comp", "eigenvalue").distinct()
      .as[(Long, Double)].collect().sortBy(_._1)
    // positions (1..8) must carry eigen-ranks (1,8),(2,7),(3,6),(4,5)
    val posToRank = got.map { case (pos, l) =>
      pos -> (Seq(0.5, 0.2, 0.1, 0.04, 0.02, 0.01, 0.005, 0.001).indexOf(l) + 1)
    }.toMap
    assert(posToRank == Map(1L -> 1, 2L -> 8, 3L -> 2, 4L -> 7,
      5L -> 3, 6L -> 6, 7L -> 4, 8L -> 5), posToRank.toString)
    // scaling every eigenvalue by 1000 (all > 1) gives the SAME permutation
    val big = comps(Seq(0.5, 0.2, 0.1, 0.04, 0.02, 0.01, 0.005, 0.001).map(_ * 1000))
    val got2 = Similarity.opqAllocate(big, m = 4)
      .select("comp", "eigenvalue").distinct().as[(Long, Double)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(got2 == got.map(_._2 * 1000).toSeq)
    // non-positive eigenvalue fails loud
    intercept[IllegalArgumentException] {
      Similarity.opqAllocate(comps(Seq(0.5, 0.0, 0.1, 0.04, 0.02, 0.01, 0.005, 0.001)), m = 4)
    }
  }

  test("artifact save refuses to overwrite a concurrently-committed version") {
    val root = tmpRoot("cc")
    val df = Seq((1L, 1.0)).toDF("k", "v")
    Artifacts.saveArtifact(df, root, "ivf_centroids")
    // simulate a racing/corrupt writer: something occupies the NAME this
    // save will allocate (v2) without being a committed version dir (a
    // plain file is invisible to the committed-version listing, exactly
    // like a directory that appears between the listing and the rename);
    // the save must fail loud instead of clobbering it
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, "v" + "0" * 19 + "2"), true).close()
    val e = intercept[IllegalArgumentException] {
      Artifacts.saveArtifact(df, root, "ivf_centroids")
    }
    // r16: with the claim lease, a foreign object on the committed name
    // can only mean out-of-band tampering — still fail loud
    assert(e.getMessage.contains("tampered"))
  }

  test("artifact sidecar escapes quotes and backslashes in params") {
    val root = tmpRoot("esc")
    val params = Map(
      "note" -> """a "quoted\path" value""",
      "k" -> "8",
      "multiline" -> "line one\nline two\ttabbed",
      "json-ish" -> """{"family":"trap","params":{}}""",
      "unicode" -> "λ₁=0.02, é → c3 a9",
      "edge\"key\\" -> "\"")
    Artifacts.saveArtifact(Seq((1L, "x")).toDF("id", "s"), root, "bpe_merges", params)
    val (_, meta) = Artifacts.loadArtifact(spark, root, "bpe_merges")
    assert(meta.params == params)
    assert(meta.family == "bpe_merges", "a JSON-shaped param value must not spoof the family")
  }
}
