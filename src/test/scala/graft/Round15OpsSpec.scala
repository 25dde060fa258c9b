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

  test("artifact sidecar escapes quotes and backslashes in params") {
    val root = tmpRoot("esc")
    val params = Map("note" -> """a "quoted\path" value""", "k" -> "8")
    Artifacts.saveArtifact(Seq((1L, "x")).toDF("id", "s"), root, "bpe_merges", params)
    val (_, meta) = Artifacts.loadArtifact(spark, root, "bpe_merges")
    assert(meta.params == params)
  }
}
