package graft

import org.apache.spark.sql.functions._
import graft.ops.{Artifacts, Similarity}
import graft.streaming.StreamingOps

/** Round-16 additions: artifact-store writer lease + sidecar escaping,
  * recoverResplit row-loss hardening, kernel null/ANSI parity with the
  * HOF forms, and the deterministic (lattice-mean) PQ trainer. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("artifact writer lease: concurrent saves serialize onto distinct versions") {
    import java.nio.file.Files
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = Files.createTempDirectory("graft_art_race").toString + "/store"
    val dfs = (1 to 8).map(i => (i.toLong, i * 10L)).map { case (a, b) =>
      Seq((a, b)).toDF("a", "b")
    }
    val versions = Await.result(
      Future.sequence(dfs.map(df => Future(
        Artifacts.saveArtifact(df, root, "ivf_centroids")))), 120.seconds)
    // every writer terminates with its OWN committed version — no silent
    // loser whose rows vanish under the winner's number (the pre-lease
    // TOCTOU failure mode)
    assert(versions.sorted == (1L to 8L), versions.toString)
    assert(Artifacts.listArtifacts(spark, root).map(_.version) == (1L to 8L))
    // every committed version serves ITS writer's rows
    versions.zip(dfs).foreach { case (v, df) =>
      val (got, _) = Artifacts.loadArtifactVersion(spark, root, v, "ivf_centroids")
      assert(got.as[(Long, Long)].collect().toSeq ==
        df.as[(Long, Long)].collect().toSeq)
    }
    // no claim residue below the newest version after a prune
    Artifacts.pruneArtifacts(spark, root, keep = 2)
    val residue = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith(".claim-"))
    assert(residue.isEmpty, residue.toSeq.toString)
    assert(Artifacts.listArtifacts(spark, root).map(_.version) == Seq(7L, 8L))
  }

  test("artifact sidecar escapes control characters — valid JSON for external tools") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_art_esc").toString + "/store"
    val params = Map("note" -> "line1\nline2\ttabbed\r\"quoted\" back\\slash",
      "ctl" -> "bell")
    Artifacts.saveArtifact(Seq((1L, 2L)).toDF("a", "b"), root, "bpe_merges", params)
    val (_, meta) = Artifacts.loadArtifact(spark, root, "bpe_merges")
    assert(meta.params == params, "control-char params must round-trip")
    val raw = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/v${"%020d".format(1)}/meta.json")), "UTF-8")
    assert(!raw.exists(_ < ' '), s"sidecar must contain no raw control bytes: $raw")
  }

  test("recoverResplit: trash gone + re-created live cell dir -> roll FORWARD, " +
      "children kept (no row loss)") {
    import java.nio.file.Files
    val index = Files.createTempDirectory("graft_rec_fwd").toString + "/index"
    Seq((2L, Seq(0.0, 1.0), 1L)).toDF("pid", "pv", "cell")
      .write.partitionBy("cell").parquet(index)
    // committed install: children hold the moved rows, manifest residue
    // remains, trash already deleted
    Seq((0L, Seq(1.0, 0.1))).toDF("pid", "pv").write.parquet(s"$index/cell=5")
    Seq((1L, Seq(1.0, -0.1))).toDF("pid", "pv").write.parquet(s"$index/cell=6")
    val fs = new org.apache.hadoop.fs.Path(index)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$index/.resplit-manifest-cell=0"), true)
    try out.write("5\n6".getBytes("UTF-8")) finally out.close()
    // an ingest (with stale centroids) re-created the parent cell with a
    // NEW row after the commit — the pre-r16 rollback would have deleted
    // children 5 and 6, losing the only copy of pids 0 and 1
    Seq((9L, Seq(1.0, 0.0))).toDF("pid", "pv").write.parquet(s"$index/cell=0")
    assert(StreamingOps.recoverResplit(spark, index) == Seq(0L))
    val got = spark.read.parquet(index)
      .select(col("pid"), col("cell")).as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 5L), (1L, 6L), (2L, 1L), (9L, 0L)),
      s"children AND the re-created live dir must survive: $got")
  }

  test("recoverResplit: rollback with a re-created live cell dir MERGES the " +
      "trash copy instead of deleting it") {
    import java.nio.file.Files
    val index = Files.createTempDirectory("graft_rec_mrg").toString + "/index"
    Seq((0L, Seq(1.0, 0.1), 0L), (1L, Seq(1.0, -0.1), 0L))
      .toDF("pid", "pv", "cell").write.partitionBy("cell").parquet(index)
    val fs = new org.apache.hadoop.fs.Path(index)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$index/$n")
    // mid-install crash: cell 0 moved aside, one child installed
    assert(fs.rename(p("cell=0"), p(".trash-cell=0")))
    Seq((0L, Seq(1.0, 0.1))).toDF("pid", "pv").write.parquet(s"$index/cell=5")
    val out = fs.create(p(".resplit-manifest-cell=0"), true)
    try out.write("5".getBytes("UTF-8")) finally out.close()
    // a rogue ingest re-created cell=0 with a NEW row before recovery —
    // the pre-r16 path deleted the trash (the only pre-split copy)
    Seq((9L, Seq(0.9, 0.0))).toDF("pid", "pv").write.parquet(s"$index/cell=0")
    assert(StreamingOps.recoverResplit(spark, index) == Seq(0L))
    val got = spark.read.parquet(index)
      .select(col("pid"), col("cell")).as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 0L), (1L, 0L), (9L, 0L)),
      s"rollback must merge pre-split rows with the re-created dir: $got")
    val residue = new java.io.File(index).listFiles()
      .map(_.getName).filter(n => n.startsWith(".resplit") || n.startsWith(".trash"))
    assert(residue.isEmpty, residue.toSeq.toString)
  }

  test("maintainAnnIndex prunes the centroid version chain to retainVersions; " +
      "serving unaffected") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_maint_prune").toString
    val index = s"$base/index"; val store = s"$base/store"
    Seq((0L, Seq(1.0, 0.1), 0L), (1L, Seq(1.0, -0.1), 0L), (2L, Seq(0.0, 1.0), 1L))
      .toDF("pid", "pv", "cell").write.partitionBy("cell").parquet(index)
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cell", "cv")
    (1 to 4).foreach(_ => Artifacts.saveArtifact(cents, store, "ivf_centroids"))
    val (_, v, _) = StreamingOps.maintainAnnIndex(spark, index, store,
      maxSkew = 100.0, retainVersions = 2)
    assert(v == 5L)
    assert(Artifacts.listArtifacts(spark, store).map(_.version) == Seq(4L, 5L),
      "older versions pruned, current + one rollback retained")
    val (cur, meta) = Artifacts.loadArtifact(spark, store, "ivf_centroids")
    assert(meta.version == 5L && cur.count() == 2L, "serving reads the current version")
  }

  test("NearestCell kernel mirrors the HOF null-skip semantics (public SQL surface)") {
    graft.functions.GraftFunctions.register(spark)
    // null element in p -> every HOF dist is null -> fold init -1
    assert(spark.sql("SELECT graft_nearest_cell(array(1.0D, CAST(NULL AS DOUBLE)), " +
      "array(named_struct('cell', 1L, 'cv', array(1.0D, 2.0D))))")
      .collect().head.getLong(0) == -1L)
    // null centroid struct entry and null cell id are skipped
    assert(spark.sql("SELECT graft_nearest_cell(array(1.0D, 0.0D), array(" +
      "CAST(NULL AS STRUCT<cell: BIGINT, cv: ARRAY<DOUBLE>>), " +
      "named_struct('cell', CAST(NULL AS BIGINT), 'cv', array(1.0D, 0.0D)), " +
      "named_struct('cell', 7L, 'cv', array(0.0D, 1.0D))))")
      .collect().head.getLong(0) == 7L)
    // null element inside a centroid vector: that centroid skipped, and
    // the kernel agrees with a RAW HOF fold frame-for-frame (raw SQL is
    // the surface where null-skip applies; the graft_dot in the fold
    // nulls on a null element — r16 — so the IF drops the entry)
    val frames = spark.sql("SELECT * FROM VALUES " +
      "(1L, array(1.0D, CAST(NULL AS DOUBLE))), (2L, array(0.9D, 0.1D)) AS t(pid, pv)")
      .crossJoin(spark.sql("SELECT array(" +
        "named_struct('cell', 10L, 'cv', array(1.0D, CAST(NULL AS DOUBLE)))," +
        "named_struct('cell', 11L, 'cv', array(0.0D, 1.0D))) AS cents"))
    val kernel = frames.select(col("pid"), expr("graft_nearest_cell(pv, cents)").as("cell"))
      .as[(Long, Long)].collect().toMap
    val hof = frames.select(col("pid"), expr(
      """aggregate(
           transform(cents, c -> named_struct(
             'cell', c.cell,
             'dist', (graft_dot(pv, pv) - 2 * graft_dot(pv, c.cv)) + graft_dot(c.cv, c.cv))),
           named_struct('cell', CAST(-1 AS BIGINT), 'dist', CAST('Infinity' AS DOUBLE)),
           (acc, c) -> IF(c.dist < acc.dist, c, acc)).cell""").as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(kernel == hof, s"kernel $kernel vs hof $hof")
    assert(kernel == Map(1L -> -1L, 2L -> 11L))
    // the INTERNAL ops declare density instead: a null element fails loud
    // (graft_dense boundary contract) rather than silently skipping
    val pts = spark.sql("SELECT * FROM VALUES (1L, array(1.0D, CAST(NULL AS DOUBLE))) " +
      "AS t(pid, pv)")
    val cents = spark.sql("SELECT * FROM VALUES (11L, array(0.0D, 1.0D)) AS t(cell, cv)")
    intercept[Exception] {
      Similarity.assignCells(pts, "pid", "pv", cents).collect()
    }
  }

  test("MaxCosine kernel: null skip + ANSI-off zero-norm skip, both ≡ HOF") {
    graft.functions.GraftFunctions.register(spark)
    // null element in p -> every cosine null -> the -1.0 seed
    assert(spark.sql("SELECT graft_max_cosine(array(1.0D, CAST(NULL AS DOUBLE)), " +
      "array(array(1.0D, 0.0D)))").collect().head.getDouble(0) == -1.0)
    // null bench vector / null element skipped on the raw SQL surface,
    // kernel ≡ raw HOF fold (graft_dot nulls the entry; greatest skips)
    val rawFrames = spark.sql("SELECT 1L AS doc_id, array(1.0D, 0.0D) AS pv")
      .crossJoin(spark.sql(
        "SELECT array(array(CAST(NULL AS DOUBLE), 1.0D), array(0.6D, 0.8D)) AS bvs"))
    assert(rawFrames.select(expr("graft_max_cosine(pv, bvs)"))
      .as[Double].collect().head == 0.6)
    assert(rawFrames.select(expr(
      """aggregate(bvs, CAST(-1.0 AS DOUBLE),
           (acc, bv) -> greatest(acc, graft_dot(pv, bv) /
             (sqrt(graft_dot(pv, pv)) * sqrt(graft_dot(bv, bv)))))"""))
      .as[Double].collect().head == 0.6)
    // the INTERNAL op declares density: a null bench element fails loud
    val corpus = spark.sql(
      "SELECT * FROM VALUES (1L, array(1.0D, 0.0D)) AS t(doc_id, embedding)")
    val sparseBench = spark.sql(
      "SELECT * FROM VALUES (array(CAST(NULL AS DOUBLE), 1.0D)) AS t(embedding)")
    intercept[Exception] {
      Similarity.semanticDecontaminate(corpus, "doc_id", "embedding",
        sparseBench, "embedding").collect()
    }
    def mc(df: org.apache.spark.sql.DataFrame) =
      df.select("max_cos").as[Double].collect().head
    // ANSI OFF: the HOF's divide-by-zero folds to null and greatest skips
    // it; the kernel must do the same instead of throwing (the ADVICE
    // divergence: throw-vs-skip depended on session config before r16)
    val zeroBench = spark.sql("SELECT * FROM VALUES (array(0.0D, 0.0D))," +
      " (array(0.6D, 0.8D)) AS t(embedding)")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val k = mc(Similarity.semanticDecontaminate(corpus, "doc_id", "embedding",
        zeroBench, "embedding"))
      val h = mc(Similarity.semanticDecontaminateHof(corpus, "doc_id", "embedding",
        zeroBench, "embedding"))
      assert(k == 0.6 && h == 0.6, s"ANSI-off zero-norm must skip: kernel=$k hof=$h")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // ANSI ON (the default): both forms fail loud — pinned in Round15OpsSpec
  }

  test("exactQuantiles ≡ the sort-based position rule (random data, " +
      "many buckets crossed, constant group)") {
    import graft.ops.AggOps
    val rnd = new scala.util.Random(31)
    val data = (1 to 500).map(i => (s"g${i % 3}", rnd.nextDouble() * 100)) ++
      (1 to 7).map(_ => ("const", 42.0)) // min == max: single-bucket path
    val df = data.toDF("k", "v").repartition(7)
    val qs = Seq(0.05, 0.5, 0.9, 1.0)
    val got = AggOps.exactQuantiles(df, Seq("k"), "v", qs, buckets = 16)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expect = data.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      qs.map(q => (k, q) -> sorted(math.ceil(sorted.size * q).toInt.max(1) - 1))
    }
    expect.foreach { case (key, v) =>
      assert(got(key) == v, s"$key: got ${got(key)}, want $v")
    }
    assert(got.size == expect.size)
  }

  test("pqTrain latticeMeans: bit-deterministic across partitionings, " +
      "exact half-boundary means included") {
    // two members whose coordinate sits exactly between lattice steps:
    // the classic pr(avg) resolves the tie by FP partial-sum noise; the
    // lattice mean resolves it by integer arithmetic, always up
    val df = Seq(
      (3L, Seq(0.000001, 0.5)), (26L, Seq(0.000002, 0.5)),
      (7L, Seq(0.25, 0.125)), (8L, Seq(0.125, 0.25)))
      .toDF("vec_id", "embedding")
    val sp = pmod(col("vec_id"), lit(23)) === 3
    def fit(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTrain(d, "vec_id", "embedding", m = 1, dim = 2,
        seedPred = sp, iters = 2, latticeMeans = true)
        .orderBy(col("sub"), col("cell"), col("pos"))
        .as[(Long, Long, Long, Double, Long)].collect().toSeq
    val a = fit(df.repartition(1))
    val b = fit(df.repartition(7))
    assert(a == b, s"lattice means must not depend on partitioning:\n$a\n$b")
    // the boundary coordinate resolves upward deterministically
    val seedCell = a.filter(r => r._2 == 3L && r._3 == 0L)
    assert(seedCell.nonEmpty)
  }
}
