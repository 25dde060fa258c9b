package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Similarity

/** Dev probe for the round-16 x2_opq_refine_recall framing: on a
  * deterministic CORRELATED 8-dim fixture (dims 4-7 correlate 0.8 with
  * dims 0-3 across the m=4 subspace cuts — opqRefine's documented
  * operating domain), price recall@5 + total quantization error for
  * (a) plain PQ, (b) PCA+allocation (parametric OPQ), (c) one NP
  * Procrustes alternation, at several powerIters. */
object OpqNpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embRaw = graft.sources.Tables.embeddings(spark, sfDir)
    // correlated fixture: w = [u0,u1,u2,u3, .8u0+.6u4, .8u1+.6u5, .8u2+.6u6, .8u3+.6u7]
    val emb = embRaw.select(col("vec_id"), expr(
      "transform(sequence(0, 7), i -> CASE WHEN i < 4 THEN " +
        "element_at(CAST(embedding AS array<double>), i+1) ELSE " +
        "(0.9D - 0.1D * (i-4)) * element_at(CAST(embedding AS array<double>), i-3) + " +
        "0.6D * element_at(CAST(embedding AS array<double>), i+1) END)")
      .as("embedding")).cache()
    val qp = pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 800
    val seedPred = pmod(col("vec_id"), lit(23)) === 3

    val e = emb.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").as("cv"))
    val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
      col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("cand_id").asc)
    val exact = e.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("d", round(expr(
        "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("query_id"), col("cand_id")).cache()
    exact.count()

    def meanRecall(cand: DataFrame): Double =
      exact.join(cand.select(col("query_id"), col("cand_id")).distinct()
          .withColumn("__hit", lit(1)), Seq("query_id", "cand_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hits"))
        .agg(avg(col("n_hits") / least(col("n_exact"), lit(5L)).cast("double")))
        .collect().head.getDouble(0)

    def priced(src: DataFrame, vecCol: String): (Double, Double) = {
      val cb = Similarity.pqTrain(src, "vec_id", vecCol, m = 4, dim = 8,
        seedPred = seedPred, iters = 2).cache()
      val cand = Similarity.pqSearch(src, "vec_id", vecCol, m = 4, dim = 8,
        codebooks = cb, queryPred = qp, k = 5)
      val xh = Similarity.pqDecode(
        Similarity.pqEncode(src, "vec_id", vecCol, m = 4, dim = 8, cb), cb)
      val err = src.select(col("vec_id").cast("long").as("pid"), col(vecCol).as("v"))
        .join(xh, Seq("pid"))
        .select(expr("aggregate(zip_with(v, xhat, (a, b) -> (a-b)*(a-b)), " +
          "0D, (acc, x) -> acc + x)").as("e"))
        .agg(sum(col("e"))).collect().head.getDouble(0)
      (meanRecall(cand), err)
    }

    val (rp, ep) = priced(emb, "embedding")
    println(f"plain:        recall=$rp%.4f err=$ep%.4f")

    for (it <- Seq(3, 6, 10)) {
      try {
        val comps = Similarity.pcaTopK(emb, "embedding", dim = 8, k = 8, iters = it)
        val lams = comps.select(col("comp"), col("eigenvalue")).distinct()
          .orderBy(col("comp")).collect().map(_.getDouble(1))
        println(s"pca(it=$it) eigenvalues: ${lams.map(l => f"$l%.5f").mkString(", ")}")
        val rotA = Similarity.pcaRotate(emb, "vec_id", "embedding",
          Similarity.opqAllocate(comps, m = 4)).cache()
        val (ra, ea) = priced(rotA, "rv")
        println(f"pca+alloc(it=$it): recall=$ra%.4f err=$ea%.4f")
      } catch { case ex: Throwable => println(s"alloc(it=$it) FAILED: ${ex.getMessage.take(100)}") }
    }

    for (pi <- Seq(12, 24)) {
      try {
        var cur = emb.select(col("vec_id"), col("embedding").as("rv")).cache()
        for (alt <- 1 to 3) {
          val r = Similarity.opqRefine(cur, "vec_id", "rv", m = 4, dim = 8,
            seedPred = seedPred, iters = 2, powerIters = pi)
          cur = Similarity.pcaRotate(cur, "vec_id", "rv", r).cache()
          val (rn, en) = priced(cur, "rv")
          println(f"np(pi=$pi%2d, alt=$alt):     recall=$rn%.4f err=$en%.4f")
        }
      } catch { case ex: Throwable => println(s"np(pi=$pi) FAILED: ${ex.getMessage.take(120)}") }
    }
    // the paper's initialization: NP refinement FROM the parametric rotation
    for (pi <- Seq(12, 24)) {
      try {
        val comps = Similarity.pcaTopK(emb, "embedding", dim = 8, k = 8, iters = 6)
        var cur = Similarity.pcaRotate(emb, "vec_id", "embedding",
          Similarity.opqAllocate(comps, m = 4)).cache()
        for (alt <- 1 to 2) {
          val r = Similarity.opqRefine(cur, "vec_id", "rv", m = 4, dim = 8,
            seedPred = seedPred, iters = 2, powerIters = pi)
          cur = Similarity.pcaRotate(cur, "vec_id", "rv", r).cache()
          val (rn, en) = priced(cur, "rv")
          println(f"np-from-alloc(pi=$pi%2d, alt=$alt): recall=$rn%.4f err=$en%.4f")
        }
      } catch { case ex: Throwable => println(s"np-from-alloc(pi=$pi) FAILED: ${ex.getMessage.take(120)}") }
    }
    // NP from the PLAIN descending PCA rotation (no allocation — no
    // eigenvalue-order assumption in an oracle replay)
    for (it <- Seq(6); pi <- Seq(12, 24)) {
      try {
        val comps = Similarity.pcaTopK(emb, "embedding", dim = 8, k = 8, iters = it)
        var cur = Similarity.pcaRotate(emb, "vec_id", "embedding", comps).cache()
        val (rb, eb) = priced(cur, "rv")
        println(f"pca-plain(it=$it):          recall=$rb%.4f err=$eb%.4f")
        for (alt <- 1 to 2) {
          val r = Similarity.opqRefine(cur, "vec_id", "rv", m = 4, dim = 8,
            seedPred = seedPred, iters = 2, powerIters = pi)
          cur = Similarity.pcaRotate(cur, "vec_id", "rv", r).cache()
          val (rn, en) = priced(cur, "rv")
          println(f"np-from-pca(it=$it,pi=$pi%2d, alt=$alt): recall=$rn%.4f err=$en%.4f")
        }
      } catch { case ex: Throwable => println(s"np-from-pca(pi=$pi) FAILED: ${ex.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
