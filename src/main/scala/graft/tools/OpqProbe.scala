package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Similarity

/** Dev probe for the OPQ-rotation recall measurement (round 14): at the
  * x2_pq_recall operating point (m=8 sub-codes, seeds vec_id%23==3,
  * 2 Lloyd iterations, recall@5 vs exact L2 on the ORIGINAL vectors),
  * compare plain PQ over the raw 64 dims against PQ over the top-k PCA
  * rotation, for several k — the measurement that decides the
  * x2_opq_recall query's framing. */
object OpqProbe {
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
    // anisotropic corpus: deterministic per-dim 1/(1+i) scaling — the
    // decaying spectrum real text embeddings have (the raw synthetic
    // embeddings are near-isotropic: flat spectrum, nothing to rotate)
    val emb = embRaw.select(col("vec_id"),
      expr("transform(sequence(0, 63), i -> element_at(CAST(embedding AS array<double>), i+1) / (1.0D + i))")
        .as("embedding"))
    val qp = pmod(col("vec_id"), lit(100)) === 0
    val seedPred = pmod(col("vec_id"), lit(23)) === 3

    // exact L2 top-5 on the original vectors
    val e = emb.select(col("vec_id").cast("long").as("cand_id"),
      col("embedding").cast("array<double>").as("cv"))
    val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("cand_id").asc)
    val exact = e.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("d", round(expr(
        "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("query_id"), col("cand_id")).cache()
    exact.count()

    def meanRecall(cand: org.apache.spark.sql.DataFrame): Double = {
      val r = exact.join(cand.select(col("query_id"), col("cand_id")).distinct()
          .withColumn("__hit", lit(1)), Seq("query_id", "cand_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hits"))
        .agg(avg(col("n_hits") / least(col("n_exact"), lit(5L)).cast("double")))
        .collect().head.getDouble(0)
      r
    }

    val cbPlain = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8,
      dim = 64, seedPred = seedPred, iters = 2)
    val plain = Similarity.pqSearch(emb, "vec_id", "embedding", m = 8,
      dim = 64, codebooks = cbPlain, queryPred = qp, k = 5)
    println(f"plain m=8 dim=64: recall@5 = ${meanRecall(plain)}%.4f")

    for (k <- Seq(8, 16)) {
      val comps = Similarity.pcaTopK(emb, "embedding", dim = 64, k = k, iters = 3)
      comps.groupBy("comp").agg(min("eigenvalue").as("lam")).orderBy("comp")
        .collect().foreach(r => println(s"  comp ${r.getLong(0)} lam ${r.getDouble(1)}"))
      val rot = Similarity.pcaRotate(emb, "vec_id", "embedding", comps)
      println("  rot sample: " + rot.orderBy("vec_id").limit(2).collect().toSeq)
      val cbR = Similarity.pqTrain(rot, "vec_id", "rv", m = 8, dim = k,
        seedPred = pmod(col("vec_id"), lit(23)) === 3, iters = 2)
      val pqR = Similarity.pqSearch(rot, "vec_id", "rv", m = 8, dim = k,
        codebooks = cbR, queryPred = pmod(col("vec_id"), lit(100)) === 0, k = 5)
      println(f"rotated k=$k m=8: recall@5 = ${meanRecall(pqR)}%.4f")
    }
    spark.stop()
  }
}
