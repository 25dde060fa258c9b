package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** Dev probe for the OPQ-NP refinement chain (x2_opq_np_recall design):
  * measures quantization error + recall for rotated vs refined at m=4
  * over the anisotropic embeddings. Not part of the driver contract. */
object OpqDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.01")
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(sequence(0, 63), i -> " +
        "element_at(CAST(embedding AS array<double>), i+1) / (1.0D + i))")
        .as("embedding"))
    val qp = pmod(col("vec_id"), lit(100)) === 0 && col("vec_id") < 800
    val sp = pmod(col("vec_id"), lit(23)) === 3
    val comps = Similarity.pcaTopK(emb, "embedding", dim = 64, k = 8, iters = 3)
    val rot = Similarity.pcaRotate(emb, "vec_id", "embedding", comps).cache()
    def qErr(df: org.apache.spark.sql.DataFrame, vecCol: String): Double = {
      val cb = Similarity.pqTrain(df, "vec_id", vecCol, m = 4, dim = 8, sp, iters = 2)
      val xh = Similarity.pqDecode(
        Similarity.pqEncode(df, "vec_id", vecCol, m = 4, dim = 8, cb), cb)
      df.select(col("vec_id").cast("long").as("pid"),
          col(vecCol).cast("array<double>").as("pv"))
        .join(xh, "pid")
        .select(expr("aggregate(zip_with(pv, xhat, (a,b) -> (a-b)*(a-b)), 0D, (acc,x) -> acc+x)").as("e"))
        .agg(sum(col("e"))).collect().head.getDouble(0)
    }
    val e = emb.select(col("vec_id").cast("long").as("cand_id"), col("embedding").as("cv"))
    val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("cand_id").asc)
    val exact = e.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("d", round(expr(
        "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("query_id"), col("cand_id")).cache()
    def recall(df: org.apache.spark.sql.DataFrame, vecCol: String): Double = {
      val cb = Similarity.pqTrain(df, "vec_id", vecCol, m = 4, dim = 8, sp, iters = 2)
      val cand = Similarity.pqSearch(df, "vec_id", vecCol, m = 4, dim = 8, cb, qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      exact.join(cand, Seq("query_id", "cand_id")).count().toDouble / exact.count()
    }
    // zig-zag eigen-allocation for subd=2: comps (1,8),(2,7),(3,6),(4,5)
    val order = Seq(1, 8, 2, 7, 3, 6, 4, 5)
    val mapExpr = map(order.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.toLong), lit(i + 1L)) }: _*)
    val alloc = comps.select(element_at(mapExpr, col("comp")).as("comp"),
      col("i"), col("loading"))
    val rotA = Similarity.pcaRotate(emb, "vec_id", "embedding", alloc).cache()
    println(f"pca-order: err=${qErr(rot, "rv")}%.4f recall=${recall(rot, "rv")}%.3f")
    println(f"allocated: err=${qErr(rotA, "rv")}%.4f recall=${recall(rotA, "rv")}%.3f")
    for (pi <- Seq(12, 24)) {
      val refd = Similarity.opqRefine(rotA, "vec_id", "rv", m = 4, dim = 8, sp,
        iters = 2, powerIters = pi)
      val rot2 = Similarity.pcaRotate(rotA, "vec_id", "rv", refd)
      println(f"refined(pi=$pi): err=${qErr(rot2, "rv")}%.4f recall=${recall(rot2, "rv")}%.3f")
    }
    spark.stop()
  }
}
