package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev probe: print opqRefine's M and R for the x2_opq_refine_recall
  * fixture so the oracle replay can be diffed stage by stage. */
object OpqNpDbg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, sfDir).select(col("vec_id"), expr(
      "transform(sequence(0, 7), i -> CASE WHEN i < 4 THEN " +
        "element_at(CAST(embedding AS array<double>), i+1) ELSE " +
        "(0.9D - 0.1D * (i-4)) * element_at(CAST(embedding AS array<double>), i-3) + " +
        "0.6D * element_at(CAST(embedding AS array<double>), i+1) END)")
      .as("embedding"))
    val sp = pmod(col("vec_id"), lit(23)) === 3
    val comps = Similarity.pcaTopK(emb, "embedding", dim = 8, k = 8, iters = 6)
    val rotP = Similarity.pcaRotate(emb, "vec_id", "embedding", comps)
    // replicate opqRefine's M reduction for printing
    val cb = Similarity.pqTrain(rotP, "vec_id", "rv", m = 4, dim = 8,
      seedPred = sp, iters = 2)
    val xh = Similarity.pqDecode(
      Similarity.pqEncode(rotP, "vec_id", "rv", m = 4, dim = 8, cb), cb)
    val s = 1000000.0
    val mRows = rotP
      .select(col("vec_id").cast("long").as("pid"), col("rv").as("pv"))
      .join(xh, Seq("pid"))
      .select(posexplode(col("pv")).as(Seq("i", "x")), col("xhat"))
      .select(col("i"), col("x"), posexplode(col("xhat")).as(Seq("j", "xh")))
      .groupBy(col("i"), col("j"))
      .agg((sum(floor(col("x") * col("xh") * lit(s) + lit(0.5)).cast("long"))
        .cast("double") / lit(s)).as("mv"))
      .orderBy(col("i"), col("j")).collect()
    println("M: " + mRows.take(6).map(r =>
      s"(${r.getInt(0)},${r.getInt(1)},${r.getDouble(2)})").mkString(" "))
    rotP.select(col("vec_id").cast("long").as("pid"), col("rv"))
      .write.mode("overwrite").parquet("/tmp/npdbg_rotp")
    xh.write.mode("overwrite").parquet("/tmp/npdbg_xhat")
    val r = Similarity.opqRefine(rotP, "vec_id", "rv", m = 4, dim = 8,
      seedPred = sp, iters = 2, powerIters = 12)
    val rr = r.orderBy(col("comp"), col("i")).collect()
    println("R: " + rr.take(10).map(x =>
      s"(comp=${x.getLong(0)},i=${x.getLong(1)},${x.getDouble(2)})").mkString(" "))
    spark.stop()
  }
}
