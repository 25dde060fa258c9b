package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the Ed-Join prefix-group skew report's size distribution at
  * an SF dir — used to pick the `maxGroupSize` cap that splits a
  * fixture's groups across both guard branches (r19; mirrors the cosine
  * guard's bucket probe). Usage: run_main.sh graft.tools.EdSkewProbe <sfDir> [q] [cap] */
object EdSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = if (args.length > 1) args(1).toInt else 4
    val docs = graft.sources.Tables.documents(spark, args.head)
    val rep = graft.ops.Dedup.editGroupReport(docs, "doc_id",
      lower(substring(col("text"), 1, 40)), maxDist = 2, q = q, minKeys = 2)
    rep.cache()
    println(s"[edskew] q=$q groups(n>=2)=${rep.count()}")
    println("[edskew] size histogram (n_keys -> #groups):")
    rep.groupBy(col("n_keys")).count().orderBy(col("n_keys").desc).show(40, false)
    println("[edskew] hottest 20 groups:")
    rep.show(20, false)
    if (args.length > 2) {
      val cap = args(2).toInt
      val above = rep.where(col("n_keys") > cap).count()
      val below = rep.where(col("n_keys") <= cap).count()
      println(s"[edskew] cap=$cap: $above groups star-degraded, $below all-pairs")
    }
    spark.stop()
  }
}
