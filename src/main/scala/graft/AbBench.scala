package graft
import org.apache.spark.sql.SparkSession

/** Throwaway A/B micro-bench: min-of-3 over the named queries only. */
object AbBench {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true") // r21 — match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val res = for (_ <- 1 to 3; n <- names) yield {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      n -> (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val v = res.filter(_._1 == n).map(_._2)
      println(f"ABRESULT $n min=${v.min}%.3f all=${v.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
