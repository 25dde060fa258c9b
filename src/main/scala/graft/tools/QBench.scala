package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time specific named queries (Bench semantics — noop sink,
  * cache cleared per query, min-of-3) at an arbitrary SF dir. Usage:
  *   tools/run_main.sh graft.tools.QBench <sfDir> <query> [query...] */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true") // r21 — match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        // release checkpoint/persist blocks too — Bench semantics (r18).
        // NOTE when comparing against board numbers: Bench's CPU default
        // is 4 (the driver's per-round convention); QBench's is 32 — set
        // SPARK_GRAFT_CPUS=4 to reproduce in-board timings.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name%-32s min=${ts.min}%7.2f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
