package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r21): interleaved A/B of runtime SQL confs on named queries
  * within ONE JVM — alternating passes cancel the session-level load noise
  * that makes separate-process A/Bs unreadable on a busy host.
  * A = baseline confs, B = candidate confs (hardcoded below while the
  * experiment is live). Usage:
  *   tools/run_main.sh graft.tools.ConfAb <sfDir> <query> [query...] */
object ConfAb {
  // the r21 candidate set: the optimization guide §2.2 scale-adaptive
  // coalescing levers (target-size coalescing instead of parallelism-first,
  // AQE allowed to re-partition cached plans) — disaggregated so a
  // regression can be pinned on one knob
  private val pf = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
  private val cc = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
  private val oc = "spark.sql.files.openCostInBytes"
  private val sides: Seq[(String, Map[String, String])] = Seq(
    "A" -> Map(cc -> "true"),                   // the shipped board confs
    "B" -> Map(cc -> "true", oc -> "131072"),   // + small-file scan splits
    "C" -> Map(cc -> "true", oc -> "16384"),    // + even smaller
    "D" -> Map(pf -> "false", cc -> "true"))    // (kept)

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_AB_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    graft.functions.GraftFunctions.register(spark)
    val defaults = Seq(pf, cc, oc).map(k => k -> spark.conf.get(k)).toMap
    names.foreach { name =>
      val times = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      for (p <- 1 to passes; (side, confs) <- sides) {
        defaults.foreach { case (k, v) => spark.conf.set(k, v) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        times(side) = t :: times(side)
        val _ = p
      }
      defaults.foreach { case (k, v) => spark.conf.set(k, v) }
      def fmt(l: List[Double]) =
        f"min=${l.min}%6.2f all=${l.reverse.map(x => f"$x%.2f").mkString(",")}"
      println(f"[confab] $name%-32s " +
        sides.map { case (s, _) => s"$s ${fmt(times(s))}" }.mkString("   "))
    }
    spark.stop()
  }
}
