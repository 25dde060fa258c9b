package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe (r21): run named queries once each and report, per query,
  * the Spark job count, total job wall time, per-stage task time, and
  * the gap between query wall and job wall (≈ driver-side planning /
  * analysis / collect glue). Attributes WHERE a small-SF query's time
  * goes before optimizing it — job-count-dominated queries need fewer
  * actions, stage-dominated ones need cheaper plans.
  * Usage: tools/run_main.sh graft.tools.JobProbe <sfDir> <query> [query...] */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // function registration is session-global and normally happens inside
    // whichever op first needs it; probing a single query in isolation must
    // not depend on another query having run first
    graft.functions.GraftFunctions.register(spark)

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    val stageRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = System.nanoTime()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        starts.remove(j.jobId).foreach(t0 => jobNanos += System.nanoTime() - t0)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskNanos += s.stageInfo.taskMetrics.executorRunTime * 1000000L
        val m = s.stageInfo.taskMetrics
        stageRows += ((s.stageInfo.taskMetrics.executorRunTime,
          s"tasks=${s.stageInfo.numTasks} in=${m.inputMetrics.recordsRead} " +
            s"sRead=${m.shuffleReadMetrics.recordsRead} " +
            s"sWrite=${m.shuffleWriteMetrics.recordsWritten} " +
            s"${s.stageInfo.name.take(90)}"))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println(f"${"query"}%-32s ${"wall"}%7s ${"jobs"}%5s ${"jobSum"}%8s ${"stages"}%6s ${"tasks"}%6s ${"taskSum"}%8s ${"driverGap"}%9s")
    names.foreach { name =>
      // two runs: first is cold (JIT + cache population), second is the
      // bench-comparable one — report both
      (1 to 2).foreach { pass =>
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        jobs = 0; jobNanos = 0L; stages = 0; tasks = 0; taskNanos = 0L
        stageRows.clear()
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"$name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain before reading counters
        val gap = wall - jobNanos / 1e9
        println(f"$name%-32s $wall%7.2f $jobs%5d ${jobNanos / 1e9}%8.2f $stages%6d $tasks%6d ${taskNanos / 1e9}%8.2f $gap%9.2f  (pass $pass)")
        if (sys.env.get("SPARK_GRAFT_PROBE_STAGES").exists(_ == "1") && pass == 2)
          stageRows.sortBy(-_._1).take(10).foreach { case (ms, desc) =>
            println(f"    stage ${ms / 1000.0}%8.2fs  $desc")
          }
      }
    }
    spark.stop()
  }
}
