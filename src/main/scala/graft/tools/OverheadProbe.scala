package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r21): calibrate fixed per-stage/per-task cost in this
  * environment, and inspect the partitioning the edit-join chain actually
  * runs with. Usage: tools/run_main.sh graft.tools.OverheadProbe <sfDir> */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ovh] $label%-48s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // calibrate: empty-ish jobs
    time("warmup count")(spark.range(1000000).count())
    (1 to 3).foreach { i =>
      time(s"range groupBy 32-part agg #$i")(
        spark.range(5000).groupBy(col("id") % 97).count()
          .write.format("noop").mode("overwrite").save())
    }
    (1 to 3).foreach { i =>
      time(s"32 trivial jobs #$i")((1 to 32).foreach(_ => spark.range(64).count()))
    }
    // the edit chain's pieces
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val keysAll = docs.select(col("doc_id").cast("long").as("id"),
      lower(substring(col("text"), 1, 40)).as("key"))
    val keys = keysAll.groupBy(col("key")).agg(min(col("id")).as("id"))
      .withColumn("len", length(col("key")))
    (1 to 3).foreach { i =>
      time(s"keys agg (no cache) #$i")(
        keys.write.format("noop").mode("overwrite").save())
    }
    val kc = keys.cache()
    time("keys cache materialize")(kc.write.format("noop").mode("overwrite").save())
    println("[ovh] keys cached partitions = " + kc.rdd.getNumPartitions)
    (1 to 3).foreach { i =>
      time(s"keys cached re-read #$i")(
        kc.write.format("noop").mode("overwrite").save())
    }
    import org.apache.spark.sql.expressions.Window
    val toks = kc.select(col("id"), col("len"), col("key"),
        explode(sequence(lit(0), col("len") - lit(2))).as("p"))
      .withColumn("gram", expr("substring(key, p + 1, 2)"))
    val occ = Window.partitionBy(col("id"), col("gram")).orderBy(col("p"))
    val tokens = toks.withColumn("occ", row_number().over(occ))
      .select(col("id"), col("len"), col("key"), col("gram"), col("occ"))
    (1 to 3).foreach { i =>
      time(s"token stream + occ window #$i")(
        tokens.write.format("noop").mode("overwrite").save())
    }
    println("[ovh] tokens partitions = " + tokens.rdd.getNumPartitions)
    spark.stop()
  }
}
