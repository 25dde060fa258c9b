package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Dev-only scratch: phase timings of the nested-exactQuantiles
  * madOutliers path (r17 regression hunt). */
object MadDbg {
  def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[maddbg] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (!new java.io.File(dir).isDirectory) {
      System.err.println(s"usage: MadDbg [sfDir]  (data dir not found: $dir)")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.events(spark, dir).where(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
    t("base count")(base.count())
    val med = AggOps.exactQuantiles(base, Seq("event_type"), "value", Seq(0.5))
    t("inner eq (med) collect")(med.collect().length)
    t("inner eq (med) collect again")(med.collect().length)
    val gmed = med.select(col("event_type").as("__g_event_type"),
      col("__qval").as("med"))
    val withMed = base.join(broadcast(gmed),
        base("event_type") <=> col("__g_event_type"), "left")
      .drop("__g_event_type")
      .withColumn("__dev", abs(col("value") - col("med")))
    t("withMed noop")(withMed.write.format("noop").mode("overwrite").save())
    val mad = AggOps.exactQuantiles(withMed, Seq("event_type"), "__dev", Seq(0.5))
    t("outer eq (mad) collect")(mad.collect().length)
    t("full madOutliers noop")(
      AggOps.madOutliers(base, Seq("event_type"), "value", 4.45)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
