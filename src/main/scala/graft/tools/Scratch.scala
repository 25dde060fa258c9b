package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: the driver's t1 smoke (SparkEntry.entry rows>0). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(5, 40)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}
