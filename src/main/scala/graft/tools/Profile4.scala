package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Dev-only: round count + per-stage timing of connected components. */
object Profile4 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 8, r = 4, estMin = 0.75, threshold = 0.8)
    time("pairs")(println("  pairs: " + pairs.count()))
    val fwd = pairs.select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    time("edges")(println("  edges: " + edges.count()))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).cache()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < 20) {
      val viaNeighbors = edges
        .join(labels.select(col("id").as("src"), col("component")), "src")
        .select(col("dst").as("id"), col("component"))
      val jumped = labels
        .join(labels.select(col("id").as("component"), col("component").as("__j")),
          "component")
        .select(col("id"), col("__j").as("component"))
      val next = labels.unionAll(viaNeighbors).unionAll(jumped)
        .groupBy(col("id")).agg(min(col("component")).as("component")).cache()
      changed = time(s"round $it") {
        next.join(labels.select(col("id"), col("component").as("__old")), "id")
          .where(col("component") =!= col("__old")).count()
      }
      println(s"  changed: $changed")
      labels.unpersist()
      labels = next
      it += 1
    }
    spark.stop()
  }
}
