package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of the minhash pipeline. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val sets = Dedup.docShingleSets(docs, "doc_id", "text")
    time("shingle sets")(sets.count())
    time("shingle explode")(sets.select(explode(col("toks"))).count())
    val dict = Dedup.featureDictionary(sets)
    time("dictionary")(dict.count())
    time("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("lsh pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
