package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of the simhash-pairs pipeline. */
object Profile3 {
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
    time("docs.count")(docs.count())
    val sets = Dedup.docShingleSets(docs, "doc_id", "text").cache()
    time("shingle sets")(sets.count())
    time("dictionary")(Dedup.featureDictionary(sets).count())
    val sig = Dedup.simhashFromSets(sets, 48).cache()
    time("48-bit fingerprints")(sig.count())
    val bandBits = 12; val mask = (1L << bandBits) - 1L
    val bands = (0 until 4).map { b =>
      sig.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bucket"))
    }.reduce(_ unionAll _)
    time("bands")(bands.count())
    val joined = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
      .where(col("l.doc_id") < col("r.doc_id"))
    time("bucket join raw pairs")(println("  raw pairs: " + joined.count()))
    time("full query")(
      Dedup.simhashPairs(docs, "doc_id", "text", 48, 4, 3).count())
    time("full query again")(
      Dedup.simhashPairs(docs, "doc_id", "text", 48, 4, 3).count())
    spark.stop()
  }
}
