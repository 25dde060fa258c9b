package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables
import graft.tools.Profile.time

/** Dev-only: stage-by-stage timing of the simhash-pairs pipeline. */
object Profile2 {
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
    docs.count()

    val sets = Dedup.docShingleSets(docs, "doc_id", "text").cache()
    time("shingle sets (cache)")(sets.count())
    val dict = Dedup.featureDictionary(sets)
    time("dictionary")(println("  dict rows: " + dict.count()))
    val sig = Dedup.simhashFromSets(sets, 48)
    time("simhash fingerprints")(sig.count())
    time("simhash fingerprints x2")(sig.count())
    time("full simhashPairs")(
      Dedup.simhashPairs(docs, "doc_id", "text").count())
    time("full simhashPairs x2")(
      Dedup.simhashPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
