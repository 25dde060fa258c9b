package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables
import graft.tools.Profile.time

object Profile2 {
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
    docs.count()

    val tokens = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks0"))
    time("tokens explode")(tokens.select(explode(col("toks0"))).count())

    val sets = Dedup.docShingleSets(docs, "doc_id", "text")
    println(sets.select(explode(col("toks"))).queryExecution.optimizedPlan.toString.take(2000))
    time("shingle explode")(sets.select(explode(col("toks"))).count())

    // variant: shingle via posexplode of tokens (Generate barrier) then window collect
    val cached = tokens.cache()
    cached.count()
    time("shingle explode (cached toks)")(
      cached.select(col("doc_id"), Dedup.shinglesFromTokens(col("toks0")).as("toks"))
        .select(explode(col("toks"))).count())
    spark.stop()
  }
}
