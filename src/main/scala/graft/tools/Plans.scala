package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for selected queries to spot
  * missing pushdown/pruning/broadcast before they cost anything at scale. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSet
      else Set("s1_ingest_transitions", "join_star_revenue", "x2_similarity_topk",
        "j1_deterministic_sample", "w1_discounted_return", "x1_exact_dedup")
    graft.Queries.all.filter(q => names(q.name)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
