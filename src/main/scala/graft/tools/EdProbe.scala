package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: measure the Ed-Join candidate volume (prefix-token collision
  * pairs BEFORE verification) as a function of q-gram width, on the real
  * `documents` 40-char key at an arbitrary SF dir. The candidate count is
  * the cost driver of editDistanceJoin — the verify join shuffles exactly
  * these rows. Usage: tools/run_main.sh graft.tools.EdProbe <sfDir> [q ...] */
object EdProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EdProbe <sfDir> [q ...]")
    val sfDir = args.head
    val qs = if (args.tail.nonEmpty) args.tail.map(_.toInt).toSeq else Seq(2, 3, 4, 5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = 2
    val keysAll = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("id"),
        lower(substring(col("text"), 1, 40)).as("key"))
    val keys = keysAll.groupBy(col("key")).agg(min(col("id")).as("id"))
      .withColumn("len", length(col("key"))).cache()
    println(s"[edprobe] total keys=${keysAll.count()} distinct=${keys.count()}")
    qs.foreach { q =>
      val longMin = q * (d + 1)
      val longs = keys.where(col("len") >= longMin)
      val toks = longs.select(col("id"), col("len"), col("key"),
          explode(sequence(lit(0), col("len") - lit(q))).as("p"))
        .withColumn("gram", expr(s"substring(key, p + 1, $q)"))
      val occ = Window.partitionBy(col("id"), col("gram")).orderBy(col("p"))
      val tokens = toks.withColumn("occ", row_number().over(occ))
        .select(col("id"), col("len"), col("gram"), col("occ"))
      val freq = tokens.groupBy(col("gram"), col("occ")).agg(count(lit(1)).as("tf"))
      val rarity = Window.partitionBy(col("id"))
        .orderBy(col("tf").asc, col("gram").asc, col("occ").asc)
      val prefix = tokens.join(freq, Seq("gram", "occ"))
        .withColumn("pr", row_number().over(rarity))
        .where(col("pr") <= q * d + 1)
        .select(col("id"), col("len"), col("gram"), col("occ")).cache()
      val t0 = System.nanoTime()
      // collision volume = rows flowing INTO the distinct, i.e. the join size
      val collisions = prefix.as("l").join(prefix.as("r"),
          col("l.gram") === col("r.gram") && col("l.occ") === col("r.occ")
            && col("l.id") < col("r.id")
            && abs(col("l.len") - col("r.len")) <= d)
        .count()
      val cand = prefix.as("l").join(prefix.as("r"),
          col("l.gram") === col("r.gram") && col("l.occ") === col("r.occ")
            && col("l.id") < col("r.id")
            && abs(col("l.len") - col("r.len")) <= d)
        .select(col("l.id"), col("r.id")).distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[edprobe] q=$q collisionRows=$collisions%,d distinctCand=$cand%,d (count time $secs%.1f s)")
      prefix.unpersist()
    }
    spark.stop()
  }
}
