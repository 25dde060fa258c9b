package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.AggOps

/** Dev-only skew probe for [[AggOps.exactQuantiles]] (r17 verdict item 1):
  * times the primitive at 1× vs N× rows on the three distributions where
  * the r16 equal-width form degenerated to a single-task sort —
  *   - heavy-tie: 99 % of rows share one value (its bucket holds ~all rows;
  *     the tie short-circuit must resolve it without materializing any row)
  *   - zipfian:   v = 1/u^1.2 concentrates mass in the minimum bucket
  *     (the recursive re-bucket must localize the target instead of
  *     sorting the O(n) first bucket)
  *   - constant:  mn <=> mx puts ALL rows in bucket 0 (pure tie path)
  * plus a uniform control. A ratio ≈ N (linear) on every shape means no
  * stage sorts more than one bounded slice; the r16 cliff showed as a
  * superlinear ratio on the skewed shapes only. Results → SCALING.md. */
object QuantileSkewProbe {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val base = args.lift(1).map(_.toLong).getOrElse(600000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic synthetic rows: 3 groups, xxhash64-keyed "random" u
    def rows(n: Long, shape: String): DataFrame = {
      val ids = spark.range(n)
        .withColumn("g", pmod(col("id"), lit(3)).cast("int"))
        .withColumn("u",
          (pmod(xxhash64(col("id"), lit(shape)), lit(1000000)).cast("double")
            + lit(1.0)) / lit(1000001.0))
      shape match {
        case "heavy-tie" => ids.withColumn("v",
          when(col("u") < 0.99, lit(5.0))
            .otherwise(col("u") * lit(10.0))).select("g", "v")
        case "zipfian" => ids.withColumn("v",
          lit(1.0) / pow(col("u"), lit(1.2))).select("g", "v")
        case "constant" => ids.withColumn("v", lit(42.0)).select("g", "v")
        case "uniform" => ids.withColumn("v", col("u")).select("g", "v")
      }
    }
    def run(df: DataFrame): Long = {
      AggOps.exactQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.99))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq("heavy-tie", "zipfian", "constant", "uniform").foreach { shape =>
      val d1 = rows(base, shape).cache(); d1.count()
      val dN = rows(base * scale, shape).cache(); dN.count()
      val t1 = Seq(time(run(d1)), time(run(d1))).min
      val tN = Seq(time(run(dN)), time(run(dN))).min
      println(f"[qskew] $shape%-10s 1x $t1%6.2f s  ${scale}x $tN%6.2f s  " +
        f"ratio ${tN / t1}%5.2f (linear = $scale)")
      d1.unpersist(); dN.unpersist()
    }
    spark.stop()
  }
}
