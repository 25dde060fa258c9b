package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an N× replica of a testdata scale-factor dir
  * with CONSISTENT key shifts — every join key (primary and foreign)
  * moves by the same `copy · span`, so each copy joins exactly its own
  * copy and join hit-rates/selectivities match the source corpus. Used
  * for off-anchor bench points (e.g. a 3× sf0.1 ≈ sf0.3 sweep) where no
  * generated parquet exists.
  *
  * `span` is divisible by 33600 = lcm(64, 48, 80, 60, 100, 7, 10), the
  * small moduli the query surface derives features from (`doc_id % 64`
  * image widths, `% 10` eval stripes, …), so id-derived distributions
  * are IDENTICAL per copy instead of drifting with the shift.
  *
  * KNOWN SHAPE CAVEAT, by construction: non-key columns (text, vectors,
  * payloads) replicate VERBATIM, so every document in the N× corpus is
  * an exact N-clique of duplicates — dedup/similarity families see a
  * (N−1)/N duplicate rate and corpus-wide LSH cliques a genuinely
  * generated larger scale factor would not have. Bench points on this
  * data are therefore a WORST-CASE stress for the X1/X2 families
  * (clique mass maximal), not an organic-corpus extrapolation; record
  * them as such (see BASELINE.md's sf0.3 note). */
object MakeScaled {
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val span = args.lift(3).map(_.toLong).getOrElse(33600000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keyCols.foreach { case (table, keys) =>
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      // int32 key columns: the largest shift must leave half the int
      // range for the original ids, or the cast back silently wraps
      keys.foreach { k =>
        val narrow = src.schema(k).dataType == org.apache.spark.sql.types.IntegerType
        require(!narrow || (n - 1).toLong * span <= Int.MaxValue / 2,
          s"key shift ${(n - 1).toLong * span} would overflow int32 column $k " +
            "— lower n or span, or widen the column")
      }
      val shifted: DataFrame = (0 until n).map { c =>
        keys.foldLeft(src)((d, k) =>
          d.withColumn(k, (col(k).cast("long") + lit(c * span)).cast(src.schema(k).dataType)))
      }.reduce(_ unionAll _)
      shifted.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"[make-scaled] $table x$n -> $outDir/$table.parquet")
    }
    spark.stop()
  }
}
