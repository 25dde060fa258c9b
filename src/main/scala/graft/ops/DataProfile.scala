package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the `ANALYZE`-style health pass a pipeline runs
  * before/after every curation stage (did the filter nuke a column? did
  * nulls spike? is cardinality sane?).
  *
  * ONE aggregation pass over the table computes every metric for every
  * profiled column (count / nulls / distinct / min / max / mean), then a
  * driver-free `explode` unpivots the single result row into
  * (col_name, metric, value) — so profiling N columns costs one scan and
  * one (tiny) shuffle regardless of N.
  *
  * Scale note: `countDistinct` is exact and plans through Catalyst's
  * Expand (data duplicated once per distinct column in the shuffle). At
  * 100 TB swap `distinctFn = approx_count_distinct(_)` — the HLL path
  * kills the Expand and the profile becomes a plain partial-aggregate
  * scan; the oracle query pins the exact form because HLL estimates are
  * engine-specific (x5_approx_distinct covers the sketch-vs-exact
  * tolerance contract separately). */
object DataProfile {

  /** Profile `numericCols` (all six metrics, value as double; mean
    * portable-rounded at `meanDigits`) and `keyCols` (count / nulls /
    * distinct only — strings and other non-numeric types). Output:
    * (col_name, metric, value) sorted by caller. */
  def profile(df: DataFrame, numericCols: Seq[String], keyCols: Seq[String] = Nil,
              meanDigits: Int = 4,
              distinctFn: Column => Column = countDistinct(_)): DataFrame = {
    val s = math.pow(10.0, meanDigits)
    def proundD(c: Column): Column = floor(c * lit(s) + lit(0.5)) / lit(s)

    val aggs: Seq[Column] =
      numericCols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__n"),
          sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
          distinctFn(col(c)).as(s"${c}__distinct"),
          min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"),
          proundD(avg(col(c))).as(s"${c}__mean"))
      } ++ keyCols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__n"),
          sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
          distinctFn(col(c)).as(s"${c}__distinct"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*)

    val entries: Seq[(String, String)] =
      numericCols.flatMap(c => Seq("n", "nulls", "n_distinct", "min", "max", "mean")
        .map(m => c -> m)) ++
      keyCols.flatMap(c => Seq("n", "nulls", "n_distinct").map(m => c -> m))
    def fieldOf(c: String, m: String): String = m match {
      case "n"          => s"${c}__n"
      case "nulls"      => s"${c}__nulls"
      case "n_distinct" => s"${c}__distinct"
      case other        => s"${c}__$other"
    }
    row.select(explode(array(entries.map { case (c, m) =>
      struct(lit(c).as("col_name"), lit(m).as("metric"),
        col(fieldOf(c, m)).cast("double").as("value"))
    }: _*)).as("e")).select(col("e.col_name").as("col_name"),
      col("e.metric").as("metric"), col("e.value").as("value"))
  }

  /** Key-skew report — the diagnosis that decides salting / AQE skew
    * hints / bucket counts BEFORE a 100 TB join or aggregation is
    * launched on a key. One row per candidate key column:
    * (key_col, n_rows, n_keys, max_key_rows, median_key_rows, top_share,
    * skew_ratio) where top_share = heaviest key's row fraction and
    * skew_ratio = max/median per-key rows — a uniform key sits near 1,
    * a power-law key explodes.
    *
    * Plan shape per column: one partial+final count aggregate keyed on
    * the column (the same shuffle the real query would pay — nothing
    * heavier), then the per-key count table reduces two ways: a tiny
    * scalar aggregate, and a count-of-counts histogram for the EXACT
    * lower median ([[AggOps.lowerMediansByHistogram]] — the count domain
    * is bounded, so the histogram is tiny and no per-key array ever
    * materializes). Columns profile independently and union — each key
    * needs its own shuffle anyway; there is nothing to share. Null keys
    * count as a real group (they land in one reduce partition in a real
    * join — exactly the skew this report exists to expose). */
  def keySkewReport(df: DataFrame, keyCols: Seq[String],
                    shareDigits: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val s = math.pow(10.0, shareDigits)
    def pround(c: Column): Column = floor(c * lit(s) + lit(0.5)) / lit(s)
    keyCols.map { k =>
      val counts = df.groupBy(col(k)).agg(count(lit(1)).as("__c"))
      val scalars = counts.agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__c")).as("max_key_rows"))
      val med = AggOps.lowerMediansByHistogram(counts,
        Seq(("median_key_rows", col("__c"))))
      scalars.crossJoin(broadcast(med))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_key_rows"), col("median_key_rows"),
          pround(col("max_key_rows") / col("n_rows")).as("top_share"),
          pround(col("max_key_rows") / col("median_key_rows")).as("skew_ratio"))
    }.reduce(_.unionByName(_))
  }
}
