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
}
