package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ordered / sequential operators (SURVEY.md §2.5, W1–W6).
  *
  * All built on `Window.partitionBy(key).orderBy(time)` — one shuffle on
  * the partition key, then a per-partition sort; at 100 TB the partition
  * key (episode/user) is high-cardinality so the shuffle is well spread,
  * and no window frame ever crosses partitions.
  */
object SeqOps {

  /** W1 — discounted reverse cumulative sum
    * (reference fawac.py:88-96: `c[t] = x[t] + γ·c[t+1]`).
    *
    * Closed form: c_t = Σ_{t'≥t} γ^(t'−t)·x_{t'}. Computed as a single
    * suffix-window sum of γ^rn·x rebased by γ^−rn — one sort, one pass,
    * no self-join and no recursion. γ^rn underflows ~rn≈35 000 at γ=0.99;
    * reference episodes are ≤300 rows (fawac_configs.py:31) and the
    * events sessions are far shorter, so the rebase is numerically safe.
    */
  def discountedReturn(df: DataFrame, partitionCol: String, orderCols: Seq[Column],
                       valueCol: Column, gamma: Double, out: String): DataFrame = {
    if (gamma == 0.0) return df.withColumn(out, valueCol) // closed form would divide by 0^rn
    val wOrd = Window.partitionBy(col(partitionCol)).orderBy(orderCols: _*)
    val wSuffix = Window.partitionBy(col(partitionCol)).orderBy(col("__rn"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn(out,
        sum(valueCol * pow(lit(gamma), col("__rn"))).over(wSuffix)
          / pow(lit(gamma), col("__rn")))
      .drop("__rn")
  }

  /** W2 — EMA smoothing (reference make_plots.ipynb cell 5:
    * `s_0 = x_0; s_i = α·s_{i−1} + (1−α)·x_i`), batch form.
    *
    * Exact recurrence via an ordered fold: collect the partition's series
    * (ordered) and fold with the literal recurrence — bit-identical to the
    * reference and to DuckDB's `list_reduce`, which is what makes it
    * oracle-hashable. Group series must fit in memory (episodes/sessions
    * do); the unbounded-stream scale path is the stateful streaming
    * variant [[graft.streaming.StreamingOps.statefulEma]].
    * Returns one row per key: (key, out).
    */
  def emaFinal(df: DataFrame, keyCol: String, orderCols: Seq[String],
               valueCol: String, alpha: Double, out: String): DataFrame = {
    val keep = alpha          // coefficient of the running state
    val mix = 1.0 - alpha     // folded in Scala so the oracle can embed the identical double
    val series = array_sort(collect_list(struct((orderCols :+ valueCol).map(col): _*)))
    val xs = transform(series, s => s.getField(valueCol))
    val ema = aggregate(
      slice(xs, lit(2), greatest(size(xs) - 1, lit(0))),
      element_at(xs, 1),
      (s, x) => lit(keep) * s + lit(mix) * x)
    df.groupBy(col(keyCol)).agg(ema.as(out))
  }

  /** W3 — per-episode/session accumulation (reference fawac.py:597-611:
    * running return/cost/length per rollout; early stop = length cap). */
  def sessionAgg(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                 valueCol: Column, lengthCap: Option[Int] = None): DataFrame = {
    val capped = lengthCap match {
      case Some(n) =>
        val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
        df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
      case None => df
    }
    capped.groupBy(col(keyCol)).agg(
      sum(valueCol).as("session_sum"),
      count(lit(1)).as("session_len"),
      min(valueCol).as("session_min"),
      max(valueCol).as("session_max"))
  }

  /** S3 — trajectory-level outlier removal (reference
    * train_fawac_iql.py:66-75 passes `outliers_percent` to dsrl's
    * `pre_process_data`, which drops the ENTIRE top-% of trajectories by
    * total cost — an episode-granular filter, not the row-level range
    * filter of [[graft.Queries]] s3_preprocess_density).
    *
    * Shape chosen for scale: the cutoff is the exact discrete (1−pct)
    * quantile of the per-episode cost (`percentile_disc`, SQL-standard
    * inverse ECDF — one aggregate), broadcast back as a one-row frame.
    * NOT a `row_number` over an unpartitioned window: ranking every
    * episode through one partition is the single-partition funnel
    * PlanSpec bans. Episodes with cost ≥ the cutoff drop (ties at the
    * cutoff all drop — deterministic because the cost is rounded onto the
    * data's lattice first, so both engines compare identical doubles).
    * Returns the surviving transitions with `episode_cost` attached. */
  def dropOutlierTrajectories(df: DataFrame, episodeCol: String, costCol: Column,
                              pct: Double, roundDigits: Int): DataFrame = {
    val q = java.lang.Double.toString(1.0 - pct)
    // explicit null filter BEFORE the aggregate: the final equi-join infers
    // isnotnull on its keep side only, which would make the two uses of
    // `ep` (threshold branch, keep branch) canonically different plans and
    // defeat ReuseExchange — leaving the corpus aggregated twice
    val ep = df.where(col(episodeCol).isNotNull).groupBy(col(episodeCol))
      .agg(round(sum(costCol), roundDigits).as("__ep_cost"))
    val thr = ep.agg(
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY __ep_cost)").as("__thr"))
    val keep = ep.crossJoin(broadcast(thr))
      .where(col("__ep_cost") < col("__thr"))
      .select(col(episodeCol), col("__ep_cost").as("episode_cost"))
    df.join(keep, Seq(episodeCol))
  }

  /** W4 — best-so-far / top-1 selection with tie-break (reference
    * train_fawac_iql.py:153-155: lowest cost, then highest reward). */
  def bestPerKey(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1).drop("__rk")
  }

  /** W4 variant — feasible-best: best reward among rows under the cost
    * limit (reference train_fawac_iql.py:157-162).
    *
    * Planned as `where → orderBy → limit(1)` so Spark picks
    * `TakeOrderedAndProject`: each partition keeps its local top-1 and the
    * driver merges — no shuffle, no single-partition sort. The previous
    * form (`row_number` over an UNPARTITIONED window) funneled every
    * feasible row through ONE partition, which at 100 TB is corpus-sized;
    * PlanSpec now asserts no query plans an unpartitioned WindowExec. */
  def feasibleBest(df: DataFrame, costCol: Column, costLimit: Double,
                   ordering: Seq[Column]): DataFrame =
    df.where(costCol < lit(costLimit)).orderBy(ordering: _*).limit(1)

  /** W5 — periodic cadence filter (reference train_fawac_iql.py:143:
    * `step % eval_every == 0`). */
  def cadence(df: DataFrame, stepCol: Column, every: Long): DataFrame =
    df.where(pmod(stepCol, lit(every)) === 0)

  /** W6 — per-key truncation / limit (reference notebook cell 4 series
    * halving; fawac.py:601 episode cap). */
  def topNPerKey(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
  }
}
