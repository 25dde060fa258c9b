package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join / lookup / sampling operators (SURVEY.md §2.3, J1–J3). */
object JoinOps {

  /** J1 — deterministic sample (reference fawac.py:77-85 draws uniform
    * random row indices; our engine keys the sample on the stable primary
    * key so both Spark and the DuckDB oracle agree row-for-row).
    * Keeps rows where pk ≡ keep (mod m) — a 1/m systematic sample that
    * needs no shuffle, no state, and prunes at the scan when the table is
    * bucketed/partitioned by pk. Seeded pseudo-random sampling at scale:
    * `df.sample(withReplacement, frac, seed)` (not oracle-hashable). */
  def deterministicSample(df: DataFrame, pk: Column, mod: Int, keep: Int = 0): DataFrame =
    df.where(pmod(pk, lit(mod)) === lit(keep))

  /** J2 — TD-target next-row lookup (reference fawac.py:366,417:
    * `target = r + (1−done)·γ·V(s′)`). With episode-ordered data the
    * next-state value is `lead(v)` over (episode, time) — a window, not a
    * self-join, so it costs one shuffle on the episode key instead of two.
    * The terminal row has no successor: bootstrap value 0 (done=1 there in
    * well-formed data; we also null-guard via coalesce). */
  def tdTarget(df: DataFrame, partitionCol: String, orderCols: Seq[Column],
               rewardCol: Column, doneCol: Column, valueCol: Column,
               gamma: Double, out: String): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(orderCols: _*)
    df.withColumn(out,
      rewardCol + (lit(1.0) - doneCol) * lit(gamma)
        * coalesce(lead(valueCol, 1).over(w), lit(0.0)))
  }

  /** J1 (stochastic form) — the reference's uniform with-replacement batch
    * sampler (fawac.py:77-85) as seeded Bernoulli/Poisson sampling: not
    * oracle-hashable across engines (engine-specific RNG streams), so the
    * scored surface uses [[deterministicSample]]; this is the runtime API. */
  def seededSample(df: DataFrame, fraction: Double, seed: Long,
                   withReplacement: Boolean = true): DataFrame =
    df.sample(withReplacement, fraction, seed)

  /** J1 (exact semantics) — the reference's with-replacement positional
    * gather (fawac.py:77-85: `torch.randint(0, size, (batch,))` then
    * index into the buffer) as an index-table join: draw k maps to
    * position `lcg2(seed + k) mod N` and an inner join on the dense
    * position column replicates a row once per draw that lands on it —
    * true replacement semantics (duplicate indices → duplicate rows),
    * unlike Bernoulli [[seededSample]].
    *
    * The RNG is two rounds of the minstd LCG (x·48271 mod 2³¹−1) written
    * in plain int64 arithmetic so any SQL engine reproduces the draw
    * stream bit-for-bit (torch's RNG is not portable); intermediates stay
    * < 2⁴⁷, safe under ANSI overflow checking. N is a broadcast one-row
    * count, so the plan is: tiny draw table (batch-sized) built →
    * broadcast-hash-join against the corpus scan. No shuffle of the
    * corpus, no global row-numbering — the gather requires `posCol` to be
    * dense 0..N−1 (a replay buffer's position is, by construction). */
  def gatherSample(df: DataFrame, posCol: String, nDraws: Long, seed: Long): DataFrame = {
    val n = df.agg(count(lit(1)).cast("long").as("__n"))
    val s1 = (lit(seed) + col("id")) * lit(48271L) % lit(2147483647L)
    val draws = df.sparkSession.range(nDraws)
      .crossJoin(broadcast(n))
      .select(col("id").as("draw_id"),
        (s1 * lit(48271L) % lit(2147483647L) % col("__n")).as("__idx"))
    broadcast(draws).join(df, col("__idx") === col(posCol)).drop("__idx")
  }

  /** As-of lookup composed from a single conditional window — for each row,
    * the most recent at-or-before row of a marker type within the same key
    * (the events-enrichment as-of join, SURVEY.md §2.3 taxonomy). One hash
    * shuffle on the key + sort; no join at all, which beats a sort-merge
    * as-of for the common same-table case. */
  def asOfLastMarker(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                     markerCond: Column, markerValue: Column, out: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // last(…, ignoreNulls), NOT a running max: the value of the latest
    // marker row in window order, correct for arbitrary (non-monotone)
    // marker payloads.
    df.withColumn(out, last(when(markerCond, markerValue), ignoreNulls = true).over(w))
  }

  /** As-of join via the custom whole-operator stack ([[graft.plans.AsOfJoinPlan]]
    * → Strategy → Exec): for each left row, the time-adjacent right row in
    * the same key — `direction` picks latest-at-or-before ("backward", the
    * default), earliest-at-or-after ("forward") or closest-either-way
    * ("nearest", ties backward); `tolerance` (same units as the time
    * columns) drops matches further than the bound. One shuffle + sort per
    * side and a streaming merge — the plan shape a native engine would
    * pick. Keys may be any orderable type (same type both sides); times any
    * integral-backed type — long/int, date, timestamp (µs precision).
    * Right-side column names must not clash. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime),
        graft.plans.AsOfDirection.parse(direction), tolerance))
  }

  /** Range (band) join: each row matched to the band [lo, hi) containing
    * its value. The bands table is tiny → broadcast nested-loop with a
    * range predicate; no shuffle of the fact side. */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: Column): DataFrame =
    facts.join(broadcast(bands), valueCol >= col("lo") && valueCol < col("hi"))

  /** J3 — soft update: per-element EMA of two aligned parameter tables
    * (reference fawac.py:15-17: `target ← (1−τ)·target + τ·source`).
    * Parameter vectors stay as arrays (no explode → no row blow-up); the
    * zip is a per-row higher-order function after an equi-join on the
    * parameter key. At scale the "source" side is the model delta —
    * broadcast when small. */
  def softUpdate(target: DataFrame, source: DataFrame, key: String,
                 vecCol: String, tau: Double, out: String): DataFrame =
    target.join(source.withColumnRenamed(vecCol, "__src"), Seq(key))
      .withColumn(out,
        zip_with(col(vecCol), col("__src"),
          (t, s) => (lit(1.0) - lit(tau)) * t + lit(tau) * s))
      .drop("__src")
}
