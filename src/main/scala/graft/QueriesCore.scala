package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables
import graft.streaming.StreamingOps

/** §2.1–§2.7 scans/projections/aggregations/joins/windows/streaming-CDC + §2.6 built-ins, plus the shared Q case class, rounding/parity helpers and reference constants.
  *
  * Part of the [[Queries]] registry split (r18): the registry grew past
  * 7k LoC in one file, so its definition blocks moved into CHAINED traits
  * — each extends the previous, preserving the original textual
  * definition order (trait linearization initializes them in chain
  * order), member visibility (`private` → `protected`, still invisible
  * outside the object), and `Queries.all`, which is byte-identical. */
private[graft] trait QueriesCore {

  /** `eagerPlan`: constructing the DataFrame itself runs Spark jobs (the
    * adaptive local-vs-distributed decision in Dedup.connectedComponents
    * counts the edge graph before choosing a plan). Plan-only test sweeps
    * skip these so "inspect the plan" never executes a query and never
    * mutates cache state other tests observe. */
  final case class Q(name: String,
                     run: (SparkSession, String) => DataFrame,
                     oracle: Option[String],
                     eagerPlan: Boolean = false)

  /** Shortest round-trip decimal of a double — both Scala's parser and
    * DuckDB's strtod map it back to the identical bit pattern. */
  protected def d(x: Double): String = java.lang.Double.toString(x)

  /** Portable round-half-up: floor(x·10^d + 0.5)/10^d computed with the
    * IDENTICAL FP ops in both engines. Needed because DuckDB's round()
    * scales by 10^d in floating point (0.79499999999999998 → 79.5 → 0.8)
    * while Spark rounds the exact decimal expansion (→ 0.79): on the same
    * input double the two disagree near boundaries. Defined for x ≥ 0. */
  protected def pround(c: Column, digits: Int): Column = {
    val s = math.pow(10.0, digits)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }
  protected def proundSql(e: String, digits: Int): String = {
    val s = math.pow(10.0, digits)
    s"floor(($e) * ${d(s)} + 0.5) / ${d(s)}"
  }

  protected val Gamma = 0.99
  protected val Tau = 0.005
  protected val IqlTau = 0.7
  protected val Beta = 2.0

  // e2e_train_step hyperparameters (reference fawac_configs.py shapes:
  // reward_scale, rew_beta, exp_adv_max_reward, lag_max, cost_limit·γ^steps)
  protected val RewScale = 0.001
  protected val Beta2 = 0.5
  protected val ExpCap = 100.0
  protected val MaxLag = 10.0
  protected val SafeTheta = 0.8
  protected val CostThresh = CoreOps.costThreshold(1.0, Gamma, 5.0)

  // ------------------------------------------------------------------
  // §2.1 scans / ingest
  // ------------------------------------------------------------------

  protected val s1Ingest = Q("s1_ingest_transitions",
    (s, dir) => Tables.transitions(s, dir)
      // (episode_id, t) is non-unique → order by every column so tied rows
      // are identical and hash the same in any order
      .orderBy(col("episode_id"), col("t"), col("state0"), col("reward"),
        col("cost"), col("done")),
    Some("""SELECT l_orderkey AS episode_id, CAST(l_linenumber AS BIGINT) AS t,
      l_quantity AS state0, l_extendedprice*0.1 AS reward,
      l_discount*10.0 AS cost,
      CASE WHEN l_returnflag='R' OR l_linestatus='F' THEN 1.0 ELSE 0.0 END AS done
      FROM lineitem ORDER BY episode_id, t, state0, reward, cost, done"""))

  /** S3: outlier filter + deterministic noise injection + density-based
    * per-(cost_bin × reward_bin) capped subsampling (reference
    * train_fawac_iql.py:59-75). Noise is integer-arithmetic pseudo-random
    * so both engines reproduce it exactly. */
  protected val s3Preprocess = Q("s3_preprocess_density",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .where(col("l_quantity").between(2, 49))
        .withColumn("noise",
          (pmod(col("l_orderkey") * 9973 + col("l_linenumber") * 7919, lit(1000))
            .cast("double") / lit(1000.0)) - lit(0.5))
        .withColumn("noisy_price", col("l_extendedprice") + col("noise") * lit(10.0))
        .withColumn("cost_bin", floor(col("l_discount") * lit(100.0) / lit(2.0)))
        .withColumn("reward_bin", floor(col("l_quantity") / lit(10.0)))
      val w = Window.partitionBy(col("cost_bin"), col("reward_bin"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_quantity"), col("l_discount"))
      li.withColumn("rn", row_number().over(w)).where(col("rn") <= 40)
        .groupBy(col("cost_bin"), col("reward_bin"))
        .agg(count(lit(1)).as("n_kept"), round(sum(col("noisy_price")), 2).as("sum_price"))
        .orderBy(col("cost_bin"), col("reward_bin"))
    },
    Some("""WITH f AS (
        SELECT *, (CAST((l_orderkey*9973 + l_linenumber*7919) % 1000 AS DOUBLE)/1000.0) - 0.5 AS noise,
               CAST(floor(l_discount*100.0/2.0) AS BIGINT) AS cost_bin,
               CAST(floor(l_quantity/10.0) AS BIGINT) AS reward_bin
        FROM lineitem WHERE l_quantity BETWEEN 2 AND 49),
      r AS (SELECT *, l_extendedprice + noise*10.0 AS noisy_price,
               row_number() OVER (PARTITION BY cost_bin, reward_bin
                 ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_discount) AS rn
            FROM f)
      SELECT cost_bin, reward_bin, CAST(count(*) AS BIGINT) AS n_kept,
             round(sum(noisy_price), 2) AS sum_price
      FROM r WHERE rn <= 40 GROUP BY cost_bin, reward_bin ORDER BY cost_bin, reward_bin"""))

  /** S1+W1: the reference's dead `cost_returns` column (allocated but never
    * populated, fawac.py:48) materialized the way it clearly intended —
    * discounted reverse cumsum of cost per episode (SURVEY.md §1.4). */
  protected val s1CostReturns = Q("s1_cost_returns",
    (s, dir) => SeqOps.discountedReturn(Tables.transitions(s, dir), "episode_id",
      // (episode_id, t) is NOT unique in this lineitem: order by the value
      // too, so the fold sequence is engine-independent; remaining ties are
      // identical (t, cost) rows, interchangeable by construction
      Seq(col("t"), col("cost")), col("cost"), Gamma, "cost_return")
      .select(col("episode_id"), col("t"), pround(col("cost_return"), 4).as("cost_return"))
      .orderBy(col("episode_id"), col("t"), col("cost_return")),
    Some("""WITH tr AS (SELECT l_orderkey AS episode_id, CAST(l_linenumber AS BIGINT) AS t,
        l_discount*10.0 AS cost FROM lineitem),
      r AS (SELECT *, row_number() OVER (PARTITION BY episode_id ORDER BY t, cost) AS rn FROM tr)
      SELECT episode_id, t,
        """ + proundSql("""sum(cost * pow(""" + d(Gamma) + """, rn)) OVER (PARTITION BY episode_id ORDER BY rn
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) / pow(""" + d(Gamma) + """, rn)""", 4) + """ AS cost_return
      FROM r ORDER BY episode_id, t, cost_return"""))

  /** S2: the external-dataset boundary (`env.get_dataset()`,
    * reference train_fawac_iql.py:56) as a DataSourceV2 connector scan —
    * [[graft.sources.TransitionGen]] plans per-worker splits, prunes
    * columns, and narrows the generated interval from the pushed range
    * predicates, so the `WHERE` never materializes outside [1200, 43200).
    * The closed forms are dyadic rationals (k/2^20), so every per-episode
    * sum here is exact in IEEE double in any addition order — no rounding
    * needed for cross-engine parity. Oracle forms come from the connector
    * itself ([[graft.sources.TransitionGen.oracleForms]]) so the Scala and
    * SQL renderings can only drift together. */
  protected val s2Generator = {
    val f = graft.sources.TransitionGen.oracleForms
    Q("s2_generator_source",
      (s, _) => s.read.format("graft-transitions")
        .option("rows", 50000L).option("splits", 8).load()
        .where(col("i") >= 1200 && col("i") < 43200)
        .groupBy(col("episode"))
        .agg(count(lit(1)).as("n"), sum(col("reward")).as("sum_reward"),
          max(col("obs")).as("max_obs"),
          sum(col("done")).cast("long").as("n_done"))
        .orderBy(col("episode")),
      Some(s"""SELECT ${f("episode")} AS episode, count(*) AS n,
        sum(${f("reward")}) AS sum_reward, max(${f("obs")}) AS max_obs,
        CAST(sum(${f("done")}) AS BIGINT) AS n_done
        FROM range(1200, 43200) t(i) GROUP BY 1 ORDER BY 1"""))
  }

  /** S2 (pushed aggregation): ungrouped count/min/max over the connector
    * answer at PLANNING time — [[graft.sources.TransitionGen]] folds them
    * to closed forms of the filter-narrowed interval and emits one row,
    * generating nothing (Round8OpsSpec proves the same plan at 2^40
    * rows). The 200M-row size here is for the oracle's benefit: DuckDB
    * actually scans its `range()`, Spark does not. */
  protected val s2PushCount = Q("s2_generator_pushdown_count",
    (s, _) => s.read.format("graft-transitions")
      .option("rows", 200000000L).option("splits", 8).load()
      .where(col("i") >= 1234)
      .agg(count(lit(1)).as("n_rows"), min(col("i")).as("min_i"),
        max(col("i")).as("max_i")),
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows, min(i) AS min_i,
      max(i) AS max_i FROM range(1234, 200000000) t(i)"""))

  // ------------------------------------------------------------------
  // §2.2 projections / scalar expressions
  // ------------------------------------------------------------------

  protected val pScalar = Q("p_scalar_ops",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val q1 = col("l_quantity") * lit(0.9)
      val q2 = col("l_quantity") * lit(1.1)
      val mask = CoreOps.safetyMask(col("l_discount"), col("l_tax"), 0.05)
      li.select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        CoreOps.twinRewardQ(q1, q2).as("twin_reward_q"),
        CoreOps.twinCostQ(q1, q2).as("twin_cost_q"),
        CoreOps.clamp(col("l_discount"), 0.02, 0.08).as("clamped_disc"),
        mask.as("safety_mask"),
        CoreOps.netAdvantage(col("l_quantity") - lit(25.0),
          -(col("l_discount") * lit(10.0)),
          CoreOps.penaltyGate(col("l_discount") * lit(10.0), 0.5, 20.0)).as("net_adv"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("twin_reward_q"),
          col("clamped_disc"), col("safety_mask"), col("net_adv"))
    },
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      least(l_quantity*0.9, l_quantity*1.1) AS twin_reward_q,
      greatest(greatest(l_quantity*0.9, l_quantity*1.1), 0.0) AS twin_cost_q,
      least(greatest(l_discount, 0.02), 0.08) AS clamped_disc,
      (CASE WHEN l_discount < 0.05 THEN 1.0 ELSE 0.0 END)
        * (CASE WHEN l_tax < 0.05 THEN 1.0 ELSE 0.0 END) AS safety_mask,
      (l_quantity - 25.0) + ((CASE WHEN (l_discount*10.0) - 0.5 > 0.0 THEN 1.0 ELSE 0.0 END) * 20.0)
        * (-(l_discount*10.0)) AS net_adv
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, twin_reward_q, clamped_disc, safety_mask, net_adv"""))

  protected val pExp = Q("p_exp_advantage",
    (s, dir) => Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      pround(CoreOps.expAdvantage(col("l_quantity") / lit(25.0) - lit(1.0), Beta, 100.0), 4)
        .as("exp_adv"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("exp_adv")),
    Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
      proundSql("least(exp(" + d(Beta) + "*(l_quantity/25.0 - 1.0)), 100.0)", 4) + " AS exp_adv " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber, exp_adv"))

  /** P8: row-wise squared-residual sum between consecutive embedding
    * vectors (reference fawac.py:449 `Σ_dim (π(s)−a)²`). */
  protected val p8Residual = Q("p8_residual_sum",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id"), col("embedding").cast("array<double>").as("va"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").cast("array<double>").as("vb"))
      a.join(b, "vec_id")
        .select(col("vec_id"), round(CoreOps.squaredResidualSum(col("va"), col("vb")), 6).as("bc_loss"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS va FROM embeddings),
      b AS (SELECT vec_id - 1 AS vec_id, embedding::DOUBLE[] AS vb FROM embeddings)
      SELECT a.vec_id,
        round(list_sum(list_transform(range(len(va)), i -> (va[i+1]-vb[i+1])*(va[i+1]-vb[i+1]))), 6) AS bc_loss
      FROM a JOIN b USING (vec_id) ORDER BY vec_id"""))

  /** P10: fixed two-layer MLP forward pass (4 ReLU units) over the
    * embedding column, weights from the closed form w(o,i)=((3o+5i)%13−6)/10.
    * Output is exploded to (vec_id, unit, y) rows: the driver's compare
    * sorts/hashes with pandas, which cannot sort ndarray cells — array
    * payloads stay out of the hashed output (ADVICE r1). */
  protected val p10Mlp = Q("p10_mlp_inference",
    (s, dir) => {
      val x = col("embedding").cast("array<double>")
      val w = ModelOps.pseudoWeights(4, 64)
      val y = ModelOps.denseLayer(x, w, Seq.fill(4)(0.1), ModelOps.relu)
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(transform(y, v => round(v, 6))))
        .select(col("vec_id"), col("pos").cast("long").as("unit"), col("col").as("y"))
        .orderBy(col("vec_id"), col("unit"))
    },
    Some {
      val units = (0 until 4).map { o =>
        s"round(greatest(0.1 + list_sum(list_transform(range(len(x)), i -> x[i+1] * (CAST(((3*$o + 5*i) % 13) - 6 AS DOUBLE)/10.0))), 0.0), 6)"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      ys AS (SELECT vec_id, [$units] AS y FROM e)
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS unit, y[i] AS y
      FROM (SELECT vec_id, unnest(range(1, len(y)+1)) AS i, y FROM ys)
      ORDER BY vec_id, unit"""
    })

  // ------------------------------------------------------------------
  // §2.4 aggregations
  // ------------------------------------------------------------------

  protected val aStats = Q("a_stats",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // exact lower median via the histogram path (l_quantity has a
      // bounded domain) — same value as AggOps.lowerMedian but without
      // collecting each group into one array; see AggOps scaladoc.
      val med = AggOps.exactMedianByValue(li, Seq("l_returnflag"), "l_quantity", "median_q")
      li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("cnt"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"),
        round(AggOps.stddevPop(col("l_quantity")), 4).as("std_q"),
        round(sum(col("l_quantity")), 2).as("sum_q"))
        .join(med, Seq("l_returnflag"), "left") // left: an all-null group keeps its row (null median), matching quantile_disc
        .select(col("l_returnflag"), col("cnt"), col("min_q"), col("max_q"),
          col("median_q"), col("std_q"), col("sum_q"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
      min(l_quantity) AS min_q, max(l_quantity) AS max_q,
      quantile_disc(l_quantity, 0.5) AS median_q,
      round(stddev_pop(l_quantity), 4) AS std_q,
      round(sum(l_quantity), 2) AS sum_q
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  protected val aLosses = Q("a_losses",
    (s, dir) => {
      val u = col("l_quantity") - lit(25.5)
      val q1 = col("l_quantity") * lit(0.9)
      val q2 = col("l_quantity") * lit(1.1)
      val w = CoreOps.expAdvantage(col("l_quantity") * lit(0.1) - lit(2.5), 1.0, 10.0)
      Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
        round(sum(abs(lit(IqlTau) - CoreOps.indicator(u < lit(0.0))) * u * u), 4)
          .as("expectile_loss_sum"),
        round((sum((q1 - col("l_quantity")) * (q1 - col("l_quantity")))
          + sum((q2 - col("l_quantity")) * (q2 - col("l_quantity")))) / lit(2.0), 4)
          .as("twin_mse_halfsum"),
        round(AggOps.weightedMean(w, col("l_quantity")), 4).as("weighted_mean"),
        round(AggOps.normalizedWeightedMean(w, col("l_quantity")), 4).as("norm_weighted_mean"))
        .orderBy(col("l_returnflag"))
    },
    Some("SELECT l_returnflag, " +
      "round(sum(abs(" + d(IqlTau) + " - (CASE WHEN (l_quantity - 25.5) < 0.0 THEN 1.0 ELSE 0.0 END)) " +
      "* (l_quantity - 25.5) * (l_quantity - 25.5)), 4) AS expectile_loss_sum, " +
      "round((sum((l_quantity*0.9 - l_quantity)*(l_quantity*0.9 - l_quantity)) " +
      "+ sum((l_quantity*1.1 - l_quantity)*(l_quantity*1.1 - l_quantity)))/2.0, 4) AS twin_mse_halfsum, " +
      "round(avg(least(exp(1.0*(l_quantity*0.1 - 2.5)), 10.0) * l_quantity), 4) AS weighted_mean, " +
      "round(sum(least(exp(1.0*(l_quantity*0.1 - 2.5)), 10.0) * l_quantity) " +
      "/ sum(least(exp(1.0*(l_quantity*0.1 - 2.5)), 10.0)), 4) AS norm_weighted_mean " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))

  // ------------------------------------------------------------------
  // §2.3 joins / lookups / sampling
  // ------------------------------------------------------------------

  protected val j1Sample = Q("j1_deterministic_sample",
    (s, dir) => JoinOps.deterministicSample(Tables.events(s, dir), col("event_id"), 10)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      FROM events WHERE event_id % 10 = 0 ORDER BY event_id"""))

  /** J1 exact with-replacement semantics (fawac.py:77-85): 2048 seeded
    * positional draws (the reference's batch_size) gathered from the
    * events table by dense event_id — duplicate draws replicate rows, so
    * the output keys on draw_id, not event_id. Pure per-row projection
    * after the gather join: bit-exact across engines, no rounding. */
  protected val j1Gather = Q("j1_gather_sample",
    (s, dir) => JoinOps.gatherSample(Tables.events(s, dir), "event_id",
      nDraws = 2048, seed = 7L)
      .select(col("draw_id"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("draw_id")),
    Some("""WITH draws AS (
        SELECT d AS draw_id,
          (7 + d) * 48271 % 2147483647 * 48271 % 2147483647
            % (SELECT count(*) FROM events) AS idx
        FROM (SELECT unnest(range(2048)) AS d))
      SELECT draw_id, e.event_id, e.user_id, e.event_type, e.value
      FROM draws JOIN events e ON e.event_id = idx
      ORDER BY draw_id"""))

  protected val j2Td = Q("j2_td_target",
    (s, dir) => JoinOps.tdTarget(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"), lit(0.0), col("value"),
      Gamma, "td_target")
      .select(col("user_id"), col("event_id"), col("td_target"))
      .orderBy(col("user_id"), col("event_id")),
    Some("SELECT user_id, event_id, value + (1.0 - 0.0) * " + d(Gamma) +
      " * coalesce(lead(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id), 0.0) AS td_target " +
      "FROM events ORDER BY user_id, event_id"))

  protected val j3Soft = Q("j3_soft_update",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val target = e.where(pmod(col("vec_id"), lit(2)) === 0)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val source = e.where(pmod(col("vec_id"), lit(2)) === 1)
        .select((col("vec_id") - 1).as("vec_id"), col("embedding").cast("array<double>").as("vec"))
      // exploded to the canonical (key, idx, value) parameter-table shape
      // (reference state_dict) — keeps ndarray cells out of the gate's sort
      JoinOps.softUpdate(target, source, "vec_id", "vec", Tau, "updated")
        .select(col("vec_id"), posexplode(col("updated")))
        .select(col("vec_id"), col("pos").cast("long").as("idx"), col("col").as("updated"))
        .orderBy(col("vec_id"), col("idx"))
    },
    Some("""WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS tv FROM embeddings WHERE vec_id % 2 = 0),
      s AS (SELECT vec_id - 1 AS vec_id, embedding::DOUBLE[] AS sv FROM embeddings WHERE vec_id % 2 = 1),
      u AS (SELECT vec_id, list_transform(range(len(tv)), i -> """ +
      d(1.0 - Tau) + "*tv[i+1] + " + d(Tau) + """*sv[i+1]) AS upd
            FROM t JOIN s USING (vec_id))
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS idx, upd[i] AS updated
      FROM (SELECT vec_id, unnest(range(1, len(upd)+1)) AS i, upd FROM u)
      ORDER BY vec_id, idx"""))

  // ------------------------------------------------------------------
  // §2.5 windows / sequences
  // ------------------------------------------------------------------

  protected val w1Discounted = Q("w1_discounted_return",
    (s, dir) => SeqOps.discountedReturn(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"), Gamma, "disc_return")
      .select(col("user_id"), col("event_id"), pround(col("disc_return"), 4).as("disc_return"))
      .orderBy(col("user_id"), col("event_id")),
    Some("""WITH r AS (SELECT user_id, event_id, value,
        row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events)
      SELECT user_id, event_id,
        """ + proundSql("""sum(value * pow(""" + d(Gamma) + """, rn)) OVER (PARTITION BY user_id ORDER BY rn
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) / pow(""" + d(Gamma) + """, rn)""", 4) + """ AS disc_return
      FROM r ORDER BY user_id, event_id"""))

  protected val w2Ema = Q("w2_ema_smoothing",
    (s, dir) => SeqOps.emaFinal(Tables.events(s, dir), "user_id",
      Seq("ts", "event_id"), "value", 0.5, "ema")
      .orderBy(col("user_id")),
    Some("""SELECT user_id,
      list_reduce(list(value ORDER BY epoch_ns(ts), event_id), (s, x) -> 0.5*s + 0.5*x) AS ema
      FROM events GROUP BY user_id ORDER BY user_id"""))

  protected val w3Sessions = Q("w3_episode_accumulation",
    (s, dir) => SeqOps.sessionAgg(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"))
      .select(col("user_id"), round(col("session_sum"), 4).as("session_sum"),
        col("session_len"), col("session_min"), col("session_max"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, round(sum(value), 4) AS session_sum,
      CAST(count(*) AS BIGINT) AS session_len,
      min(value) AS session_min, max(value) AS session_max
      FROM events GROUP BY user_id ORDER BY user_id"""))

  protected val w4Best = Q("w4_best_per_key",
    (s, dir) => SeqOps.bestPerKey(Tables.events(s, dir), Seq("user_id"),
      Seq(col("value").desc, col("event_id").asc))
      .select(col("user_id"), col("event_id"), col("value"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
          row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
        FROM events) WHERE rk = 1 ORDER BY user_id"""))

  protected val w4Feasible = Q("w4_feasible_best",
    (s, dir) => SeqOps.feasibleBest(Tables.orders(s, dir), col("o_totalprice"), 50000.0,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select(col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 50000.0
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1"""))

  protected val w5Cadence = Q("w5_cadence",
    (s, dir) => SeqOps.cadence(Tables.events(s, dir), col("event_id"), 20)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id")),
    Some("SELECT event_id, user_id, value FROM events WHERE event_id % 20 = 0 ORDER BY event_id"))

  protected val w6TopN = Q("w6_topn_per_key",
    (s, dir) => SeqOps.topNPerKey(Tables.events(s, dir), Seq("user_id"),
      Seq(col("ts"), col("event_id")), 3)
      .select(col("user_id"), col("event_id"), col("__rn").cast("long").as("rn"))
      .orderBy(col("user_id"), col("rn")),
    Some("""SELECT user_id, event_id, CAST(rn AS BIGINT) AS rn FROM (
        SELECT user_id, event_id,
          row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
        FROM events) WHERE rn <= 3 ORDER BY user_id, rn"""))

  // ------------------------------------------------------------------
  // §2.7 streaming/CDC semantics (batch-equivalent, oracle-checked)
  // ------------------------------------------------------------------

  protected val cdcLatest = Q("cdc_latest_state",
    (s, dir) => StreamingOps.cdcLatestState(Tables.events(s, dir))
      .withColumn("last_ts", expr("last_ts div 1000"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts,
        event_type AS last_type, value AS last_value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rk
        FROM events) WHERE rk = 1
        AND COALESCE(event_type NOT IN ('error'), TRUE) ORDER BY user_id"""))

  /** CDC at-least-once replay dedup (batch form of
    * StreamingOps.dedupEvents): the input is the event log plus a
    * replayed subset (every 7th event delivered twice); exactly one row
    * per event_id must survive. */
  protected val cdcDedupReplay = Q("cdc_dedup_replay",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val replayed = ev.unionAll(ev.where(pmod(col("event_id"), lit(7)) === 0))
      StreamingOps.dedupEvents(replayed)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
      FROM (SELECT *, row_number() OVER (PARTITION BY event_id
              ORDER BY epoch_ns(ts), user_id, event_type, value, props) AS rk
            FROM (SELECT * FROM events
                  UNION ALL SELECT * FROM events WHERE event_id % 7 = 0))
      WHERE rk = 1 ORDER BY event_id"""))

  /** Stream-stream interval join, batch form (StreamingOps
    * .attributionJoin): per click, the same user's views in the
    * preceding hour. */
  protected val cdcIntervalJoin = Q("cdc_interval_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      StreamingOps.attributionJoin(
        ev.where(col("event_type") === "view"),
        ev.where(col("event_type") === "click"), "1 hour")
        .groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_views"),
          min(col("view_id")).as("first_view_id"),
          max(unix_micros(col("v_ts"))).as("last_view_us"),
          max(col("click_value")).as("click_value"))
        .orderBy(col("click_id"))
    },
    Some("""WITH v AS (SELECT user_id, epoch_us(ts) AS v_us, event_id AS view_id
              FROM events WHERE event_type = 'view'),
      c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id, value AS click_value
              FROM events WHERE event_type = 'click')
      SELECT click_id, CAST(count(*) AS BIGINT) AS n_views, min(view_id) AS first_view_id,
        max(v_us) AS last_view_us, max(click_value) AS click_value
      FROM v JOIN c ON v.user_id = c.user_id
        AND v_us <= c_us AND v_us >= c_us - 3600000000
      GROUP BY click_id ORDER BY click_id"""))

  /** SCD Type-2 dimension history from the CDC purchase log
    * (StreamingOps.scd2History): versioned `[valid_from, valid_to)` rows
    * per user, open row = current state. */
  protected val cdcScd2 = Q("cdc_scd2_history",
    (s, dir) => StreamingOps.scd2History(
        Tables.events(s, dir).where(col("event_type") === "purchase"))
      .select(col("user_id"), col("event_id"),
        expr("valid_from div 1000").as("valid_from_us"),
        expr("valid_to div 1000").as("valid_to_us"),
        col("state_value"), col("version"), col("is_current"))
      .orderBy(col("user_id"), col("version")),
    Some("""SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
      lead(epoch_us(ts)) OVER w AS valid_to_us, value AS state_value,
      CAST(row_number() OVER w AS BIGINT) AS version,
      (lead(epoch_us(ts)) OVER w IS NULL) AS is_current
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      ORDER BY user_id, version"""))

  /** CDC changelog op classification (StreamingOps.changelogOps): each
    * event vs the key's previous state → I/U/N op codes, Debezium-style
    * before/after columns derived with one lag pass. */
  protected val cdcChangelog = Q("cdc_changelog_ops",
    (s, dir) => StreamingOps.changelogOps(Tables.events(s, dir))
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        col("op"), col("old_value"), col("value").as("new_value"))
      .orderBy(col("user_id"), col("event_id")),
    Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      CASE WHEN lag(value) OVER w IS NULL THEN 'I'
           WHEN lag(value) OVER w <> value THEN 'U' ELSE 'N' END AS op,
      lag(value) OVER w AS old_value, value AS new_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      ORDER BY user_id, event_id"""))

  protected val sessWindow = Q("session_windows",
    (s, dir) => StreamingOps.sessionSums(Tables.events(s, dir), "30 minutes")
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        round(col("session_value"), 4).as("session_value"), col("session_events"))
      .orderBy(col("user_id"), col("session_start_us")),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      m AS (SELECT *, CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
              THEN 1 ELSE 0 END AS brk FROM e),
      g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT user_id, min(us) AS session_start_us, max(us) + 1800000000 AS session_end_us,
        round(sum(value), 4) AS session_value, CAST(count(*) AS BIGINT) AS session_events
      FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_us"""))

  protected val tumbling = Q("tumbling_window",
    (s, dir) => StreamingOps.tumblingAgg(Tables.events(s, dir), "1 day")
      .select(col("w_start_us"), col("event_type"), col("n"), round(col("total"), 2).as("total"))
      .orderBy(col("w_start_us"), col("event_type")),
    Some("""SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS w_start_us, event_type,
      CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type"""))

  // ------------------------------------------------------------------
  // engine built-ins over the star schema (SURVEY.md §2.6)
  // ------------------------------------------------------------------

  protected val aggPricing = Q("q1_pricing_summary",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_discount")), 4).as("sum_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      round(sum(l_discount), 4) AS sum_disc,
      CAST(count(*) AS BIGINT) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  protected val joinStar = Q("join_star_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      // customer is NOT hinted: it scales linearly with the fact tables
      // (largest "dimension" in the schema), so the join strategy is left
      // to size-based selection/AQE — at small SF it still broadcasts, at
      // 100 TB it becomes a shuffle join instead of a forced driver OOM.
      // nation/region are genuinely bounded (≤ 25 rows at any scale).
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, CAST(count(*) AS BIGINT) AS n_items,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  protected val semiJoin = Q("semi_join_segments",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
      FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  protected val antiJoin = Q("anti_join_customers",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  protected val setOps = Q("set_ops_except",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchasers = ev.where(col("event_type") === "purchase").select(col("user_id"))
      val erroring = ev.where(col("event_type") === "error").select(col("user_id"))
      purchasers.except(erroring).orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT SELECT user_id FROM events WHERE event_type = 'error' ORDER BY user_id"""))

  protected val stringDate = Q("string_date_funcs",
    (s, dir) => Tables.orders(s, dir).groupBy(
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      upper(substring(col("o_orderpriority"), 1, 1)).as("prio"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("min_price"))
      .orderBy(col("y"), col("m"), col("prio")),
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
      upper(substring(o_orderpriority, 1, 1)) AS prio,
      CAST(count(*) AS BIGINT) AS n, min(o_totalprice) AS min_price
      FROM orders GROUP BY 1, 2, 3 ORDER BY y, m, prio"""))

  protected val jsonFuncs = Q("json_extract",
    (s, dir) => Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("k")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY k ORDER BY k"""))

  // ------------------------------------------------------------------
  // §2.8 LLM-pipeline extensions X1–X4
  // ------------------------------------------------------------------

  protected val x1Exact = Q("x1_exact_dedup",
    (s, dir) => Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("fp")),
    Some("""SELECT md5(regexp_replace(trim(lower(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp,
      min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
      FROM documents GROUP BY fp ORDER BY fp"""))

  protected val tokenSetSql =
    """SELECT doc_id, list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS toks
       FROM documents"""

  /** Word 3-gram shingle sets — must mirror Dedup.wordShingles exactly. */
  protected val shingleSetSql =
    """SELECT doc_id,
        CASE WHEN len(toks0) >= 3
          THEN list_distinct(list_transform(range(len(toks0)-2),
                 i -> toks0[i+1] || ' ' || toks0[i+2] || ' ' || toks0[i+3]))
          ELSE list_filter([array_to_string(toks0, ' ')], s -> s <> '') END AS toks
       FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks0
             FROM documents)"""

  protected val x1Jaccard = Q("x1_jaccard_neardup",
    (s, dir) => Dedup.jaccardNearDup(Tables.documents(s, dir), "doc_id", "text",
      maxDf = 8, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH sets AS ($tokenSetSql),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      rare AS (SELECT tok FROM tok GROUP BY tok HAVING count(*) <= 8 AND count(*) >= 2),
      rt AS (SELECT doc_id, tok FROM tok JOIN rare USING (tok)),
      cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
               FROM rt l JOIN rt r ON l.tok = r.tok AND l.doc_id < r.doc_id),
      j AS (SELECT doc_a, doc_b,
              len(list_intersect(a.toks, b.toks)) AS inter, len(a.toks) AS na, len(b.toks) AS nb
            FROM cand JOIN sets a ON cand.doc_a = a.doc_id JOIN sets b ON cand.doc_b = b.doc_id)
      SELECT doc_a, doc_b,
        round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
      FROM j WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5
      ORDER BY doc_a, doc_b"""))

  /** X1 — asymmetric containment pairs ([[Dedup.containmentPairs]]):
    * doc_a's shingles ≥50% contained in doc_b's — the truncated-copy
    * signal; same rare-shingle candidate pruning, exact measure on full
    * sets, both directions emitted. */
  protected val x1Containment = Q("x1_containment_pairs",
    (s, dir) => Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
      maxDf = 8, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH sets0 AS ($shingleSetSql),
      sets AS (SELECT doc_id, list_distinct(list_transform(toks,
          t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))) AS toks
        FROM sets0),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      rare AS (SELECT tok FROM tok GROUP BY tok HAVING count(*) BETWEEN 2 AND 8),
      rt AS (SELECT doc_id, tok FROM tok JOIN rare USING (tok)),
      cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
               FROM rt l JOIN rt r ON l.tok = r.tok AND l.doc_id <> r.doc_id),
      j AS (SELECT doc_a, doc_b,
              len(list_intersect(a.toks, b.toks)) AS inter, len(a.toks) AS na
            FROM cand JOIN sets a ON cand.doc_a = a.doc_id
            JOIN sets b ON cand.doc_b = b.doc_id
            WHERE len(a.toks) > 0)
      SELECT doc_a, doc_b,
        round(CAST(inter AS DOUBLE) / na, 6) AS containment
      FROM j WHERE CAST(inter AS DOUBLE) / na >= 0.5
      ORDER BY doc_a, doc_b"""))

  protected val x1Minhash = Q("x1_minhash_signatures",
    (s, dir) => Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text", k = 8)
      .orderBy(col("doc_id")),
    Some {
      val sigs = (0 until 8).map { j =>
        s"CAST(min((${Dedup.minhashA(j)}*tok_id + ${Dedup.minhashB(j)}) % ${Dedup.MinhashP}) AS BIGINT) AS mh$j"
      }.mkString(", ")
      s"""WITH sets AS ($shingleSetSql),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      j AS (SELECT doc_id, ${Dedup.FeatureHashSql} % ${Dedup.MinhashP} AS tok_id FROM tok)
      SELECT doc_id, $sigs FROM j GROUP BY doc_id ORDER BY doc_id"""
    })

  protected val x2TopK = Q("x2_similarity_topk",
    (s, dir) => Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      pmod(col("vec_id"), lit(100)) === 0, k = 5)
      .orderBy(col("query_id"), col("rk")),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
      scored AS (SELECT query_id, e.vec_id AS cand_id,
          round(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*qv[i+1])))
             * sqrt(list_sum(list_transform(range(len(v)), i -> v[i+1]*v[i+1])))), 6) AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rk
        FROM scored)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, cand_id, cosine
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""))

  protected val x3Text = Q("x3_text_analysis",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // one tokenization pass per document (TextStatsExpr); the naive
      // per-column forms re-tokenize ~6× through interpreted HOF lambdas
      // (CodegenFallback) — measured 4.6 s vs <1 s at sf0.1. Each derived
      // expression below reproduces its TextOps declarative form exactly
      // (cross-checked in TextKernelSpec), so the oracle is unchanged.
      val st = TextOps.textStats(col("text"))
      docs.select(col("doc_id"),
        st.getField("n_tokens").cast("long").as("n_tokens"),
        TextOps.subwordCountFromStats(st, col("text")).as("n_subwords"),
        length(col("text")).cast("long").as("n_chars_m"),
        TextOps.punctCount(col("text")).cast("long").as("n_punct"),
        TextOps.qualityScoreFromStats(st, col("text")).as("quality"),
        TextOps.langIdFromStats(st).as("lang_pred"),
        TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },
    Some {
      def hits(l: String) = {
        val words = TextOps.stopwords(l).map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, t -> list_contains([$words], t)))"
      }
      s"""WITH base AS (SELECT doc_id, text,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
        FROM documents),
      h AS (SELECT doc_id, text, toks,
          ${hits("de")} AS hd, ${hits("en")} AS he, ${hits("es")} AS hes, ${hits("fr")} AS hf
        FROM base)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(coalesce(list_sum(list_transform(toks, t -> CAST(ceil(length(t)/4.0) AS BIGINT))), 0)
          + length(regexp_replace(text, '[a-zA-Z \\t\\n\\x0B\\f\\r]', '', 'g')) AS BIGINT) AS n_subwords,
        CAST(length(text) AS BIGINT) AS n_chars_m,
        CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS BIGINT) AS n_punct,
        round((least(CAST(length(text) AS DOUBLE)/200.0, 1.0)
          + greatest(1.0 - (CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1)) * 4.0, 0.0)
          + least((CAST(${hits("en")} AS DOUBLE) / greatest(len(toks), 1)) * 4.0, 1.0)) / 3.0, 6) AS quality,
        CASE WHEN hd >= he AND hd >= hes AND hd >= hf AND hd > 0 THEN 'de'
             WHEN he >= hes AND he >= hf AND he > 0 THEN 'en'
             WHEN hes >= hf AND hes > 0 THEN 'es'
             WHEN hf > 0 THEN 'fr'
             ELSE 'und' END AS lang_pred,
        md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp
      FROM h ORDER BY doc_id"""
    })

  protected val x4Multimodal = Q("x4_multimodal_join",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("label").cast("long").as("label"),
          round(CoreOps.l2Norm(col("embedding").cast("array<double>")), 6).as("emb_norm"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars, CAST(label AS BIGINT) AS label,
      round(sqrt(list_sum(list_transform(range(len(embedding)),
        i -> CAST(embedding[i+1] AS DOUBLE)*CAST(embedding[i+1] AS DOUBLE)))), 6) AS emb_norm
      FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"""))

}
