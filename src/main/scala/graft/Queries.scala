package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables
import graft.streaming.StreamingOps

/** The scored query surface: one entry per implemented operator from
  * SURVEY.md §2, each paired with DuckDB SQL computing the identical
  * result (the driver hash-compares parquet dumps, so both sides must
  * agree to the last row and — after the documented rounding — the last
  * bit).
  *
  * Determinism rules (SURVEY.md §5, FIXTURES.md):
  *  - every query ends in ORDER BY on a deterministic key;
  *  - per-row IEEE arithmetic from identical inputs is bit-exact across
  *    engines → no rounding; engine-ordered aggregates round at LATTICE-SAFE
  *    scales (≥ the data's decimal places); irrational-valued sums
  *    (transcendental multipliers) round coarsely (2–4 digits) since no
  *    lattice protects their boundaries — see SCALING.md;
  *  - double literals are folded in Scala and embedded via
  *    `Double.toString` so both engines parse the identical bit pattern;
  *  - integral outputs cast to BIGINT on both sides;
  *  - events.ts reads as epoch-nanos long (= DuckDB `epoch_ns(ts)`).
  */
object Queries {

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
  private def d(x: Double): String = java.lang.Double.toString(x)

  /** Portable round-half-up: floor(x·10^d + 0.5)/10^d computed with the
    * IDENTICAL FP ops in both engines. Needed because DuckDB's round()
    * scales by 10^d in floating point (0.79499999999999998 → 79.5 → 0.8)
    * while Spark rounds the exact decimal expansion (→ 0.79): on the same
    * input double the two disagree near boundaries. Defined for x ≥ 0. */
  private def pround(c: Column, digits: Int): Column = {
    val s = math.pow(10.0, digits)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }
  private def proundSql(e: String, digits: Int): String = {
    val s = math.pow(10.0, digits)
    s"floor(($e) * ${d(s)} + 0.5) / ${d(s)}"
  }

  private val Gamma = 0.99
  private val Tau = 0.005
  private val IqlTau = 0.7
  private val Beta = 2.0

  // e2e_train_step hyperparameters (reference fawac_configs.py shapes:
  // reward_scale, rew_beta, exp_adv_max_reward, lag_max, cost_limit·γ^steps)
  private val RewScale = 0.001
  private val Beta2 = 0.5
  private val ExpCap = 100.0
  private val MaxLag = 10.0
  private val SafeTheta = 0.8
  private val CostThresh = CoreOps.costThreshold(1.0, Gamma, 5.0)

  // ------------------------------------------------------------------
  // §2.1 scans / ingest
  // ------------------------------------------------------------------

  private val s1Ingest = Q("s1_ingest_transitions",
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
  private val s3Preprocess = Q("s3_preprocess_density",
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
  private val s1CostReturns = Q("s1_cost_returns",
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
  private val s2Generator = {
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
  private val s2PushCount = Q("s2_generator_pushdown_count",
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

  private val pScalar = Q("p_scalar_ops",
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

  private val pExp = Q("p_exp_advantage",
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
  private val p8Residual = Q("p8_residual_sum",
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
  private val p10Mlp = Q("p10_mlp_inference",
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

  private val aStats = Q("a_stats",
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

  private val aLosses = Q("a_losses",
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

  private val j1Sample = Q("j1_deterministic_sample",
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
  private val j1Gather = Q("j1_gather_sample",
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

  private val j2Td = Q("j2_td_target",
    (s, dir) => JoinOps.tdTarget(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"), lit(0.0), col("value"),
      Gamma, "td_target")
      .select(col("user_id"), col("event_id"), col("td_target"))
      .orderBy(col("user_id"), col("event_id")),
    Some("SELECT user_id, event_id, value + (1.0 - 0.0) * " + d(Gamma) +
      " * coalesce(lead(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id), 0.0) AS td_target " +
      "FROM events ORDER BY user_id, event_id"))

  private val j3Soft = Q("j3_soft_update",
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

  private val w1Discounted = Q("w1_discounted_return",
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

  private val w2Ema = Q("w2_ema_smoothing",
    (s, dir) => SeqOps.emaFinal(Tables.events(s, dir), "user_id",
      Seq("ts", "event_id"), "value", 0.5, "ema")
      .orderBy(col("user_id")),
    Some("""SELECT user_id,
      list_reduce(list(value ORDER BY epoch_ns(ts), event_id), (s, x) -> 0.5*s + 0.5*x) AS ema
      FROM events GROUP BY user_id ORDER BY user_id"""))

  private val w3Sessions = Q("w3_episode_accumulation",
    (s, dir) => SeqOps.sessionAgg(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"))
      .select(col("user_id"), round(col("session_sum"), 4).as("session_sum"),
        col("session_len"), col("session_min"), col("session_max"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, round(sum(value), 4) AS session_sum,
      CAST(count(*) AS BIGINT) AS session_len,
      min(value) AS session_min, max(value) AS session_max
      FROM events GROUP BY user_id ORDER BY user_id"""))

  private val w4Best = Q("w4_best_per_key",
    (s, dir) => SeqOps.bestPerKey(Tables.events(s, dir), Seq("user_id"),
      Seq(col("value").desc, col("event_id").asc))
      .select(col("user_id"), col("event_id"), col("value"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
          row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rk
        FROM events) WHERE rk = 1 ORDER BY user_id"""))

  private val w4Feasible = Q("w4_feasible_best",
    (s, dir) => SeqOps.feasibleBest(Tables.orders(s, dir), col("o_totalprice"), 50000.0,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select(col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 50000.0
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1"""))

  private val w5Cadence = Q("w5_cadence",
    (s, dir) => SeqOps.cadence(Tables.events(s, dir), col("event_id"), 20)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id")),
    Some("SELECT event_id, user_id, value FROM events WHERE event_id % 20 = 0 ORDER BY event_id"))

  private val w6TopN = Q("w6_topn_per_key",
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

  private val cdcLatest = Q("cdc_latest_state",
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
  private val cdcDedupReplay = Q("cdc_dedup_replay",
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
  private val cdcIntervalJoin = Q("cdc_interval_join",
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
  private val cdcScd2 = Q("cdc_scd2_history",
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
  private val cdcChangelog = Q("cdc_changelog_ops",
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

  private val sessWindow = Q("session_windows",
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

  private val tumbling = Q("tumbling_window",
    (s, dir) => StreamingOps.tumblingAgg(Tables.events(s, dir), "1 day")
      .select(col("w_start_us"), col("event_type"), col("n"), round(col("total"), 2).as("total"))
      .orderBy(col("w_start_us"), col("event_type")),
    Some("""SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS w_start_us, event_type,
      CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type"""))

  // ------------------------------------------------------------------
  // engine built-ins over the star schema (SURVEY.md §2.6)
  // ------------------------------------------------------------------

  private val aggPricing = Q("q1_pricing_summary",
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

  private val joinStar = Q("join_star_revenue",
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

  private val semiJoin = Q("semi_join_segments",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
      FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  private val antiJoin = Q("anti_join_customers",
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  private val setOps = Q("set_ops_except",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchasers = ev.where(col("event_type") === "purchase").select(col("user_id"))
      val erroring = ev.where(col("event_type") === "error").select(col("user_id"))
      purchasers.except(erroring).orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT SELECT user_id FROM events WHERE event_type = 'error' ORDER BY user_id"""))

  private val stringDate = Q("string_date_funcs",
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

  private val jsonFuncs = Q("json_extract",
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

  private val x1Exact = Q("x1_exact_dedup",
    (s, dir) => Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("fp")),
    Some("""SELECT md5(regexp_replace(trim(lower(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp,
      min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
      FROM documents GROUP BY fp ORDER BY fp"""))

  private val tokenSetSql =
    """SELECT doc_id, list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS toks
       FROM documents"""

  /** Word 3-gram shingle sets — must mirror Dedup.wordShingles exactly. */
  private val shingleSetSql =
    """SELECT doc_id,
        CASE WHEN len(toks0) >= 3
          THEN list_distinct(list_transform(range(len(toks0)-2),
                 i -> toks0[i+1] || ' ' || toks0[i+2] || ' ' || toks0[i+3]))
          ELSE list_filter([array_to_string(toks0, ' ')], s -> s <> '') END AS toks
       FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks0
             FROM documents)"""

  private val x1Jaccard = Q("x1_jaccard_neardup",
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
  private val x1Containment = Q("x1_containment_pairs",
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

  private val x1Minhash = Q("x1_minhash_signatures",
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

  private val x2TopK = Q("x2_similarity_topk",
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

  private val x3Text = Q("x3_text_analysis",
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

  private val x4Multimodal = Q("x4_multimodal_join",
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

  // ------------------------------------------------------------------
  // batch 2: LSH/simhash dedup, ANN, set/grouping built-ins, running
  // windows, checkpoint/metric plumbing
  // ------------------------------------------------------------------

  /** Shared CTE chain for the shingle→minhash→banding→verify pipeline —
    * reused by the pairs query and the end-to-end dedup query. */
  private def lshPairCtes: String = {
    val sigs = (0 until 8).map { j =>
      s"CAST(min((${Dedup.minhashA(j)}*tok_id + ${Dedup.minhashB(j)}) % ${Dedup.MinhashP}) AS BIGINT) AS mh$j"
    }.mkString(", ")
    val bandSelects = (0 until 2).map { b =>
      val parts = (0 until 4).map(i => s"mh${4 * b + i}").mkString(", '_', ")
      s"SELECT *, $b AS band, concat($parts) AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    val est = (0 until 8).map(i =>
      s"(CASE WHEN l.mh$i = r.mh$i THEN 1.0 ELSE 0.0 END)").mkString(" + ")
    s"""sets AS ($shingleSetSql),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      j AS (SELECT doc_id, ${Dedup.FeatureHashSql} % ${Dedup.MinhashP} AS tok_id FROM tok),
      sig AS (SELECT doc_id, $sigs FROM j GROUP BY doc_id),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
               FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
               WHERE l.doc_id < r.doc_id AND ($est) / 8.0 >= 0.75),
      v AS (SELECT doc_a, doc_b,
              len(list_intersect(a.toks, b.toks)) AS inter, len(a.toks) AS na, len(b.toks) AS nb
            FROM cand JOIN sets a ON cand.doc_a = a.doc_id JOIN sets b ON cand.doc_b = b.doc_id)"""
  }

  /** X1 — near-dup pairs → dedup clusters: connected components by
    * iterative min-label propagation (Dedup.connectedComponents); the
    * oracle computes the same min-reachable-id per node with a recursive
    * CTE over the identical pair set. */
  private val x1Components = Q("x1_dedup_components",
    (s, dir) => {
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        k = 8, r = 4, estMin = 0.75, threshold = 0.8)
      Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("component").as("component_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $lshPairCtes,
      p AS (SELECT doc_a, doc_b FROM v
            WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.8),
      e AS (SELECT doc_a AS src, doc_b AS dst FROM p
            UNION SELECT doc_b AS src, doc_a AS dst FROM p),
      reach AS (SELECT src, dst FROM e
                UNION
                SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
      SELECT src AS doc_id, least(src, min(dst)) AS component_id
      FROM reach GROUP BY src ORDER BY doc_id"""),
    eagerPlan = true)

  private val x1Lsh = Q("x1_minhash_lsh_pairs",
    (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
      k = 8, r = 4, estMin = 0.75, threshold = 0.8)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $lshPairCtes
      SELECT doc_a, doc_b,
        round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
      FROM v WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.8
      ORDER BY doc_a, doc_b"""))

  /** X1 end-to-end: the corpus after exact dedup + near-dup CLUSTER
    * removal — near-dup pairs become connected components and only the
    * min-id representative of each cluster survives (the oracle composes
    * the same recursive-CTE reachability as `x1_dedup_components`). */
  private val x1Pipeline = Q("x1_dedup_pipeline",
    (s, dir) => Dedup.dedupPipeline(Tables.documents(s, dir), "doc_id", "text",
      threshold = 0.8)
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $lshPairCtes,
      p AS (SELECT doc_a, doc_b FROM v
            WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.8),
      e AS (SELECT doc_a AS src, doc_b AS dst FROM p
            UNION SELECT doc_b AS src, doc_a AS dst FROM p),
      reach AS (SELECT src, dst FROM e
                UNION
                SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
      nonreps AS (SELECT src AS doc_id FROM reach
                  GROUP BY src HAVING least(src, min(dst)) <> src),
      exact AS (SELECT min(doc_id) AS keep_id FROM documents
                GROUP BY md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))
      SELECT doc_id FROM documents
      WHERE doc_id IN (SELECT keep_id FROM exact)
        AND NOT EXISTS (SELECT 1 FROM nonreps n WHERE n.doc_id = documents.doc_id)
      ORDER BY doc_id"""),
    eagerPlan = true)

  /** X1 — quality-aware dedup survivor selection: each near-dup cluster
    * keeps its highest-quality member (here `n_chars`; ties → lowest id)
    * over the exact-stage survivors — see
    * [[graft.ops.Dedup.dedupPipelineKeepBest]]. The oracle replays the
    * recursive reachability with a rank-1 window where Spark plans a
    * component-cardinality `max_by` aggregate. */
  private val x1KeepBest = Q("x1_dedup_keep_best",
    (s, dir) => Dedup.dedupPipelineKeepBest(Tables.documents(s, dir), "doc_id", "text",
      quality = col("n_chars"), threshold = 0.8)
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $lshPairCtes,
      p AS (SELECT doc_a, doc_b FROM v
            WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.8),
      e AS (SELECT doc_a AS src, doc_b AS dst FROM p
            UNION SELECT doc_b AS src, doc_a AS dst FROM p),
      reach AS (SELECT src, dst FROM e
                UNION
                SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
      comp AS (SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src),
      exact AS (SELECT min(doc_id) AS keep_id FROM documents
                GROUP BY md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))),
      base AS (SELECT d.doc_id, d.n_chars AS q FROM documents d
               WHERE d.doc_id IN (SELECT keep_id FROM exact)),
      m AS (SELECT b.doc_id, b.q, c.component FROM base b
            LEFT JOIN comp c ON b.doc_id = c.id),
      best AS (SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY component
            ORDER BY q DESC, doc_id ASC) AS rk
          FROM m WHERE component IS NOT NULL) WHERE rk = 1)
      SELECT doc_id FROM m WHERE component IS NULL
      UNION ALL SELECT doc_id FROM best
      ORDER BY doc_id"""),
    eagerPlan = true)

  private val x1Simhash = Q("x1_simhash",
    (s, dir) => Dedup.simhashFingerprint(Tables.documents(s, dir), "doc_id", "text", bits = 16)
      .orderBy(col("doc_id")),
    Some {
      val bitSums = (0 until 16).map { j =>
        s"CAST(sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j"
      }.mkString(", ")
      val fp = (0 until 16).map { j =>
        s"(CASE WHEN s$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH sets AS ($tokenSetSql),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      j AS (SELECT doc_id, ${Dedup.FeatureHashSql} AS h FROM tok),
      agg AS (SELECT doc_id, $bitSums FROM j GROUP BY doc_id)
      SELECT doc_id, $fp AS simhash FROM agg ORDER BY doc_id"""
    })

  private def lshBucketSql(vecExpr: String, bits: Int): String =
    (0 until bits).map { j =>
      s"(CASE WHEN list_sum(list_transform(range(len($vecExpr)), i -> $vecExpr[i+1] * (CAST((i*(${j + 3})) % 11 AS DOUBLE)/10.0 - 0.5))) >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  private val x2Ann = Q("x2_ann_lsh_topk",
    (s, dir) => Similarity.lshTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      pmod(col("vec_id"), lit(100)) === 0, k = 5, bits = 4)
      .orderBy(col("query_id"), col("rk")),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        ${lshBucketSql("(embedding::DOUBLE[])", 4)} AS bucket FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id % 100 = 0),
      scored AS (SELECT query_id, e.vec_id AS cand_id,
          round(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*qv[i+1])))
             * sqrt(list_sum(list_transform(range(len(v)), i -> v[i+1]*v[i+1])))), 6) AS cosine
        FROM e JOIN q USING (bucket) WHERE e.vec_id <> query_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rk
        FROM scored)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, cand_id, cosine
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""))

  /** X2 — ANN quality evaluation: recall@k of the sign-LSH index against
    * the exact brute-force neighbors, per query. The evaluation op a
    * real ANN deployment ships with — index parameters (bits, cells) are
    * tuned against MEASURED recall, not guessed. Exact and LSH top-k run
    * side-by-side over one corpus scan; hits are the (query, cand)
    * intersection via a semi-join. recall = n_hits / min(k, n_exact) —
    * the denominator is the MEASURED per-query exact-candidate count
    * capped at k, and the division takes two exact small integers in
    * IEEE double — bit-identical in both engines. */
  /** Shared recall@k plumbing: ONE pass over the exact top-k — the
    * index's candidate pairs LEFT-join in as a hit marker and a single
    * per-query aggregate folds n_exact and n_hits together. The
    * previous shape referenced the brute-force `exact` frame twice
    * (semi-join hits + denominator count) with nothing cached, so its
    * crossJoin+window subtree executed twice (verified in the r11
    * executed plans — no ReusedExchange spans it). At eval-stripe sizes
    * that second execution is small next to the index-build stages, so
    * this is a plan-shape cleanup more than a headline win; at a larger
    * query stripe the saved pass is the corpus×queries term. Values are
    * identical: recall = n_hits / min(k, n_exact), the
    * measured-denominator contract every recall eval carries. */
  /** FIXED-SIZE query sample for the recall evals (round 15): the stripe
    * `vec_id % 100 == 0 AND vec_id < RecallQueryCap` selects at most
    * RecallQueryCap/100 = 8 queries at ANY corpus size, so the
    * brute-force exact reference each `*_recall` query carries costs
    * O(N·8) instead of O(N²/100) — at 100× the data the eval price grows
    * linearly with the corpus, not quadratically (SCALING.md round-15).
    * At the sf0.01 correctness gate all 5 stripe ids are < 800, so the
    * capped and uncapped stripes are identical there. The topk DEMO
    * queries keep the uncapped stripe: they carry no exact reference
    * (bounded cost already) and several are bench headliners whose
    * workload must stay comparable across rounds. */
  private val RecallQueryCap = 800L
  private def cappedStripe(c: Column): Column =
    pmod(c, lit(100)) === 0 && c < lit(RecallQueryCap)

  private def recallOf(exact: DataFrame, cand: DataFrame, k: Int): DataFrame =
    // the left join counts cand multiplicity into BOTH n_exact and n_hits,
    // so duplicate (query_id, cand_id) candidate rows would silently
    // inflate recall — dedup defensively (eval stripes are tiny; the
    // distinct is noise next to the index build).
    exact.join(cand.select(col("query_id"), col("cand_id")).distinct()
        .withColumn("__hit", lit(1)), Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") / least(col("n_exact"), lit(k.toLong)).cast("double")).as("recall"))
      .orderBy(col("query_id"))

  private val x2AnnRecall = Q("x2_ann_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qp = cappedStripe(col("vec_id"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      val ann = Similarity.lshTopK(emb, "vec_id", "embedding", qp, k = 5, bits = 4)
        .select(col("query_id"), col("cand_id"))
      recallOf(exact, ann, k = 5)
    },
    Some {
      val cosine = """round(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*qv[i+1])))
             * sqrt(list_sum(list_transform(range(len(v)), i -> v[i+1]*v[i+1])))), 6)"""
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        ${lshBucketSql("(embedding::DOUBLE[])", 4)} AS bucket FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e
        WHERE vec_id % 100 = 0 AND vec_id < 800),
      bscored AS (SELECT query_id, e.vec_id AS cand_id, $cosine AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
      brk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rk FROM bscored) WHERE rk <= 5),
      ascored AS (SELECT query_id, e.vec_id AS cand_id, $cosine AS cosine
        FROM e JOIN q USING (bucket) WHERE e.vec_id <> query_id),
      ark AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rk FROM ascored) WHERE rk <= 5),
      hits AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM brk JOIN ark USING (query_id, cand_id) GROUP BY query_id),
      qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM brk GROUP BY query_id)
      SELECT qs.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        coalesce(n_hits, 0) / CAST(least(n_exact, 5) AS DOUBLE) AS recall
      FROM qs LEFT JOIN hits USING (query_id) ORDER BY query_id"""
    })

  private val distinctAgg = Q("distinct_agg",
    (s, dir) => Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(col("l_partkey")).as("n_part"),
      count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val rollupAgg = Q("rollup_agg",
    (s, dir) => Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus")).agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
      CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  private val intersectUsers = Q("set_ops_intersect",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "purchase").select(col("user_id"))
        .intersect(ev.where(col("event_type") === "signup").select(col("user_id")))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT SELECT user_id FROM events WHERE event_type = 'signup' ORDER BY user_id"""))

  private val runningWindow = Q("running_window",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("running_sum",
          round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("running_sum"), col("delta"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
      value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS delta
      FROM events ORDER BY user_id, event_id"""))

  /** S5: checkpoint round-trip — explode the parameter vectors into the
    * canonical (key, idx, value) parameter table (reference state_dict,
    * fawac.py:555-583), reassemble, and re-explode the reassembled vector.
    * A hash match against the directly-exploded oracle proves the snapshot
    * is lossless; the output stays row-shaped so the gate can sort it. */
  private val s5Checkpoint = Q("s5_checkpoint_roundtrip",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).where(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id"), posexplode(col("embedding").cast("array<double>")))
      e.groupBy(col("vec_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("col")))),
          x => x.getField("col")).as("vec"))
        .select(col("vec_id"), posexplode(col("vec")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("col").as("val"))
        .orderBy(col("vec_id"), col("pos"))
    },
    Some("""WITH p AS (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i,
          embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 5 = 0)
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, v[i] AS val
      FROM p ORDER BY vec_id, pos"""))

  /** S6: metric-log sink shape — melt events into (step, key, value) log
    * rows then pivot back per entity (reference logger.store/write,
    * train_fawac_iql.py:145-166). */
  private val s6Metrics = Q("s6_metrics_pivot",
    (s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val aggs = types.map(t =>
        round(sum(when(col("event_type") === t, col("value")).otherwise(0.0)), 4).as(s"${t}_sum"))
      Tables.events(s, dir).groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("user_id"))
    },
    Some {
      val cols = Seq("click", "view", "purchase", "signup", "error").map(t =>
        s"round(sum(CASE WHEN event_type = '$t' THEN value ELSE 0.0 END), 4) AS ${t}_sum")
        .mkString(", ")
      s"SELECT user_id, $cols FROM events GROUP BY user_id ORDER BY user_id"
    })

  /** P7: vector concatenation (reference fawac.py:206 cat([s, a], dim=1)),
    * exploded to (vec_id, pos, sa, dim) rows for the gate's pandas sort. */
  private val p7Concat = Q("p7_vector_concat",
    (s, dir) => {
      val v = col("embedding").cast("array<double>")
      Tables.embeddings(s, dir)
        .select(col("vec_id"), size(v).cast("long").as("dim"),
          posexplode(CoreOps.concatVec(slice(v, 1, 4), slice(v, 61, 4))))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col").as("sa"), col("dim"))
        .orderBy(col("vec_id"), col("pos"))
    },
    Some("""WITH c AS (SELECT vec_id, (embedding::DOUBLE[])[1:4] || (embedding::DOUBLE[])[61:64] AS sa,
          CAST(len(embedding) AS BIGINT) AS dim FROM embeddings)
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, sa[i] AS sa, dim
      FROM (SELECT vec_id, unnest(range(1, len(sa)+1)) AS i, sa, dim FROM c)
      ORDER BY vec_id, pos"""))

  private val inSubquery = Q("in_subquery",
    (s, dir) => {
      val building = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      Tables.orders(s, dir)
        .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      round(sum(o_totalprice), 2) AS total
      FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Runtime-filter join as an explicit operator (BloomJoin): the probe
    * side is pruned by a distributed-built bloom sketch BEFORE its
    * shuffle, then exact-verified by the semi join — result is identical
    * to the plain semi join, which is what the oracle states. */
  private val bloomSemi = Q("bloom_semi_join",
    (s, dir) => {
      val bigOrders = Tables.orders(s, dir).where(col("o_totalprice") > 480000.0)
      BloomJoin.bloomSemiJoin(Tables.lineitem(s, dir), "l_orderkey",
          bigOrders, "o_orderkey", expectedItems = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      round(sum(l_extendedprice), 2) AS revenue
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000.0)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Correlated EXISTS — Catalyst decorrelates to a semi join (verified in
    * PlanSpec); suppliers that ever shipped a near-capacity line. */
  private val existsSubquery = Q("exists_subquery",
    (s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("g_supplier")
      Tables.lineitem(s, dir).createOrReplaceTempView("g_lineitem")
      s.sql("""SELECT s_suppkey, s_name FROM g_supplier s
        WHERE EXISTS (SELECT 1 FROM g_lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.0)
        ORDER BY s_suppkey""")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier s
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.0)
      ORDER BY s_suppkey"""))

  /** Uncorrelated scalar subquery threshold — exact (min/max are
    * order-independent), so the float comparison is bit-identical in both
    * engines: customers richer than every supplier. */
  private val scalarSubquery = Q("scalar_subquery",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("g_customer")
      Tables.supplier(s, dir).createOrReplaceTempView("g_supplier")
      s.sql("""SELECT c_custkey, c_acctbal FROM g_customer
        WHERE c_acctbal > (SELECT max(s_acctbal) FROM g_supplier)
        ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT max(s_acctbal) FROM supplier)
      ORDER BY c_custkey"""))

  /** Equi-width histogram via width_bucket (DuckDB side emulated with the
    * same closed-form floor arithmetic — both engines bucket identical
    * doubles identically). */
  private val histogramBuckets = Q("histogram_buckets",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy(width_bucket(col("l_quantity"), lit(0.0), lit(50.0), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("total_q"))
      .orderBy(col("bucket")),
    Some("""SELECT CAST(floor(l_quantity / 5.0) + 1 AS BIGINT) AS bucket,
      CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS total_q
      FROM lineitem GROUP BY bucket ORDER BY bucket"""))

  /** Stateful EMA as a *streaming* operator (flatMapGroupsWithState,
    * reference soft-update/smoothing J3/W2) run in batch mode — the same
    * code path Structured Streaming executes per micro-batch. Oracle:
    * per-row prefix folds via DuckDB list_reduce (identical recurrence →
    * bit-exact, no rounding). */
  private val statefulEmaQ = Q("stateful_ema_series",
    (s, dir) => {
      import s.implicits._
      // fold order = full NANOSECOND ts with event_id tie-break (same as
      // every other sequence query); ts_us is derived only in the output
      // projection (ADVICE r1: µs-truncated order made ties nondeterministic)
      val ds = Tables.events(s, dir)
        .select(col("user_id").as("key"), col("ts").as("order"),
          col("event_id").as("tie"), col("value"))
        .as[StreamingOps.KeyedValue]
      StreamingOps.statefulEma(ds, 0.5).toDF()
        .select(col("key").as("user_id"), col("tie").as("event_id"),
          expr("`order` div 1000").as("ts_us"), col("ema"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ns, epoch_us(ts) AS us, value FROM events),
      l AS (SELECT user_id, list(value ORDER BY ns, event_id) AS vs,
              list(event_id ORDER BY ns, event_id) AS ids,
              list(us ORDER BY ns, event_id) AS uss
            FROM e GROUP BY user_id),
      x AS (SELECT user_id, unnest(range(1, len(vs)+1)) AS i, vs, ids, uss FROM l)
      SELECT user_id, ids[i] AS event_id, uss[i] AS ts_us,
        list_reduce(vs[1:i], (s, y) -> 0.5*s + 0.5*y) AS ema
      FROM x ORDER BY user_id, event_id"""))

  private val x2NearDup = Q("x2_cosine_neardup",
    (s, dir) => Similarity.cosineNearDup(Tables.embeddings(s, dir), "vec_id", "embedding",
      threshold = 0.35, bits = 4)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        ${lshBucketSql("(embedding::DOUBLE[])", 4)} AS bucket FROM embeddings),
      p AS (SELECT l.vec_id AS id_a, r.vec_id AS id_b,
          round(list_sum(list_transform(range(len(l.v)), i -> l.v[i+1]*r.v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(l.v)), i -> l.v[i+1]*l.v[i+1])))
             * sqrt(list_sum(list_transform(range(len(r.v)), i -> r.v[i+1]*r.v[i+1])))), 6) AS cosine
        FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
      SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.35 ORDER BY id_a, id_b"""))

  /** X2 — bounded-output cosine near-dup view
    * ([[Similarity.cosineNearDupTopK]], r17): same sign-LSH bucket
    * candidate generation as x2_cosine_neardup, but each id keeps only
    * its top-3 partners — ≤ 3 output rows per vector at ANY corpus size
    * (the uncapped pair set measured ×196 at ×10 data). Symmetric view:
    * a qualifying pair ranks under both endpoints. */
  private val x2NearDupTopK = Q("x2_neardup_topk",
    (s, dir) => Similarity.cosineNearDupTopK(Tables.embeddings(s, dir), "vec_id",
      "embedding", threshold = 0.35, bits = 4, k = 3)
      .orderBy(col("id"), col("neighbor_id")),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        ${lshBucketSql("(embedding::DOUBLE[])", 4)} AS bucket FROM embeddings),
      p AS (SELECT l.vec_id AS id, r.vec_id AS neighbor_id,
          round(list_sum(list_transform(range(len(l.v)), i -> l.v[i+1]*r.v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(l.v)), i -> l.v[i+1]*l.v[i+1])))
             * sqrt(list_sum(list_transform(range(len(r.v)), i -> r.v[i+1]*r.v[i+1])))), 6) AS cosine
        FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
      f AS (SELECT * FROM p WHERE cosine >= 0.35),
      rk AS (SELECT id, neighbor_id, cosine, row_number() OVER (PARTITION BY id
          ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM f)
      SELECT id, neighbor_id, cosine FROM rk WHERE rk <= 3
      ORDER BY id, neighbor_id"""))

  /** X2 — sign-LSH hot-bucket skew report
    * ([[Similarity.cosineBucketReport]], r18): every bucket of the cosine
    * near-dup family's blocking key with its member count and the
    * quadratic candidate-pair count the within-bucket join pays there —
    * the diagnosis behind `cosineNearDup`'s `maxBucketSize` guard (one
    * duplicate-saturated corpus region concentrates a bucket no matter
    * the bit width; the r17 30× board measured the uncapped join at
    * 91 s for 16 buckets). The simhash family's skew report
    * (`x1_simhash_bucket_skew`) applied to the embedding side. */
  private val x2CosineSkew = Q("x2_cosine_bucket_skew",
    (s, dir) => Similarity.cosineBucketReport(Tables.embeddings(s, dir), "vec_id",
      "embedding", bits = 4, minVecs = 2),
    Some(s"""WITH e AS (SELECT vec_id,
        ${lshBucketSql("(embedding::DOUBLE[])", 4)} AS bucket
        FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings))
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
        CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs
      FROM e GROUP BY bucket HAVING count(*) >= 2
      ORDER BY n_vecs DESC, bucket"""))

  /** X2 — hot-bucket-GUARDED cosine near-dup
    * ([[Similarity.cosineNearDup]] with `maxBucketSize`, r18): buckets
    * over the cap degrade to a star comparison against the bucket's
    * lowest-id member — O(n) per bucket instead of O(n²), the bounded
    * recall trade `x2_cosine_bucket_skew` prices (capped buckets named
    * there). At sf0.01 the cap splits the 16 buckets into both branches,
    * so this oracle pins all-pairs AND star semantics; at 30× data the
    * guarded form is output- and candidate-bounded where the uncapped
    * `x2_cosine_neardup` join is quadratic per bucket. */
  private val x2NearDupCapped = Q("x2_neardup_capped",
    (s, dir) => Similarity.cosineNearDup(Tables.embeddings(s, dir), "vec_id",
      "embedding", threshold = 0.35, bits = 4, maxBucketSize = Some(40))
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        ${lshBucketSql("(embedding::DOUBLE[])", 4)} AS bucket FROM embeddings),
      st AS (SELECT bucket, count(*) AS n, min(vec_id) AS rep
             FROM e GROUP BY bucket),
      small AS (SELECT l.vec_id AS id_a, r.vec_id AS id_b,
          round(list_sum(list_transform(range(len(l.v)), i -> l.v[i+1]*r.v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(l.v)), i -> l.v[i+1]*l.v[i+1])))
             * sqrt(list_sum(list_transform(range(len(r.v)), i -> r.v[i+1]*r.v[i+1])))), 6) AS cosine
        FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        JOIN st ON st.bucket = l.bucket AND st.n <= 40),
      star AS (SELECT st.rep AS id_a, m.vec_id AS id_b,
          round(list_sum(list_transform(range(len(rv.v)), i -> rv.v[i+1]*m.v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(rv.v)), i -> rv.v[i+1]*rv.v[i+1])))
             * sqrt(list_sum(list_transform(range(len(m.v)), i -> m.v[i+1]*m.v[i+1])))), 6) AS cosine
        FROM e m JOIN st ON st.bucket = m.bucket AND st.n > 40
          AND m.vec_id <> st.rep
        JOIN e rv ON rv.vec_id = st.rep),
      p AS (SELECT * FROM small UNION ALL SELECT * FROM star)
      SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.35
      ORDER BY id_a, id_b"""))

  /** S4: CSV time-series source + sink round-trip (reference make_plots
    * pd.read_csv, notebook cell 1): dump a (step, value) series to CSV with
    * an explicit schema, read it back, EMA-fold it. The oracle reads the
    * same CSV file — proving the format boundary, not just the transform. */
  private val s4Csv = Q("s4_csv_roundtrip",
    (s, dir) => {
      val path = "/tmp/graft_s4_csv_" + Tables.scratchTag(s, dir)
      Tables.events(s, dir)
        .select(col("event_id").as("step"), col("user_id"), col("value"))
        .where(pmod(col("event_id"), lit(4)) === 0)
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("step LONG, user_id LONG, value DOUBLE")
        .csv(path)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("user_id"))
    },
    // oracle computes from the SOURCE table: if the CSV round-trip lost any
    // precision, the Spark side would diverge — and the oracle stays
    // independent of /tmp state across scale factors.
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
      FROM events WHERE event_id % 4 = 0
      GROUP BY user_id ORDER BY user_id"""),
    eagerPlan = true) // constructing runs the CSV sink write

  /** As-of join: every purchase event enriched with the user's most recent
    * at-or-before click (µs) — composed as one conditional window, no join. */
  private val asofJoin = Q("asof_join",
    (s, dir) => JoinOps.asOfLastMarker(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")),
      col("event_type") === "click", expr("ts div 1000"), "last_click_us")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("last_click_us"))
      .orderBy(col("user_id"), col("event_id")),
    Some("""SELECT user_id, event_id, value, last_click_us FROM (
        SELECT user_id, event_id, value, event_type,
          last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
        FROM events)
      WHERE event_type = 'purchase' ORDER BY user_id, event_id"""))

  /** Range/band join: quantities bucketed by a broadcast bands table. */
  private val rangeJoin = Q("range_band_join",
    (s, dir) => {
      import s.implicits._
      val bands = Seq((0.0, 10.0, "low"), (10.0, 30.0, "mid"), (30.0, 100.0, "high"))
        .toDF("lo", "hi", "band")
      JoinOps.bandJoin(Tables.lineitem(s, dir), bands, col("l_quantity"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("band"))
    },
    Some("""WITH bands(lo, hi, band) AS (VALUES (0.0, 10.0, 'low'), (10.0, 30.0, 'mid'), (30.0, 100.0, 'high'))
      SELECT band, CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
      GROUP BY band ORDER BY band"""))

  private val unionUsers = Q("set_ops_union",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "purchase").select(col("user_id"))
        .union(ev.where(col("event_type") === "signup").select(col("user_id")))
        .distinct()
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
      UNION SELECT user_id FROM events WHERE event_type = 'signup' ORDER BY user_id"""))

  private val dateFuncs = Q("date_funcs",
    (s, dir) => Tables.orders(s, dir)
      .withColumn("month_start_us", unix_micros(date_trunc("month", col("o_orderdate"))))
      .groupBy(col("month_start_us"))
      .agg(count(lit(1)).as("n"),
        max(datediff(col("o_orderdate"), to_date(lit("2024-01-01")))).as("max_day_offset"))
      .orderBy(col("month_start_us")),
    Some("""SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
      CAST(count(*) AS BIGINT) AS n,
      CAST(max(datediff('day', DATE '2024-01-01', o_orderdate)) AS INTEGER) AS max_day_offset
      FROM orders GROUP BY 1 ORDER BY month_start_us"""))

  /** X4 media metadata: documents → synthetic binary payload + typed
    * metadata (bytes, checksum) — the decode itself stays a stub, but the
    * binary column, its pruning behavior and checksum plumbing are real
    * and oracle-checked (DuckDB strlen = bytes, md5 = same hex). */
  private val x4Media = Q("x4_media_metadata",
    (s, dir) => {
      val enriched = Multimodal.enrich(Tables.documents(s, dir), "doc_id", "text")
      enriched.select(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.checksum").as("checksum"),
        element_at(col("features"), 1).as("f0"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      md5(text) AS checksum, CAST(strlen(text) AS DOUBLE) AS f0
      FROM documents ORDER BY doc_id"""))

  /** X4 — the TYPED decode path ([[graft.ops.Multimodal.decodeMedia]]:
    * Dataset[MediaRow] → mapPartitions with one codec per partition →
    * Dataset[DecodedMedia]) oracle-checked end-to-end: the stub codec's
    * closed form (width/height from the payload's first/last byte, the
    * 3-dim feature vector) is DuckDB-expressible over the same synthetic
    * UTF-8 payload, so the whole typed plumbing — encoders, partition
    * codec lifecycle, struct schema — is verified against an independent
    * engine, not just a spec. A real codec replaces only the closed
    * form. */
  private val x4Decode = Q("x4_decode_features",
    (s, dir) => {
      import s.implicits._
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"), Multimodal.syntheticMedia(col("text")).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeMedia(rows).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_bytes"),
          // shape assertion: the oracle hard-codes 3, so a codec emitting
          // a wrong-length feature vector fails the gate, not just f0–f2
          size(col("features")).cast("long").as("n_features"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"),
          round(element_at(col("features"), 3), 6).as("f2"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        CAST(strlen(text) AS BIGINT) AS n FROM documents),
      d AS (SELECT doc_id, n,
          CASE WHEN n = 0 THEN 0
            ELSE CAST(('0x' || substr(hx, 1, 2)) AS INT) END AS fb,
          CASE WHEN n = 0 THEN 0
            ELSE CAST(('0x' || substr(hx, -2, 2)) AS INT) END AS lb
        FROM b)
      SELECT doc_id, CAST(1 + fb % 64 AS BIGINT) AS width,
        CAST(1 + lb % 64 AS BIGINT) AS height, n AS n_bytes,
        CAST(3 AS BIGINT) AS n_features,
        round(CAST(n AS DOUBLE), 6) AS f0, round(CAST(fb AS DOUBLE), 6) AS f1,
        round(CAST(lb AS DOUBLE), 6) AS f2
      FROM d ORDER BY doc_id"""))

  /** X4 — REAL format decode ([[Multimodal.decodeBmp]]): each document
    * is wrapped in a genuine 54-byte BMP container
    * ([[Multimodal.syntheticBmp]]) with width/height written as
    * little-endian int32 header fields, and the codec PARSES those bytes
    * back (magic check + offset-18/22 extraction — actual format
    * decoding, pure JVM). The oracle replays the closed-form
    * width/height/byte-count, so the gate proves the builder→parser
    * byte round-trip against an independent engine: a codec that
    * misread endianness, offsets, or the magic would hash-diverge. Same
    * mapPartitions plan shape as the stub path. */
  private val x4DecodeReal = Q("x4_decode_real",
    (s, dir) => {
      import s.implicits._
      val w = (pmod(col("doc_id"), lit(64)) + 1).cast("int")
      val h = (pmod(col("doc_id") * 7, lit(48)) + 1).cast("int")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticBmp(w, h, encode(col("text"), "UTF-8")).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeBmp(rows).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_bytes"),
          size(col("features")).cast("long").as("n_features"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"),
          round(element_at(col("features"), 3), 6).as("f2"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(doc_id % 64 + 1 AS BIGINT) AS w,
        CAST((doc_id * 7) % 48 + 1 AS BIGINT) AS h,
        CAST(54 + strlen(text) AS BIGINT) AS n FROM documents)
      SELECT doc_id, w AS width, h AS height, n AS n_bytes,
        CAST(3 AS BIGINT) AS n_features,
        round(CAST(w AS DOUBLE), 6) AS f0, round(CAST(h AS DOUBLE), 6) AS f1,
        round(CAST(w AS DOUBLE) * h, 6) AS f2
      FROM d ORDER BY doc_id"""))

  /** X4 — PNG decode ([[Multimodal.decodePng]]): the BIG-endian mirror
    * of `x4_decode_real` — each document wrapped in a valid PNG
    * signature + IHDR chunk ([[Multimodal.syntheticPng]]) whose
    * network-order width/height the codec parses back at offsets 16/20.
    * Together the two gates pin BOTH byte orders: a parser that
    * conflated them would pass one and hash-diverge on the other. */
  private val x4DecodePng = Q("x4_decode_png",
    (s, dir) => {
      import s.implicits._
      val w = (pmod(col("doc_id"), lit(48)) + 1).cast("int")
      val h = (pmod(col("doc_id") * 5, lit(64)) + 1).cast("int")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticPng(w, h, encode(col("text"), "UTF-8")).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodePng(rows).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_bytes"),
          size(col("features")).cast("long").as("n_features"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"),
          round(element_at(col("features"), 3), 6).as("f2"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(doc_id % 48 + 1 AS BIGINT) AS w,
        CAST((doc_id * 5) % 64 + 1 AS BIGINT) AS h,
        CAST(33 + strlen(text) AS BIGINT) AS n FROM documents)
      SELECT doc_id, w AS width, h AS height, n AS n_bytes,
        CAST(3 AS BIGINT) AS n_features,
        round(CAST(w AS DOUBLE), 6) AS f0, round(CAST(h AS DOUBLE), 6) AS f1,
        round(CAST(w AS DOUBLE) * h, 6) AS f2
      FROM d ORDER BY doc_id"""))

  /** X4 — pixel-payload statistics ([[Multimodal.bmpPayloadStats]]):
    * feature extraction from REAL bytes end-to-end — the codec reads the
    * pixel-array OFFSET field (LE int32 at byte 10, a header field the
    * geometry gates never exercise) and folds mean/max over the payload
    * from that offset; the oracle replays the fold from the hex dump of
    * the same payload. Byte sum is exact integer arithmetic, so the
    * mean divides identically on both engines. */
  private val x4PixelStats = Q("x4_pixel_stats",
    (s, dir) => {
      import s.implicits._
      val w = (pmod(col("doc_id"), lit(64)) + 1).cast("int")
      val h = (pmod(col("doc_id") * 7, lit(48)) + 1).cast("int")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticBmp(w, h, encode(col("text"), "UTF-8")).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.bmpPayloadStats(rows).toDF()
        .select(col("doc_id"), col("n_payload"),
          round(col("mean_byte"), 6).as("mean_byte"), col("max_byte"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        CAST(strlen(text) AS BIGINT) AS n FROM documents),
      e AS (SELECT doc_id, n, list_transform(range(CAST(n AS INT)),
          i -> CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS INT)) AS bs
        FROM b)
      SELECT doc_id, n AS n_payload,
        round(CAST(coalesce(list_sum(bs), 0) AS DOUBLE)
          / greatest(CAST(n AS DOUBLE), 1.0), 6) AS mean_byte,
        CAST(coalesce(list_aggregate(bs, 'max'), 0) AS BIGINT) AS max_byte
      FROM e ORDER BY doc_id"""))

  /** X4 — JPEG header decode ([[Multimodal.decodeJpeg]]): each document
    * wrapped in a valid JFIF prefix ([[Multimodal.syntheticJpeg]]) whose
    * frame header the codec reaches by WALKING the marker-segment
    * stream (an APP0 and a COM segment sit in front, each skipped by its
    * own length field) and whose height/width are BIG-endian 16-bit —
    * the third byte-width variant after BMP's LE32 and PNG's BE32, plus
    * the 4:2:0 chroma-subsampling factors a photographic corpus
    * actually carries. Odd doc_ids get a PROGRESSIVE (SOF2) frame —
    * the format most real crawl JPEGs ship — proving the codec parses
    * geometry from both baseline and progressive headers. */
  private val x4DecodeJpeg = Q("x4_decode_jpeg",
    (s, dir) => {
      import s.implicits._
      val w = (pmod(col("doc_id"), lit(80)) + 1).cast("int")
      val h = (pmod(col("doc_id") * 3, lit(60)) + 1).cast("int")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticJpeg(w, h, encode(col("text"), "UTF-8"),
            progressive = pmod(col("doc_id"), lit(2)) === 1).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeJpeg(rows).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_bytes"),
          col("n_components").cast("long").as("n_components"),
          col("subsampling"), col("sof_type"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(doc_id % 80 + 1 AS BIGINT) AS width,
        CAST((doc_id * 3) % 60 + 1 AS BIGINT) AS height,
        CAST(48 + strlen(text) AS BIGINT) AS n_bytes,
        CAST(3 AS BIGINT) AS n_components, '4:2:0' AS subsampling,
        CASE WHEN doc_id % 2 = 1 THEN 'progressive' ELSE 'baseline' END
          AS sof_type
      FROM documents ORDER BY doc_id"""))

  /** X4 — EXIF orientation decode ([[Multimodal.decodeExif]]): each
    * document wrapped in a JPEG whose APP1/Exif block carries the
    * orientation tag in a REAL TIFF structure — little-endian ("II") for
    * even doc_ids, big-endian ("MM") for odd, so the codec must parse
    * with the endianness the payload itself declares (the dual-endian
    * format family BMP/PNG/SOF don't exercise). Orientations 5–8
    * transpose the raster, so the effective dimensions swap — the fact
    * resize/crop planning must honor on a real photo corpus. */
  private val x4ExifOrientation = Q("x4_exif_orientation",
    (s, dir) => {
      import s.implicits._
      val w = (pmod(col("doc_id"), lit(80)) + 1).cast("int")
      val h = (pmod(col("doc_id") * 3, lit(60)) + 1).cast("int")
      val orient = (pmod(col("doc_id"), lit(8)) + 1).cast("int")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticExifJpeg(w, h, orient,
            littleEndian = pmod(col("doc_id"), lit(2)) === 0,
            payload = encode(col("text"), "UTF-8")).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeExif(rows).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("orientation").cast("long").as("orientation"),
          col("effective_w").cast("long").as("effective_w"),
          col("effective_h").cast("long").as("effective_h"),
          col("byte_order"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(doc_id % 80 + 1 AS BIGINT) AS width,
        CAST((doc_id * 3) % 60 + 1 AS BIGINT) AS height,
        CAST(doc_id % 8 + 1 AS BIGINT) AS orientation FROM documents)
      SELECT doc_id, width, height, orientation,
        CASE WHEN orientation >= 5 THEN height ELSE width END AS effective_w,
        CASE WHEN orientation >= 5 THEN width ELSE height END AS effective_h,
        CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order
      FROM d ORDER BY doc_id"""))

  /** X4 — WAV audio header decode ([[Multimodal.decodeWav]]): the audio
    * modality's REAL codec (images have BMP/PNG/JPEG/EXIF). Each
    * document gets a spec-valid RIFF/WAVE payload with per-row PCM
    * params and a LIST chunk the walk must skip by length; the codec
    * re-reads format fields (checking the byte-rate/block-align
    * equations), counts frames from the data chunk, and derives the
    * exact integer duration — the stats an audio curation pipeline
    * filters on. */
  private val x4DecodeWav = Q("x4_decode_wav",
    (s, dir) => {
      import s.implicits._
      val rate = (lit(8000) + pmod(col("doc_id"), lit(5)) * 2000).cast("int")
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
      val bits = (ch * 8).cast("int") // frame = 1 or 4 bytes
      val k = ((pmod(col("doc_id"), lit(100)) + 1) * 2).cast("int")
      val data = encode(repeat(lit("ab"), k), "UTF-8") // 4·(d%100+1) bytes
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticWav(rate, ch, bits, data).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeWav(rows).toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_frames"), col("duration_us"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS sample_rate,
        CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        CAST((doc_id % 2 + 1) * 8 AS BIGINT) AS bits_per_sample,
        CAST(4 * (doc_id % 100 + 1) AS BIGINT) AS nbytes FROM documents)
      SELECT doc_id, sample_rate, channels, bits_per_sample,
        nbytes // (channels * bits_per_sample // 8) AS n_frames,
        (nbytes // (channels * bits_per_sample // 8)) * 1000000 // sample_rate
          AS duration_us
      FROM d ORDER BY doc_id"""))

  /** X4 — MP4 container decode ([[Multimodal.decodeMp4]]): the video
    * modality's REAL codec. Big-endian ISO-BMFF box walk (sizes include
    * their own header — a third container discipline after JPEG
    * segments and RIFF chunks), recursion into moov for the mvhd,
    * exact integer duration from timescale/ticks, box census, and mdat
    * payload size — with the classic timescales (600/1000/90000) mixed
    * across rows. Odd doc_ids carry a VERSION-1 mvhd whose 64-bit
    * duration exceeds uint32 (what real encoders emit for long
    * material), and doc_id%4==3 rows additionally use the size==1 +
    * 64-bit largesize mdat header (the >4 GiB file form) — so both
    * wide-field reads are oracle-gated, not just spec-gated. */
  private val x4DecodeMp4 = Q("x4_decode_mp4",
    (s, dir) => {
      import s.implicits._
      val ts = when(pmod(col("doc_id"), lit(3)) === 0, lit(600L))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit(1000L))
        .otherwise(lit(90000L))
      val v1 = pmod(col("doc_id"), lit(2)) === 1
      val ticks = (pmod(col("doc_id"), lit(1000)) + 1) * lit(600L) +
        when(v1, lit(1L << 32)).otherwise(lit(0L))
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticMp4(ts, ticks,
            encode(col("text"), "UTF-8"), mvhdV1 = v1,
            largesizeMdat = pmod(col("doc_id"), lit(4)) === 3).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeMp4(rows).toDF()
        .select(col("doc_id"), col("timescale"), col("duration_ticks"),
          col("duration_us"), col("n_boxes").cast("long").as("n_boxes"),
          col("mdat_bytes"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END
          AS timescale,
        (doc_id % 1000 + 1) * 600
          + CASE WHEN doc_id % 2 = 1 THEN 4294967296 ELSE 0 END
          AS duration_ticks,
        CAST(strlen(text) AS BIGINT) AS mdat_bytes FROM documents)
      SELECT doc_id, CAST(timescale AS BIGINT) AS timescale,
        CAST(duration_ticks AS BIGINT) AS duration_ticks,
        CAST(duration_ticks * 1000000 // timescale AS BIGINT) AS duration_us,
        CAST(4 AS BIGINT) AS n_boxes, mdat_bytes
      FROM d ORDER BY doc_id"""))

  /** X4 — WAV format-envelope decode ([[Multimodal.decodeWav]] over the
    * three fmt-chunk forms real crawl audio ships): plain PCM (tag 1),
    * IEEE float (tag 3, 32-bit), and WAVE_FORMAT_EXTENSIBLE (tag
    * 0xFFFE — cbSize/validBits checked, SubFormat GUID resolved to
    * PCM 24-bit / float 64-bit) cycled across rows, with the resolved
    * `format` name reported. The duration math is the same exact
    * integer arithmetic regardless of form. */
  private val x4DecodeWavExt = Q("x4_decode_wav_ext",
    (s, dir) => {
      import s.implicits._
      val mode = when(pmod(col("doc_id"), lit(4)) === 0, lit("pcm"))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit("float"))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit("ext_pcm"))
        .otherwise(lit("ext_float"))
      val bits = when(pmod(col("doc_id"), lit(4)) === 0, lit(16))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit(32))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit(24))
        .otherwise(lit(64))
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
      val rate = (lit(16000) + pmod(col("doc_id"), lit(3)) * 8000).cast("int")
      // 48 = lcm of every frame size above → always frame-aligned
      val k = (pmod(col("doc_id"), lit(40)) + 1).cast("int")
      val data = encode(repeat(lit("abcdefgh"), k * 6), "UTF-8")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticWav(rate, ch, bits, data, mode).as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeWav(rows).toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_frames"), col("duration_us"), col("format"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CASE doc_id % 4 WHEN 0 THEN 'pcm' WHEN 1 THEN 'float'
          WHEN 2 THEN 'ext_pcm' ELSE 'ext_float' END AS format,
        CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 32
          WHEN 2 THEN 24 ELSE 64 END AS bits,
        doc_id % 2 + 1 AS ch,
        16000 + (doc_id % 3) * 8000 AS rate,
        48 * (doc_id % 40 + 1) AS nbytes FROM documents)
      SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
        CAST(ch AS BIGINT) AS channels,
        CAST(bits AS BIGINT) AS bits_per_sample,
        CAST(nbytes // (ch * bits // 8) AS BIGINT) AS n_frames,
        CAST((nbytes // (ch * bits // 8)) * 1000000 // rate AS BIGINT)
          AS duration_us,
        format
      FROM d ORDER BY doc_id"""))

  /** X4 — image curation pipeline as ONE declarative DAG: EXIF decode
    * ([[Multimodal.decodeExif]], mixed II/MM endianness and mixed
    * orientations) → the standard crawl-image quality gates on the
    * ORIENTATION-CORRECTED geometry (aspect ∈ [0.5, 2], area ≥ 400 px —
    * apply them to raw dims and every rotated portrait/landscape is
    * misjudged, which is why the codec parses orientation at all) →
    * aspect-preserving 224×224 resize planning
    * ([[Multimodal.resizeFit]]). Codec + filter + plan in one map-only
    * chain: no shuffle anywhere. */
  private val x4ImageCuration = Q("x4_image_curation",
    (s, dir) => {
      import s.implicits._
      val w = (pmod(col("doc_id"), lit(80)) + 1).cast("int")
      val h = (pmod(col("doc_id") * 3, lit(60)) + 1).cast("int")
      val orient = (pmod(col("doc_id"), lit(8)) + 1).cast("int")
      val rows = Tables.documents(s, dir)
        .select(col("doc_id"),
          Multimodal.syntheticExifJpeg(w, h, orient,
            littleEndian = pmod(col("doc_id"), lit(2)) === 0,
            payload = encode(col("text"), "UTF-8")).as("media"))
        .as[Multimodal.MediaRow]
      val (outW, outH) = Multimodal.resizeFit(
        col("effective_w").cast("double"), col("effective_h").cast("double"),
        224, 224)
      Multimodal.decodeExif(rows).toDF()
        .where((col("effective_w").cast("double") / col("effective_h"))
          .between(0.5, 2.0) &&
          col("effective_w") * col("effective_h") >= 400)
        .select(col("doc_id"),
          col("orientation").cast("long").as("orientation"),
          col("effective_w").cast("long").as("effective_w"),
          col("effective_h").cast("long").as("effective_h"),
          outW.as("out_w"), outH.as("out_h"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(doc_id % 80 + 1 AS BIGINT) AS w,
        CAST((doc_id * 3) % 60 + 1 AS BIGINT) AS h,
        CAST(doc_id % 8 + 1 AS BIGINT) AS o FROM documents),
      e AS (SELECT doc_id, o,
        CASE WHEN o >= 5 THEN h ELSE w END AS ew,
        CASE WHEN o >= 5 THEN w ELSE h END AS eh FROM d),
      f AS (SELECT * FROM e
        WHERE CAST(ew AS DOUBLE) / eh BETWEEN 0.5 AND 2.0
          AND ew * eh >= 400),
      r AS (SELECT doc_id, o, ew, eh,
        least(224.0 / ew, 224.0 / eh, 1.0) AS sc FROM f)
      SELECT doc_id, o AS orientation, ew AS effective_w, eh AS effective_h,
        CAST(greatest(floor(ew * sc), 1.0) AS BIGINT) AS out_w,
        CAST(greatest(floor(eh * sc), 1.0) AS BIGINT) AS out_h
      FROM r ORDER BY doc_id"""))

  /** X4 — heterogeneous media duration budget: a mixed corpus (even
    * doc_ids carry WAV audio, odd carry MP4 video) decoded by the
    * matching codec, gated on modality-appropriate duration windows,
    * and rolled up to the per-modality budget — the "how many hours
    * survive curation" accounting a multimodal training-data pipeline
    * plans capacity with. Durations are exact integer µs from both
    * codecs, so the rollup is float-free. */
  private val x4MediaBudget = Q("x4_media_duration_budget",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val audioSrc = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val rate = (lit(8000) + pmod(col("doc_id"), lit(5)) * 2000).cast("int")
      val k = ((pmod(col("doc_id"), lit(100)) + 1)).cast("int")
      val audio = Multimodal.decodeWav(
        audioSrc.select(col("doc_id"),
          Multimodal.syntheticWav(rate, lit(1), lit(8),
            encode(repeat(lit("abcd"), k), "UTF-8")).as("media"))
          .as[Multimodal.MediaRow]).toDF()
        .select(lit("audio").as("modality"), col("duration_us"),
          (col("duration_us") >= 10000L).as("kept"))
      val ts = when(pmod(col("doc_id"), lit(3)) === 0, lit(600L))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit(1000L))
        .otherwise(lit(90000L))
      val ticks = (pmod(col("doc_id"), lit(1000)) + 1) * lit(600L)
      val video = Multimodal.decodeMp4(
        docs.where(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"),
            Multimodal.syntheticMp4(ts, ticks, lit(Array.emptyByteArray))
              .as("media"))
          .as[Multimodal.MediaRow]).toDF()
        .select(lit("video").as("modality"), col("duration_us"),
          col("duration_us").between(1000000L, 300000000L).as("kept"))
      audio.unionByName(video)
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("kept").cast("long")).as("n_kept"),
          sum(when(col("kept"), col("duration_us")).otherwise(lit(0L)))
            .as("kept_duration_us"))
        .orderBy(col("modality"))
    },
    Some("""WITH a AS (SELECT doc_id,
        (4 * (doc_id % 100 + 1)) * 1000000
          // (8000 + (doc_id % 5) * 2000) AS dur
        FROM documents WHERE doc_id % 2 = 0),
      v AS (SELECT doc_id,
        ((doc_id % 1000 + 1) * 600) * 1000000
          // (CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
             ELSE 90000 END) AS dur
        FROM documents WHERE doc_id % 2 = 1),
      u AS (SELECT 'audio' AS modality, dur,
              CASE WHEN dur >= 10000 THEN 1 ELSE 0 END AS kept FROM a
            UNION ALL
            SELECT 'video', dur,
              CASE WHEN dur BETWEEN 1000000 AND 300000000 THEN 1 ELSE 0 END
            FROM v)
      SELECT modality, CAST(count(*) AS BIGINT) AS n_total,
        CAST(sum(kept) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN kept = 1 THEN dur ELSE 0 END) AS BIGINT)
          AS kept_duration_us
      FROM u GROUP BY modality ORDER BY modality"""))

  /** X4 — FULL PNG pixel round-trip ([[Multimodal.buildFullPng]] →
    * [[Multimodal.decodePngPixels]]): per document, a deterministic RGB
    * image (`byte(i) = (doc_id·31 + i·7) mod 256`) is filtered (all five
    * PNG filter types, one per scanline), DEFLATED into a real zlib
    * stream split across two IDAT chunks, and decoded back through the
    * full chunk-walk → CRC32-validate → inflate → defilter path; the
    * oracle replays the per-channel means and global max from the
    * closed-form byte formula, so a codec that miscomputed ANY filter
    * inverse, CRC, or chunk boundary hash-diverges. Exact integer sums
    * divide identically in IEEE double on both engines. */
  private val x4PngRoundtrip = Q("x4_png_roundtrip",
    (s, dir) => {
      import s.implicits._
      val rows = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 24 + 1).toInt
          val h = ((id * 5) % 16 + 2).toInt
          val rgb = Array.tabulate(w * h * 3)(i =>
            ((id * 31 + i.toLong * 7) % 256).toByte)
          Multimodal.MediaRow(id, Multimodal.buildFullPng(w, h, rgb))
        })
      Multimodal.decodePngPixels(rows).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("n_pixels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          col("max_byte"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(doc_id % 24 + 1 AS BIGINT) AS w,
        CAST((doc_id * 5) % 16 + 2 AS BIGINT) AS h FROM documents),
      px AS (SELECT doc_id, w, h,
        list_transform(range(CAST(w * h AS INT)),
          j -> (doc_id * 31 + (3 * j) * 7) % 256) AS rs,
        list_transform(range(CAST(w * h AS INT)),
          j -> (doc_id * 31 + (3 * j + 1) * 7) % 256) AS gs,
        list_transform(range(CAST(w * h AS INT)),
          j -> (doc_id * 31 + (3 * j + 2) * 7) % 256) AS bs FROM d)
      SELECT doc_id, w AS width, h AS height, w * h AS n_pixels,
        round(CAST(list_sum(rs) AS DOUBLE) / (w * h), 6) AS mean_r,
        round(CAST(list_sum(gs) AS DOUBLE) / (w * h), 6) AS mean_g,
        round(CAST(list_sum(bs) AS DOUBLE) / (w * h), 6) AS mean_b,
        CAST(greatest(list_aggregate(rs, 'max'), list_aggregate(gs, 'max'),
          list_aggregate(bs, 'max')) AS BIGINT) AS max_byte
      FROM px ORDER BY doc_id"""))

  /** X4 — media near-dup pairs ([[Multimodal.mediaNearDupPairs]]):
    * checksum-collapse → quantized-feature band → exact L2 verify; the
    * L2 fold runs in dimension order on both engines and rounds at 6. */
  private val x4MediaDedup = Q("x4_media_dedup",
    (s, dir) => Multimodal.mediaNearDupPairs(Tables.documents(s, dir),
        "doc_id", "text", lenBand = 16, maxDist = 5.0)
      .orderBy(col("doc_a"), col("doc_b")),
    Some("""WITH b AS (SELECT doc_id, text, encode(text) AS bin FROM documents),
      h AS (SELECT doc_id, md5(text) AS ck, hex(bin) AS hx,
          CAST(octet_length(bin) AS DOUBLE) AS n FROM b),
      f0 AS (SELECT doc_id, ck, [n,
          CASE WHEN n = 0 THEN 0.0
            ELSE CAST(CAST(('0x' || substr(hx, 1, 2)) AS INT) AS DOUBLE) END,
          CASE WHEN n = 0 THEN 0.0
            ELSE CAST(CAST(('0x' || substr(hx, -2, 2)) AS INT) AS DOUBLE) END,
          CAST(CAST(('0x' || substr(ck, 1, 1)) AS INT) AS DOUBLE)] AS feats
        FROM h),
      reps AS (SELECT ck, min(doc_id) AS doc_id FROM f0 GROUP BY ck),
      f AS (SELECT f0.doc_id, feats,
          CAST(CAST(floor(feats[1] / 16.0) AS BIGINT) AS VARCHAR) || ':' ||
          CAST(CAST(feats[2] AS BIGINT) AS VARCHAR) || ':' ||
          CAST(CAST(feats[3] AS BIGINT) AS VARCHAR) AS band
        FROM f0 JOIN reps ON reps.ck = f0.ck AND reps.doc_id = f0.doc_id),
      pairs AS (SELECT l.doc_a, l.doc_b, sqrt(list_sum(list_transform(
            range(4), i -> (l.fa[i+1] - l.fb[i+1]) * (l.fa[i+1] - l.fb[i+1]))))
          AS dist
        FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.feats AS fa, b.feats AS fb
          FROM f a JOIN f b ON a.band = b.band AND a.doc_id < b.doc_id) l)
      SELECT doc_a, doc_b, round(dist, 6) AS dist
      FROM pairs WHERE dist <= 5.0 ORDER BY doc_a, doc_b"""))

  /** The same as-of semantics through the CUSTOM OPERATOR stack
    * (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec): its oracle is the
    * identical window-composed SQL, so the physical operator's merge is
    * verified row-for-row against an independent formulation. */
  private val asofCustom = Q("asof_join_custom_operator",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          expr("ts div 1000").as("last_click_us"))
      JoinOps.asOfJoin(purchases, clicks, "user_id", "c_user", "ts", "c_ts")
        .select(col("user_id"), col("event_id"), col("value"), col("last_click_us"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, value, last_click_us FROM (
        SELECT user_id, event_id, value, event_type,
          max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
            OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
        FROM events)
      WHERE event_type = 'purchase' ORDER BY user_id, event_id"""))

  /** Forward as-of through the custom operator: each purchase enriched
    * with the user's EARLIEST click at-or-after it. Times are µs on BOTH
    * sides (Spark `ts div 1000` of the nanos long, DuckDB `epoch_us`), so
    * the comparison basis is engine-identical; the payload is the matched
    * time itself, so equal-µs ties collapse to one value and first-vs-last
    * tie choice cannot affect the hash. */
  private val asofForward = Q("asof_join_forward",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"),
          expr("ts div 1000").as("t_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), expr("ts div 1000").as("c_us"))
      JoinOps.asOfJoin(purchases, clicks, "user_id", "c_user", "t_us", "c_us",
        direction = "forward")
        .select(col("user_id"), col("event_id"), col("value"),
          col("c_us").as("next_click_us"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT p.user_id, p.event_id, p.value,
        (SELECT min(epoch_us(c.ts)) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND epoch_us(c.ts) >= epoch_us(p.ts)) AS next_click_us
      FROM events p WHERE p.event_type = 'purchase'
      ORDER BY p.user_id, p.event_id"""))

  /** Nearest as-of with a tolerance bound: each purchase matched to the
    * temporally closest click within ±1 day (µs both sides), equal-distance
    * ties to the earlier (backward) click. ~1 day sits between the median
    * (~18 h) and 90th-pct (~62 h) nearest-click gap in the synthetic
    * events, so the oracle exercises match, tie and out-of-tolerance NULL
    * rows at every scale factor. */
  private val asofNearest = Q("asof_join_nearest",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"),
          expr("ts div 1000").as("t_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), expr("ts div 1000").as("c_us"))
      JoinOps.asOfJoin(purchases, clicks, "user_id", "c_user", "t_us", "c_us",
        direction = "nearest", tolerance = Some(86400000000L))
        .select(col("user_id"), col("event_id"), col("value"),
          col("c_us").as("near_click_us"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH p AS (SELECT user_id, event_id, value, epoch_us(ts) AS t
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS cu, epoch_us(ts) AS cus
          FROM events WHERE event_type = 'click'),
        j AS (SELECT user_id, event_id, cus, row_number() OVER (
              PARTITION BY user_id, event_id
              ORDER BY abs(cus - t) ASC,
                       CASE WHEN cus <= t THEN 0 ELSE 1 END ASC) AS rk
            FROM p JOIN c ON p.user_id = c.cu
            WHERE abs(cus - t) <= 86400000000)
      SELECT p.user_id, p.event_id, p.value, j.cus AS near_click_us
      FROM p LEFT JOIN j ON p.user_id = j.user_id AND p.event_id = j.event_id
        AND j.rk = 1
      ORDER BY p.user_id, p.event_id"""))

  /** RANGE-frame window (vs ROWS frames elsewhere): per user, the rolling
    * 1-hour event-time sum — frame bounds in value space, not row counts. */
  private val rangeFrame = Q("range_frame_window",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0L)
      ev.withColumn("hour_sum", round(sum(col("value")).over(w), 4))
        .select(col("user_id"), col("event_id"), col("hour_sum"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS hour_sum
      FROM events ORDER BY user_id, event_id"""))

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), i -> $a[i+1]*$b[i+1]))"

  /** X2 IVF ANN: deterministic centroids → nearest-centroid cells →
    * per-cell search. Cell assignment (argmin squared L2, centroid-id
    * tie-break) is bit-reproducible in the oracle. */
  private val x2Ivf = Q("x2_ivf_topk",
    (s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      centroidPred = pmod(col("vec_id"), lit(97)) === 3,
      queryPred = pmod(col("vec_id"), lit(100)) === 0, k = 5)
      .orderBy(col("query_id"), col("rk")),
    Some {
      val dvv = dotSql("v", "v"); val dvc = dotSql("v", "cv"); val dcc = dotSql("cv", "cv")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 97 = 3),
      assign AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.centroid_id AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY (($dvv - 2*$dvc) + $dcc) ASC, c.centroid_id ASC) AS rk
          FROM e CROSS JOIN c) WHERE rk = 1),
      corpus AS (SELECT e.vec_id AS cand_id, v AS cvv, cell FROM e JOIN assign ON e.vec_id = assign.vec_id),
      q AS (SELECT e.vec_id AS query_id, v AS qv, cell FROM e JOIN assign ON e.vec_id = assign.vec_id
            WHERE e.vec_id % 100 = 0),
      scored AS (SELECT query_id, cand_id,
          round(${dotSql("qv", "cvv")}
            / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cvv", "cvv")})), 6) AS cosine
        FROM corpus JOIN q USING (cell) WHERE cand_id <> query_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rk
        FROM scored)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, cand_id, cosine
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
    })

  /** X2 — IVF index recall@k vs exact neighbors (sibling of
    * [[x2AnnRecall]] for the second ANN path): with cells ~√N a query
    * scans only its own cell, and this measures exactly what that
    * sacrifice costs. The cells-vs-recall trade is THE production tuning
    * knob for IVF (probe more cells ↔ higher recall); tuning it needs
    * this measurement. */
  private val x2IvfRecall = Q("x2_ivf_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qp = cappedStripe(col("vec_id"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        centroidPred = pmod(col("vec_id"), lit(97)) === 3, queryPred = qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      recallOf(exact, ivf, k = 5)
    },
    Some {
      val dvv = dotSql("v", "v"); val dvc = dotSql("v", "cv"); val dcc = dotSql("cv", "cv")
      val cosine = s"""round(${dotSql("qv", "cvv")}
            / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cvv", "cvv")})), 6)"""
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 97 = 3),
      assign AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.centroid_id AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY (($dvv - 2*$dvc) + $dcc) ASC, c.centroid_id ASC) AS rk
          FROM e CROSS JOIN c) WHERE rk = 1),
      corpus AS (SELECT e.vec_id AS cand_id, v AS cvv, cell
        FROM e JOIN assign ON e.vec_id = assign.vec_id),
      q AS (SELECT e.vec_id AS query_id, v AS qv, cell
        FROM e JOIN assign ON e.vec_id = assign.vec_id
        WHERE e.vec_id % 100 = 0 AND e.vec_id < 800),
      iscored AS (SELECT query_id, cand_id, $cosine AS cosine
        FROM corpus JOIN q USING (cell) WHERE cand_id <> query_id),
      irk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rk FROM iscored) WHERE rk <= 5),
      bscored AS (SELECT query_id, e.vec_id AS cand_id,
          round(${dotSql("qv", "v")}
            / (sqrt(${dotSql("qv", "qv")}) * sqrt($dvv)), 6) AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
      brk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rk FROM bscored) WHERE rk <= 5),
      hits AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM brk JOIN irk USING (query_id, cand_id) GROUP BY query_id),
      qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM brk GROUP BY query_id)
      SELECT qs.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        coalesce(n_hits, 0) / CAST(least(n_exact, 5) AS DOUBLE) AS recall
      FROM qs LEFT JOIN hits USING (query_id) ORDER BY query_id"""
    })

  /** X2 multi-probe IVF: each query searches its 2 nearest cells — the
    * production recall lever [[x2IvfRecall]] measures the need for. The
    * corpus keeps the single-cell broadcast-fold assignment; only the
    * (tiny) query side expands, to nprobe rows per query. */
  private val x2IvfNprobe = Q("x2_ivf_nprobe_topk",
    (s, dir) => Similarity.ivfTopKProbe(Tables.embeddings(s, dir), "vec_id", "embedding",
      centroidPred = pmod(col("vec_id"), lit(97)) === 3,
      queryPred = pmod(col("vec_id"), lit(100)) === 0, k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("rk")),
    Some {
      val dvv = dotSql("v", "v"); val dvc = dotSql("v", "cv"); val dcc = dotSql("cv", "cv")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 97 = 3),
      assign AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.centroid_id AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY (($dvv - 2*$dvc) + $dcc) ASC, c.centroid_id ASC) AS rk
          FROM e CROSS JOIN c) WHERE rk = 1),
      qprobe AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, c.centroid_id AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY (($dvv - 2*$dvc) + $dcc) ASC, c.centroid_id ASC) AS rk
          FROM e CROSS JOIN c WHERE e.vec_id % 100 = 0) WHERE rk <= 2),
      corpus AS (SELECT e.vec_id AS cand_id, v AS cvv, cell
        FROM e JOIN assign ON e.vec_id = assign.vec_id),
      q AS (SELECT e.vec_id AS query_id, v AS qv, cell
        FROM e JOIN qprobe ON e.vec_id = qprobe.vec_id),
      scored AS (SELECT query_id, cand_id,
          round(${dotSql("qv", "cvv")}
            / (sqrt(${dotSql("qv", "qv")}) * sqrt(${dotSql("cvv", "cvv")})), 6) AS cosine
        FROM corpus JOIN q USING (cell) WHERE cand_id <> query_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS rk FROM scored)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, cand_id, cosine
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
    })

  /** Skew-resistant salted two-stage aggregation — identical results to the
    * direct groupBy (the oracle is the direct form), different shuffle
    * profile: the hot key spreads over 16 salt buckets before merging. */
  private val saltedAgg = Q("salted_agg",
    (s, dir) => AggOps.saltedSum(Tables.events(s, dir), "event_type", "value",
      saltBuckets = 16, saltSource = col("event_id"))
      .select(col("event_type"), col("n"), round(col("total"), 4).as("total"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      round(sum(value), 4) AS total
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Analytic rank functions over a fully-deterministic ordering
    * (value, event_id) — rank/percent_rank/cume_dist/ntile divisions are
    * exact int ratios, identical in both engines. */
  private val analyticFuncs = Q("analytic_rank_funcs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      Tables.events(s, dir).select(col("user_id"), col("event_id"),
        rank().over(w).cast("long").as("rnk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      CAST(rank() OVER w AS BIGINT) AS rnk,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY user_id, event_id"""))

  private val cubeAgg = Q("cube_agg",
    (s, dir) => Tables.events(s, dir)
      .cube(col("event_type"), pmod(col("user_id"), lit(3)).as("user_bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .orderBy(col("event_type").asc_nulls_first, col("user_bucket").asc_nulls_first),
    Some("""SELECT event_type, user_id % 3 AS user_bucket,
      CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
      FROM events GROUP BY CUBE (event_type, user_bucket)
      ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST"""))

  /** §3.4 notebook pipeline: per-series truncation to the first ⌊n/2⌋+1
    * points (make_plots cell 4) then EMA smoothing (cell 5) — an ordered
    * fold over the truncated prefix, bit-exact in both engines. */
  private val notebookSmoothing = Q("notebook_truncate_ema",
    (s, dir) => {
      val series = array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
      val xs = transform(series, r => r.getField("value"))
      val used = slice(xs, lit(1), floor(size(xs) / lit(2)).cast("int") + lit(1))
      val ema = aggregate(
        slice(used, lit(2), greatest(size(used) - 1, lit(0))),
        element_at(used, 1),
        (acc, x) => lit(0.5) * acc + lit(0.5) * x)
      Tables.events(s, dir).groupBy(col("user_id"))
        .agg(size(xs).cast("long").as("n_points"),
          size(used).cast("long").as("n_used"), ema.as("ema"))
        .orderBy(col("user_id"))
    },
    Some("""WITH l AS (SELECT user_id, list(value ORDER BY epoch_ns(ts), event_id) AS vs
            FROM events GROUP BY user_id)
      SELECT user_id, CAST(len(vs) AS BIGINT) AS n_points,
        CAST(len(vs)//2 + 1 AS BIGINT) AS n_used,
        list_reduce(vs[1:(len(vs)//2 + 1)], (s, y) -> 0.5*s + 0.5*y) AS ema
      FROM l ORDER BY user_id"""))

  /** P10 actor head: tanh-squashed dense layer scaled by max_action
    * (reference fawac.py:146-157), 2 units over the embedding; exploded
    * to (vec_id, unit, action) rows for the gate's pandas sort. */
  private val p10Actor = Q("p10_actor_head",
    (s, dir) => {
      val x = col("embedding").cast("array<double>")
      val act = ModelOps.actorHead(x, ModelOps.pseudoWeights(2, 64), Seq(0.1, 0.1), 2.0)
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(transform(act, v => pround(v, 4))))
        .select(col("vec_id"), col("pos").cast("long").as("unit"), col("col").as("action"))
        .orderBy(col("vec_id"), col("unit"))
    },
    Some {
      // DuckDB 1.0 has no tanh(): use (e^2z - 1)/(e^2z + 1); pround(4)
      // absorbs its ulp-level difference from Math.tanh
      val units = (0 until 2).map { o =>
        val z = s"(0.1 + list_sum(list_transform(range(len(x)), i -> x[i+1] * (CAST(((3*$o + 5*i) % 13) - 6 AS DOUBLE)/10.0))))"
        proundSql(s"2.0 * ((exp(2.0*$z) - 1.0) / (exp(2.0*$z) + 1.0))", 4)
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      a AS (SELECT vec_id, [$units] AS act FROM e)
      SELECT vec_id, CAST(i - 1 AS BIGINT) AS unit, act[i] AS action
      FROM (SELECT vec_id, unnest(range(1, len(act)+1)) AS i, act FROM a)
      ORDER BY vec_id, unit"""
    })

  /** §3.3 evaluate(): mean/std/count over the per-episode summaries
    * (reference np.mean/np.std over rollout returns, fawac.py:585-595). */
  private val evalSummary = Q("eval_summary",
    (s, dir) => {
      val episodes = SeqOps.sessionAgg(Tables.events(s, dir), "user_id",
        Seq(col("ts"), col("event_id")), col("value"))
      episodes.agg(
        count(lit(1)).as("n_episodes"),
        round(avg(col("session_sum")), 4).as("mean_return"),
        round(stddev_pop(col("session_sum")), 4).as("std_return"),
        min(col("session_len")).as("min_len"),
        max(col("session_len")).as("max_len"))
    },
    Some("""WITH ep AS (SELECT user_id, sum(value) AS ret, count(*) AS len
            FROM events GROUP BY user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_episodes,
        round(avg(ret), 4) AS mean_return,
        round(stddev_pop(ret), 4) AS std_return,
        CAST(min(len) AS BIGINT) AS min_len, CAST(max(len) AS BIGINT) AS max_len
      FROM ep"""))

  /** §3.3 normalized evaluation scores — the reference maps raw eval
    * means through `env.get_normalized_score` before logging
    * (train_fawac_iql.py:147-149: normalized_ret, normalized_cost from
    * the task's reference constants). Here the per-task constants
    * (ret_min, ret_max, cost_limit) live in a BROADCAST parameter table
    * — corpus-invariant metadata, exactly like the config overlay —
    * and the normalization is the affine map
    * norm_ret = (ret − ret_min)/(ret_max − ret_min)·100,
    * norm_cost = cost/κ, applied to per-task episode means
    * ("task" = event_type; episode = one user's events of that type,
    * cost = episode length — the step-cost convention). Means are
    * sums/n (the avg-of-lattice-decimals rounding trap); one shuffle on
    * (task, user) then a task-cardinality aggregate. */
  private val evalNorm = Q("eval_normalized",
    (s, dir) => {
      import s.implicits._
      val consts = Seq(
        ("click", 0.0, 5000.0, 25.0), ("error", 0.0, 5200.0, 25.0),
        ("purchase", 0.0, 4800.0, 25.0), ("signup", 0.0, 5100.0, 25.0),
        ("view", 0.0, 4900.0, 25.0))
        .toDF("event_type", "ret_min", "ret_max", "cost_limit")
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value")).as("ret"), count(lit(1)).cast("double").as("cost"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_episodes"),
          sum(col("ret")).as("__rs"), sum(col("cost")).as("__cs"))
        .join(broadcast(consts), Seq("event_type"))
        .select(col("event_type").as("task"), col("n_episodes"),
          round(col("__rs") / col("n_episodes"), 4).as("mean_return"),
          round(col("__cs") / col("n_episodes"), 4).as("mean_cost"),
          round((col("__rs") / col("n_episodes") - col("ret_min"))
            / (col("ret_max") - col("ret_min")) * lit(100.0), 6)
            .as("normalized_return"),
          round(col("__cs") / col("n_episodes") / col("cost_limit"), 6)
            .as("normalized_cost"))
        .orderBy(col("task"))
    },
    Some("""WITH ep AS (SELECT event_type, user_id, sum(value) AS ret,
        CAST(count(*) AS DOUBLE) AS cost FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, count(*) AS n, sum(ret) AS rs, sum(cost) AS cs
        FROM ep GROUP BY 1),
      c(event_type, ret_min, ret_max, cost_limit) AS (VALUES
        ('click', 0.0, 5000.0, 25.0), ('error', 0.0, 5200.0, 25.0),
        ('purchase', 0.0, 4800.0, 25.0), ('signup', 0.0, 5100.0, 25.0),
        ('view', 0.0, 4900.0, 25.0))
      SELECT t.event_type AS task, CAST(n AS BIGINT) AS n_episodes,
        round(rs / n, 4) AS mean_return,
        round(cs / n, 4) AS mean_cost,
        round((rs / n - ret_min) / (ret_max - ret_min) * 100.0, 6) AS normalized_return,
        round(cs / n / cost_limit, 6) AS normalized_cost
      FROM t JOIN c USING (event_type) ORDER BY task"""))

  // ------------------------------------------------------------------
  // batch 3 (round 2): correlation stats, arg-extrema, grouping sets,
  // sliding windows, nth_value frames, unpivot, simhash pairs, TF-IDF,
  // int8 quantization, partitioned/JSON source round-trips, config
  // overlay, approximate distinct
  // ------------------------------------------------------------------

  /** A-family extension: two-column association aggregates (corr /
    * covar_pop / regr_slope) — ratio-of-sums forms, rounded at 4 since
    * partial-aggregation order differs between engines. */
  private val aCorr = Q("a_corr_stats",
    (s, dir) => Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
      round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
      round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
      count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qp,
      round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A-family: argument extrema (max_by/min_by ↔ DuckDB arg_max/arg_min);
    * the ordering argument (event_id) is unique per key → deterministic. */
  private val aMinMaxBy = Q("a_minmax_by",
    (s, dir) => Tables.events(s, dir).groupBy(col("user_id")).agg(
      max_by(col("value"), col("event_id")).as("latest_value"),
      min_by(col("value"), col("event_id")).as("earliest_value"),
      max(col("event_id")).as("last_event_id"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, arg_max(value, event_id) AS latest_value,
      arg_min(value, event_id) AS earliest_value, max(event_id) AS last_event_id
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Explicit GROUPING SETS (beyond rollup/cube): chosen aggregation
    * lattice cells in one pass. */
  private val groupingSetsAgg = Q("grouping_sets_agg",
    (s, dir) => Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
      CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Sliding (hopping) event-time window: width 1 day, slide 12 h —
    * every event lands in exactly 2 windows, both aligned to the epoch
    * like Spark's `window()`. */
  private val slidingWindow = Q("sliding_window",
    (s, dir) => StreamingOps.slidingAgg(Tables.events(s, dir), "1 day", "12 hours")
      .select(col("w_start_us"), col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy(col("w_start_us"), col("event_type")),
    Some("""WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
      x AS (SELECT unnest([(us // 43200000000) * 43200000000,
                           (us // 43200000000) * 43200000000 - 43200000000]) AS w_start_us,
                   event_type, value FROM e)
      SELECT w_start_us, event_type, CAST(count(*) AS BIGINT) AS n,
        round(sum(value), 2) AS total
      FROM x GROUP BY 1, 2 ORDER BY w_start_us, event_type"""))

  /** Positional window functions: first / nth / last value over running
    * and full-partition frames. */
  private val nthWindow = Q("nth_value_window",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir).select(col("user_id"), col("event_id"),
        first(col("value")).over(wRun).as("first_v"),
        nth_value(col("value"), 2).over(wRun).as("second_v"),
        last(col("value")).over(wAll).as("final_v"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      first_value(value) OVER w1 AS first_v,
      nth_value(value, 2) OVER w1 AS second_v,
      last_value(value) OVER w2 AS final_v
      FROM events
      WINDOW w1 AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id, event_id"""))

  /** S6 melt direction: wide metric columns → (user, metric, value) log
    * rows via the native unpivot operator (reference logger.store shape). */
  private val unpivotMetrics = Q("unpivot_metrics",
    (s, dir) => Tables.events(s, dir).groupBy(col("user_id")).agg(
      round(sum(when(col("event_type") === "click", col("value")).otherwise(0.0)), 4).as("click_sum"),
      round(sum(when(col("event_type") === "view", col("value")).otherwise(0.0)), 4).as("view_sum"),
      round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 4).as("purchase_sum"))
      .unpivot(Array(col("user_id")),
        Array(col("click_sum"), col("view_sum"), col("purchase_sum")),
        "metric", "value")
      .orderBy(col("user_id"), col("metric")),
    Some("""WITH p AS (SELECT user_id,
        round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END), 4) AS click_sum,
        round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END), 4) AS view_sum,
        round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4) AS purchase_sum
        FROM events GROUP BY user_id)
      SELECT user_id, metric, value FROM (
        SELECT user_id, 'click_sum' AS metric, click_sum AS value FROM p
        UNION ALL SELECT user_id, 'view_sum', view_sum FROM p
        UNION ALL SELECT user_id, 'purchase_sum', purchase_sum FROM p)
      ORDER BY user_id, metric"""))

  /** X1 SimHash near-dup pairs: 48-bit fingerprint, 4×12-bit band
    * blocking + Hamming verify (the SimHash counterpart of the
    * MinHash-LSH pair query; band width is the anti-quadratic lever —
    * see Dedup.simhashPairs). */
  private val x1SimhashPairs = Q("x1_simhash_pairs",
    (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
      bits = 48, nBands = 4, maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b")),
    Some {
      val bitSums = (0 until 48).map { j =>
        s"CAST(sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j"
      }.mkString(", ")
      val fpExpr = (0 until 48).map { j =>
        s"(CASE WHEN s$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH sets AS ($shingleSetSql),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      j AS (SELECT doc_id, ${Dedup.FeatureHashSql} AS h FROM tok),
      agg AS (SELECT doc_id, $bitSums FROM j GROUP BY doc_id),
      fp AS (SELECT doc_id, $fpExpr AS simhash FROM agg),
      bands AS (SELECT doc_id, simhash, band, (simhash >> (band*12)) & 4095 AS bucket
                FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
      cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                 CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
               FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
               WHERE l.doc_id < r.doc_id
                 AND bit_count(xor(l.simhash, r.simhash)) <= 3)
      SELECT doc_a, doc_b, hamming FROM cand ORDER BY doc_a, doc_b"""
    })

  /** X1 — SimHash hot-bucket skew report
    * ([[graft.ops.Dedup.simhashBucketReport]]): every (band, bucket)
    * holding ≥ 2 docs with the quadratic candidate count the blocking
    * join pays there — the diagnosis behind `simhashPairs`' per-bucket
    * cap (one dominant boilerplate template concentrates one bucket no
    * matter how wide the bands are). Same fingerprint/banding chain as
    * `x1_simhash_pairs`, reduced to one count row per bucket. */
  private val x1SimhashSkew = Q("x1_simhash_bucket_skew",
    (s, dir) => Dedup.simhashBucketReport(Tables.documents(s, dir), "doc_id", "text",
      bits = 48, nBands = 4, minDocs = 2),
    Some {
      val bitSums = (0 until 48).map { j =>
        s"CAST(sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j"
      }.mkString(", ")
      val fpExpr = (0 until 48).map { j =>
        s"(CASE WHEN s$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH sets AS ($shingleSetSql),
      tok AS (SELECT doc_id, unnest(toks) AS tok FROM sets),
      j AS (SELECT doc_id, ${Dedup.FeatureHashSql} AS h FROM tok),
      agg AS (SELECT doc_id, $bitSums FROM j GROUP BY doc_id),
      fp AS (SELECT doc_id, $fpExpr AS simhash FROM agg),
      bands AS (SELECT doc_id, simhash, band, (simhash >> (band*12)) & 4095 AS bucket
                FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b)
      SELECT CAST(band AS INTEGER) AS band, bucket,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs
      FROM bands GROUP BY band, bucket HAVING count(*) >= 2
      ORDER BY n_docs DESC, band, bucket"""
    })

  /** X3 TF-IDF: top-3 terms per document, ranked on the rounded score
    * with a term tie-break. */
  private val x3Tfidf = Q("x3_tfidf_topterms",
    (s, dir) => TextOps.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", 3)
      .orderBy(col("doc_id"), col("rk")),
    Some("""WITH toks AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok),
      idf AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      n AS (SELECT count(*) AS n FROM documents),
      scored AS (SELECT doc_id, tok,
          round(tf * ln(CAST(n.n AS DOUBLE) / df), 4) AS tfidf
        FROM tf JOIN idf USING (tok) CROSS JOIN n),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rk
        FROM scored)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tfidf
      FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** X3 BM25 ([[TextOps.bm25TopDocs]]): top-20 documents for a 4-term
    * query. idf rounds at 6 (transcendental), the saturation factor is
    * rational per-row IEEE, contributions fold in term order, final
    * score portable-rounds at 4 — the [[x6Dsir]] fold discipline applied
    * to retrieval. Output re-sorted by doc_id for a deterministic dump. */
  /** Shared BM25 oracle CTE chain (terms spark/vector/merge/stream,
    * k1 = 1.2, b = 0.75) ending at `bm_top(doc_id, n_terms, score)` with
    * the given page size — used by the standalone query and the hybrid
    * RRF fusion. Constants are the identical Scala doubles the DataFrame
    * side folds in (1.2+1.0 is a round-to-even tie — a parsed "2.2"
    * literal may differ by an ulp from the computed sum, so both engines
    * get the printed sum). */
  private def bm25Ctes(topK: Int): String = {
    val k1p1 = d(1.2 + 1.0); val k1 = d(1.2)
    val oneMb = d(1.0 - 0.75); val b = d(0.75)
    s"""bm_q(term) AS (VALUES ('spark'), ('vector'), ('merge'), ('stream')),
      bm_toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      bm_dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM bm_toks),
      bm_stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
          CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM bm_dl),
      bm_tok AS (SELECT doc_id, unnest(t) AS tok FROM bm_toks),
      bm_tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        FROM bm_tok JOIN bm_q ON tok = bm_q.term GROUP BY doc_id, tok),
      bm_df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM bm_tf GROUP BY tok),
      bm_c AS (SELECT bm_tf.doc_id, bm_tf.tok,
          (floor(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * 1000000.0 + 0.5) / 1000000.0)
            * (tf * $k1p1) / (tf + $k1 * ($oneMb + $b * bm_dl.dl / avgdl)) AS contrib
        FROM bm_tf JOIN bm_df USING (tok) JOIN bm_dl ON bm_dl.doc_id = bm_tf.doc_id
        CROSS JOIN bm_stats),
      bm_sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
          list_sum(list(contrib ORDER BY tok)) AS raw
        FROM bm_c GROUP BY doc_id),
      bm_top AS (SELECT doc_id, n_terms,
          floor(raw * 10000.0 + 0.5) / 10000.0 AS score
        FROM bm_sc ORDER BY score DESC, doc_id LIMIT $topK)"""
  }

  private val x3Bm25 = Q("x3_bm25_topdocs", {
    (s, dir) =>
      import s.implicits._
      TextOps.bm25TopDocs(Tables.documents(s, dir), "doc_id", "text",
          Seq("spark", "vector", "merge", "stream").toDF("term"),
          k1 = 1.2, b = 0.75, topK = 20, roundDigits = 4)
        .orderBy(col("doc_id"))
  },
    Some(s"""WITH ${bm25Ctes(20)}
      SELECT doc_id, n_terms, score FROM bm_top ORDER BY doc_id"""))

  /** X2 — hybrid retrieval ([[Similarity.rrfFuse]]): BM25 page (lexical)
    * ⊕ brute-cosine page for query vector 0 (dense), fused by reciprocal
    * rank at c = 60. Ranks derive from already-rounded scores with id
    * tie-breaks; the fused score is a fixed-order two-term reciprocal
    * sum — exact on both engines, no further rounding. */
  private val x2Rrf = Q("x2_hybrid_rrf", {
    (s, dir) =>
      import s.implicits._
      val bm = TextOps.bm25TopDocs(Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "vector", "merge", "stream").toDF("term"), topK = 50)
      // rank within the 50-row retrieval page WITHOUT a window: an
      // unpartitioned row_number is the single-partition-funnel class the
      // PlanSpec gate closes, so the bounded page ranks by a count-ahead
      // self-join instead (k² comparisons on a k-row page; AQE broadcasts
      // it by size — no hint, the page carries a fact key)
      val page = bm.select(col("doc_id"), col("score"))
      val ahead = page.select(col("doc_id").as("b_id"), col("score").as("b_score"))
      val bmr = page.join(ahead,
          col("b_score") > col("score")
            || (col("b_score") === col("score") && col("b_id") < col("doc_id")),
          "left")
        .groupBy(col("doc_id"))
        .agg((count(col("b_id")) + lit(1L)).as("rank"))
        .select(col("doc_id").as("id"), col("rank"))
      val cos = Similarity.bruteForceTopK(Tables.embeddings(s, dir),
        "vec_id", "embedding", col("vec_id") === 0, k = 50)
      val cr = cos.select(col("cand_id").as("id"), col("rk").as("rank"))
      Similarity.rrfFuse(bmr, cr, c = 60, topK = 10).orderBy(col("id"))
  },
    Some(s"""WITH ${bm25Ctes(50)},
      bmr AS (SELECT doc_id AS id,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        FROM bm_top),
      ce AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cq AS (SELECT v AS qv FROM ce WHERE vec_id = 0),
      csc AS (SELECT ce.vec_id AS cand_id,
          round(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*v[i+1]))
            / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1]*qv[i+1])))
             * sqrt(list_sum(list_transform(range(len(v)), i -> v[i+1]*v[i+1])))), 6) AS cosine
        FROM ce CROSS JOIN cq WHERE ce.vec_id <> 0),
      cranked AS (SELECT cand_id, row_number() OVER (
          ORDER BY cosine DESC, cand_id ASC) AS rk FROM csc),
      cr AS (SELECT cand_id AS id, CAST(rk AS BIGINT) AS rank
        FROM cranked WHERE rk <= 50),
      fused AS (SELECT coalesce(b.id, c2.id) AS id,
          b.rank AS rank_a, c2.rank AS rank_b,
          coalesce(1.0 / (60 + b.rank), 0.0)
            + coalesce(1.0 / (60 + c2.rank), 0.0) AS rrf
        FROM bmr b FULL OUTER JOIN cr c2 ON b.id = c2.id),
      page AS (SELECT id, rank_a, rank_b, rrf FROM fused
        ORDER BY rrf DESC, id LIMIT 10)
      SELECT id, rank_a, rank_b, rrf FROM page ORDER BY id"""))

  /** X3 — benchmark decontamination: docs with doc_id ≡ 7 (mod 10) play
    * the eval set; the report lists every training doc sharing a word
    * 8-gram with it. Spark joins on the fused kernel's 64-bit gram hashes (the scale
    * shape — broadcast longs, corpus never shuffled); the oracle joins on
    * the gram STRINGS, so any hash collision would fail the gate here. */
  private val x3Decon = Q("x3_decontaminate",
    (s, dir) => TextOps.contaminationReport(Tables.documents(s, dir),
      "doc_id", "text", isBench = col("doc_id") % 10 === 7, n = 8)
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      i AS (SELECT doc_id, t, unnest(range(greatest(len(t) - 7, 0))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+8], ' ') AS g FROM i),
      bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 7)
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM grams g JOIN bench USING (g) WHERE g.doc_id % 10 <> 7
      GROUP BY g.doc_id ORDER BY doc_id"""))

  /** X1 — cross-document duplicated-span fraction (Lee et al. exact-
    * substring dedup signal at 8-gram granularity): occurrences whose
    * gram appears in ≥2 distinct documents. Counts are exact integers;
    * the ratio uses portable rounding. Spark matches on 64-bit gram hashes, the
    * oracle on gram strings — the same accepted 2⁻⁶⁴ collision trade as
    * x3_decontaminate. */
  private val x1DupSpans = Q("x1_dup_span_fraction",
    (s, dir) => {
      val r = TextOps.duplicatedSpans(Tables.documents(s, dir), "doc_id", "text", n = 8)
      r.select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        pround(col("n_dup_grams").cast("double") / col("n_grams"), 4).as("dup_span_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      i AS (SELECT doc_id, t, unnest(range(greatest(len(t) - 7, 0))) AS i
            FROM toks WHERE len(t) >= 8),
      gr AS (SELECT doc_id, array_to_string(t[i+1:i+8], ' ') AS g FROM i),
      df AS (SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
        """ + proundSql("sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 4) + """ AS dup_span_frac
      FROM gr JOIN df USING (g) GROUP BY doc_id ORDER BY doc_id"""))

  /** X3 — Gopher-style repetition quality gates: duplicate-bigram ratio
    * and top-token frequency ratio per doc. Counts are exact integers;
    * the two ratios use portable rounding (ratios of small ints land
    * near decimal boundaries often enough to hit the round-half trap). */
  private val x3Repetition = Q("x3_repetition_quality",
    (s, dir) => {
      val r = TextOps.repetitionStats(Tables.documents(s, dir), "doc_id", "text", n = 2)
      r.select(col("doc_id"), col("n_toks"), col("n_grams"), col("n_dup_grams"),
        col("top_tok_cnt"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(pround(col("n_dup_grams").cast("double") / col("n_grams"), 4))
          .as("dup_gram_ratio"),
        pround(col("top_tok_cnt").cast("double") / col("n_toks"), 4).as("top_tok_ratio"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      base AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_toks FROM toks WHERE len(t) > 0),
      gi AS (SELECT doc_id, t, unnest(range(greatest(len(t) - 1, 0))) AS i FROM base),
      g AS (SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS g FROM gi),
      gs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(DISTINCT g) AS BIGINT) AS n_uniq FROM g GROUP BY doc_id),
      tok AS (SELECT doc_id, unnest(t) AS tok FROM base),
      tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
      top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_tok_cnt FROM tc GROUP BY doc_id)
      SELECT b.doc_id, b.n_toks,
        coalesce(gs.n_grams, 0) AS n_grams,
        coalesce(gs.n_grams - gs.n_uniq, 0) AS n_dup_grams,
        top.top_tok_cnt,
        CASE WHEN coalesce(gs.n_grams, 0) = 0 THEN 0.0
             ELSE """ + proundSql("(gs.n_grams - gs.n_uniq) / CAST(gs.n_grams AS DOUBLE)", 4) + """ END AS dup_gram_ratio,
        """ + proundSql("top.top_tok_cnt / CAST(b.n_toks AS DOUBLE)", 4) + """ AS top_tok_ratio
      FROM (SELECT doc_id, n_toks FROM base) b
      JOIN top USING (doc_id) LEFT JOIN gs USING (doc_id)
      ORDER BY doc_id"""))

  /** X6 — stride-overlap document chunking (32-token windows every 24
    * tokens): map-only explode, no shuffle; text joins are string-exact
    * so no rounding anywhere. */
  private val x6Chunk = Q("x6_chunk_documents",
    (s, dir) => Curation.chunkDocuments(Tables.documents(s, dir),
      "doc_id", "text", chunkTokens = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      base AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
      st AS (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s FROM base)
      SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_idx,
        array_to_string(t[s+1:s+32], ' ') AS chunk_text,
        CAST(least(len(t) - s, 32) AS BIGINT) AS n_chunk_tokens
      FROM st ORDER BY doc_id, chunk_idx"""))

  /** X2 int8 scalar quantization of the embedding column (4× ANN memory
    * cut) with per-element reconstruction error — portable floor(x+0.5)
    * rounding, identical FP ops in both engines. */
  private val x2Quantize = Q("x2_embedding_quantize",
    (s, dir) => Similarity.quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")
      .orderBy(col("vec_id"), col("pos")),
    Some("""WITH p AS (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i,
          embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
          least(greatest(v[i], -1.0), 1.0) AS cl FROM p)
      SELECT vec_id, pos, CAST(floor(cl*127.0 + 0.5) AS BIGINT) AS q,
        floor(cl*127.0 + 0.5)/127.0 AS recon,
        abs(floor(cl*127.0 + 0.5)/127.0 - cl) AS err
      FROM c ORDER BY vec_id, pos"""))

  /** S-family: hive-style partitioned parquet sink + partition-pruned
    * re-read (the layout a 100 TB events table would use: the filter on
    * the partition column prunes directories, not rows). */
  private val s7Partitioned = Q("s7_partitioned_roundtrip",
    (s, dir) => {
      val path = "/tmp/graft_s7_part_" + Tables.scratchTag(s, dir)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      s.read.parquet(path)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id ORDER BY user_id"""),
    eagerPlan = true) // constructing runs the partitioned parquet sink write

  /** S4 JSON-lines source/sink round-trip (same proof as the CSV one:
    * doubles survive the text format via shortest-round-trip rendering). */
  private val s4Jsonl = Q("s4_jsonl_roundtrip",
    (s, dir) => {
      val path = "/tmp/graft_s4_jsonl_" + Tables.scratchTag(s, dir)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .where(pmod(col("event_id"), lit(7)) === 0)
        .coalesce(1)
        .write.mode("overwrite").json(path)
      s.read.schema("event_id LONG, user_id LONG, value DOUBLE").json(path)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
      FROM events WHERE event_id % 7 = 0
      GROUP BY user_id ORDER BY user_id"""),
    eagerPlan = true) // constructing runs the JSONL sink write

  /** J4 — config cascade overlay (reference train_fawac_iql.py:28-32):
    * per-task overrides overlaid on defaults, full-outer so new keys
    * survive, provenance flag per key. */
  private val configOverlay = Q("j4_config_overlay",
    (s, dir) => {
      import s.implicits._
      val defaults = Seq(("discount", 0.99), ("tau", 0.005), ("beta", 2.0),
        ("iql_tau", 0.7), ("cost_limit", 10.0))
        .toDF("key", "default_v")
      val overrides = Seq(("beta", 4.0), ("cost_limit", 20.0), ("episode_len", 300.0))
        .toDF("key", "override_v")
      defaults.join(overrides, Seq("key"), "full_outer")
        .select(col("key"),
          coalesce(col("override_v"), col("default_v")).as("value"),
          col("override_v").isNotNull.as("overridden"))
        .orderBy(col("key"))
    },
    Some("""WITH d(key, default_v) AS (VALUES ('discount', 0.99), ('tau', 0.005),
        ('beta', 2.0), ('iql_tau', 0.7), ('cost_limit', 10.0)),
      o(key, override_v) AS (VALUES ('beta', 4.0), ('cost_limit', 20.0), ('episode_len', 300.0))
      SELECT coalesce(d.key, o.key) AS key,
        CAST(coalesce(override_v, default_v) AS DOUBLE) AS value,
        override_v IS NOT NULL AS overridden
      FROM d FULL JOIN o ON d.key = o.key ORDER BY key"""))

  /** HLL++ sketch validated against the exact count: the raw estimate is
    * engine-specific (Spark HLL++ vs DuckDB HLL differ by design), so the
    * oracle-checked output is the exact count plus the sketch's
    * within-tolerance verdict — deterministic for fixed input, and a
    * mismatch would surface as `sketch_ok = false` hash-failing against
    * the oracle's TRUE. Tolerance 2× the default rsd (0.05). */
  private val x5ApproxDistinct = Q("x5_approx_distinct",
    (s, dir) => Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= lit(0.1) * col("exact_parts")).as("sketch_ok"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      TRUE AS sketch_ok FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** GK sketch (approx_percentile) validated against the exact discrete
    * quantile, same oracle pattern as x5_approx_distinct: the exact p50/p90
    * are actual data values (bit-exact across engines, no rounding), the
    * sketch contributes a within-tolerance verdict. percentile_disc =
    * smallest value with cume_dist ≥ p in BOTH engines (ceil(p·n) index —
    * verified against DuckDB's quantile_disc). */
  private val x5ApproxQuantile = Q("x5_approx_quantile",
    (s, dir) => {
      // Exact discrete quantiles (percentile_disc position rule: the
      // value at 1-based position ceil(q·n)) via the DISTRIBUTED
      // selection primitive (AggOps.exactQuantiles, r16): bucket counts
      // locate each rank's bucket, only that bucket's rows rank. The
      // previous global-rank window partitioned by l_returnflag — THREE
      // groups, so one task sorted each group's whole slice (measured
      // ×6.5 at the 10× board; a straight single-node sort at 100 TB).
      // Spark's percentile_disc aggregate is equally single-node (per-
      // group value map in one buffer). The GK sketch (approx_percentile)
      // rides a plain aggregate, and sketch_ok asserts it lands within
      // 2% of the exact p50 — the approx-vs-exact contract
      // x5_approx_distinct also follows.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val exact = AggOps.exactQuantiles(li, Seq("l_returnflag"),
          "l_extendedprice", Seq(0.5, 0.9))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("__q") === lit(0.5), col("__qval"))).as("p50"),
          min(when(col("__q") === lit(0.9), col("__qval"))).as("p90"))
      li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(2000)).as("ap50"))
        .join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p50"), col("p90"),
          (abs(col("ap50") - col("p50")) <= col("p50") * lit(0.02)).as("sketch_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS p50,
      quantile_disc(l_extendedprice, 0.9) AS p90, TRUE AS sketch_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Distributed uniform k-sample without replacement: rank every row by a
    * salted 60-bit hash of its key and take the global top-k — the batch
    * equivalent of reservoir sampling (each key's rank is an iid uniform
    * draw), executed as TakeOrderedAndProject: per-partition top-k then a
    * driver merge of k·partitions candidates, never a global sort.
    * Deterministic given the salt, so both engines select the same rows. */
  private val x6Reservoir = Q("x6_reservoir_sample",
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"),
        Dedup.featureHash(concat(lit("rsv1:"), col("doc_id").cast("string"))).as("rk"))
      .orderBy(col("rk"), col("doc_id")).limit(100),
    Some("""SELECT doc_id,
      CAST(('0x' || substr(md5('rsv1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
      FROM documents ORDER BY rk, doc_id LIMIT 100"""))

  /** Time-series resample + gap fill: per user, a continuous daily grid
    * from first to last purchase day, value = last observation carried
    * forward (LOCF). The grid is generated per key (sequence + explode —
    * no driver loop) and the fill is one window pass. */
  private val resampleLocf = Q("resample_locf",
    (s, dir) => {
      val ev = Tables.events(s, dir).where(col("event_type") === "purchase")
        .withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = ev.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
        .select(col("user_id"), col("day"), round(col("value"), 4).as("v"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val filled = grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("v_filled",
          last(col("v"), ignoreNulls = true).over(
            Window.partitionBy(col("user_id")).orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      filled.select(col("user_id"), col("day").cast("string").as("day"), col("v_filled"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value, epoch_ns(ts) AS ns, event_id
              FROM events WHERE event_type = 'purchase'),
      daily AS (SELECT user_id, day, round(value, 4) AS v FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, day ORDER BY ns DESC, event_id DESC) AS rk
          FROM ev) WHERE rk = 1),
      grid AS (SELECT user_id,
          CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily GROUP BY user_id),
      filled AS (SELECT g.user_id, g.day,
          last_value(d.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day
            ROWS UNBOUNDED PRECEDING) AS v_filled
        FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day)
      SELECT user_id, CAST(day AS VARCHAR) AS day, v_filled
      FROM filled ORDER BY user_id, day"""))

  /** Ordered funnel (view → click → purchase): each stage's timestamp
    * must follow the previous stage's; counts per stage in one row.
    * Sequential min-after-min via two re-aggregations — no window over
    * the full log. Stage joins are keyed on user_id with NO broadcast
    * hint: the per-user stage table is corpus-cardinality (one row per
    * surviving user), so the join strategy is left to Spark/AQE — a
    * forced broadcast would OOM the driver at real user counts. */
  private val funnelStages = Q("funnel_stages",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("us", expr("ts div 1000"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("us_v"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("us") > col("us_v"))
        .groupBy(col("user_id")).agg(min(col("us")).as("us_c"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("us") > col("us_c"))
        .groupBy(col("user_id")).agg(min(col("us")).as("us_p"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v AS (SELECT user_id, min(us) AS us_v FROM e WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(us) AS us_c FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND us > us_v GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(us) AS us_p FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND us > us_c GROUP BY e.user_id)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
             (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
             (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel"""))

  /** TPC-H Q3-style shipping priority: selective dimension filter,
    * fact-fact join on the order key, revenue aggregate, top-10 on the
    * ROUNDED revenue with pk tie-break (rank stability across engines).
    * Revenue terms price·(1−discount) live on a 4-decimal lattice →
    * round(4) is exact. The filtered customer side is NOT broadcast-hinted:
    * the segment filter keeps ~1/5 of customers — still linear in the
    * corpus — so strategy choice belongs to size-based selection/AQE. */
  private val q3Ship = Q("q3_shipping_priority",
    (s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") < to_timestamp(lit("1995-03-15")))
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") > to_timestamp(lit("1995-03-15")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderpriority,
        round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY l_orderkey, o_orderpriority
      ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""))

  /** TPC-H Q5 shape: two fact-side joins (orders⋈customer, lineitem⋈
    * supplier) with the local-supplier condition c_nationkey = s_nationkey,
    * dimension chain nation→region broadcast. The extra equi-condition
    * rides on the supplier join (no separate shuffle); only lineitem and
    * orders move. */
  private val q5Local = Q("q5_local_supplier_volume",
    (s, dir) => {
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .join(c, col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
        round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name"""))

  /** P10 at parameter-table scale — the distributed join-aggregate
    * matmul (ModelOps.denseLayerFromTable): a 64→8 ReLU layer whose
    * weights live in a table built from the same closed form as
    * pseudoWeights, broadcast-joined to the exploded input. The sum per
    * (row, unit) crosses partition boundaries → rounded on both sides. */
  private val p10Table = Q("p10_table_inference",
    (s, dir) => {
      val iCol = col("id") % 64
      val jCol = expr("id div 64")
      val w = s.range(8L * 64L).select(
        iCol.as("i"), jCol.as("j"),
        ((((lit(3) * jCol + lit(5) * iCol) % 13) - lit(6)).cast("double") / lit(10.0)).as("w"))
      ModelOps.denseLayerFromTable(Tables.embeddings(s, dir), "vec_id", "embedding",
        w, ModelOps.pseudoBias, ModelOps.relu)
        .select(col("vec_id"), col("j"), round(col("h"), 6).as("h"))
        .orderBy(col("vec_id"), col("j"))
    },
    Some("""WITH idx AS (SELECT unnest(range(64)) AS i),
      ou AS (SELECT unnest(range(8)) AS j),
      x AS (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS x
            FROM embeddings CROSS JOIN idx),
      w AS (SELECT i, j, CAST(((3*j + 5*i) % 13) - 6 AS DOUBLE) / 10.0 AS w
            FROM idx CROSS JOIN ou),
      h AS (SELECT vec_id, j, sum(x * w) AS s FROM x JOIN w USING (i) GROUP BY vec_id, j)
      SELECT vec_id, CAST(j AS BIGINT) AS j,
        round(greatest(s + CAST((5*j) % 7 - 3 AS DOUBLE) / 10.0, 0.0), 6) AS h
      FROM h ORDER BY vec_id, j"""))

  // ------------------------------------------------------------------
  // X6 — training-data assembly (ops.Curation): split / mix / pack
  // ------------------------------------------------------------------

  private val bucketSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  /** X6 — deterministic train/val/test split (90/5/5 by id bucket);
    * growth-stable, never moves an existing document between splits. */
  private val x6Split = Q("x6_split_assign",
    (s, dir) => Curation.splitAssign(Tables.documents(s, dir), "doc_id")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang")),
    Some(s"""WITH b AS (SELECT *, $bucketSql AS bk FROM documents)
      SELECT CASE WHEN bk < 90 THEN 'train' WHEN bk < 95 THEN 'val' ELSE 'test' END AS split,
        lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM b GROUP BY 1, 2 ORDER BY split, lang"""))

  /** X6 — stratified mix sampling: language keep-rates (downsample the
    * dominant en, keep all zh), id-bucket keyed → exactly reproducible. */
  private val x6Sample = Q("x6_stratified_sample",
    (s, dir) => Curation.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
      Map("en" -> 25, "zh" -> 100), defaultPct = 50)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id, lang
      FROM (SELECT *, $bucketSql AS bk FROM documents)
      WHERE bk < CASE WHEN lang = 'en' THEN 25 WHEN lang = 'zh' THEN 100 ELSE 50 END
      ORDER BY doc_id"""))

  /** X6 — greedy contiguous sequence packing into 512-token bins per
    * language (bin = where the document's token span starts). */
  private val x6Pack = Q("x6_pack_sequences",
    (s, dir) => {
      val nToks = TextOps.textStats(col("text")).getField("n_tokens").cast("long")
      Curation.packSequences(Tables.documents(s, dir), "doc_id", "lang", nToks, 512)
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH t AS (SELECT doc_id, lang,
        CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      p AS (SELECT *, CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0) AS BIGINT) AS bin FROM t)
      SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tok_sum
      FROM p GROUP BY lang, bin ORDER BY lang, bin"""))

  // ------------------------------------------------------------------
  // round 7: end-to-end composition + fidelity nuance
  // ------------------------------------------------------------------

  /** The reference's FULL `train_one_step` (fawac.py:521-551) as one
    * declarative DAG over the transitions table — the integration query
    * SURVEY.md §3.2 sketches ("one declarative DAG per update"). Stage by
    * stage, matching the torch control flow:
    *  - frozen nets = literal-weight forward passes (P10): V is a genuine
    *    2-unit MLP (`ModelOps.mlp`), critics are affine heads; the "data
    *    action" is the bounded cost channel (a ∈ [0,1]);
    *  - no-grad next-state values = `lead` over episode order (J2,
    *    fawac.py:530-532), bootstrapping 0 past the terminal row;
    *  - V-loss = expectile/asymmetric-L2 of adv = Q_target − V (A7,
    *    fawac.py:343-355); twin Q MSE vs TD targets (A6, fawac.py:357-373);
    *    cost critics mirror with the clamp-at-0 contract (fawac.py:375-425);
    *  - policy loss = exp(β·net_adv)-weighted BC residual with the penalty
    *    gate λ = 1(costV > limit·γ^steps)·λmax (P5/P6/P8/A5,
    *    fawac.py:427-446), plus the safety-mask diagnostic (fawac.py:390);
    *  - soft update (J3, fawac.py:15-17): the online Q-head scale is
    *    re-fit in closed form (least-squares of TD targets on state,
    *    θ̂ = Σ(target·s)/Σ(s²)) and EMA'd into the frozen θ=0.2.
    * Rewards are ingest-scaled ×0.001 (wrap_env reward_scale) so squared
    * losses stay O(100)/row. One window pass + one global aggregate: at
    * 100 TB this shuffles on episode_id once, then tree-aggregates — the
    * same wall shape as s1_cost_returns. Loss outputs are SUMS + n (means
    * derive as sum/n; a plain avg of finite-decimal data is the documented
    * half-boundary rounding trap). */
  private val e2eTrain = Q("e2e_train_step",
    (s, dir) => {
      val tr = Tables.transitions(s, dir)
      // (episode_id, t) non-unique → total order over the value columns
      val ord = Seq(col("t"), col("state0"), col("reward"), col("cost"), col("done"))
      val sC = col("state0")
      val aC = col("cost")
      val rC = col("reward") * lit(RewScale)
      val vNet = element_at(ModelOps.mlp(array(sC), Seq(
        (Seq(Seq(0.3), Seq(-0.15)), Seq(-2.0, 4.0), ModelOps.relu),
        (Seq(Seq(0.5, -0.4)), Seq(0.05), ModelOps.identityAct))), 1)
      val qTargetNet = sC * lit(0.2) + aC * lit(0.3) - lit(0.1)
      val q1 = sC * lit(0.25) + aC * lit(0.28)
      val q2 = sC * lit(0.15) + aC * lit(0.32) + lit(0.2)
      val costQt = CoreOps.clampMin(sC * lit(0.12) + aC * lit(0.05) - lit(1.2))
      val cq1 = sC * lit(0.1) + aC * lit(0.06)
      val cq2 = sC * lit(0.14) + aC * lit(0.04) - lit(0.3)
      val withV = tr
        .withColumn("v", vNet)
        .withColumn("cost_v", CoreOps.clampMin(sC * lit(0.1) - lit(1.0)))
      val withTgt = JoinOps.tdTarget(
        JoinOps.tdTarget(withV, "episode_id", ord, rC, col("done"), col("v"),
          Gamma, "q_tgt"),
        "episode_id", ord, aC, col("done"), col("cost_v"), Gamma, "cq_tgt")
      val adv = qTargetNet - col("v")
      val costAdv = -(costQt - col("cost_v"))
      val lag = CoreOps.penaltyGate(col("cost_v"), CostThresh, MaxLag)
      val expAdv = CoreOps.expAdvantage(CoreOps.netAdvantage(adv, costAdv, lag),
        Beta2, ExpCap)
      val mask = CoreOps.safetyMask(col("cost_v"), costQt, SafeTheta)
      val pi = CoreOps.clamp(sC * lit(0.04) - lit(1.0), -1.0, 1.0)
      val aNorm = aC * lit(2.0) - lit(1.0)
      val bc = (pi - aNorm) * (pi - aNorm)
      def expectile(u: Column): Column =
        abs(lit(IqlTau) - CoreOps.indicator(u < lit(0.0))) * u * u
      withTgt.agg(
        count(lit(1)).as("n"),
        round(sum(expectile(adv)), 4).as("value_loss_sum"),
        round((sum((q1 - col("q_tgt")) * (q1 - col("q_tgt")))
          + sum((q2 - col("q_tgt")) * (q2 - col("q_tgt")))) / lit(2.0), 4)
          .as("q_loss_halfsum"),
        round(sum(expectile(costAdv)), 4).as("cost_v_loss_sum"),
        round((sum((cq1 - col("cq_tgt")) * (cq1 - col("cq_tgt")))
          + sum((cq2 - col("cq_tgt")) * (cq2 - col("cq_tgt")))) / lit(2.0), 4)
          .as("cost_q_loss_halfsum"),
        sum(mask).cast("long").as("n_safe"),
        round(sum(expAdv), 4).as("exp_adv_sum"),
        round(sum(expAdv * bc), 4).as("policy_loss_sum"),
        sum(col("q_tgt") * sC).as("__ts"),
        sum(sC * sC).as("__ss"))
        .select(col("n"), col("value_loss_sum"), col("q_loss_halfsum"),
          col("cost_v_loss_sum"), col("cost_q_loss_halfsum"), col("n_safe"),
          col("exp_adv_sum"), col("policy_loss_sum"),
          pround(lit(1.0 - Tau) * lit(0.2) + lit(Tau) * (col("__ts") / col("__ss")), 6)
            .as("q_coef_soft_updated"))
    },
    Some("""WITH tr AS (SELECT l_orderkey AS episode_id, CAST(l_linenumber AS BIGINT) AS t,
        l_quantity AS s, l_extendedprice*0.1 AS reward, l_discount*10.0 AS a,
        CASE WHEN l_returnflag='R' OR l_linestatus='F' THEN 1.0 ELSE 0.0 END AS d
      FROM lineitem),
      f AS (SELECT *, reward*0.001 AS r,
        0.05 + greatest(-2.0 + s*0.3, 0.0)*0.5 + greatest(4.0 + s*(-0.15), 0.0)*(-0.4) AS v,
        greatest(s*0.1 - 1.0, 0.0) AS cost_v,
        greatest(s*0.12 + a*0.05 - 1.2, 0.0) AS cost_qt
      FROM tr),
      g AS (SELECT *,
        r + (1.0 - d) * """ + d(Gamma) + """ * coalesce(lead(v) OVER w, 0.0) AS q_tgt,
        a + (1.0 - d) * """ + d(Gamma) + """ * coalesce(lead(cost_v) OVER w, 0.0) AS cq_tgt
      FROM f WINDOW w AS (PARTITION BY episode_id ORDER BY t, s, reward, a, d)),
      h AS (SELECT *,
        (s*0.2 + a*0.3 - 0.1) - v AS adv,
        -(cost_qt - cost_v) AS cost_adv,
        (CASE WHEN cost_v - """ + d(CostThresh) + """ > 0.0 THEN 1.0 ELSE 0.0 END) * """ + d(MaxLag) + """ AS lag,
        (CASE WHEN cost_v < """ + d(SafeTheta) + """ THEN 1.0 ELSE 0.0 END)
          * (CASE WHEN cost_qt < """ + d(SafeTheta) + """ THEN 1.0 ELSE 0.0 END) AS mask,
        least(greatest(s*0.04 - 1.0, -1.0), 1.0) AS pi
      FROM g),
      i AS (SELECT *,
        least(exp(""" + d(Beta2) + """ * (adv + lag * cost_adv)), """ + d(ExpCap) + """) AS exp_adv,
        (pi - (a*2.0 - 1.0)) * (pi - (a*2.0 - 1.0)) AS bc
      FROM h)
      SELECT CAST(count(*) AS BIGINT) AS n,
        round(sum(abs(""" + d(IqlTau) + """ - (CASE WHEN adv < 0.0 THEN 1.0 ELSE 0.0 END)) * adv * adv), 4) AS value_loss_sum,
        round((sum(((s*0.25 + a*0.28) - q_tgt)*((s*0.25 + a*0.28) - q_tgt))
          + sum(((s*0.15 + a*0.32 + 0.2) - q_tgt)*((s*0.15 + a*0.32 + 0.2) - q_tgt))) / 2.0, 4) AS q_loss_halfsum,
        round(sum(abs(""" + d(IqlTau) + """ - (CASE WHEN cost_adv < 0.0 THEN 1.0 ELSE 0.0 END)) * cost_adv * cost_adv), 4) AS cost_v_loss_sum,
        round((sum(((s*0.1 + a*0.06) - cq_tgt)*((s*0.1 + a*0.06) - cq_tgt))
          + sum(((s*0.14 + a*0.04 - 0.3) - cq_tgt)*((s*0.14 + a*0.04 - 0.3) - cq_tgt))) / 2.0, 4) AS cost_q_loss_halfsum,
        CAST(sum(mask) AS BIGINT) AS n_safe,
        round(sum(exp_adv), 4) AS exp_adv_sum,
        round(sum(exp_adv * bc), 4) AS policy_loss_sum,
        """ + proundSql(d(1.0 - Tau) + "*0.2 + " + d(Tau) + "*(sum(q_tgt * s) / sum(s * s))", 6) + """ AS q_coef_soft_updated
      FROM i"""))

  /** TWO unrolled `train_one_step` iterations in ONE declarative DAG —
    * the training LOOP property the single-step queries can't show: the
    * soft-updated target-net parameter from step 1 (a scalar aggregate)
    * broadcasts back over the batch and changes step 2's advantage,
    * expectile loss, and next soft update, exactly the
    * `_update_q → soft_update → next iteration` recurrence
    * (reference fawac.py:357-373 + train loop train_fawac_iql.py:136-140).
    * Plan: the TD-target window computes ONCE (both steps read the same
    * episode-keyed frame), then two tree aggregates chained by a one-row
    * broadcast — the loop costs one extra reduction per step, never a
    * second corpus shuffle. The step-1 coefficient is portable-rounded
    * BEFORE step 2 consumes it, so cross-engine drift cannot compound
    * through the recurrence (the kmeansFit/doremi chaining rule). */
  private val e2eTrain2 = Q("e2e_train_2step",
    (s, dir) => {
      val tr = Tables.transitions(s, dir)
      val ord = Seq(col("t"), col("state0"), col("reward"), col("cost"), col("done"))
      val sC = col("state0"); val aC = col("cost")
      val rC = col("reward") * lit(RewScale)
      val vNet = element_at(ModelOps.mlp(array(sC), Seq(
        (Seq(Seq(0.3), Seq(-0.15)), Seq(-2.0, 4.0), ModelOps.relu),
        (Seq(Seq(0.5, -0.4)), Seq(0.05), ModelOps.identityAct))), 1)
      val base = JoinOps.tdTarget(tr.withColumn("v", vNet), "episode_id", ord,
        rC, col("done"), col("v"), Gamma, "q_tgt")
      def expectile(u: Column): Column =
        abs(lit(IqlTau) - CoreOps.indicator(u < lit(0.0))) * u * u
      def advWith(c: Column): Column = (sC * c + aC * lit(0.3) - lit(0.1)) - col("v")
      val s1 = base.agg(
        round(sum(expectile(advWith(lit(0.2)))), 4).as("value_loss_sum"),
        sum(col("q_tgt") * sC).as("__ts"), sum(sC * sC).as("__ss"))
        .select(col("value_loss_sum"),
          pround(lit(1.0 - Tau) * lit(0.2)
            + lit(Tau) * (col("__ts") / col("__ss")), 6).as("q_coef_after"))
      val s2 = base.crossJoin(broadcast(s1.select(col("q_coef_after").as("__c"))))
        .agg(round(sum(expectile(advWith(col("__c")))), 4).as("value_loss_sum"),
          first(col("__c")).as("__c2"),
          sum(col("q_tgt") * sC).as("__ts"), sum(sC * sC).as("__ss"))
        .select(lit(2L).as("step"), col("value_loss_sum"),
          pround(lit(1.0 - Tau) * col("__c2")
            + lit(Tau) * (col("__ts") / col("__ss")), 6).as("q_coef_after"))
      s1.select(lit(1L).as("step"), col("value_loss_sum"), col("q_coef_after"))
        .unionByName(s2).orderBy(col("step"))
    },
    Some {
      def advSql(c: String) = s"((s*$c + a*0.3 - 0.1) - v)"
      def lossSql(c: String) =
        s"""round(sum(abs(${d(IqlTau)} - (CASE WHEN ${advSql(c)} < 0.0
          THEN 1.0 ELSE 0.0 END)) * ${advSql(c)} * ${advSql(c)}), 4)"""
      s"""WITH tr AS (SELECT l_orderkey AS episode_id,
          CAST(l_linenumber AS BIGINT) AS t, l_quantity AS s,
          l_extendedprice*0.1 AS reward, l_discount*10.0 AS a,
          CASE WHEN l_returnflag='R' OR l_linestatus='F' THEN 1.0 ELSE 0.0 END AS d
        FROM lineitem),
        f AS (SELECT *, reward*0.001 AS r,
          0.05 + greatest(-2.0 + s*0.3, 0.0)*0.5
            + greatest(4.0 + s*(-0.15), 0.0)*(-0.4) AS v
        FROM tr),
        g AS (SELECT *,
          r + (1.0 - d) * ${d(Gamma)} * coalesce(lead(v) OVER w, 0.0) AS q_tgt
        FROM f WINDOW w AS (PARTITION BY episode_id ORDER BY t, s, reward, a, d)),
        s1 AS (SELECT ${lossSql("0.2")} AS loss,
          sum(q_tgt * s) AS ts, sum(s * s) AS ss FROM g),
        c2 AS (SELECT ${proundSql(d(1.0 - Tau) + "*0.2 + " + d(Tau) + "*(ts/ss)", 6)} AS c,
          ts, ss FROM s1),
        s2 AS (SELECT ${lossSql("(SELECT c FROM c2)")} AS loss FROM g)
        SELECT CAST(1 AS BIGINT) AS step, (SELECT loss FROM s1) AS value_loss_sum,
          (SELECT c FROM c2) AS q_coef_after
        UNION ALL
        SELECT CAST(2 AS BIGINT),
          (SELECT loss FROM s2),
          ${proundSql(
            d(1.0 - Tau) + "*(SELECT c FROM c2) + " + d(Tau)
              + "*((SELECT ts FROM c2)/(SELECT ss FROM c2))", 6)}
        ORDER BY step"""
    })

  /** The k-step training loop as a BOUNDED-LINEAGE incremental program —
    * the property the unrolled [[e2eTrain2]] DAG cannot show past a
    * handful of steps: each iteration's one-row coefficient frame is
    * `localCheckpoint`ed (the cap the bpeMerges scaladoc prescribes for
    * iterated optimize loops), so step i+1's plan references a LEAF, not
    * step i's full nested aggregate — per-iteration plan size is CONSTANT
    * in i instead of the O(i) (O(k²) total) growth of naive chaining.
    * The TD-target frame computes once into a tracked cache; each step
    * is then ONE tree aggregate over it (a k-iteration loop costs k
    * reductions, never k corpus shuffles — the
    * `_update_q → soft_update → next iteration` recurrence of reference
    * fawac.py:357-373 + train_fawac_iql.py:136-140 at any k).
    * Cross-engine parity composes stepwise: each coefficient is
    * portable-rounded BEFORE the next step consumes it (the
    * kmeansFit/doremi chaining rule), so drift cannot compound. */
  private[graft] def trainKStep(s: SparkSession, dir: String, k: Int): DataFrame = {
    val tr = Tables.transitions(s, dir)
    val ord = Seq(col("t"), col("state0"), col("reward"), col("cost"), col("done"))
    val sC = col("state0"); val aC = col("cost")
    val rC = col("reward") * lit(RewScale)
    val vNet = element_at(ModelOps.mlp(array(sC), Seq(
      (Seq(Seq(0.3), Seq(-0.15)), Seq(-2.0, 4.0), ModelOps.relu),
      (Seq(Seq(0.5, -0.4)), Seq(0.05), ModelOps.identityAct))), 1)
    val base = JoinOps.tdTarget(tr.withColumn("v", vNet), "episode_id", ord,
      rC, col("done"), col("v"), Gamma, "q_tgt")
      .select(sC, aC, col("v"), col("q_tgt"))
      .cache()
    def expectile(u: Column): Column =
      abs(lit(IqlTau) - CoreOps.indicator(u < lit(0.0))) * u * u
    def advWith(c: Column): Column = (sC * c + aC * lit(0.3) - lit(0.1)) - col("v")
    def step(coef: DataFrame): DataFrame =
      base.crossJoin(broadcast(coef))
        .agg(round(sum(expectile(advWith(col("__c")))), 4).as("value_loss_sum"),
          first(col("__c")).as("__cprev"),
          sum(col("q_tgt") * sC).as("__ts"), sum(sC * sC).as("__ss"))
        .select(col("value_loss_sum"),
          pround(lit(1.0 - Tau) * col("__cprev")
            + lit(Tau) * (col("__ts") / col("__ss")), 6).as("q_coef_after"))
    try {
      var coef = s.range(1).select(lit(0.2).as("__c"))
      val outs = (1 to k).map { i =>
        // eager localCheckpoint: runs this step's aggregate and truncates
        // the one-row result to a leaf — the next iteration's plan (and
        // the final union) never re-embeds this step's lineage
        val out = step(coef).localCheckpoint(true)
        coef = out.select(col("q_coef_after").as("__c"))
        out.select(lit(i.toLong).as("step"), col("value_loss_sum"),
          col("q_coef_after"))
      }
      outs.reduce(_ unionByName _).orderBy(col("step"))
    } finally base.unpersist(): Unit
  }

  private val e2eTrainK = Q("e2e_train_kstep",
    (s, dir) => trainKStep(s, dir, 4),
    Some {
      def advSql(c: String) = s"((s*$c + a*0.3 - 0.1) - v)"
      def lossSql(c: String) =
        s"""round(sum(abs(${d(IqlTau)} - (CASE WHEN ${advSql(c)} < 0.0
          THEN 1.0 ELSE 0.0 END)) * ${advSql(c)} * ${advSql(c)}), 4)"""
      def coefSql(prev: String) =
        proundSql(d(1.0 - Tau) + s"*$prev + " + d(Tau)
          + "*((SELECT ts FROM s0)/(SELECT ss FROM s0))", 6)
      val stepCtes = (1 to 4).map { i =>
        val prevC = if (i == 1) "0.2" else s"(SELECT c FROM c${i - 1})"
        s"""l$i AS (SELECT ${lossSql(prevC)} AS loss FROM g),
        c$i AS (SELECT ${coefSql(prevC)} AS c FROM s0)"""
      }.mkString(",\n        ")
      val rows = (1 to 4).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS step, (SELECT loss FROM l$i) AS value_loss_sum,
          (SELECT c FROM c$i) AS q_coef_after"""
      }.mkString("\n        UNION ALL\n        ")
      s"""WITH tr AS (SELECT l_orderkey AS episode_id,
          CAST(l_linenumber AS BIGINT) AS t, l_quantity AS s,
          l_extendedprice*0.1 AS reward, l_discount*10.0 AS a,
          CASE WHEN l_returnflag='R' OR l_linestatus='F' THEN 1.0 ELSE 0.0 END AS d
        FROM lineitem),
        f AS (SELECT *, reward*0.001 AS r,
          0.05 + greatest(-2.0 + s*0.3, 0.0)*0.5
            + greatest(4.0 + s*(-0.15), 0.0)*(-0.4) AS v
        FROM tr),
        g AS (SELECT *,
          r + (1.0 - d) * ${d(Gamma)} * coalesce(lead(v) OVER w, 0.0) AS q_tgt
        FROM f WINDOW w AS (PARTITION BY episode_id ORDER BY t, s, reward, a, d)),
        s0 AS (SELECT sum(q_tgt * s) AS ts, sum(s * s) AS ss FROM g),
        $stepCtes
        $rows
        ORDER BY step"""
    },
    eagerPlan = true) // construction runs the k per-step aggregate jobs

  /** The `obj_method="statewise_lagrangian"` training branch composed
    * end-to-end (fawac_configs.py:50 selects it; the paper's FAWAC-M
    * headline variant) — sibling of [[e2eTrain]], which composes the
    * `"penalty"` branch. Stage by stage, matching the torch control flow:
    *  - λ(s) = clamp(Softplus(MLP(s)), 0, λmax) — a genuine literal-weight
    *    2-unit ReLU hidden layer + Softplus head (P10,
    *    `lagrangian_fxn.forward`, fawac.py:166-175);
    *  - policy update takes λ from the NET, not the penalty gate
    *    (fawac.py:441-442 else-branch): net_adv = rew_adv + λ·cost_adv,
    *    exp_adv = min(exp(β·net_adv), cap), weighted-BC loss with the
    *    max/min weight diagnostics (fawac.py:447-456);
    *  - `_update_lagrangian`'s loss = mean(−λ(s)·(costV(s) − d))
    *    (fawac.py:486-492) plus its logging medley: max/min/median λ and
    *    the costV stats (fawac.py:494-513) — medians are the torch
    *    lower-median (A3 `AggOps.lowerMedian`; collect-based exact form,
    *    scale path = approxMedian per its scaladoc).
    * No TD windows here — rew_adv/cost_adv come from the frozen critic
    * heads directly, so the whole branch is a pure projection + ONE tree
    * aggregate: zero data shuffles at any scale. Sums + n are output
    * (means derive); per-row-derived outputs (max/min/median) are
    * portable-rounded — λ and exp_adv are transcendental, so sums round
    * at 4 digits (no lattice; see file scaladoc). */
  private val e2eTrainLag = Q("e2e_train_step_lagrangian",
    (s, dir) => {
      val tr = Tables.transitions(s, dir)
      val sC = col("state0")
      val aC = col("cost")
      val vNet = element_at(ModelOps.mlp(array(sC), Seq(
        (Seq(Seq(0.3), Seq(-0.15)), Seq(-2.0, 4.0), ModelOps.relu),
        (Seq(Seq(0.5, -0.4)), Seq(0.05), ModelOps.identityAct))), 1)
      val qTargetNet = sC * lit(0.2) + aC * lit(0.3) - lit(0.1)
      val costQt = CoreOps.clampMin(sC * lit(0.12) + aC * lit(0.05) - lit(1.2))
      val lagNet = element_at(ModelOps.mlp(array(sC), Seq(
        (Seq(Seq(0.2), Seq(-0.1)), Seq(0.1, 0.5), ModelOps.relu),
        (Seq(Seq(0.6, -0.8)), Seq(0.2), ModelOps.softplusAct))), 1)
      val base = tr
        .withColumn("v", vNet)
        .withColumn("cost_v", CoreOps.clampMin(sC * lit(0.1) - lit(1.0)))
        .withColumn("adv", qTargetNet - col("v"))
        .withColumn("cost_adv", -(costQt - col("cost_v")))
        .withColumn("lag", CoreOps.clamp(lagNet, 0.0, MaxLag))
        .withColumn("pi", CoreOps.clamp(sC * lit(0.04) - lit(1.0), -1.0, 1.0))
      val expAdv = CoreOps.expAdvantage(
        CoreOps.netAdvantage(col("adv"), col("cost_adv"), col("lag")),
        Beta2, ExpCap)
      val aNorm = aC * lit(2.0) - lit(1.0)
      val bc = (col("pi") - aNorm) * (col("pi") - aNorm)
      val full = base.withColumn("exp_adv", expAdv).withColumn("bc", bc)
      // medians: lag and cost_v are bounded-domain functions of the
      // integer-valued state, so the exact torch lower-median comes from
      // ONE tiny value-histogram + fold (AggOps.lowerMediansByHistogram)
      // instead of collecting the corpus into a single sort buffer — the
      // only piece of the branch that wasn't scale-free. Both medians
      // share the one histogram pass; the 1-row result broadcast-joins
      // the loss aggregate.
      val meds = AggOps.lowerMediansByHistogram(full,
        Seq("__med_lag" -> col("lag"), "__med_cost_v" -> col("cost_v")))
      full.agg(
        count(lit(1)).as("n"),
        round(sum(-col("lag") * (col("cost_v") - lit(CostThresh))), 4)
          .as("lag_loss_sum"),
        round(sum(col("lag")), 4).as("lag_sum"),
        pround(max(col("lag")), 6).as("max_lag_b"),
        pround(min(col("lag")), 6).as("min_lag_b"),
        round(sum(col("cost_v")), 4).as("cost_v_sum"),
        round(sum(col("exp_adv")), 4).as("exp_adv_sum"),
        pround(max(col("exp_adv")), 6).as("max_exp_adv"),
        pround(min(col("exp_adv")), 6).as("min_exp_adv"),
        round(sum(col("exp_adv") * col("bc")), 4).as("policy_loss_sum"))
        .crossJoin(broadcast(meds))
        .select(col("n"), col("lag_loss_sum"), col("lag_sum"),
          col("max_lag_b"), col("min_lag_b"),
          pround(col("__med_lag"), 6).as("median_lag_b"),
          col("cost_v_sum"),
          pround(col("__med_cost_v"), 6).as("median_cost_v_b"),
          col("exp_adv_sum"), col("max_exp_adv"), col("min_exp_adv"),
          col("policy_loss_sum"))
    },
    Some("""WITH tr AS (SELECT l_quantity AS s, l_discount*10.0 AS a FROM lineitem),
      f AS (SELECT *,
        0.05 + greatest(-2.0 + s*0.3, 0.0)*0.5 + greatest(4.0 + s*(-0.15), 0.0)*(-0.4) AS v,
        greatest(s*0.1 - 1.0, 0.0) AS cost_v,
        greatest(s*0.12 + a*0.05 - 1.2, 0.0) AS cost_qt
      FROM tr),
      g AS (SELECT *,
        (s*0.2 + a*0.3 - 0.1) - v AS adv,
        -(cost_qt - cost_v) AS cost_adv,
        least(greatest(ln(1.0 + exp(0.2 + greatest(0.1 + s*0.2, 0.0)*0.6 + greatest(0.5 + s*(-0.1), 0.0)*(-0.8))), 0.0), """ + d(MaxLag) + """) AS lag,
        least(greatest(s*0.04 - 1.0, -1.0), 1.0) AS pi
      FROM f),
      i AS (SELECT *,
        least(exp(""" + d(Beta2) + """ * (adv + lag * cost_adv)), """ + d(ExpCap) + """) AS exp_adv,
        (pi - (a*2.0 - 1.0)) * (pi - (a*2.0 - 1.0)) AS bc
      FROM g)
      SELECT CAST(count(*) AS BIGINT) AS n,
        round(sum(-lag * (cost_v - """ + d(CostThresh) + """)), 4) AS lag_loss_sum,
        round(sum(lag), 4) AS lag_sum,
        """ + proundSql("max(lag)", 6) + """ AS max_lag_b,
        """ + proundSql("min(lag)", 6) + """ AS min_lag_b,
        """ + proundSql("quantile_disc(lag, 0.5)", 6) + """ AS median_lag_b,
        round(sum(cost_v), 4) AS cost_v_sum,
        """ + proundSql("quantile_disc(cost_v, 0.5)", 6) + """ AS median_cost_v_b,
        round(sum(exp_adv), 4) AS exp_adv_sum,
        """ + proundSql("max(exp_adv)", 6) + """ AS max_exp_adv,
        """ + proundSql("min(exp_adv)", 6) + """ AS min_exp_adv,
        round(sum(exp_adv * bc), 4) AS policy_loss_sum
      FROM i"""))

  /** S3 trajectory-granular outlier filter (reference
    * train_fawac_iql.py:66-75 `outliers_percent` → dsrl pre_process_data):
    * per-episode total cost, drop every transition of the top-2.5%
    * costliest episodes. Threshold = exact discrete 0.975-quantile
    * (one aggregate + broadcast scalar — no global ranking window);
    * episode costs are lattice-rounded (cost = l_discount·10 has 1
    * decimal) so both engines compare identical doubles. */
  private val s3Outliers = Q("s3_outlier_trajectories",
    (s, dir) => SeqOps.dropOutlierTrajectories(Tables.transitions(s, dir),
      "episode_id", col("cost"), pct = 0.025, roundDigits = 1)
      .groupBy(col("episode_id"))
      .agg(min(col("episode_cost")).as("episode_cost"),
        count(lit(1)).as("n_t"))
      .orderBy(col("episode_id")),
    Some("""WITH tr AS (SELECT l_orderkey AS episode_id, l_discount*10.0 AS cost FROM lineitem),
      ep AS (SELECT episode_id, round(sum(cost), 1) AS ep_cost,
               CAST(count(*) AS BIGINT) AS n_t
             FROM tr GROUP BY episode_id),
      thr AS (SELECT quantile_disc(ep_cost, 0.975) AS t FROM ep)
      SELECT episode_id, ep_cost AS episode_cost, n_t
      FROM ep, thr WHERE ep_cost < t ORDER BY episode_id"""))

  /** W3 with the reference's episode-length cap exercised end-to-end
    * (fawac.py:601: rollouts stop at ≤300 steps; the synthetic sessions
    * are shorter, so the query caps at 20 to make the path bite at every
    * scale factor): per-user accumulation over only the first N events. */
  private val w3Capped = Q("w3_capped_accumulation",
    (s, dir) => SeqOps.sessionAgg(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"), lengthCap = Some(20))
      .select(col("user_id"), round(col("session_sum"), 4).as("session_sum"),
        col("session_len"), col("session_min"), col("session_max"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, round(sum(value), 4) AS session_sum,
      CAST(count(*) AS BIGINT) AS session_len,
      min(value) AS session_min, max(value) AS session_max
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts), event_id) AS rn FROM events)
      WHERE rn <= 20 GROUP BY user_id ORDER BY user_id"""))

  /** Backward as-of through the custom operator, verified against
    * DuckDB's NATIVE `ASOF LEFT JOIN` — engine-native as-of on both sides
    * (the other as-of oracles emulate with windows/subqueries). Payload is
    * the matched time itself, so equal-time tie choice cannot affect the
    * hash (see AsOfJoin scaladoc). */
  private val asofNativeOracle = Q("asof_join_native_oracle",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"),
          expr("ts div 1000").as("t_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), expr("ts div 1000").as("c_us"))
      JoinOps.asOfJoin(purchases, clicks, "user_id", "c_user", "t_us", "c_us")
        .select(col("user_id"), col("event_id"), col("value"),
          col("c_us").as("last_click_us"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH p AS (SELECT user_id, event_id, value, epoch_us(ts) AS t_us
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click')
      SELECT p.user_id, p.event_id, p.value, c.c_us AS last_click_us
      FROM p ASOF LEFT JOIN c ON p.user_id = c.c_user AND p.t_us >= c.c_us
      ORDER BY p.user_id, p.event_id"""))

  /** P10 at depth: TWO chained table-driven layers (64→8→4 ReLU), the
    * reference's multi-hidden-layer production inference shape
    * (fawac.py:112-144 nets are 2×256) — layer 1's activation table
    * re-joins layer 2's broadcast weight table (ModelOps.mlpFromTables).
    * Activations round per layer on BOTH sides so partial-sum order
    * differences cannot compound across layers. Layer 1 rounds at 6
    * (embedding sums are off-lattice; same accepted regime as
    * p10_table_inference); layer 2 rounds at 7 — its true values lie
    * EXACTLY on the 1e-7 lattice (6-decimal activations × 1-decimal
    * weights + 1-decimal bias), so 7 digits is the lattice-safe scale,
    * while rounding at 6 puts every value on a .5 boundary where engine
    * ulps decide (observed live at sf0.001). */
  private val p10Deep = Q("p10_deep_table_inference",
    (s, dir) => {
      val i1 = col("id") % 64
      val j1 = expr("id div 64")
      val w1 = s.range(8L * 64L).select(i1.as("i"), j1.as("j"),
        ((((lit(3) * j1 + lit(5) * i1) % 13) - lit(6)).cast("double") / lit(10.0)).as("w"))
      val i2 = col("id") % 8
      val j2 = expr("id div 8")
      val w2 = s.range(4L * 8L).select(i2.as("i"), j2.as("j"),
        ((((lit(7) * i2 + lit(11) * j2) % 9) - lit(4)).cast("double") / lit(10.0)).as("w"))
      val bias2: Column => Column = j =>
        (((lit(3) * j) % 5) - lit(2)).cast("double") / lit(10.0)
      ModelOps.mlpFromTables(Tables.embeddings(s, dir), "vec_id", "embedding", Seq(
        (w1, ModelOps.pseudoBias, ModelOps.relu, 6),
        (w2, bias2, ModelOps.relu, 7)))
        .orderBy(col("vec_id"), col("j"))
    },
    Some("""WITH i64 AS (SELECT unnest(range(64)) AS i),
      o8 AS (SELECT unnest(range(8)) AS j),
      i8 AS (SELECT unnest(range(8)) AS i),
      o4 AS (SELECT unnest(range(4)) AS j),
      x AS (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS x
            FROM embeddings CROSS JOIN i64),
      w1 AS (SELECT i, j, CAST(((3*j + 5*i) % 13) - 6 AS DOUBLE) / 10.0 AS w
            FROM i64 CROSS JOIN o8),
      h1 AS (SELECT vec_id, CAST(j AS BIGINT) AS j,
               round(greatest(sum(x * w) + CAST((5*j) % 7 - 3 AS DOUBLE) / 10.0, 0.0), 6) AS h
            FROM x JOIN w1 USING (i) GROUP BY vec_id, j),
      x2 AS (SELECT vec_id, j AS i, h AS x FROM h1),
      w2 AS (SELECT i, j, CAST(((7*i + 11*j) % 9) - 4 AS DOUBLE) / 10.0 AS w
            FROM i8 CROSS JOIN o4),
      h2 AS (SELECT vec_id, CAST(j AS BIGINT) AS j,
               round(greatest(sum(x * w) + CAST((3*j) % 5 - 2 AS DOUBLE) / 10.0, 0.0), 7) AS h
            FROM x2 JOIN w2 USING (i) GROUP BY vec_id, j)
      SELECT vec_id, j, h FROM h2 ORDER BY vec_id, j"""))

  /** DuckDB base CTE for the documents table with the tokenizer projected
    * (shared by the round-7 curation oracles; mirrors TextOps.tokens). */
  private val docsTokSql =
    """SELECT doc_id, text, source,
       list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
       FROM documents"""

  /** TextOps.qualityScore over columns (text, toks) — the same fragment
    * the x3_text_analysis oracle inlines, kept verbatim so they stay in
    * lockstep. */
  private val enHitsSql = {
    val words = TextOps.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> list_contains([$words], t)))"
  }
  private val qualitySql =
    s"""round((least(CAST(length(text) AS DOUBLE)/200.0, 1.0)
        + greatest(1.0 - (CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1)) * 4.0, 0.0)
        + least((CAST($enHitsSql AS DOUBLE) / greatest(len(toks), 1)) * 4.0, 1.0)) / 3.0, 6)"""

  /** X3 — PII scrub over deterministically injected addresses (the raw
    * documents carry no PII, so the query plants an email / IPv4 / phone
    * per modular doc_id class, then counts and redacts them — both
    * engines build the identical injected text, so the redacted md5 is
    * the full-fidelity check). */
  private val x3Pii = Q("x3_pii_redaction",
    (s, dir) => {
      val injected = concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example.com"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, concat(lit(" from 10."),
          (col("doc_id") % 200).cast("string"), lit(".0."),
          (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" call 555-010-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
      val (ne, ni, np) = TextOps.piiCounts(injected)
      Tables.documents(s, dir)
        .select(col("doc_id"), ne.as("n_emails"), ni.as("n_ips"), np.as("n_phones"),
          md5(TextOps.redactPii(injected)).as("red_fp"),
          length(TextOps.redactPii(injected)).cast("long").as("red_len"))
        .orderBy(col("doc_id"))
    },
    Some {
      val redSql = s"""regexp_replace(regexp_replace(regexp_replace(t,
          '${TextOps.EmailRe}', '<EMAIL>', 'g'),
          '${TextOps.Ipv4Re}', '<IP>', 'g'),
          '${TextOps.PhoneRe}', '<PHONE>', 'g')"""
      s"""WITH inj AS (SELECT doc_id, text
        || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
        || CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
      FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '${TextOps.EmailRe}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '${TextOps.Ipv4Re}')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(t, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phones,
        md5($redSql) AS red_fp,
        CAST(length($redSql) AS BIGINT) AS red_len
      FROM inj ORDER BY doc_id"""
    })

  /** X3 — per-domain cap + blocklist over synthesized URLs (source ×
    * doc_id mod 7 → ~140 hosts). Keeps each domain's 10 best documents
    * by quality. */
  private val x3Domain = Q("x3_domain_cap",
    (s, dir) => {
      import s.implicits._
      val blocked = Seq("src12.example.com", "src45.example.com").toDF("domain")
      val st = TextOps.textStats(col("text"))
      val scored = Tables.documents(s, dir)
        .withColumn("url", concat(lit("https://"), col("source"),
          (col("doc_id") % 7).cast("string"), lit(".example.com/p/"),
          col("doc_id").cast("string")))
        .withColumn("quality", TextOps.qualityScoreFromStats(st, col("text")))
      TextOps.domainCap(scored, "url", Seq(col("quality").desc, col("doc_id").asc),
        maxPerDomain = 10, blocklist = blocked)
        .select(col("doc_id"), col("domain"), col("quality"), col("rk"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS ($docsTokSql),
      q AS (SELECT doc_id, source, $qualitySql AS quality FROM base),
      d AS (SELECT doc_id, quality,
          regexp_extract('https://' || source || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com/p/' || CAST(doc_id AS VARCHAR),
            '^[a-z]+://([^/]+)/', 1) AS domain
        FROM q),
      f AS (SELECT * FROM d
        WHERE COALESCE(domain NOT IN ('src12.example.com', 'src45.example.com'), TRUE)),
      r AS (SELECT doc_id, domain, quality,
          row_number() OVER (PARTITION BY domain ORDER BY quality DESC, doc_id) AS rk FROM f)
      SELECT doc_id, domain, quality, CAST(rk AS BIGINT) AS rk
      FROM r WHERE rk <= 10 ORDER BY doc_id"""))

  /** X3 — logistic quality classifier (TextOps.classifierScore) with the
    * keep decision taken on the ROUNDED score, so the 0.55 threshold
    * compares identical doubles on both engines. */
  private val x3Clf = Q("x3_quality_classifier",
    (s, dir) => {
      val score = TextOps.classifierScore(col("text"))
      Tables.documents(s, dir).select(col("doc_id"), score.as("clf_score"),
        (score >= lit(0.55)).cast("long").as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS ($docsTokSql),
      f AS (SELECT doc_id,
          least(CAST(length(text) AS DOUBLE)/300.0, 1.0) AS f_len,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS f_punct,
          CAST($enHitsSql AS DOUBLE) / greatest(len(toks), 1) AS f_stop,
          CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS f_digit
        FROM base),
      z AS (SELECT doc_id,
          round(1.0/(1.0 + exp(-(1.8*f_len - 2.5*f_punct + 3.0*f_stop - 1.2*f_digit - 0.7))), 6) AS clf_score
        FROM f)
      SELECT doc_id, clf_score,
        CAST(CASE WHEN clf_score >= 0.55 THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM z ORDER BY doc_id"""))

  /** X6 — self-calibrating source-mixture resample: 5 target shares, the
    * binding source keeps 100%, the rest downsample to hit the mix. */
  private val MixTargets = Seq("src0" -> 25, "src1" -> 25, "src2" -> 20,
    "src3" -> 15, "src4" -> 15)
  private val x6Mixture = Q("x6_source_mixture",
    (s, dir) => Curation.mixtureSample(Tables.documents(s, dir), "doc_id", "source",
        MixTargets.toMap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("rate")).as("rate"))
      .orderBy(col("source")),
    Some {
      val caseSql = MixTargets.map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
      s"""WITH c AS (SELECT source, count(*) AS n_docs,
          CAST(CASE source $caseSql ELSE 0 END AS DOUBLE) / 100.0 AS share
        FROM documents GROUP BY source),
      c2 AS (SELECT * FROM c WHERE share > 0),
      t AS (SELECT min(CAST(n_docs AS DOUBLE) / share) AS tv FROM c2),
      r AS (SELECT source, CAST(floor(100.0 * share * tv / CAST(n_docs AS DOUBLE)) AS BIGINT) AS rate
        FROM c2, t),
      k AS (SELECT d.source, r.rate FROM documents d JOIN r USING (source)
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < r.rate)
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept, max(rate) AS rate
      FROM k GROUP BY source ORDER BY source"""
    })

  /** X3 — per-language adaptive quality gate (CCNet-style): keep the top
    * 40% of documents BY QUALITY WITHIN EACH LANGUAGE, so a low-resource
    * language is gated against its own distribution rather than starved
    * by a global threshold. Bound = positional quantile per group
    * ([[graft.ops.AggOps.qualityGate]]); quality is the shared 6-rounded
    * x3 formula, so the ≥-bound comparison sees identical doubles in
    * both engines. */
  private val x3QualityGate = Q("x3_quality_gate",
    (s, dir) => {
      val st = TextOps.textStats(col("text"))
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TextOps.qualityScoreFromStats(st, col("text")).as("q"))
      AggOps.qualityGate(scored, Seq("lang"), "q", keepTopFrac = 0.4)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), round(min(col("q")), 6).as("min_q"))
        .orderBy(col("lang"))
    },
    Some {
      val enWords = TextOps.stopwords("en").map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, text,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
        FROM documents),
      base AS (SELECT doc_id, lang,
          round((least(CAST(length(text) AS DOUBLE)/200.0, 1.0)
            + greatest(1.0 - (CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1)) * 4.0, 0.0)
            + least((CAST(len(list_filter(toks, t -> list_contains([$enWords], t))) AS DOUBLE)
                / greatest(len(toks), 1)) * 4.0, 1.0)) / 3.0, 6) AS q
        FROM t),
      b AS (SELECT lang, quantile_disc(q, 0.6) AS lo FROM base GROUP BY lang)
      SELECT base.lang, CAST(count(*) AS BIGINT) AS n_kept, round(min(q), 6) AS min_q
      FROM base JOIN b USING (lang) WHERE q >= lo
      GROUP BY base.lang ORDER BY lang"""
    })

  /** X6 — temperature mixture (mT5/XLM-R resampling: keep stratum l with
    * probability ∝ n_l^α): α = 0.5 flattens the source distribution so
    * small sources keep a larger share than proportional sampling gives
    * them. Float-parity plumbing lives in [[Curation.temperatureRates]]
    * (portable-rounded pow, ascending-fold weight sum); the oracle
    * replays the identical closed forms. */
  private val x6Temperature = Q("x6_temperature_mixture",
    (s, dir) => Curation.temperatureSample(Tables.documents(s, dir), "doc_id",
        "source", alpha = 0.5, totalTarget = 2000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("rate")).as("rate"))
      .orderBy(col("source")),
    Some("""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      w AS (SELECT source, n_docs,
          floor(pow(CAST(n_docs AS DOUBLE), 0.5) * 1e4 + 0.5) / 1e4 AS wv FROM c),
      t AS (SELECT list_sum(list_sort(list(wv))) AS sw FROM w),
      r AS (SELECT source, least(CAST(1000 AS BIGINT),
          CAST(floor(1000.0 * 2000.0 * wv / (sw * CAST(n_docs AS DOUBLE))) AS BIGINT)) AS rate
        FROM w, t),
      k AS (SELECT d.source, r.rate FROM documents d JOIN r USING (source)
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < r.rate)
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept, max(rate) AS rate
      FROM k GROUP BY source ORDER BY source"""))

  /** X6 — token-budget selection: quality-ordered prefix of the corpus
    * under a 6000-token budget. The oracle is the naive global running
    * sum; the Spark plan is the bucket-prefix decomposition (no global
    * window — see Curation.tokenBudgetSelect). */
  private val x6Budget = Q("x6_token_budget",
    (s, dir) => {
      val st = TextOps.textStats(col("text"))
      val scored = Tables.documents(s, dir).select(col("doc_id"),
        TextOps.qualityScoreFromStats(st, col("text")).as("q"),
        st.getField("n_tokens").cast("long").as("n"))
      Curation.tokenBudgetSelect(scored, "doc_id", col("q"), col("n"), budget = 6000L)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS ($docsTokSql),
      sc AS (SELECT doc_id, $qualitySql AS q, CAST(len(toks) AS BIGINT) AS n FROM base),
      c AS (SELECT doc_id, q, n, sum(n) OVER (ORDER BY q DESC, doc_id) AS cum FROM sc)
      SELECT doc_id, q, n AS n_tokens, CAST(cum - n AS BIGINT) AS start
      FROM c WHERE cum - n < 6000 ORDER BY doc_id"""))

  /** X3 — cross-document boilerplate strip: 8-token units recurring in
    * ≥3 distinct docs are cut everywhere; output fingerprints the
    * surviving text. The synthetic corpus genuinely repeats a handful of
    * position-aligned 8-grams across documents, so the ledger is
    * non-empty without any injection. */
  private val x3Boiler = Q("x3_boilerplate_strip",
    (s, dir) => TextOps.boilerplateStrip(Tables.documents(s, dir), "doc_id", "text",
        unitTokens = 8, minDf = 3)
      .orderBy(col("doc_id")),
    Some(s"""WITH base AS ($docsTokSql),
      ch AS (SELECT doc_id, i AS idx,
          array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS unit
        FROM (SELECT doc_id, toks,
                unnest(range(CAST(ceil(len(toks)/8.0) AS BIGINT))) AS i
              FROM base)),
      df AS (SELECT unit, count(DISTINCT doc_id) AS df FROM ch GROUP BY unit)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_units,
        CAST(sum(CASE WHEN df < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        md5(coalesce(string_agg(CASE WHEN df < 3 THEN unit END, ' ' ORDER BY idx), '')) AS kept_fp
      FROM ch JOIN df USING (unit) GROUP BY doc_id ORDER BY doc_id"""))

  /** X2 — distributed Lloyd's k-means fit (2 iterations) over the
    * embedding table: the training step behind x2_ivf_topk's centroid
    * table. Assignment is a broadcast fold (no corpus shuffle, no
    * window); the update shuffles only (cell, pos) partial sums. The
    * oracle unrolls both iterations as CTEs with the identical distance
    * association and portable per-iteration mean rounding, so iteration
    * 2's assignment compares bit-identical doubles. */
  private val x2Kmeans = Q("x2_kmeans_fit",
    (s, dir) => Similarity.kmeansFit(Tables.embeddings(s, dir), "vec_id", "embedding",
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2, roundDigits = 6)
      .orderBy(col("cell"), col("pos")),
    Some {
      val dpc = dotSql("pv", "cv"); val dcc = dotSql("cv", "cv")
      def distRk(cents: String) =
        s"""SELECT pid, pv, cell FROM (
          SELECT e.pid, e.pv, c.cell,
            row_number() OVER (PARTITION BY e.pid ORDER BY
              ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
          FROM e CROSS JOIN $cents c) WHERE rk = 1"""
      s"""WITH e AS (SELECT pid, pv, ${dotSql("pv", "pv")} AS pn FROM
          (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings)),
      c0 AS (SELECT CAST(vec_id AS BIGINT) AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id % 97 = 3),
      a0 AS (${distRk("c0")}),
      m0 AS (SELECT cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a0, range(64) t(i) GROUP BY cell, i),
      c1 AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m0 GROUP BY cell),
      a1 AS (${distRk("c1")})
      SELECT cell, CAST(i AS BIGINT) AS pos,
        floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS coord,
        CAST(count(*) AS BIGINT) AS n
      FROM a1, range(64) t(i) GROUP BY cell, i ORDER BY cell, pos"""
    })

  /** Shared oracle scaffolding for the PQ queries: 2 subspaces × 32 dims
    * over the 64-dim embeddings, seeds vec_id%97==3, 2 Lloyd iterations —
    * the per-subspace generalization of the x2_kmeans_fit CTE chain. */
  private def pqOracleCtes(seedMod: Int = 97, m: Int = 2): String = {
    val subd = 64 / m
    val dpc = dotSql("pv", "cv"); val dcc = dotSql("cv", "cv")
    def distRk(cents: String) =
      s"""SELECT pid, sub, pv, pn, cell FROM (
        SELECT e.pid, e.sub, e.pv, e.pn, c.cell,
          row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
            ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
        FROM e JOIN $cents c USING (sub)) WHERE rk = 1"""
    s"""WITH v AS (SELECT vec_id AS pid, embedding::DOUBLE[] AS v FROM embeddings),
      e0 AS (SELECT pid, s AS sub, v[s*$subd+1 : s*$subd+$subd] AS pv FROM v, range($m) t(s)),
      e AS (SELECT pid, sub, pv, ${dotSql("pv", "pv")} AS pn FROM e0),
      c0 AS (SELECT sub, CAST(pid AS BIGINT) AS cell, pv AS cv
        FROM e0 WHERE pid % $seedMod = 3),
      a0 AS (${distRk("c0")}),
      m0 AS (SELECT sub, cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a0, range($subd) t(i) GROUP BY sub, cell, i),
      c1 AS (SELECT sub, cell, list(m ORDER BY pos) AS cv FROM m0 GROUP BY sub, cell),
      a1 AS (${distRk("c1")})"""
  }

  /** X2 — PQ codebook training (Jégou et al. 2011): per-subspace Lloyd's
    * in one dataflow; see [[graft.ops.Similarity.pqTrain]] for the
    * broadcast-fold scale argument. */
  private val x2PqTrain = Q("x2_pq_train",
    (s, dir) => Similarity.pqTrain(Tables.embeddings(s, dir), "vec_id", "embedding",
        m = 2, dim = 64, seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      .orderBy(col("sub"), col("cell"), col("pos")),
    Some(s"""${pqOracleCtes()}
      SELECT sub, cell, CAST(i AS BIGINT) AS pos,
        floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS coord,
        CAST(count(*) AS BIGINT) AS n
      FROM a1, range(32) t(i) GROUP BY sub, cell, i ORDER BY sub, cell, pos"""))

  /** X2 — PQ encode + asymmetric-distance top-k chained onto the trained
    * codebooks: every corpus vector compresses to 2 sub-codes and queries
    * rank candidates by summed distance-table lookups. The ADC sum is one
    * FP add at m=2 (commutative — engine-order-safe without rounding);
    * ties break by candidate id. */
  private val x2PqSearch = Q("x2_pq_adc_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      Similarity.pqSearch(emb, "vec_id", "embedding", m = 2, dim = 64,
        codebooks = cb, queryPred = col("vec_id") < 3, k = 5)
        .orderBy(col("query_id"), col("rk"))
    },
    Some(s"""${pqOracleCtes()},
      m1 AS (SELECT sub, cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a1, range(32) t(i) GROUP BY sub, cell, i),
      cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv FROM m1 GROUP BY sub, cell),
      codes AS (SELECT pid, sub, cell AS code FROM (
        SELECT e.pid, e.sub, c.cell,
          row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
            ((e.pn - 2*${dotSql("pv", "cv")}) + ${dotSql("cv", "cv")}) ASC, c.cell ASC) AS rk
        FROM e JOIN cb c USING (sub)) WHERE rk = 1),
      dt AS (SELECT q.pid AS query_id, q.sub, c.cell AS code,
          ((q.pn - 2*${dotSql("q.pv", "c.cv")}) + ${dotSql("c.cv", "c.cv")}) AS d
        FROM e q JOIN cb c USING (sub) WHERE q.pid < 3),
      scored AS (SELECT dt.query_id, codes.pid,
          list_sum(list(dt.d ORDER BY dt.sub)) AS adc_dist
        FROM codes JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
        WHERE codes.pid <> dt.query_id GROUP BY dt.query_id, codes.pid),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc_dist ASC, pid ASC) AS rk FROM scored)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, pid AS cand_id, adc_dist
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""))

  /** X2 — Matryoshka (truncated-dimension) recall@5: rank by cosine over
    * the FIRST 16 of 64 dims and measure how much of the full-dimension
    * top-5 survives — the evaluation behind MRL-style dimension-truncated
    * serving (4× cheaper vectors; this query quantifies the retrieval
    * price, sibling of `x2_pq_recall` for the quantization axis). Both
    * rankings are brute-force over the same query stripe; the truncation
    * is a pure `slice` projection at the scan. */
  private val x2MatRecall = Q("x2_matryoshka_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .withColumn("emb16", slice(col("embedding"), 1, 16))
      val qp = cappedStripe(col("vec_id"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      val trunc = Similarity.bruteForceTopK(emb, "vec_id", "emb16", qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      recallOf(exact, trunc, k = 5)
    },
    Some {
      def cosine(q: String, c: String) =
        s"""round(list_sum(list_transform(range(len($q)), i -> $q[i+1]*$c[i+1]))
            / (sqrt(list_sum(list_transform(range(len($q)), i -> $q[i+1]*$q[i+1])))
             * sqrt(list_sum(list_transform(range(len($c)), i -> $c[i+1]*$c[i+1])))), 6)"""
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          (embedding::DOUBLE[])[1:16] AS v16 FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv, v16 AS qv16 FROM e
          WHERE vec_id % 100 = 0 AND vec_id < 800),
        fscored AS (SELECT query_id, e.vec_id AS cand_id,
            ${cosine("qv", "v")} AS cosine
          FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
        frk AS (SELECT query_id, cand_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, cand_id ASC) AS rk FROM fscored) WHERE rk <= 5),
        tscored AS (SELECT query_id, e.vec_id AS cand_id,
            ${cosine("qv16", "v16")} AS cosine
          FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
        trk AS (SELECT query_id, cand_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, cand_id ASC) AS rk FROM tscored) WHERE rk <= 5),
        h AS (SELECT f.query_id, count(*) AS n_hits
          FROM frk f JOIN trk t ON f.query_id = t.query_id AND f.cand_id = t.cand_id
          GROUP BY f.query_id)
        SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
          coalesce(h.n_hits, 0) / CAST(least(q.n_exact, 5) AS DOUBLE) AS recall
        FROM (SELECT query_id, count(*) AS n_exact FROM frk GROUP BY query_id) q
        LEFT JOIN h USING (query_id) ORDER BY query_id"""
    })

  /** X1 — edit-distance similarity join on a normalized 40-char key
    * ([[Dedup.editDistanceJoin]], the Ed-Join prefix-filter shape). The
    * oracle is BRUTE FORCE all-pairs Levenshtein, so this gate verifies
    * the prefix/length filter chain is lossless on real data — the
    * Spark side must find exactly the pairs the quadratic scan finds. */
  private val x1EditJoin = Q("x1_edit_distance_join",
    (s, dir) => Dedup.editDistanceJoin(Tables.documents(s, dir), "doc_id",
      lower(substring(col("text"), 1, 40)), maxDist = 2, q = 4),
    Some("""WITH k AS (SELECT doc_id AS id, lower(substr(text, 1, 40)) AS key
        FROM documents)
      SELECT a.id AS a_id, b.id AS b_id,
        CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
      FROM k a JOIN k b ON a.id < b.id
      WHERE levenshtein(a.key, b.key) <= 2
      ORDER BY a_id, b_id"""))

  /** X1 — bounded-output edit-distance neighbors ([[Dedup.editDistanceTopK]],
    * r17): the same lossless prefix-filter chain, emission capped at each
    * id's 3 nearest keys. The uncapped x1_edit_distance_join output grew
    * ×408 at ×10 data (near-clique replicas); this view's output is ≤ 3
    * rows per doc by construction. Oracle: brute-force all-pairs,
    * symmetrized, ranked. */
  private val x1EditTopK = Q("x1_edit_join_topk",
    (s, dir) => Dedup.editDistanceTopK(Tables.documents(s, dir), "doc_id",
      lower(substring(col("text"), 1, 40)), maxDist = 2, q = 4, k = 3)
      .orderBy(col("id"), col("nbr_id")),
    Some("""WITH k AS (SELECT doc_id AS id, lower(substr(text, 1, 40)) AS key
        FROM documents),
      p AS (SELECT a.id AS a_id, b.id AS b_id,
          CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM k a JOIN k b ON a.id < b.id
        WHERE levenshtein(a.key, b.key) <= 2),
      s AS (SELECT a_id AS id, b_id AS nbr_id, dist FROM p
        UNION ALL SELECT b_id AS id, a_id AS nbr_id, dist FROM p),
      rk AS (SELECT id, nbr_id, dist, row_number() OVER (PARTITION BY id
          ORDER BY dist ASC, nbr_id ASC) AS rk FROM s)
      SELECT id, nbr_id, dist FROM rk WHERE rk <= 3 ORDER BY id, nbr_id"""))

  /** X6 — DSIR-style target-domain data selection
    * ([[Curation.dsirWeights]]): hashed-token importance weights toward
    * the English slice, top-100 raw docs kept. The feature space is a
    * fixed 128-bucket hash range (corpus-independent — never a
    * vocabulary), the λ table one broadcast map row; the oracle replays
    * the identical closed form with the per-doc fold in token order. */
  private val x6Dsir = Q("x6_dsir_select",
    (s, dir) => Curation.dsirWeights(Tables.documents(s, dir), "text",
        col("lang") === "en", buckets = 128, alpha = 0.5, roundDigits = 4)
      .select(col("doc_id"), col("source"), col("lang"), col("n_toks"),
        col("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(100),
    Some("""WITH toks AS (SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      tok AS (SELECT doc_id, lang, i AS pos,
          CAST(('0x' || substr(md5(t[i+1]), 1, 15)) AS BIGINT) % 128 AS bucket
        FROM (SELECT doc_id, lang, t, unnest(range(len(t))) AS i FROM toks)),
      raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM tok GROUP BY bucket),
      tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM tok
        WHERE lang = 'en' GROUP BY bucket),
      tot AS (SELECT (SELECT sum(cr) FROM raw) AS tr, (SELECT sum(ct) FROM tgt) AS tt),
      lam AS (SELECT raw.bucket,
          ln((coalesce(ct, 0) + 0.5) / (tt + 64.0))
            - ln((cr + 0.5) / (tr + 64.0)) AS lam
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot),
      dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
          list_sum(list(lam ORDER BY pos)) AS wsum
        FROM tok JOIN lam USING (bucket) GROUP BY doc_id)
      SELECT d.doc_id, d.source, d.lang, n_toks,
        floor(wsum / n_toks * 10000.0 + 0.5) / 10000.0 AS weight
      FROM dw JOIN documents d USING (doc_id)
      ORDER BY weight DESC, d.doc_id LIMIT 100"""))

  /** X3 — per-source Zipf exponent ([[TextOps.zipfFit]]): OLS power-law
    * fit of the top-30 rank-size curve, every regression sum folded in
    * rank order on both engines; slope/intercept/r² round at 4 (log
    * values — irrational). */
  private val x3Zipf = Q("x3_zipf_fit", {
    (s, dir) =>
      TextOps.zipfFit(Tables.documents(s, dir), "doc_id", "source", "text",
          maxRank = 30, roundDigits = 4)
        .orderBy(col("source"))
  },
    Some {
      val n = "CAST(n_ranks AS DOUBLE)"
      val cov = s"($n*sxy - sx*sy)"
      val varx = s"($n*sxx - sx*sx)"
      val vary = s"($n*syy - sy*sy)"
      s"""WITH c AS (SELECT source, doc_id, CAST(len(list_filter(
            string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS BIGINT)
            AS n_toks FROM documents),
        r AS (SELECT source, doc_id, n_toks, row_number() OVER (
            PARTITION BY source ORDER BY n_toks DESC, doc_id ASC) AS rank
          FROM c WHERE n_toks > 0),
        k AS (SELECT source, rank, ln(CAST(rank AS DOUBLE)) AS lx,
            ln(CAST(n_toks AS DOUBLE)) AS ly
          FROM r WHERE rank <= 30),
        sums AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
            list_sum(list(lx ORDER BY rank)) AS sx,
            list_sum(list(ly ORDER BY rank)) AS sy,
            list_sum(list(lx*lx ORDER BY rank)) AS sxx,
            list_sum(list(lx*ly ORDER BY rank)) AS sxy,
            list_sum(list(ly*ly ORDER BY rank)) AS syy
          FROM k GROUP BY source HAVING count(*) >= 3)
        SELECT source, n_ranks,
          ${proundSql(s"$cov / $varx", 4)} AS slope,
          ${proundSql(s"(sy - ($cov / $varx) * sx) / $n", 4)} AS intercept,
          ${proundSql(s"($cov * $cov) / ($varx * $vary)", 4)} AS r2
        FROM sums ORDER BY source"""
    })

  /** X5 — HyperLogLog distinct-token estimate per source + the merged
    * union sketch ([[HyperLogLog]]): engine-exact by construction
    * (integer register maxes, dyadic 2^−m sums, generated comparison
    * chain instead of float log2), checked against the exact distinct
    * count with the relative error in the output. */
  private val x5Hll = Q("x5_hll_distinct",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      val regs = HyperLogLog.registers(toks, "source", col("tok"))
      val est = HyperLogLog.estimate(
        regs.unionAll(HyperLogLog.unionRegisters(regs, "source")), "source")
      val exact = toks.groupBy(col("source"))
        .agg(count_distinct(col("tok")).as("n_exact"))
        .unionAll(toks.agg(count_distinct(col("tok")).as("n_exact"))
          .select(lit("__all__").as("source"), col("n_exact")))
      est.join(exact, Seq("source"))
        .withColumn("rel_err",
          pround((col("estimate") - col("n_exact")) / col("n_exact"), 4))
        .orderBy(col("source"))
    },
    Some {
      val m = 256.0
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      // DuckDB parses bare float literals as DECIMAL; the sketch math has
      // no DOUBLE column to promote against, so cast the anchors explicitly
      val mD = s"CAST(${d(m)} AS DOUBLE)"
      val rank = (1 to 20).map(r =>
        s"WHEN w >= ${1L << (20 - r)} THEN ${r}").mkString(
        "CASE ", " ", " ELSE 21 END")
      s"""WITH toks AS (SELECT source, unnest(list_filter(
            string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS tok
          FROM documents),
        h AS (SELECT source, tok,
            CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
          FROM toks),
        rk AS (SELECT source, hv % 256 AS bucket, $rank AS rank
          FROM (SELECT source, tok, hv, (hv // 256) % 1048576 AS w FROM h)),
        regs0 AS (SELECT source, bucket, max(rank) AS m_j FROM rk
          GROUP BY source, bucket),
        regs AS (SELECT * FROM regs0 UNION ALL
          SELECT '__all__' AS source, bucket, max(m_j) AS m_j FROM regs0
          GROUP BY bucket),
        agg AS (SELECT source, count(*) AS observed,
            sum(CAST(1.0 AS DOUBLE) / (1 << m_j)) AS zsum
          FROM regs GROUP BY source),
        est AS (SELECT source,
            CAST($mD - observed AS BIGINT) AS v_zero,
            CASE WHEN ((CAST(${d(alpha)} AS DOUBLE) * $mD) * $mD)
                / (($mD - observed) + zsum) <= $mD * CAST(2.5 AS DOUBLE)
                AND ($mD - observed) > 0
              THEN ${proundSql(s"$mD * ln($mD / ($mD - observed))", 4)}
              ELSE ${proundSql(
                s"((CAST(${d(alpha)} AS DOUBLE) * $mD) * $mD) / (($mD - observed) + zsum)", 4)}
            END AS estimate
          FROM agg),
        ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
          FROM toks GROUP BY source UNION ALL
          SELECT '__all__', CAST(count(DISTINCT tok) AS BIGINT) FROM toks)
        SELECT est.source, v_zero, estimate, n_exact,
          ${proundSql("(estimate - n_exact) / CAST(n_exact AS DOUBLE)", 4)} AS rel_err
        FROM est JOIN ex ON est.source = ex.source
        ORDER BY est.source"""
    })

  /** A-family — robust MAD outliers ([[AggOps.madOutliers]]): per
    * event-type |x − median| > k·MAD flags; rank-picked med/MAD are data
    * values (exact), every comparison rational — no rounding anywhere. */
  private val aMad = Q("a_mad_outliers",
    (s, dir) => AggOps.madOutliers(
        Tables.events(s, dir).where(col("value").isNotNull)
          .select(col("event_type"), col("event_id"), col("value")),
        Seq("event_type"), "value", k = 4.45)
      .where(col("is_outlier"))
      .select(col("event_type"), col("event_id"), col("value"),
        col("med"), col("mad"))
      .orderBy(col("event_type"), col("event_id")),
    Some("""WITH v AS (SELECT event_type, event_id, value FROM events
        WHERE value IS NOT NULL),
      m AS (SELECT event_type, med FROM (
        SELECT event_type, value AS med,
          row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n FROM v)
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)),
      d AS (SELECT v.event_type, v.event_id, v.value, m.med,
          abs(v.value - m.med) AS dev
        FROM v JOIN m USING (event_type)),
      md AS (SELECT event_type, mad FROM (
        SELECT event_type, dev AS mad,
          row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n FROM d)
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT))
      SELECT d.event_type, event_id, value, med, mad
      FROM d JOIN md USING (event_type)
      WHERE dev > 4.45 * mad ORDER BY d.event_type, event_id"""))

  /** X3 — n-gram diversity ([[TextOps.ngramDiversity]]): per-source
    * unigram/bigram type-token ratios — the mode-collapse diagnostic;
    * exact-integer divisions rounded portably at 6. */
  private val x3Diversity = Q("x3_ngram_diversity",
    (s, dir) => TextOps.ngramDiversity(Tables.documents(s, dir), "source", "text")
      .orderBy(col("source")),
    Some("""WITH toks AS (SELECT source,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      uni AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unigrams,
          CAST(count(DISTINCT g) AS BIGINT) AS d_unigrams
        FROM (SELECT source, unnest(t) AS g FROM toks) GROUP BY source),
      bi AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(count(DISTINCT g) AS BIGINT) AS d_bigrams
        FROM (SELECT source, unnest(list_transform(range(len(t) - 1),
            i -> t[i+1] || ' ' || t[i+2])) AS g
          FROM toks WHERE len(t) >= 2) GROUP BY source)
      SELECT uni.source, n_unigrams, d_unigrams,
        floor(CAST(d_unigrams AS DOUBLE) / n_unigrams * 1000000.0 + 0.5)
          / 1000000.0 AS ttr,
        coalesce(n_bigrams, 0) AS n_bigrams,
        coalesce(d_bigrams, 0) AS d_bigrams,
        floor(coalesce(CAST(d_bigrams AS DOUBLE) / n_bigrams, 0.0)
          * 1000000.0 + 0.5) / 1000000.0 AS bigram_ttr
      FROM uni LEFT JOIN bi ON bi.source = uni.source
      ORDER BY uni.source"""))

  /** X3 — markup stripping ([[TextOps.stripMarkup]]): each document is
    * deterministically wrapped in HTML scaffolding (tags + a script
    * block + entities) and the strip must recover exactly the original
    * text — fingerprint-compared so the dump stays narrow. Both engines
    * build the same wrapped string and replay the same regex chain. */
  private val x3Strip = Q("x3_strip_markup", {
    (s, dir) =>
      val html = concat(lit("<html><body><p class=\"x\">"), col("text"),
        lit("</p><script type=\"text/javascript\">var a = 1 < 2;</script>" +
          "&amp;&#169; tail</body></html>"))
      Tables.documents(s, dir).select(col("doc_id"),
          length(html).cast("long").as("n_raw"),
          TextOps.stripMarkup(html).as("clean"))
        .select(col("doc_id"), col("n_raw"),
          length(col("clean")).cast("long").as("n_clean"),
          md5(col("clean")).as("fp"))
        .orderBy(col("doc_id"))
  },
    Some("""WITH h AS (SELECT doc_id,
          '<html><body><p class="x">' || text ||
          '</p><script type="text/javascript">var a = 1 < 2;</script>' ||
          '&amp;&#169; tail</body></html>' AS html
        FROM documents),
      s1 AS (SELECT doc_id, html, regexp_replace(html,
          '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t1
        FROM h),
      s2 AS (SELECT doc_id, html,
          regexp_replace(t1, '<[^>]*>', ' ', 'g') AS t2 FROM s1),
      s3 AS (SELECT doc_id, html,
          regexp_replace(t2, '&[a-zA-Z]+;|&#[0-9]+;', ' ', 'g') AS t3 FROM s2),
      s4 AS (SELECT doc_id, html,
          trim(regexp_replace(t3, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean FROM s3)
      SELECT doc_id, CAST(length(html) AS BIGINT) AS n_raw,
        CAST(length(clean) AS BIGINT) AS n_clean, md5(clean) AS fp
      FROM s4 ORDER BY doc_id"""))

  /** X3 — in-engine classifier training ([[TextOps.trainHashClassifier]]):
    * 3 unrolled full-batch GD steps of a 32-bucket hashed logistic model
    * with lang='en' as the label. Residual + mean gradient round at 6,
    * η = 0.5 is dyadic, so both engines hold bit-identical weights after
    * every step; iteration CTEs MATERIALIZED (each level referenced by
    * score + gradient + update). */
  /** Shared trainer oracle CTE chain (32 buckets, lang='en' label,
    * η = 0.5): featurization + `iters` unrolled GD steps ending at
    * `w<iters>(bucket, w)` — used by the weight dump and the
    * train-then-apply scoring query. */
  private def trainCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      val p = s"w${i - 1}"
      s"""s$i AS MATERIALIZED (SELECT doc_id, y,
          list_sum(list(w.w * xt.x ORDER BY xt.bucket)) AS s
          FROM xt JOIN $p w USING (bucket) GROUP BY doc_id, y),
        r$i AS MATERIALIZED (SELECT doc_id,
          floor((1.0 / (1.0 + exp(-s)) - y) * 1000000.0 + 0.5) / 1000000.0 AS r
          FROM s$i),
        g$i AS MATERIALIZED (SELECT bucket,
          floor(sum(r * x) / (SELECT n FROM nn) * 1000000.0 + 0.5) / 1000000.0 AS g
          FROM xt JOIN r$i USING (doc_id) GROUP BY bucket),
        w$i AS MATERIALIZED (SELECT w.bucket,
          w.w - 0.5 * coalesce(g.g, 0.0) AS w
          FROM $p w LEFT JOIN g$i g USING (bucket))"""
    }.mkString(",\n        ")
    s"""toks AS (SELECT doc_id,
        CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
      FROM documents),
      tok AS MATERIALIZED (SELECT doc_id, y, CAST(len(t) AS DOUBLE) AS n_toks,
        CAST(('0x' || substr(md5(t[i+1]), 1, 15)) AS BIGINT) % 32 AS bucket
        FROM (SELECT doc_id, y, t, unnest(range(len(t))) AS i FROM toks)
        WHERE len(t) > 0),
      xt AS MATERIALIZED (SELECT doc_id, y, bucket,
        CAST(count(*) AS DOUBLE) / n_toks AS x
        FROM tok GROUP BY doc_id, y, n_toks, bucket),
      nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM xt),
      w0 AS (SELECT CAST(unnest(range(32)) AS BIGINT) AS bucket, 0.0 AS w),
      $steps"""
  }

  private val x3Train = Q("x3_train_classifier",
    (s, dir) => TextOps.trainHashClassifier(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", buckets = 32, iters = 3)
      .orderBy(col("bucket")),
    Some(s"""WITH ${trainCtes(3)}
        SELECT bucket, w AS weight FROM w3 ORDER BY bucket"""),
    eagerPlan = true) // construction materializes each step's weight table

  /** X3 — train-then-apply ([[TextOps.applyHashClassifier]]): the
    * 3-step-trained weights score every document (optimize-then-apply,
    * the DoReMi pattern on the classifier); scores round at 6. */
  private val x3Apply = Q("x3_classifier_scores",
    (s, dir) => {
      val w = TextOps.trainHashClassifier(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", buckets = 32, iters = 3)
      TextOps.applyHashClassifier(Tables.documents(s, dir), "doc_id", "text",
          w, buckets = 32)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${trainCtes(3)},
        sc AS (SELECT doc_id, list_sum(list(w.w * xt.x ORDER BY xt.bucket)) AS s
          FROM xt JOIN w3 w USING (bucket) GROUP BY doc_id)
        SELECT doc_id,
          floor((1.0 / (1.0 + exp(-s))) * 1000000.0 + 0.5) / 1000000.0 AS score
        FROM sc ORDER BY doc_id"""),
    eagerPlan = true) // training inside runs the per-step materialization

  /** X3 — CLASSIFIER-WEIGHTS artifact round-trip (r17, the last trained
    * family without an oracle-gated save→load→apply): the 3-step GD
    * weight table commits to the versioned store, loads back in a fresh
    * read, and every document scores against the LOADED weights. Oracle =
    * the `x3_classifier_scores` replay from source rows (identical SQL —
    * the store must be invisible to the result), completing the artifact
    * gate across all five trained families: centroids, PQ codebooks, PCA
    * components, BPE merges, classifier weights. */
  private lazy val x3ClfArtifactRt = Q("x3_classifier_artifact_apply",
    (s, dir) => {
      val root = "/tmp/graft_art_clfw_" + Tables.scratchTag(s, dir)
      val w = TextOps.trainHashClassifier(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", buckets = 32, iters = 3)
      val v = Artifacts.saveArtifact(w, root, "classifier_weights",
        Map("buckets" -> "32", "iters" -> "3", "label" -> "lang=en"))
      val (loaded, meta) = Artifacts.loadArtifactVersion(s, root, v,
        "classifier_weights")
      require(meta.params("buckets") == "32", "sidecar params must round-trip")
      TextOps.applyHashClassifier(Tables.documents(s, dir), "doc_id", "text",
          loaded, buckets = 32)
        .orderBy(col("doc_id"))
    },
    x3Apply.oracle,
    eagerPlan = true) // constructing commits the artifact version on disk

  /** X6 — per-source epoch upsampling ([[Curation.upsampleBy]]):
    * src0 runs 2.5 epochs, src1 1.3, src2 is downsampled to 40% —
    * whole-copy explode + stable id-bucket slice for the remainder,
    * all-integer replayable rate math. */
  private val x6Upsample = Q("x6_upsample_epochs",
    (s, dir) => Curation.upsampleBy(Tables.documents(s, dir), "doc_id", "source",
        Map("src0" -> 250, "src1" -> 130, "src2" -> 40))
      .select(col("doc_id"), col("source"), col("copy"))
      .orderBy(col("doc_id"), col("copy")),
    Some("""WITH p AS (SELECT doc_id, source,
          CASE source WHEN 'src0' THEN 250 WHEN 'src1' THEN 130
            WHEN 'src2' THEN 40 ELSE 100 END AS pct
        FROM documents),
      c AS (SELECT doc_id, source, pct // 100
          + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 100 < pct % 100 THEN 1 ELSE 0 END AS n
        FROM p)
      SELECT doc_id, source, CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy
      FROM c WHERE n > 0 ORDER BY doc_id, copy"""))

  /** X6 — weighted sampling without replacement
    * ([[Curation.weightedSample]], Efraimidis–Spirakis): 100 docs drawn
    * ∝ n_chars with deterministic md5 uniforms; the ln(u)/w draw key
    * rounds at 6 BEFORE ranking so both engines rank identically. */
  private val x6Weighted = Q("x6_weighted_sample",
    (s, dir) => Curation.weightedSample(Tables.documents(s, dir), "doc_id",
        col("n_chars").cast("double"), k = 100)
      .select(col("doc_id"), col("source"), col("n_chars"), col("draw_key"))
      .orderBy(col("draw_key").desc, col("doc_id")),
    Some(s"""WITH k AS (SELECT doc_id, source, n_chars,
        floor(ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws1'), 1, 15))
              AS BIGINT) AS DOUBLE) + 1.0) / ${d(math.pow(2.0, 60))})
            / CAST(n_chars AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS draw_key
        FROM documents WHERE n_chars > 0)
      SELECT doc_id, source, n_chars, draw_key FROM k
      ORDER BY draw_key DESC, doc_id LIMIT 100"""))

  /** X8 — top-20 three-step session paths ([[GraphOps.topPaths]]): the
    * funnel/path-mining n-gram view of the event stream; incomplete
    * tails dropped. */
  private val x8Paths = Q("x8_session_paths",
    (s, dir) => GraphOps.topPaths(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("event_type"), n = 3, topK = 20),
    Some("""WITH s AS (SELECT user_id, event_type, epoch_ns(ts) AS tns,
          event_id FROM events),
      t AS (SELECT event_type AS s0,
          lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
        FROM s WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
      SELECT s0 || '>' || s1 || '>' || s2 AS path,
        CAST(count(*) AS BIGINT) AS n_paths
      FROM t WHERE s2 IS NOT NULL
      GROUP BY path ORDER BY n_paths DESC, path LIMIT 20"""))

  /** Shared oracle CTEs: the per-user state-transition graph over the
    * events table (state = the `props.k` catalog item, successor by
    * (ts, event_id) within user). */
  private val x8EdgeCtes =
    """s AS (SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        epoch_ns(ts) AS tns, event_id FROM events),
      t AS (SELECT user_id, k AS src, lead(k) OVER (PARTITION BY user_id
          ORDER BY tns, event_id) AS dst FROM s)"""

  private def x8Edges(s: SparkSession, dir: String): DataFrame =
    GraphOps.transitionEdges(Tables.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")),
      get_json_object(col("props"), "$.k").cast("long"))

  /** X8 — the transition graph itself ([[GraphOps.transitionEdges]]):
    * consecutive per-user states paired by a lead window, multiplicity
    * counted — the edge list the graph family consumes. NULL-src edges
    * (an event whose props lacks the state key) are dropped here like
    * in every downstream graph op — beyond the not-a-node semantics,
    * keeping them would also diverge the ordered gate (Spark sorts
    * NULLS FIRST on asc, DuckDB NULLS LAST). */
  private val x8Graph = Q("x8_transition_graph",
    (s, dir) => x8Edges(s, dir).where(col("src").isNotNull)
      .orderBy(col("src"), col("dst")),
    Some(s"""WITH $x8EdgeCtes
      SELECT src, dst, CAST(count(*) AS BIGINT) AS weight FROM t
      WHERE dst IS NOT NULL AND src IS NOT NULL
      GROUP BY src, dst ORDER BY src, dst"""))

  /** X8 — weighted PageRank over the transition graph
    * ([[GraphOps.pagerank]]), 5 unrolled iterations with uniform teleport
    * and dangling-mass redistribution; ranks re-round at 8 digits every
    * iteration so engine-ordered in-sums re-synchronize (the PCA
    * power-iteration determinism contract). The oracle unrolls the same
    * recurrence as chained CTEs. */
  private val x8Pagerank = Q("x8_pagerank_states",
    (s, dir) => GraphOps.pagerank(x8Edges(s, dir), beta = 0.85, iters = 5,
        roundDigits = 8)
      .orderBy(col("rank").desc, col("node")),
    Some {
      val beta = 0.85
      val oneMinus = d(1.0 - beta)
      val steps = (1 to 5).map { i =>
        val p = s"r${i - 1}"
        s"""dm$i AS (SELECT coalesce(sum(r), 0.0) / (SELECT n FROM nn) AS dm
            FROM $p WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = $p.node)),
          ins$i AS (SELECT e.dst AS node, sum(e.w / o.ow * p.r) AS insum
            FROM e JOIN outw o ON o.src = e.src JOIN $p p ON p.node = e.src
            GROUP BY e.dst),
          r$i AS (SELECT nodes.node, ${proundSql(
            s"$oneMinus / (SELECT n FROM nn) + ${d(beta)} * " +
              s"(coalesce(i.insum, 0.0) + (SELECT dm FROM dm$i))", 8)} AS r
            FROM nodes LEFT JOIN ins$i i ON i.node = nodes.node)"""
      }.mkString(",\n        ")
      s"""WITH $x8EdgeCtes,
        e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM t
          WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
        $steps
        SELECT node, r AS rank FROM r5 ORDER BY rank DESC, node"""
    },
    eagerPlan = true) // construction materializes each iteration's ranks

  /** X8 — PERSONALIZED PageRank ([[GraphOps.pagerankPersonalized]]):
    * teleport and dangling mass restricted to the seed items 0..9, so
    * ranks measure random-walk-with-restart proximity to the seeds.
    * Same unrolled-CTE oracle discipline as the uniform query. */
  private val x8Ppr = Q("x8_personalized_pagerank",
    (s, dir) => GraphOps.pagerankPersonalized(x8Edges(s, dir),
        s.range(0, 10).select(col("id").as("node")),
        beta = 0.85, iters = 5, roundDigits = 8)
      .orderBy(col("rank").desc, col("node")),
    Some {
      val beta = 0.85
      val steps = (1 to 5).map { i =>
        val p = s"r${i - 1}"
        s"""dm$i AS (SELECT coalesce(sum(r), 0.0) AS dmt FROM $p
            WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = $p.node)),
          ins$i AS (SELECT e.dst AS node, sum(e.w / o.ow * p.r) AS insum
            FROM e JOIN outw o ON o.src = e.src JOIN $p p ON p.node = e.src
            GROUP BY e.dst),
          r$i AS (SELECT tp.node, ${proundSql(
            s"${d(1.0 - beta)} * tp.tp + ${d(beta)} * " +
              s"(coalesce(i.insum, 0.0) + (SELECT dmt FROM dm$i) * tp.tp)", 8)} AS r
            FROM tp LEFT JOIN ins$i i ON i.node = tp.node)"""
      }.mkString(",\n        ")
      s"""WITH $x8EdgeCtes,
        e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM t
          WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
        sn AS (SELECT CAST(count(*) AS DOUBLE) AS nseeds FROM nodes
          WHERE node < 10),
        tp AS (SELECT node, CASE WHEN node < 10
            THEN 1.0 / (SELECT nseeds FROM sn) ELSE CAST(0.0 AS DOUBLE) END AS tp
          FROM nodes),
        r0 AS (SELECT node, tp AS r FROM tp),
        $steps
        SELECT node, r AS rank FROM r5 ORDER BY rank DESC, node"""
    },
    eagerPlan = true) // construction materializes each iteration's ranks

  /** X8 — HITS hubs & authorities ([[GraphOps.hits]]) on the state
    * transition graph: max-normalized so the per-iteration normalizer is
    * order-exact on both engines; same unrolled-CTE oracle discipline as
    * the PageRank queries. */
  private val x8Hits = Q("x8_hits_states",
    (s, dir) => GraphOps.hits(x8Edges(s, dir), iters = 5, roundDigits = 8)
      .orderBy(col("authority").desc, col("node")),
    Some {
      // every iteration CTE is MATERIALIZED: unlike the pagerank unroll
      // (2 refs/level → 2^5, tolerable inlined), HITS references each
      // level 4× (araw → max + normalize, authority → hub sum + output),
      // so DuckDB's default CTE inlining expands the events scan 4^5
      // times and the oracle never finishes
      val steps = (1 to 5).map { i =>
        val p = s"h${i - 1}"
        s"""ar$i AS MATERIALIZED (SELECT e.dst AS node, sum(e.w * p.h) AS araw
            FROM e JOIN $p p ON p.node = e.src GROUP BY e.dst),
          am$i AS MATERIALIZED (SELECT max(araw) AS m FROM ar$i),
          a$i AS MATERIALIZED (SELECT n.node, ${proundSql(
            s"coalesce(ar.araw, 0.0) / (SELECT m FROM am$i)", 8)} AS a
            FROM nodes n LEFT JOIN ar$i ar ON ar.node = n.node),
          hr$i AS MATERIALIZED (SELECT e.src AS node, sum(e.w * a.a) AS hraw
            FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
          hm$i AS MATERIALIZED (SELECT max(hraw) AS m FROM hr$i),
          h$i AS MATERIALIZED (SELECT n.node, ${proundSql(
            s"coalesce(hr.hraw, 0.0) / (SELECT m FROM hm$i)", 8)} AS h
            FROM nodes n LEFT JOIN hr$i hr ON hr.node = n.node)"""
      }.mkString(",\n        ")
      s"""WITH $x8EdgeCtes,
        e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM t
          WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        h0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes),
        $steps
        SELECT h5.node, h5.h AS hub, a5.a AS authority
        FROM h5 JOIN a5 ON a5.node = h5.node
        ORDER BY authority DESC, h5.node"""
    },
    eagerPlan = true) // construction materializes each iteration's scores

  /** X8 — per-node triangle counts ([[GraphOps.triangleCounts]]) on the
    * undirected state graph. Spark pivots each triangle at its
    * (degree, id)-minimal node (skew-safe orientation); the oracle
    * enumerates canonical a<b<c id-ordered triangles — same triangle
    * set, so the integer counts agree exactly. */
  private val x8Tri = Q("x8_triangle_counts",
    (s, dir) => GraphOps.triangleCounts(x8Edges(s, dir))
      .orderBy(col("n_triangles").desc, col("node")),
    Some(s"""WITH $x8EdgeCtes,
        e AS (SELECT src, dst FROM t
          WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
        c AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e WHERE src <> dst),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT a AS node FROM c UNION ALL SELECT b FROM c)),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM c e1 JOIN c e2 ON e2.a = e1.b
          JOIN c e3 ON e3.a = e1.a AND e3.b = e2.b),
        corners AS (SELECT x AS node FROM tri UNION ALL
          SELECT y FROM tri UNION ALL SELECT z FROM tri),
        cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
          FROM corners GROUP BY node)
        SELECT n.node, coalesce(cnt.n_triangles, 0) AS n_triangles
        FROM nodes n LEFT JOIN cnt ON cnt.node = n.node
        ORDER BY n_triangles DESC, n.node"""))

  /** X8 — hop distances from the seed states 0..9
    * ([[GraphOps.hopDistances]]): 5 unrolled Bellman-Ford rounds,
    * all-integer, nodes beyond 5 hops stay NULL. Iteration CTEs are
    * MATERIALIZED (each round is referenced twice — keep + relax). */
  private val x8Hops = Q("x8_hop_distances",
    (s, dir) => GraphOps.hopDistances(x8Edges(s, dir),
        s.range(0, 10).select(col("id").as("node")), maxHops = 5)
      .orderBy(col("hops").asc_nulls_last, col("node")),
    Some {
      val steps = (1 to 5).map { i =>
        val p = s"d${i - 1}"
        s"""rx$i AS MATERIALIZED (SELECT e.dst AS node,
            min(p.hops) + 1 AS relax
            FROM e JOIN $p p ON p.node = e.src GROUP BY e.dst),
          d$i AS MATERIALIZED (SELECT coalesce(d.node, r.node) AS node,
            least(coalesce(d.hops, r.relax), coalesce(r.relax, d.hops)) AS hops
            FROM $p d FULL OUTER JOIN rx$i r ON r.node = d.node)"""
      }.mkString(",\n        ")
      s"""WITH $x8EdgeCtes,
        e AS MATERIALIZED (SELECT src, dst FROM t
          WHERE dst IS NOT NULL AND src IS NOT NULL GROUP BY src, dst),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        d0 AS (SELECT node, CAST(0 AS BIGINT) AS hops FROM nodes
          WHERE node < 10),
        $steps
        SELECT n.node, CAST(d.hops AS BIGINT) AS hops
        FROM nodes n LEFT JOIN d5 d ON d.node = n.node
        ORDER BY hops ASC NULLS LAST, n.node"""
    },
    eagerPlan = true) // construction materializes each round's frontier

  /** Shared DuckDB cosine closed form (same fold order as `graft_dot`):
    * used by the labeled-neighbor oracles below. */
  private def cosSql(q: String, c: String): String =
    s"""round(list_sum(list_transform(range(len($q)), i -> $q[i+1]*$c[i+1]))
        / (sqrt(list_sum(list_transform(range(len($q)), i -> $q[i+1]*$q[i+1])))
         * sqrt(list_sum(list_transform(range(len($c)), i -> $c[i+1]*$c[i+1])))), 6)"""

  /** X2 — kNN label vote over the labeled embedding table: the standard
    * embedding-space quality probe (do cosine neighborhoods predict
    * labels?) doubling as a weak-labeler for unlabeled slices. Majority
    * of the 10 nearest labels; ties broken by strongest supporting
    * cosine then lowest label — all explicit, so both engines rank
    * identically. r16: the query stripe is CAPPED (`vec_id < 2100` —
    * ≤300 queries at any scale, identical at/below sf0.1 for vec_id
    * density 1): the uncapped 1/7 stripe made the eval quadratic in the
    * corpus (the 10× board measured ×7.5) — a real kNN eval probes a
    * FIXED query set against a growing corpus, the same argument as the
    * r15 recall stripes. */
  private val x2Knn = Q("x2_knn_classify",
    (s, dir) => Similarity.knnClassify(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label",
        pmod(col("vec_id"), lit(7)) === 0 && col("vec_id") < 2100, k = 10)
      .orderBy(col("query_id")),
    Some(s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e
        WHERE vec_id % 7 = 0 AND vec_id < 2100),
      scored AS (SELECT query_id, qlabel, e.vec_id AS cand_id,
          e.label AS clabel, ${cosSql("qv", "v")} AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
      topk AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS rk FROM scored) WHERE rk <= 10),
      votes AS (SELECT query_id, qlabel, clabel, count(*) AS n_votes,
          max(cosine) AS best_cos
        FROM topk GROUP BY query_id, qlabel, clabel),
      win AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY n_votes DESC, best_cos DESC, clabel ASC) AS vr FROM votes)
        WHERE vr = 1)
      SELECT query_id, qlabel AS true_label, clabel AS pred_label,
        CAST(n_votes AS BIGINT) AS n_votes,
        CAST(clabel = qlabel AS BIGINT) AS correct
      FROM win ORDER BY query_id"""))

  /** X2 — hard-triplet mining (anchor, nearest same-label positive,
    * nearest wrong-label hard negative) — the candidate generator for
    * contrastive embedding training; negative `margin` = an active
    * triplet (imposter outranks the positive). One scored frame, one
    * window over (anchor, same-label?). r16: anchor stripe CAPPED
    * (`vec_id < 2100`), same rationale as `x2_knn_classify` — the
    * uncapped 1/7 anchors made mining quadratic (×7.3 at the 10×
    * board); a training loop mines hard negatives for a bounded anchor
    * BATCH against the corpus, not all-pairs. */
  private val x2Triplet = Q("x2_triplet_mining",
    (s, dir) => Similarity.tripletMine(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label",
        pmod(col("vec_id"), lit(7)) === 3 && col("vec_id") < 2100)
      .orderBy(col("query_id")),
    Some(s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e
        WHERE vec_id % 7 = 3 AND vec_id < 2100),
      scored AS (SELECT query_id, qlabel, e.vec_id AS cand_id,
          e.label AS clabel, (e.label = qlabel) AS same,
          ${cosSql("qv", "v")} AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
      best AS (SELECT * FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id, same
          ORDER BY cosine DESC, cand_id ASC) AS rk FROM scored) WHERE rk = 1),
      p AS (SELECT query_id, qlabel AS anchor_label, cand_id AS pos_id,
          cosine AS pos_cos FROM best WHERE same),
      n AS (SELECT query_id, cand_id AS neg_id, clabel AS neg_label,
          cosine AS neg_cos FROM best WHERE NOT same)
      SELECT p.query_id, anchor_label, pos_id, pos_cos, neg_id, neg_label,
        neg_cos, pos_cos - neg_cos AS margin
      FROM p JOIN n USING (query_id) ORDER BY p.query_id"""))

  /** X2 — PQ recall@5 against exact L2 ranking (the compression-loss
    * measurement, sibling of x2_ann_recall/x2_ivf_recall): how much of
    * the true top-5 survives 64-dim → 2-byte quantization. Trains a
    * denser codebook than the train/search queries (seeds %23 → ~22
    * codes per subspace, ~480 product cells) so the measurement reflects
    * a usable operating point rather than the oracle-friendly toy. Exact L2
    * distances round portable-free at 6 digits before ranking (same
    * accepted trade as the cosine recalls). */
  private val x2PqRecall = Q("x2_pq_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qp = cappedStripe(col("vec_id"))
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, dim = 64,
        seedPred = pmod(col("vec_id"), lit(23)) === 3, iters = 2)
      val pq = Similarity.pqSearch(emb, "vec_id", "embedding", m = 8, dim = 64,
        codebooks = cb, queryPred = qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      val e = emb.select(col("vec_id").cast("long").as("cand_id"),
        col("embedding").cast("array<double>").as("cv"))
      val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d").asc, col("cand_id").asc)
      val exact = e.crossJoin(broadcast(q))
        .where(col("cand_id") =!= col("query_id"))
        .withColumn("d", round(expr(
          "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("query_id"), col("cand_id"))
      recallOf(exact, pq, k = 5)
    },
    Some(s"""${pqOracleCtes(23, 8)},
      m1 AS (SELECT sub, cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a1, range(8) t(i) GROUP BY sub, cell, i),
      cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv FROM m1 GROUP BY sub, cell),
      codes AS (SELECT pid, sub, cell AS code FROM (
        SELECT e.pid, e.sub, c.cell,
          row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
            ((e.pn - 2*${dotSql("pv", "cv")}) + ${dotSql("cv", "cv")}) ASC, c.cell ASC) AS rk
        FROM e JOIN cb c USING (sub)) WHERE rk = 1),
      dt AS (SELECT q.pid AS query_id, q.sub, c.cell AS code,
          ((q.pn - 2*${dotSql("q.pv", "c.cv")}) + ${dotSql("c.cv", "c.cv")}) AS d
        FROM e q JOIN cb c USING (sub) WHERE q.pid % 100 = 0 AND q.pid < 800),
      pqscored AS (SELECT dt.query_id, codes.pid,
          list_sum(list(dt.d ORDER BY dt.sub)) AS adc_dist
        FROM codes JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
        WHERE codes.pid <> dt.query_id GROUP BY dt.query_id, codes.pid),
      pqrk AS (SELECT query_id, pid AS cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, pid ASC) AS rk FROM pqscored) WHERE rk <= 5),
      q2 AS (SELECT pid AS query_id, v AS qv FROM v
        WHERE pid % 100 = 0 AND pid < 800),
      exscored AS (SELECT query_id, w.pid AS cand_id,
          round(list_sum(list_transform(range(len(w.v)),
            i -> (w.v[i+1]-qv[i+1])*(w.v[i+1]-qv[i+1]))), 6) AS d
        FROM v w CROSS JOIN q2 WHERE w.pid <> query_id),
      exrk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY d ASC, cand_id ASC) AS rk FROM exscored) WHERE rk <= 5),
      hits AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM exrk JOIN pqrk USING (query_id, cand_id) GROUP BY query_id),
      qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM exrk GROUP BY query_id)
      SELECT qs.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        coalesce(n_hits, 0) / CAST(least(n_exact, 5) AS DOUBLE) AS recall
      FROM qs LEFT JOIN hits USING (query_id) ORDER BY query_id"""))

  /** X2 — OPQ-rotation recall A/B ([[graft.ops.Similarity.pcaRotate]] ∘
    * pcaTopK → pqTrain/pqSearch): the measurement the `covarianceMatrix`
    * scaladoc promises — at the SAME code budget (8 sub-codes from
    * ~%23-seeded codebooks), PQ over the top-8 PCA rotation vs plain PQ
    * over the raw 64 dims, recall@5 against exact L2 on the original
    * vectors. The corpus is the embeddings under a deterministic
    * 1/(1+i) per-dim scaling — the DECAYING spectrum real text
    * embeddings have; the raw synthetic embeddings are near-isotropic
    * (flat eigenspectrum, measured λ₁..λ₁₆ ∈ [0.019, 0.022]), where no
    * rotation can help by construction. On the anisotropic shape the
    * gain is large (measured 0.20 → 0.72 mean recall@5 at sf0.01):
    * plain PQ gives subspace 0 (the high-energy dims) the same 22 codes
    * as the noise subspaces, while the rotation re-expresses the energy
    * in 8 decorrelated coordinates that each get their own quantizer —
    * the eigen-allocation argument of Ge et al. 2013 (OPQ). The oracle
    * replays the ENTIRE chain: covariance, 8 deflated power-iteration
    * components, rotation, both PQ trainings, both ADC searches, exact
    * ranking, and the per-query recalls. */
  private val x2OpqRecall = Q("x2_opq_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"),
        expr("transform(sequence(0, 63), i -> " +
          "element_at(CAST(embedding AS array<double>), i+1) / (1.0D + i))")
          .as("embedding"))
      val qp = cappedStripe(col("vec_id"))
      val sp = pmod(col("vec_id"), lit(23)) === 3
      val e = emb.select(col("vec_id").cast("long").as("cand_id"),
        col("embedding").as("cv"))
      val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d").asc, col("cand_id").asc)
      val exact = e.crossJoin(broadcast(q))
        .where(col("cand_id") =!= col("query_id"))
        .withColumn("d", round(expr(
          "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("query_id"), col("cand_id"))
      val cbP = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, dim = 64,
        seedPred = sp, iters = 2)
      val plain = Similarity.pqSearch(emb, "vec_id", "embedding", m = 8,
        dim = 64, codebooks = cbP, queryPred = qp, k = 5)
      val comps = Similarity.pcaTopK(emb, "embedding", dim = 64, k = 8, iters = 3)
      val rot = Similarity.pcaRotate(emb, "vec_id", "embedding", comps)
      val cbR = Similarity.pqTrain(rot, "vec_id", "rv", m = 8, dim = 8,
        seedPred = pmod(col("vec_id"), lit(23)) === 3, iters = 2)
      val pqR = Similarity.pqSearch(rot, "vec_id", "rv", m = 8, dim = 8,
        codebooks = cbR, queryPred = cappedStripe(col("vec_id")), k = 5)
      recallOf(exact, plain, 5)
        .select(col("query_id"), col("recall").as("recall_plain"))
        .join(recallOf(exact, pqR, 5)
          .select(col("query_id"), col("recall").as("recall_rotated")),
          Seq("query_id"))
        .orderBy(col("query_id"))
    },
    Some {
      val dim = 64; val kComp = 8
      // deflated power-iteration chain: g{c-1} --3 iters--> p{c}3, lam{c},
      // then g{c} = g{c-1} − λ·vvᵀ (portable-rounded), exactly pcaTopK's
      // driver lattice
      def iterCtes(matrix: String, p: String): String = (1 to 3).map { t =>
        val prev = s"$p${t - 1}"
        s"""w_$p$t AS (SELECT m.i, floor(sum(m.cov * vj) * 1000000.0 + 0.5) / 1000000.0 AS wi
            FROM $matrix m JOIN $prev ON m.j = $prev.j GROUP BY m.i),
          n_$p$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w_$p$t),
          $p$t AS (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
            FROM w_$p$t, n_$p$t)"""
      }.mkString(",\n        ")
      val compCtes = (1 to kComp).map { c =>
        val mat = s"g${c - 1}"; val p = s"p$c"
        val defl = if (c < kComp) s""",
          g$c AS MATERIALIZED (SELECT m.i, m.j,
              floor((m.cov - lam * a.vj * b.vj) * 1000000.0 + 0.5) / 1000000.0 AS cov
            FROM $mat m JOIN ${p}3 a ON m.i = a.j JOIN ${p}3 b ON m.j = b.j
            CROSS JOIN lam$c)""" else ""
        s"""${p}0 AS (SELECT i AS j, 1.0 AS vj FROM range($dim) t(i)),
          ${iterCtes(mat, p)},
          lam$c AS (SELECT floor(sum(m.cov * a.vj * b.vj) * 1000000.0 + 0.5)
              / 1000000.0 AS lam
            FROM $mat m JOIN ${p}3 a ON m.i = a.j JOIN ${p}3 b ON m.j = b.j)$defl"""
      }.mkString(",\n        ")
      val pcCtes = (1 to kComp).map(c =>
        s"pc$c AS (SELECT list(vj ORDER BY j) AS pc FROM p${c}3)").mkString(",\n        ")
      val rotScores = (1 to kComp).map(c =>
        s"floor(${dotSql("v.v", s"pc$c.pc")} * 1000000.0 + 0.5) / 1000000.0")
        .mkString("[", ", ", "]")
      val rotJoin = (1 to kComp).map(c => s"CROSS JOIN pc$c").mkString(" ")
      // PQ train→encode→ADC replay over a source CTE (pid, v)
      def pqCtes(pfx: String, src: String, d: Int, m: Int): String = {
        val subd = d / m
        val dpc = dotSql("pv", "cv"); val dcc = dotSql("cv", "cv")
        def distRk(cents: String) =
          s"""SELECT pid, sub, pv, pn, cell FROM (
            SELECT e.pid, e.sub, e.pv, e.pn, c.cell,
              row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
                ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
            FROM ${pfx}e e JOIN $cents c USING (sub)) WHERE rk = 1"""
        s"""${pfx}e0 AS (SELECT pid, s AS sub, v[s*$subd+1 : s*$subd+$subd] AS pv
            FROM $src, range($m) t(s)),
          ${pfx}e AS (SELECT pid, sub, pv, ${dotSql("pv", "pv")} AS pn FROM ${pfx}e0),
          ${pfx}c0 AS (SELECT sub, CAST(pid AS BIGINT) AS cell, pv AS cv
            FROM ${pfx}e0 WHERE pid % 23 = 3),
          ${pfx}a0 AS (${distRk(s"${pfx}c0")}),
          ${pfx}m0 AS (SELECT sub, cell, i AS pos,
              floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
            FROM ${pfx}a0, range($subd) t(i) GROUP BY sub, cell, i),
          ${pfx}c1 AS (SELECT sub, cell, list(m ORDER BY pos) AS cv
            FROM ${pfx}m0 GROUP BY sub, cell),
          ${pfx}a1 AS (${distRk(s"${pfx}c1")}),
          ${pfx}m1 AS (SELECT sub, cell, i AS pos,
              floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
            FROM ${pfx}a1, range($subd) t(i) GROUP BY sub, cell, i),
          ${pfx}cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv
            FROM ${pfx}m1 GROUP BY sub, cell),
          ${pfx}codes AS (SELECT pid, sub, cell AS code FROM (
            SELECT e.pid, e.sub, c.cell,
              row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
                ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
            FROM ${pfx}e e JOIN ${pfx}cb c USING (sub)) WHERE rk = 1),
          ${pfx}dt AS (SELECT q.pid AS query_id, q.sub, c.cell AS code,
              ((q.pn - 2*${dotSql("q.pv", "c.cv")}) + ${dotSql("c.cv", "c.cv")}) AS d
            FROM ${pfx}e q JOIN ${pfx}cb c USING (sub)
            WHERE q.pid % 100 = 0 AND q.pid < 800),
          ${pfx}sc AS (SELECT dt.query_id, codes.pid,
              list_sum(list(dt.d ORDER BY dt.sub)) AS adc_dist
            FROM ${pfx}codes codes JOIN ${pfx}dt dt
              ON codes.sub = dt.sub AND codes.code = dt.code
            WHERE codes.pid <> dt.query_id GROUP BY dt.query_id, codes.pid),
          ${pfx}rk AS (SELECT query_id, pid AS cand_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist ASC, pid ASC) AS rk FROM ${pfx}sc) WHERE rk <= 5)"""
      }
      s"""WITH v AS MATERIALIZED (SELECT vec_id AS pid,
          list_transform(range(64), i -> (embedding::DOUBLE[])[i+1] / (1.0 + i)) AS v
          FROM embeddings),
        p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
          FROM v, range($dim) a(i), range($dim) b(j) WHERE i <= j),
        up AS MATERIALIZED (SELECT i, j,
            floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
              / 1000000.0 AS cov
          FROM p GROUP BY i, j),
        g0 AS MATERIALIZED (SELECT i, j, cov FROM up
               UNION ALL SELECT j AS i, i AS j, cov FROM up WHERE i <> j),
        $compCtes,
        $pcCtes,
        rot AS MATERIALIZED (SELECT pid, $rotScores AS v FROM v $rotJoin),
        ${pqCtes("pl", "v", 64, 8)},
        ${pqCtes("ro", "rot", 8, 8)},
        q2 AS (SELECT pid AS query_id, v AS qv FROM v
          WHERE pid % 100 = 0 AND pid < 800),
        exsc AS (SELECT query_id, w.pid AS cand_id,
            round(list_sum(list_transform(range(len(w.v)),
              i -> (w.v[i+1]-qv[i+1])*(w.v[i+1]-qv[i+1]))), 6) AS d
          FROM v w CROSS JOIN q2 WHERE w.pid <> query_id),
        exrk AS (SELECT query_id, cand_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY d ASC, cand_id ASC) AS rk FROM exsc) WHERE rk <= 5),
        qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
          FROM exrk GROUP BY query_id),
        ph AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exrk JOIN plrk USING (query_id, cand_id) GROUP BY query_id),
        rh AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exrk JOIN rork USING (query_id, cand_id) GROUP BY query_id)
        SELECT qs.query_id,
          coalesce(ph.n_hits, 0) / CAST(least(qs.n_exact, 5) AS DOUBLE)
            AS recall_plain,
          coalesce(rh.n_hits, 0) / CAST(least(qs.n_exact, 5) AS DOUBLE)
            AS recall_rotated
        FROM qs LEFT JOIN ph USING (query_id) LEFT JOIN rh USING (query_id)
        ORDER BY qs.query_id"""
    },
    eagerPlan = true) // the pcaTopK training inside collects the covariance

  /** X2 — OPQ eigenvalue-ALLOCATION A/B
    * ([[graft.ops.Similarity.opqAllocate]], Ge et al. 2013 §3.3 — the
    * second half of the parametric OPQ solution `x2_opq_recall`'s
    * rotation started): naive descending-order PCA hands subspace 0 the
    * two largest eigenvalues and the last subspace pure noise; the
    * greedy variance-product balancing (= the zig-zag pairing
    * (λ1,λ8)(λ2,λ7)(λ3,λ6)(λ4,λ5) at subd=2 over a descending
    * spectrum) re-orders the SAME 8 rotated coordinates so every m=4
    * sub-quantizer prices comparable energy. Reports per-query recall@5
    * vs exact 64-dim L2 for both orders AND the total quantization
    * error ‖X−X̂‖² per variant (the paper's objective — measured 0.890 →
    * 0.548 at sf0.01, a 38 % cut at the same code budget; recall@5 over
    * the 5-query stripe is a coarser signal). The non-parametric
    * alternation ([[graft.ops.Similarity.opqRefine]]) is deliberately
    * NOT in this chain: on Gaussian-like data the parametric solution
    * is already optimal (§3.3) and the decaying spectrum squares into
    * MᵀM's condition number — spec-gated on its operating domain
    * instead (Round15OpsSpec). The oracle replays the full chain:
    * covariance → 8 deflated components → both coordinate orders → both
    * PQ trainings → reconstructions and error sums → both ADC searches
    * → exact ranking. */
  private val x2OpqAlloc = Q("x2_opq_alloc_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"),
        expr("transform(sequence(0, 63), i -> " +
          "element_at(CAST(embedding AS array<double>), i+1) / (1.0D + i))")
          .as("embedding"))
      val qp = cappedStripe(col("vec_id"))
      val sp = pmod(col("vec_id"), lit(23)) === 3
      val e = emb.select(col("vec_id").cast("long").as("cand_id"),
        col("embedding").as("cv"))
      val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d").asc, col("cand_id").asc)
      val exact = e.crossJoin(broadcast(q))
        .where(col("cand_id") =!= col("query_id"))
        .withColumn("d", round(expr(
          "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("query_id"), col("cand_id"))
      val comps = Similarity.pcaTopK(emb, "embedding", dim = 64, k = 8, iters = 3)
      val rotP = Similarity.pcaRotate(emb, "vec_id", "embedding", comps)
      val rotA = Similarity.pcaRotate(emb, "vec_id", "embedding",
        Similarity.opqAllocate(comps, m = 4))
      def variant(rot: DataFrame): (DataFrame, DataFrame) = {
        // the trained codebook feeds THREE consumers (search, encode,
        // decode) — uncached, each replays the 2-iteration Lloyd chain
        // over the corpus (cb is m·k·subd rows — cache is ~free)
        val cb = Similarity.pqTrain(rot, "vec_id", "rv", m = 4, dim = 8,
          seedPred = sp, iters = 2).cache()
        val cand = Similarity.pqSearch(rot, "vec_id", "rv", m = 4, dim = 8,
          codebooks = cb, queryPred = qp, k = 5)
          .select(col("query_id"), col("cand_id"))
        val xh = Similarity.pqDecode(
          Similarity.pqEncode(rot, "vec_id", "rv", m = 4, dim = 8, cb), cb)
        val err = rot.select(col("vec_id").cast("long").as("pid"), col("rv"))
          .join(xh, Seq("pid"))
          .select(expr("aggregate(zip_with(rv, xhat, (a, b) -> (a-b)*(a-b)), " +
            "0D, (acc, x) -> acc + x)").as("e"))
          // 4-digit rounding for the cross-row error SUM: at 6 digits the
          // engines' partial-sum orders measurably hit a lattice boundary
          // (sf0.1: 0.981761 vs 0.98176); the per-row folds stay exact
          .agg((floor(sum(col("e")) * lit(10000.0) + lit(0.5)) / lit(10000.0))
            .as("err"))
        (cand, err)
      }
      val (candP, errP) = variant(rotP)
      val (candA, errA) = variant(rotA)
      recallOf(exact, candP, 5)
        .select(col("query_id"), col("recall").as("recall_pca"))
        .join(recallOf(exact, candA, 5)
          .select(col("query_id"), col("recall").as("recall_alloc")),
          Seq("query_id"))
        .crossJoin(broadcast(errP.select(col("err").as("err_pca"))))
        .crossJoin(broadcast(errA.select(col("err").as("err_alloc"))))
        .orderBy(col("query_id"))
    },
    Some {
      val dim = 64; val kComp = 8
      // the x2_opq_recall builder chain, extended with the allocated
      // coordinate order + per-variant reconstruction error
      def iterCtes(matrix: String, p: String): String = (1 to 3).map { t =>
        val prev = s"$p${t - 1}"
        s"""w_$p$t AS (SELECT m.i, floor(sum(m.cov * vj) * 1000000.0 + 0.5) / 1000000.0 AS wi
            FROM $matrix m JOIN $prev ON m.j = $prev.j GROUP BY m.i),
          n_$p$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w_$p$t),
          $p$t AS (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
            FROM w_$p$t, n_$p$t)"""
      }.mkString(",\n        ")
      val compCtes = (1 to kComp).map { c =>
        val mat = s"g${c - 1}"; val p = s"p$c"
        val defl = if (c < kComp) s""",
          g$c AS MATERIALIZED (SELECT m.i, m.j,
              floor((m.cov - lam * a.vj * b.vj) * 1000000.0 + 0.5) / 1000000.0 AS cov
            FROM $mat m JOIN ${p}3 a ON m.i = a.j JOIN ${p}3 b ON m.j = b.j
            CROSS JOIN lam$c)""" else ""
        s"""${p}0 AS (SELECT i AS j, 1.0 AS vj FROM range($dim) t(i)),
          ${iterCtes(mat, p)},
          lam$c AS (SELECT floor(sum(m.cov * a.vj * b.vj) * 1000000.0 + 0.5)
              / 1000000.0 AS lam
            FROM $mat m JOIN ${p}3 a ON m.i = a.j JOIN ${p}3 b ON m.j = b.j)$defl"""
      }.mkString(",\n        ")
      val pcCtes = (1 to kComp).map(c =>
        s"pc$c AS (SELECT list(vj ORDER BY j) AS pc FROM p${c}3)").mkString(",\n        ")
      def rotScores(order: Seq[Int]): String = order.map(c =>
        s"floor(${dotSql("v.v", s"pc$c.pc")} * 1000000.0 + 0.5) / 1000000.0")
        .mkString("[", ", ", "]")
      val rotJoin = (1 to kComp).map(c => s"CROSS JOIN pc$c").mkString(" ")
      // greedy variance-product balancing over a DESCENDING spectrum at
      // subd=2 is exactly the zig-zag pairing — a static coordinate
      // order (the realized eigenvalue order is descending on this
      // fixture; a violation would surface as a hash mismatch)
      val allocOrder = Seq(1, 8, 2, 7, 3, 6, 4, 5)
      def pqCtes(pfx: String, src: String, d: Int, m: Int): String = {
        val subd = d / m
        val dpc = dotSql("pv", "cv"); val dcc = dotSql("cv", "cv")
        def distRk(cents: String) =
          s"""SELECT pid, sub, pv, pn, cell FROM (
            SELECT e.pid, e.sub, e.pv, e.pn, c.cell,
              row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
                ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
            FROM ${pfx}e e JOIN $cents c USING (sub)) WHERE rk = 1"""
        s"""${pfx}e0 AS (SELECT pid, s AS sub, v[s*$subd+1 : s*$subd+$subd] AS pv
            FROM $src, range($m) t(s)),
          ${pfx}e AS (SELECT pid, sub, pv, ${dotSql("pv", "pv")} AS pn FROM ${pfx}e0),
          ${pfx}c0 AS (SELECT sub, CAST(pid AS BIGINT) AS cell, pv AS cv
            FROM ${pfx}e0 WHERE pid % 23 = 3),
          ${pfx}a0 AS (${distRk(s"${pfx}c0")}),
          ${pfx}m0 AS (SELECT sub, cell, i AS pos,
              floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
            FROM ${pfx}a0, range($subd) t(i) GROUP BY sub, cell, i),
          ${pfx}c1 AS (SELECT sub, cell, list(m ORDER BY pos) AS cv
            FROM ${pfx}m0 GROUP BY sub, cell),
          ${pfx}a1 AS (${distRk(s"${pfx}c1")}),
          ${pfx}m1 AS (SELECT sub, cell, i AS pos,
              floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
            FROM ${pfx}a1, range($subd) t(i) GROUP BY sub, cell, i),
          ${pfx}cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv
            FROM ${pfx}m1 GROUP BY sub, cell),
          ${pfx}codes AS (SELECT pid, sub, cell AS code FROM (
            SELECT e.pid, e.sub, c.cell,
              row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
                ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
            FROM ${pfx}e e JOIN ${pfx}cb c USING (sub)) WHERE rk = 1),
          ${pfx}xhat AS (SELECT codes.pid, flatten(list(cv ORDER BY codes.sub)) AS xh
            FROM ${pfx}codes codes JOIN ${pfx}cb cb
              ON codes.sub = cb.sub AND codes.code = cb.cell
            GROUP BY codes.pid),
          ${pfx}err AS (SELECT floor(sum(list_sum(list_transform(range($d),
                i -> (s.v[i+1] - xh[i+1]) * (s.v[i+1] - xh[i+1])))) * 10000.0 + 0.5)
              / 10000.0 AS err
            FROM $src s JOIN ${pfx}xhat x ON s.pid = x.pid),
          ${pfx}dt AS (SELECT q.pid AS query_id, q.sub, c.cell AS code,
              ((q.pn - 2*${dotSql("q.pv", "c.cv")}) + ${dotSql("c.cv", "c.cv")}) AS d
            FROM ${pfx}e q JOIN ${pfx}cb c USING (sub)
            WHERE q.pid % 100 = 0 AND q.pid < 800),
          ${pfx}sc AS (SELECT dt.query_id, codes.pid,
              list_sum(list(dt.d ORDER BY dt.sub)) AS adc_dist
            FROM ${pfx}codes codes JOIN ${pfx}dt dt
              ON codes.sub = dt.sub AND codes.code = dt.code
            WHERE codes.pid <> dt.query_id GROUP BY dt.query_id, codes.pid),
          ${pfx}rk AS (SELECT query_id, pid AS cand_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist ASC, pid ASC) AS rk FROM ${pfx}sc) WHERE rk <= 5)"""
      }
      s"""WITH v AS MATERIALIZED (SELECT vec_id AS pid,
          list_transform(range(64), i -> (embedding::DOUBLE[])[i+1] / (1.0 + i)) AS v
          FROM embeddings),
        p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
          FROM v, range($dim) a(i), range($dim) b(j) WHERE i <= j),
        up AS MATERIALIZED (SELECT i, j,
            floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
              / 1000000.0 AS cov
          FROM p GROUP BY i, j),
        g0 AS MATERIALIZED (SELECT i, j, cov FROM up
               UNION ALL SELECT j AS i, i AS j, cov FROM up WHERE i <> j),
        $compCtes,
        $pcCtes,
        rotp AS MATERIALIZED (SELECT pid, ${rotScores(1 to kComp)} AS v FROM v $rotJoin),
        rota AS MATERIALIZED (SELECT pid, ${rotScores(allocOrder)} AS v FROM v $rotJoin),
        ${pqCtes("pp", "rotp", 8, 4)},
        ${pqCtes("aa", "rota", 8, 4)},
        q2 AS (SELECT pid AS query_id, v AS qv FROM v
          WHERE pid % 100 = 0 AND pid < 800),
        exsc AS (SELECT query_id, w.pid AS cand_id,
            round(list_sum(list_transform(range(len(w.v)),
              i -> (w.v[i+1]-qv[i+1])*(w.v[i+1]-qv[i+1]))), 6) AS d
          FROM v w CROSS JOIN q2 WHERE w.pid <> query_id),
        exrk AS (SELECT query_id, cand_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY d ASC, cand_id ASC) AS rk FROM exsc) WHERE rk <= 5),
        qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
          FROM exrk GROUP BY query_id),
        pph AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exrk JOIN pprk USING (query_id, cand_id) GROUP BY query_id),
        aah AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exrk JOIN aark USING (query_id, cand_id) GROUP BY query_id)
        SELECT qs.query_id,
          coalesce(pph.n_hits, 0) / CAST(least(qs.n_exact, 5) AS DOUBLE)
            AS recall_pca,
          coalesce(aah.n_hits, 0) / CAST(least(qs.n_exact, 5) AS DOUBLE)
            AS recall_alloc,
          pperr.err AS err_pca, aaerr.err AS err_alloc
        FROM qs LEFT JOIN pph USING (query_id) LEFT JOIN aah USING (query_id)
        CROSS JOIN pperr CROSS JOIN aaerr
        ORDER BY qs.query_id"""
    },
    eagerPlan = true) // pcaTopK + opqAllocate collect bounded artifacts

  /** X2 — one NON-PARAMETRIC OPQ alternation, oracle-gated
    * ([[graft.ops.Similarity.opqRefine]], Ge et al. 2013 §4 — the
    * completion of the r14-r16 OPQ arc: rotation → allocation →
    * alternation). Fixture: a deterministic CORRELATED 8-dim view of the
    * embeddings (dims 4-7 mix 0.9/0.8/0.7/0.6 of dims 0-3 with 0.6 fresh
    * signal — cross-subspace correlation at the m=4 cuts, the op's
    * documented operating domain; the coefficients differ per pair so
    * the spectrum has no degenerate eigenvalues to stall the deflation).
    * Baseline = plain descending top-8 PCA rotation (NOT the allocation:
    * opqAllocate's greedy permutation depends on the REALIZED eigenvalue
    * order, which flips between near-equal λ3/λ4 across scale factors on
    * this fixture — measured at sf0.001 — so a static oracle cannot
    * replay it; the allocation is priced on its own well-separated
    * fixture in `x2_opq_alloc_recall`). The NP step then trains a PQ on
    * the rotated frame, solves the orthogonal Procrustes polar factor
    * R = M(MᵀM)^(-1/2) against the reconstructions (powerIters=12
    * rounded fixed-iteration eigensolve — the oracle-replayable
    * lattice), re-rotates, retrains, and reports per-query recall@5 +
    * total quantization error for BOTH sides. The oracle replays the
    * full chain:
    * covariance → 8 deflated components → rotation → PQ train/encode/
    * decode → M = XᵀX̂ → S = MᵀM → 8-component rounded eigensolve →
    * S^(-1/2) → R → re-rotation → second PQ training → both ADC
    * searches + error sums → exact ranking. Driver-side reductions
    * (S, Rayleigh, S^(-1/2), R) replay with ORDER-PINNED list folds —
    * the Scala loops sum in deterministic index order, so the SQL must
    * too — and the whole chain trains with `latticeMeans` (bit-
    * deterministic codebook means; the classic `pr(avg)` measurably
    * landed one lattice step apart between engines on this rotated —
    * lattice-valued — frame, 51/500 reconstructions off at sf0.001).
    * Measured err_pca → err_np: sf0.01 5.1761 → 5.0911, sf0.1 5.9057 →
    * 5.8221 — the alternation improves its training objective on its
    * operating domain; at sf0.001 (50-vector cells) 5.8375 → 5.8615,
    * inside retraining noise — the r15 finding that strict monotonicity
    * does not survive re-seeded codebooks stands (Round15OpsSpec pins
    * the FIXED-reconstruction objective non-increase instead). */
  private val x2OpqNp = Q("x2_opq_refine_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), expr(
        "transform(sequence(0, 7), i -> CASE WHEN i < 4 THEN " +
          "element_at(CAST(embedding AS array<double>), i+1) ELSE " +
          "(0.9D - 0.1D * (i-4)) * element_at(CAST(embedding AS array<double>), i-3) + " +
          "0.6D * element_at(CAST(embedding AS array<double>), i+1) END)")
        .as("embedding"))
      val qp = cappedStripe(col("vec_id"))
      val sp = pmod(col("vec_id"), lit(23)) === 3
      val e = emb.select(col("vec_id").cast("long").as("cand_id"),
        col("embedding").as("cv"))
      val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d").asc, col("cand_id").asc)
      val exact = e.crossJoin(broadcast(q))
        .where(col("cand_id") =!= col("query_id"))
        .withColumn("d", round(expr(
          "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("query_id"), col("cand_id"))
      val comps = Similarity.pcaTopK(emb, "embedding", dim = 8, k = 8, iters = 6)
      val rotP = Similarity.pcaRotate(emb, "vec_id", "embedding", comps)
      def variant(rot: DataFrame): (DataFrame, DataFrame) = {
        // latticeMeans: this chain's codebooks feed opqRefine's floored
        // Procrustes reduction — the mean must be bit-deterministic
        val cb = Similarity.pqTrain(rot, "vec_id", "rv", m = 4, dim = 8,
          seedPred = sp, iters = 2, latticeMeans = true).cache()
        val cand = Similarity.pqSearch(rot, "vec_id", "rv", m = 4, dim = 8,
          codebooks = cb, queryPred = qp, k = 5)
          .select(col("query_id"), col("cand_id"))
        val xh = Similarity.pqDecode(
          Similarity.pqEncode(rot, "vec_id", "rv", m = 4, dim = 8, cb), cb)
        // ORDER-INDEPENDENT error sum: each per-row error (bit-exact
        // cross-engine) rounds onto the 1e-6 integer lattice first, the
        // integers sum exactly (no FP partial-sum order), one division
        // renders the total. The alloc query's round-the-raw-sum-at-1e4
        // discipline measurably hit a half-boundary here at sf0.1
        // (5.82255: spark 5.8225 vs duckdb 5.8226).
        val err = rot.select(col("vec_id").cast("long").as("pid"), col("rv"))
          .join(xh, Seq("pid"))
          .select(expr("aggregate(zip_with(rv, xhat, (a, b) -> (a-b)*(a-b)), " +
            "0D, (acc, x) -> acc + x)").as("e"))
          .agg((sum(floor(col("e") * lit(1000000.0) + lit(0.5)).cast("long"))
            .cast("double") / lit(1000000.0)).as("err"))
        (cand, err)
      }
      val (candP, errP) = variant(rotP)
      val r = Similarity.opqRefine(rotP, "vec_id", "rv", m = 4, dim = 8,
        seedPred = sp, iters = 2, powerIters = 12)
      val rotN = Similarity.pcaRotate(rotP, "vec_id", "rv", r)
      val (candN, errN) = variant(rotN)
      recallOf(exact, candP, 5)
        .select(col("query_id"), col("recall").as("recall_pca"))
        .join(recallOf(exact, candN, 5)
          .select(col("query_id"), col("recall").as("recall_np")),
          Seq("query_id"))
        .crossJoin(broadcast(errP.select(col("err").as("err_pca"))))
        .crossJoin(broadcast(errN.select(col("err").as("err_np"))))
        .orderBy(col("query_id"))
    },
    Some {
      val dim = 8; val kComp = 8
      // plain-sum power-iteration triplets (the proven x2_opq_recall
      // lattice) for the PCA side; ORDER-PINNED list-fold triplets for
      // the NP side (new reduction shapes get the exact driver order)
      // every iterate CTE is MATERIALIZED: DuckDB inlines plain CTEs, so a
      // 6/12-deep chain whose levels reference the previous one more than
      // once re-evaluates exponentially (the pcaTopKCtes 276s lesson,
      // squared — measured: the unmaterialized 12-iter chain ran >16 min)
      def iterCtes(matrix: String, p: String, n: Int): String = (1 to n).map { t =>
        val prev = s"$p${t - 1}"
        s"""w_$p$t AS (SELECT m.i, floor(sum(m.cov * vj) * 1000000.0 + 0.5) / 1000000.0 AS wi
            FROM $matrix m JOIN $prev ON m.j = $prev.j GROUP BY m.i),
          n_$p$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w_$p$t),
          $p$t AS MATERIALIZED (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
            FROM w_$p$t, n_$p$t)"""
      }.mkString(",\n        ")
      def iterCtesOrdered(matrix: String, p: String, n: Int): String = (1 to n).map { t =>
        val prev = s"$p${t - 1}"
        s"""w_$p$t AS (SELECT m.i,
              floor(list_sum(list(m.cov * vj ORDER BY m.j)) * 1000000.0 + 0.5)
                / 1000000.0 AS wi
            FROM $matrix m JOIN $prev ON m.j = $prev.j GROUP BY m.i),
          n_$p$t AS (SELECT sqrt(list_sum(list(wi * wi ORDER BY i))) AS nrm FROM w_$p$t),
          $p$t AS MATERIALIZED (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
            FROM w_$p$t, n_$p$t)"""
      }.mkString(",\n        ")
      def eigChain(g0: String, pfx: String, n: Int, ordered: Boolean): String =
        (1 to kComp).map { c =>
          val mat = if (c == 1) g0 else s"${pfx}g${c - 1}"
          val p = s"$pfx$c"
          val lamExpr =
            if (ordered)
              s"floor(list_sum(list(m.cov * a.vj * b.vj ORDER BY m.i, m.j)) * 1000000.0 + 0.5) / 1000000.0"
            else
              s"floor(sum(m.cov * a.vj * b.vj) * 1000000.0 + 0.5) / 1000000.0"
          val defl = if (c < kComp) s""",
          ${pfx}g$c AS MATERIALIZED (SELECT m.i, m.j,
              floor((m.cov - lam * a.vj * b.vj) * 1000000.0 + 0.5) / 1000000.0 AS cov
            FROM $mat m JOIN $p$n a ON m.i = a.j JOIN $p$n b ON m.j = b.j
            CROSS JOIN ${pfx}lam$c)""" else ""
          s"""${p}0 AS (SELECT i AS j, 1.0 AS vj FROM range($dim) t(i)),
          ${if (ordered) iterCtesOrdered(mat, p, n) else iterCtes(mat, p, n)},
          ${pfx}lam$c AS (SELECT $lamExpr AS lam
            FROM $mat m JOIN $p$n a ON m.i = a.j JOIN $p$n b ON m.j = b.j)$defl"""
        }.mkString(",\n        ")
      val pcCtes = (1 to kComp).map(c =>
        s"pc$c AS (SELECT list(vj ORDER BY j) AS pc FROM pp${c}6)").mkString(",\n        ")
      val rotScores = (1 to kComp).map(c =>
        s"floor(${dotSql("v.v", s"pc$c.pc")} * 1000000.0 + 0.5) / 1000000.0")
        .mkString("[", ", ", "]")
      val rotJoin = (1 to kComp).map(c => s"CROSS JOIN pc$c").mkString(" ")
      def pqCtes(pfx: String, src: String, d: Int, m: Int): String = {
        val subd = d / m
        val dpc = dotSql("pv", "cv"); val dcc = dotSql("cv", "cv")
        def distRk(cents: String) =
          s"""SELECT pid, sub, pv, pn, cell FROM (
            SELECT e.pid, e.sub, e.pv, e.pn, c.cell,
              row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
                ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
            FROM ${pfx}e e JOIN $cents c USING (sub)) WHERE rk = 1"""
        s"""${pfx}e0 AS (SELECT pid, s AS sub, v[s*$subd+1 : s*$subd+$subd] AS pv
            FROM $src, range($m) t(s)),
          ${pfx}e AS (SELECT pid, sub, pv, ${dotSql("pv", "pv")} AS pn FROM ${pfx}e0),
          ${pfx}c0 AS (SELECT sub, CAST(pid AS BIGINT) AS cell, pv AS cv
            FROM ${pfx}e0 WHERE pid % 23 = 3),
          ${pfx}a0 AS (${distRk(s"${pfx}c0")}),
          ${pfx}m0 AS (SELECT sub, cell, i AS pos,
              floor(CAST(sum(CAST(floor(pv[i+1] * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                / count(*) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS m
            FROM ${pfx}a0, range($subd) t(i) GROUP BY sub, cell, i),
          ${pfx}c1 AS (SELECT sub, cell, list(m ORDER BY pos) AS cv
            FROM ${pfx}m0 GROUP BY sub, cell),
          ${pfx}a1 AS (${distRk(s"${pfx}c1")}),
          ${pfx}m1 AS (SELECT sub, cell, i AS pos,
              floor(CAST(sum(CAST(floor(pv[i+1] * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                / count(*) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS m
            FROM ${pfx}a1, range($subd) t(i) GROUP BY sub, cell, i),
          ${pfx}cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv
            FROM ${pfx}m1 GROUP BY sub, cell),
          ${pfx}codes AS (SELECT pid, sub, cell AS code FROM (
            SELECT e.pid, e.sub, c.cell,
              row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
                ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
            FROM ${pfx}e e JOIN ${pfx}cb c USING (sub)) WHERE rk = 1),
          ${pfx}xhat AS (SELECT codes.pid, flatten(list(cv ORDER BY codes.sub)) AS xh
            FROM ${pfx}codes codes JOIN ${pfx}cb cb
              ON codes.sub = cb.sub AND codes.code = cb.cell
            GROUP BY codes.pid),
          ${pfx}err AS (SELECT CAST(sum(CAST(floor(list_sum(list_transform(range($d),
                i -> (s.v[i+1] - xh[i+1]) * (s.v[i+1] - xh[i+1]))) * 1000000.0 + 0.5)
                AS BIGINT)) AS DOUBLE) / 1000000.0 AS err
            FROM $src s JOIN ${pfx}xhat x ON s.pid = x.pid),
          ${pfx}dt AS (SELECT q.pid AS query_id, q.sub, c.cell AS code,
              ((q.pn - 2*${dotSql("q.pv", "c.cv")}) + ${dotSql("c.cv", "c.cv")}) AS d
            FROM ${pfx}e q JOIN ${pfx}cb c USING (sub)
            WHERE q.pid % 100 = 0 AND q.pid < 800),
          ${pfx}sc AS (SELECT dt.query_id, codes.pid,
              list_sum(list(dt.d ORDER BY dt.sub)) AS adc_dist
            FROM ${pfx}codes codes JOIN ${pfx}dt dt
              ON codes.sub = dt.sub AND codes.code = dt.code
            WHERE codes.pid <> dt.query_id GROUP BY dt.query_id, codes.pid),
          ${pfx}rk AS (SELECT query_id, pid AS cand_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist ASC, pid ASC) AS rk FROM ${pfx}sc) WHERE rk <= 5)"""
      }
      s"""WITH v AS MATERIALIZED (SELECT vec_id AS pid,
          list_transform(range(8), i -> CASE WHEN i < 4
            THEN (embedding::DOUBLE[])[i+1]
            ELSE (0.9 - 0.1 * (i-4)) * (embedding::DOUBLE[])[i-3]
              + 0.6 * (embedding::DOUBLE[])[i+1] END) AS v
          FROM embeddings),
        p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
          FROM v, range($dim) a(i), range($dim) b(j) WHERE i <= j),
        up AS MATERIALIZED (SELECT i, j,
            floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
              / 1000000.0 AS cov
          FROM p GROUP BY i, j),
        g0 AS MATERIALIZED (SELECT i, j, cov FROM up
               UNION ALL SELECT j AS i, i AS j, cov FROM up WHERE i <> j),
        ${eigChain("g0", "pp", 6, ordered = false)},
        $pcCtes,
        rotp AS MATERIALIZED (SELECT pid, $rotScores AS v FROM v $rotJoin),
        ${pqCtes("aa", "rotp", 8, 4)},
        npm AS MATERIALIZED (SELECT a.i AS i, b.j AS j,
            CAST(sum(CAST(floor(s.v[a.i+1] * x.xh[b.j+1] * 1000000.0 + 0.5)
              AS BIGINT)) AS DOUBLE) / 1000000.0 AS mv
          FROM rotp s JOIN aaxhat x ON s.pid = x.pid
          CROSS JOIN range($dim) a(i) CROSS JOIN range($dim) b(j)
          GROUP BY a.i, b.j),
        nps0 AS MATERIALIZED (SELECT m1.j AS i, m2.j AS j,
            floor(list_sum(list(m1.mv * m2.mv ORDER BY m1.i)) * 1000000.0 + 0.5)
              / 1000000.0 AS cov
          FROM npm m1 JOIN npm m2 ON m1.i = m2.i GROUP BY m1.j, m2.j),
        ${eigChain("nps0", "nq", 12, ordered = true)},
        npev AS (${(1 to kComp).map(c =>
          s"SELECT $c AS c, j, vj FROM nq${c}12").mkString("\n          UNION ALL ")}),
        nplam AS (${(1 to kComp).map(c =>
          s"SELECT $c AS c, lam FROM nqlam$c").mkString("\n          UNION ALL ")}),
        npih AS (SELECT a.j AS i, b.j AS j,
            floor(list_sum(list(a.vj * b.vj / sqrt(l.lam) ORDER BY a.c))
              * 1000000.0 + 0.5) / 1000000.0 AS ih
          FROM npev a JOIN npev b ON a.c = b.c JOIN nplam l ON l.c = a.c
          GROUP BY a.j, b.j),
        npr AS (SELECT m.i AS i, h.j AS comp0,
            floor(list_sum(list(m.mv * h.ih ORDER BY m.j)) * 1000000.0 + 0.5)
              / 1000000.0 AS loading
          FROM npm m JOIN npih h ON m.j = h.i GROUP BY m.i, h.j),
        nprc AS (SELECT comp0 + 1 AS comp, list(loading ORDER BY i) AS pc
          FROM npr GROUP BY comp0),
        rotn AS MATERIALIZED (SELECT s.pid,
            list(floor(list_sum(list_transform(range($dim),
                t -> s.v[t+1] * r.pc[t+1])) * 1000000.0 + 0.5) / 1000000.0
              ORDER BY r.comp) AS v
          FROM rotp s CROSS JOIN nprc r GROUP BY s.pid),
        ${pqCtes("nn", "rotn", 8, 4)},
        q2 AS (SELECT pid AS query_id, v AS qv FROM v
          WHERE pid % 100 = 0 AND pid < 800),
        exsc AS (SELECT query_id, w.pid AS cand_id,
            round(list_sum(list_transform(range(len(w.v)),
              i -> (w.v[i+1]-qv[i+1])*(w.v[i+1]-qv[i+1]))), 6) AS d
          FROM v w CROSS JOIN q2 WHERE w.pid <> query_id),
        exrk AS (SELECT query_id, cand_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY d ASC, cand_id ASC) AS rk FROM exsc) WHERE rk <= 5),
        qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
          FROM exrk GROUP BY query_id),
        aah AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exrk JOIN aark USING (query_id, cand_id) GROUP BY query_id),
        nnh AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM exrk JOIN nnrk USING (query_id, cand_id) GROUP BY query_id)
        SELECT qs.query_id,
          coalesce(aah.n_hits, 0) / CAST(least(qs.n_exact, 5) AS DOUBLE)
            AS recall_pca,
          coalesce(nnh.n_hits, 0) / CAST(least(qs.n_exact, 5) AS DOUBLE)
            AS recall_np,
          aaerr.err AS err_pca, nnerr.err AS err_np
        FROM qs LEFT JOIN aah USING (query_id) LEFT JOIN nnh USING (query_id)
        CROSS JOIN aaerr CROSS JOIN nnerr
        ORDER BY qs.query_id"""
    },
    eagerPlan = true) // pcaTopK + opqRefine collect bounded d² artifacts

  /** X2 — PQ-CODEBOOK artifact round-trip ([[graft.ops.Artifacts]] ×
    * [[graft.ops.Similarity.pqTrain]]): the trained m=2 codebooks COMMIT
    * to the versioned store, load back in a fresh read, and the whole
    * corpus ENCODES against the LOADED table. The oracle replays
    * train+encode from the source rows directly, so a hash match proves
    * the store is lossless for this family too — a mis-serialized
    * codebook row (dropped sub, reordered pos, lost double precision)
    * shifts downstream codes and fails the gate, closing the r15 verdict
    * gap where only FacadeSpec would have caught it. Same store
    * discipline as `x2_artifact_roundtrip` (centroids) and
    * `x3_bpe_artifact_apply` (merge tables). */
  private val x2PqArtifactRt = Q("x2_pq_artifact_roundtrip",
    (s, dir) => {
      val root = "/tmp/graft_art_pqcb_" + Tables.scratchTag(s, dir)
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      val v = Artifacts.saveArtifact(cb, root, "pq_codebooks",
        Map("m" -> "2", "dim" -> "64", "iters" -> "2", "seeds" -> "vec_id%97=3"))
      val (loaded, meta) = Artifacts.loadArtifactVersion(s, root, v, "pq_codebooks")
      require(meta.params("m") == "2", "sidecar params must round-trip")
      Similarity.pqEncode(emb, "vec_id", "embedding", m = 2, dim = 64, loaded)
        .orderBy(col("pid"), col("sub"))
    },
    Some(s"""${pqOracleCtes()},
      m1 AS (SELECT sub, cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a1, range(32) t(i) GROUP BY sub, cell, i),
      cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv FROM m1 GROUP BY sub, cell),
      codes AS (SELECT pid, sub, cell AS code FROM (
        SELECT e.pid, e.sub, c.cell,
          row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
            ((e.pn - 2*${dotSql("pv", "cv")}) + ${dotSql("cv", "cv")}) ASC, c.cell ASC) AS rk
        FROM e JOIN cb c USING (sub)) WHERE rk = 1)
      SELECT pid, sub, code FROM codes ORDER BY pid, sub"""),
    eagerPlan = true) // constructing commits the artifact version on disk

  /** X2 — PCA-COMPONENT artifact round-trip: the trained top-2 component
    * table commits to the versioned store, loads back, and every
    * embedding projects + whitens against the LOADED components
    * ([[graft.ops.Similarity.pcaProjectTopK]]). Oracle = the
    * `x2_pca_project_topk` replay from source rows (identical SQL — the
    * store must be invisible to the result), completing the artifact
    * gate across all four trained families: centroids, PQ codebooks,
    * PCA components, BPE merges. */
  private lazy val x2PcaArtifactRt = Q("x2_pca_artifact_roundtrip",
    (s, dir) => {
      val root = "/tmp/graft_art_pcac_" + Tables.scratchTag(s, dir)
      val emb = Tables.embeddings(s, dir)
      val comps = Similarity.pcaTopK(emb, "embedding", dim = 64, k = 2, iters = 3)
      val v = Artifacts.saveArtifact(comps, root, "pca_components",
        Map("dim" -> "64", "k" -> "2", "iters" -> "3"))
      val (loaded, meta) = Artifacts.loadArtifactVersion(s, root, v, "pca_components")
      require(meta.params("k") == "2", "sidecar params must round-trip")
      Similarity.pcaProjectTopK(emb, "vec_id", "embedding", loaded)
        .orderBy(col("vec_id"), col("comp"))
    },
    // lazy + shared oracle: identical replay to x2_pca_project_topk
    // (declared later in the file) — the store must be invisible
    x2PcaProjectTopK.oracle,
    eagerPlan = true) // constructing commits the artifact version on disk

  /** Shared oracle CTEs for the IVF+PQ composed index: coarse centroids
    * (vec_id%89==1) assign every vector / probe the 2 nearest cells per
    * query (vec_id%100==0), chained onto [[pqOracleCtes]]'s trained m=2
    * codebooks + codes (same association order and tie-breaks as the
    * Spark folds — all proven by the component queries). */
  private def ivfPqOracleCtes(capQueries: Boolean = false): String = {
    val dww = dotSql("w.v", "w.v"); val dwc = dotSql("w.v", "c.cv")
    val dcc = dotSql("c.cv", "c.cv")
    // capQueries: the *_recall evals use the fixed-size stripe (see
    // [[cappedStripe]]); the topk demos keep the uncapped one
    val cap = if (capQueries) " AND w.pid < 800" else ""
    val capQ = if (capQueries) " AND q.pid < 800" else ""
    s"""${pqOracleCtes()},
      m1 AS (SELECT sub, cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a1, range(32) t(i) GROUP BY sub, cell, i),
      cb AS (SELECT sub, cell, list(m ORDER BY pos) AS cv FROM m1 GROUP BY sub, cell),
      codes AS (SELECT pid, sub, cell AS code FROM (
        SELECT e.pid, e.sub, c.cell,
          row_number() OVER (PARTITION BY e.pid, e.sub ORDER BY
            ((e.pn - 2*${dotSql("pv", "cv")}) + ${dotSql("cv", "cv")}) ASC, c.cell ASC) AS rk
        FROM e JOIN cb c USING (sub)) WHERE rk = 1),
      cc AS (SELECT CAST(pid AS BIGINT) AS cell, v AS cv FROM v WHERE pid % 89 = 1),
      cassign AS (SELECT pid, cell FROM (
          SELECT w.pid, c.cell,
            row_number() OVER (PARTITION BY w.pid ORDER BY
              (($dww - 2*$dwc) + $dcc) ASC, c.cell ASC) AS rk
          FROM v w CROSS JOIN cc c) WHERE rk = 1),
      qprobe AS (SELECT pid AS query_id, cell FROM (
          SELECT w.pid, c.cell,
            row_number() OVER (PARTITION BY w.pid ORDER BY
              (($dww - 2*$dwc) + $dcc) ASC, c.cell ASC) AS rk
          FROM v w CROSS JOIN cc c WHERE w.pid % 100 = 0$cap) WHERE rk <= 2),
      dt AS (SELECT q.pid AS query_id, q.sub, c.cell AS code,
          ((q.pn - 2*${dotSql("q.pv", "c.cv")}) + ${dotSql("c.cv", "c.cv")}) AS d
        FROM e q JOIN cb c USING (sub) WHERE q.pid % 100 = 0$capQ),
      pqscored AS (SELECT dt.query_id, codes.pid,
          list_sum(list(dt.d ORDER BY dt.sub)) AS adc_dist
        FROM codes
        JOIN cassign ON codes.pid = cassign.pid
        JOIN qprobe ON cassign.cell = qprobe.cell AND qprobe.query_id <> codes.pid
        JOIN dt ON codes.sub = dt.sub AND codes.code = dt.code
          AND dt.query_id = qprobe.query_id
        GROUP BY dt.query_id, codes.pid)"""
  }

  /** X2 — IVF+PQ composed index search
    * ([[graft.ops.Similarity.ivfPqSearch]]): the FAISS-IVFADC serving
    * shape — coarse cells prune each query to its 2 probed cells, ADC
    * scores only the survivors. The oracle composes the proven component
    * CTEs (coarse assign/probe from x2_ivf_nprobe_topk, trained
    * codebooks/codes/distance table from x2_pq_adc_topk) with the probe
    * restriction in the scored join. */
  private val x2IvfPq = Q("x2_ivf_pq_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      Similarity.ivfPqSearch(emb, "vec_id", "embedding", m = 2, dim = 64,
        codebooks = cb, centroidPred = pmod(col("vec_id"), lit(89)) === 1,
        queryPred = pmod(col("vec_id"), lit(100)) === 0, k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rk"))
    },
    Some(s"""${ivfPqOracleCtes(capQueries = false)},
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc_dist ASC, pid ASC) AS rk FROM pqscored)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, pid AS cand_id, adc_dist
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""))

  /** X2 — IVF+PQ recall@5 vs exact L2 (sibling of x2_pq_recall for the
    * composed index): what the coarse prune + quantization jointly cost
    * in retrieval quality. Exact side is brute-force L2 over the full
    * corpus; recall divides by the MEASURED per-query exact-candidate
    * count capped at k (min(k, n_exact)), so a thin query stripe never
    * understates recall. */
  private val x2IvfPqRecall = Q("x2_ivf_pq_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qp = cappedStripe(col("vec_id"))
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      val ivfpq = Similarity.ivfPqSearch(emb, "vec_id", "embedding", m = 2, dim = 64,
        codebooks = cb, centroidPred = pmod(col("vec_id"), lit(89)) === 1,
        queryPred = qp, k = 5, nprobe = 2)
        .select(col("query_id"), col("cand_id"))
      val e = emb.select(col("vec_id").cast("long").as("cand_id"),
        col("embedding").cast("array<double>").as("cv"))
      val q = emb.where(qp).select(col("vec_id").cast("long").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d").asc, col("cand_id").asc)
      val exact = e.crossJoin(broadcast(q))
        .where(col("cand_id") =!= col("query_id"))
        .withColumn("d", round(expr(
          "aggregate(zip_with(cv, qv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)"), 6))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("query_id"), col("cand_id"))
      recallOf(exact, ivfpq, k = 5)
    },
    Some(s"""${ivfPqOracleCtes(capQueries = true)},
      pqrk AS (SELECT query_id, pid AS cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, pid ASC) AS rk FROM pqscored) WHERE rk <= 5),
      q2 AS (SELECT pid AS query_id, v AS qv FROM v
        WHERE pid % 100 = 0 AND pid < 800),
      exscored AS (SELECT query_id, w.pid AS cand_id,
          round(list_sum(list_transform(range(len(w.v)),
            i -> (w.v[i+1]-qv[i+1])*(w.v[i+1]-qv[i+1]))), 6) AS d
        FROM v w CROSS JOIN q2 WHERE w.pid <> query_id),
      exrk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY d ASC, cand_id ASC) AS rk FROM exscored) WHERE rk <= 5),
      hits AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM exrk JOIN pqrk USING (query_id, cand_id) GROUP BY query_id),
      qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM exrk GROUP BY query_id)
      SELECT qs.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        coalesce(n_hits, 0) / CAST(least(n_exact, 5) AS DOUBLE) AS recall
      FROM qs LEFT JOIN hits USING (query_id) ORDER BY query_id"""))

  /** X2 — two-stage retrieval ([[graft.ops.Similarity.ivfPqRerank]]):
    * IVFADC shortlist of 20 candidates per query, exact-cosine re-rank
    * to the top 5 — the FAISS refine serving shape. The oracle chains
    * the proven IVF+PQ CTEs with the same shortlist cut and replays the
    * exact cosine only over shortlist rows. */
  private val x2IvfRerank = Q("x2_ivf_rerank_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      Similarity.ivfPqRerank(emb, "vec_id", "embedding", m = 2, dim = 64,
        codebooks = cb, centroidPred = pmod(col("vec_id"), lit(89)) === 1,
        queryPred = pmod(col("vec_id"), lit(100)) === 0,
        k = 5, nprobe = 2, shortlist = 20)
        .orderBy(col("query_id"), col("rk"))
    },
    Some(s"""${ivfPqOracleCtes(capQueries = false)},
      sl AS (SELECT query_id, pid AS cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, pid ASC) AS rk FROM pqscored) WHERE rk <= 20),
      q2 AS (SELECT pid AS query_id, v AS qv FROM v WHERE pid % 100 = 0),
      ex AS (SELECT sl.query_id, sl.cand_id,
          ${cosSql("qv", "w.v")} AS cosine
        FROM sl JOIN v w ON w.pid = sl.cand_id
        JOIN q2 ON q2.query_id = sl.query_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, cand_id ASC) AS rk FROM ex)
      SELECT query_id, CAST(rk AS BIGINT) AS rk, cand_id, cosine
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""))

  /** X2 — two-stage recall@5 vs exact cosine (the refine payoff the
    * recall harness measures): with the exact re-rank on top, the index
    * can only miss a true neighbor that fell OUTSIDE the 20-candidate
    * shortlist — ordering errors inside the shortlist are repaired.
    * The guaranteed form of that claim is per-query hit-count dominance
    * over the raw ADC top-k AGAINST THE SAME cosine reference
    * (Round11OpsSpec proves it); comparing this query's number to
    * `x2_ivf_pq_recall` is only indicative, since that eval's exact
    * side is L2, a different reference ranking. Measured
    * min(k, n_exact) denominator, as every recall eval. */
  private val x2IvfRerankRecall = Q("x2_ivf_rerank_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qp = cappedStripe(col("vec_id"))
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
      val rr = Similarity.ivfPqRerank(emb, "vec_id", "embedding", m = 2, dim = 64,
        codebooks = cb, centroidPred = pmod(col("vec_id"), lit(89)) === 1,
        queryPred = qp, k = 5, nprobe = 2, shortlist = 20)
        .select(col("query_id"), col("cand_id"))
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qp, k = 5)
        .select(col("query_id"), col("cand_id"))
      recallOf(exact, rr, k = 5)
    },
    Some(s"""${ivfPqOracleCtes(capQueries = true)},
      sl AS (SELECT query_id, pid AS cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, pid ASC) AS rk FROM pqscored) WHERE rk <= 20),
      q2 AS (SELECT pid AS query_id, v AS qv FROM v
        WHERE pid % 100 = 0 AND pid < 800),
      rrex AS (SELECT sl.query_id, sl.cand_id,
          ${cosSql("qv", "w.v")} AS cosine
        FROM sl JOIN v w ON w.pid = sl.cand_id
        JOIN q2 ON q2.query_id = sl.query_id),
      rrk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rk FROM rrex) WHERE rk <= 5),
      exscored AS (SELECT q2.query_id, w.pid AS cand_id,
          ${cosSql("qv", "w.v")} AS cosine
        FROM v w CROSS JOIN q2 WHERE w.pid <> q2.query_id),
      exrk AS (SELECT query_id, cand_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, cand_id ASC) AS rk FROM exscored) WHERE rk <= 5),
      hits AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM exrk JOIN rrk USING (query_id, cand_id) GROUP BY query_id),
      qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM exrk GROUP BY query_id)
      SELECT qs.query_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        coalesce(n_hits, 0) / CAST(least(n_exact, 5) AS DOUBLE) AS recall
      FROM qs LEFT JOIN hits USING (query_id) ORDER BY query_id"""))

  /** X5 — Misra–Gries heavy hitters per source (mergeable sketch
    * aggregate; see [[graft.ops.MisraGriesAggregator]]). Capacity 64 vs a
    * 31-token vocabulary puts the sketch in its exact regime, so the
    * oracle is the exact per-group top-5 — while the PLAN is the sketch's:
    * partial per-partition summaries merged at the final agg, never a
    * token-level shuffle. */
  private val x5Heavy = Q("x5_heavy_hitters",
    (s, dir) => {
      val mg = udaf(new MisraGriesAggregator(64))
      Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("source")).agg(mg(col("tok")).as("hh"))
        .select(col("source"), posexplode(col("hh")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
          col("col._1").as("token"), col("col._2").as("n"))
        .where(col("rk") <= 5)
        .orderBy(col("source"), col("rk"))
    },
    Some(s"""WITH base AS ($docsTokSql),
      t AS (SELECT source, unnest(toks) AS token FROM base),
      c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY source, token),
      r AS (SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY n DESC, token) AS rk FROM c)
      SELECT source, CAST(rk AS BIGINT) AS rk, token, n
      FROM r WHERE rk <= 5 ORDER BY source, rk"""))

  /** X5 — Count–Min point-frequency estimates (mergeable sketch
    * aggregate, [[graft.ops.CountMinAggregator]]): the whole corpus
    * folds into one depth×width counter matrix (partial + merge, never
    * a token-level shuffle for the SKETCH side), and doc 0's distinct
    * tokens probe it via the shared closed-form hash. `n_exact` rides
    * along to exhibit the one-sided error (est ≥ exact always; the
    * oracle replays sketch construction in SQL, so both engines see the
    * identical collisions). */
  private val x5CountMin = Q("x5_count_min",
    (s, dir) => {
      val cms = udaf(new CountMinAggregator(3, 64))
      val docs = Tables.documents(s, dir)
      val toks = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
      val sketch = toks.agg(cms(col("t")).as("sk"))
      val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("n_exact"))
      val probes = docs.where(col("doc_id") === 0)
        .select(explode(TextOps.tokens(col("text"))).as("t")).distinct()
      val lookups = (0 until 3).map { j =>
        expr(s"element_at(sk, CAST(${j * 64} + ${CountMin.bucketSql("code", j, 64)} + 1 AS INT))")
      }
      probes.join(exact, Seq("t"))
        .crossJoin(broadcast(sketch))
        .withColumn("code", expr(CountMin.codeSql("t")))
        .select(col("t").as("token"), least(lookups: _*).as("est"),
          col("n_exact"))
        .orderBy(col("token"))
    },
    Some {
      val aCase = "CASE j " + CountMin.A.take(3).zipWithIndex
        .map { case (a, j) => s"WHEN $j THEN $a" }.mkString(" ") + " END"
      val bucket = s"((($aCase * c + j + 1) % ${CountMin.P}) % 64)"
      s"""WITH base AS ($docsTokSql),
        tok AS (SELECT unnest(toks) AS t FROM base),
        cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t),
        code AS (SELECT t, n, ${CountMin.codeDuck("t")} AS c FROM cnt),
        bk AS (SELECT t, n, c, j, $bucket AS b FROM code, range(3) s(j)),
        rows_ AS (SELECT j, b, CAST(sum(n) AS BIGINT) AS tot FROM bk GROUP BY j, b),
        probes AS (SELECT DISTINCT unnest(toks) AS t FROM base WHERE doc_id = 0),
        pbk AS (SELECT bk.t, bk.j, bk.b FROM bk JOIN probes USING (t)),
        est AS (SELECT t, CAST(min(tot) AS BIGINT) AS est
          FROM pbk JOIN rows_ USING (j, b) GROUP BY t)
        SELECT t AS token, est, cnt.n AS n_exact
        FROM est JOIN cnt USING (t) ORDER BY token"""
    })

  /** X3 — URL canonicalization + URL-level dedup (the fetch-identity
    * pass web curation runs BEFORE content dedup). Messy URLs are
    * synthesized deterministically (mixed-case scheme/host, default
    * port, trailing slash, tracking params, fragments, shuffled param
    * order) so each normalization fires; canonical collisions group to
    * (canon_url, keeper = min doc_id, n_dups). Both engines build and
    * canonicalize the identical string with the identical regexps —
    * extraction-only, never group-ref replacement (see
    * TextOps.canonicalUrl). */
  private val x3Url = Q("x3_url_canonical",
    (s, dir) => {
      val id = col("doc_id")
      val messy = concat(
        when(id % 2 === 0, lit("HTTPS")).otherwise(lit("https")), lit("://"),
        when(id % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
        col("source"), lit(".Example.COM"),
        when(id % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), (id % 50).cast("string"),
        when(id % 5 === 0, lit("/")).otherwise(lit("")),
        when(id % 6 === 0, lit("?utm_source=x&b=2&a=1"))
          .when(id % 6 === 1, lit("?a=1&b=2")).otherwise(lit("")),
        when(id % 7 === 0, lit("#frag")).otherwise(lit("")))
      Tables.documents(s, dir)
        .withColumn("canon_url", TextOps.canonicalUrl(messy))
        .groupBy(col("canon_url"))
        .agg(min(id).as("keeper"), count(lit(1)).as("n_dups"))
        .orderBy(col("canon_url"))
    },
    Some("""WITH m AS (SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
        (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END) ||
        source || '.Example.COM' ||
        (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
        (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=x&b=2&a=1'
              WHEN doc_id % 6 = 1 THEN '?a=1&b=2' ELSE '' END) ||
        (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS u
      FROM documents),
      p AS (SELECT doc_id,
        lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,
        regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)', 1) AS port,
        rtrim(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/') AS path,
        array_to_string(list_sort(list_filter(
          string_split(regexp_extract(u, '[?]([^#]*)', 1), '&'),
          x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|ref)='))),
          '&') AS params
      FROM m),
      c AS (SELECT doc_id,
        scheme || '://' || host ||
        (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                   AND NOT (scheme = 'https' AND port = '443')
              THEN ':' || port ELSE '' END) ||
        path ||
        (CASE WHEN params <> '' THEN '?' || params ELSE '' END) AS canon_url
      FROM p)
      SELECT canon_url, min(doc_id) AS keeper,
        CAST(count(*) AS BIGINT) AS n_dups
      FROM c GROUP BY canon_url ORDER BY canon_url"""))

  /** S8 — ORC round-trip: the third columnar container after parquet and
    * the text formats (Spark ships the ORC reader/writer natively; ORC is
    * the interchange format for Hive-era warehouses a 100 TB ingest
    * frequently starts from). Partitioned write (8 files), schema-carrying
    * re-read, aggregate. The oracle computes from the SOURCE table — if
    * the ORC round-trip corrupted values or types, the Spark side
    * diverges. */
  private val s8Orc = Q("s8_orc_roundtrip",
    (s, dir) => {
      val path = "/tmp/graft_s8_orc_" + Tables.scratchTag(s, dir)
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"))
        .where(pmod(col("l_orderkey"), lit(3)) === 0)
        .repartition(8)
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      round(sum(l_quantity), 4) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem WHERE l_orderkey % 3 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    eagerPlan = true) // constructing runs the ORC sink write

  /** S3-family — winsorized preprocessing (see [[graft.ops.AggOps.winsorize]]):
    * prices clamped at per-flag exact P05/P95 via the distributed rank
    * quantile, then re-aggregated. Clamp counts are exact integers; the
    * winsorized sum is 2-decimal money (boundary-free rounding). The
    * oracle computes the same bounds with quantile_disc — the
    * position-rule agreement x5_approx_quantile established. */
  private val s3Winsorize = Q("s3_winsorize",
    (s, dir) => {
      val v = col("l_extendedprice"); val vw = col("l_extendedprice_w")
      AggOps.winsorize(Tables.lineitem(s, dir), Seq("l_returnflag"),
          "l_extendedprice", 0.05, 0.95)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(vw > v, 1L).otherwise(0L)).as("n_clamped_lo"),
          sum(when(vw < v, 1L).otherwise(0L)).as("n_clamped_hi"),
          round(sum(vw), 2).as("sum_w"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH q AS (SELECT l_returnflag,
        quantile_disc(l_extendedprice, 0.05) AS lo,
        quantile_disc(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        round(sum(CASE WHEN l_extendedprice < lo THEN lo
                       WHEN l_extendedprice > hi THEN hi
                       ELSE l_extendedprice END), 2) AS sum_w
      FROM lineitem l JOIN q USING (l_returnflag)
      GROUP BY 1 ORDER BY l_returnflag"""))

  /** X6 — leakage-safe group-wise split: the split bucket hashes the
    * site DOMAIN (the x3_domain_cap host synthesis), so every page of a
    * host lands in one split and near-identical same-site pages can
    * never straddle train/test. Output groups by (domain, split): the
    * hash-match proves each domain maps to exactly one split with the
    * identical bucket math in both engines. */
  private val x6GroupSplit = Q("x6_group_split",
    (s, dir) => {
      val withDomain = Tables.documents(s, dir)
        .withColumn("domain", concat(col("source"),
          (col("doc_id") % 7).cast("string"), lit(".example.com")))
      Curation.splitAssignBy(withDomain, col("domain"))
        .groupBy(col("domain"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("domain"), col("split"))
    },
    Some("""WITH d AS (SELECT *,
        source || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS domain
      FROM documents),
      b AS (SELECT *,
        CAST(('0x' || substr(md5(domain), 1, 15)) AS BIGINT) % 100 AS bk FROM d)
      SELECT domain,
        CASE WHEN bk < 90 THEN 'train' WHEN bk < 95 THEN 'val' ELSE 'test' END AS split,
        CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM b GROUP BY 1, 2 ORDER BY domain, split"""))

  /** X7 — the FULL curation pipeline as one declarative DAG (the X-side
    * mirror of `e2e_train_step`: proof the hygiene operators COMPOSE into
    * the program a corpus team actually runs, not just pass alone):
    *  1. exact dedup of the training corpus (bench slice held out — eval
    *     data is never deduped away);
    *  2. decontamination against the PRISTINE bench slice's 8-gram
    *     ledger (hashed + broadcast; the corpus side never shuffles);
    *  3. Gopher repetition gate in INTEGER form (5·dup_grams ≤ grams,
    *     n_toks ≥ 5 — no rounding anywhere in the filter);
    *  4. greedy 512-token packing per lang over the survivors.
    * Output: per (lang, bin) doc count + token sum. The oracle chains the
    * identical four stages as CTEs (string grams where Spark uses
    * 64-bit gram hashes — the same accepted collision trade as x3_decontaminate,
    * which the hash-match would surface). */
  private val x7Curation = Q("x7_curation_pipeline",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val isBench = pmod(col("doc_id"), lit(10)) === 7
      val corpus = docs.where(!isBench)
      val bench = docs.where(isBench)
      val keep = Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val d1 = corpus.join(keep, Seq("doc_id"), "left_semi")
      val benchGrams = TextOps.benchGramLedger(bench, "doc_id", "text", 8)
      val dirty = TextOps.gramHashes(d1, "doc_id", "text", 8)
        .join(broadcast(benchGrams), "gh").select("doc_id").distinct()
      val d2 = d1.join(dirty, Seq("doc_id"), "left_anti")
      val rep = TextOps.repetitionStats(d2, "doc_id", "text", n = 2)
        .where(col("n_dup_grams") * lit(5) <= col("n_grams")
          && col("n_toks") >= 5)
        .select(col("doc_id"), col("n_toks"))
      val gated = d2.join(rep, Seq("doc_id"))
      Curation.packSequences(gated, "doc_id", "lang", col("n_toks"), 512)
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH corpus AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 7),
      keep AS (SELECT min(doc_id) AS doc_id FROM corpus
        GROUP BY md5(regexp_replace(trim(lower(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'))),
      d1 AS (SELECT c.doc_id, c.lang, c.text FROM corpus c JOIN keep USING (doc_id)),
      t1 AS (SELECT doc_id, lang,
        list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t FROM d1),
      bt AS (SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents WHERE doc_id % 10 = 7),
      bg AS (SELECT DISTINCT array_to_string(t[i+1:i+8], ' ') AS g
        FROM (SELECT t, unnest(range(greatest(len(t) - 7, 0))) AS i FROM bt)),
      cg AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+8], ' ') AS g
        FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - 7, 0))) AS i FROM t1)),
      dirty AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (g)),
      d2 AS (SELECT * FROM t1
        WHERE NOT EXISTS (SELECT 1 FROM dirty WHERE dirty.doc_id = t1.doc_id)),
      gi AS (SELECT doc_id, t, unnest(range(greatest(len(t) - 1, 0))) AS i
        FROM d2 WHERE len(t) > 0),
      g AS (SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS g FROM gi),
      gs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(count(DISTINCT g) AS BIGINT) AS n_uniq FROM g GROUP BY doc_id),
      rep AS (SELECT d2.doc_id, d2.lang, CAST(len(d2.t) AS BIGINT) AS n_tokens
        FROM d2 JOIN gs USING (doc_id)
        WHERE (gs.n_grams - gs.n_uniq) * 5 <= gs.n_grams AND len(d2.t) >= 5),
      p AS (SELECT *, CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0) AS BIGINT) AS bin FROM rep)
      SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tok_sum
      FROM p GROUP BY lang, bin ORDER BY lang, bin"""))

  /** S11 — Z-order layout key (see [[graft.ops.CoreOps.mortonKey]]): the
    * multi-dimensional clustering key a 100 TB table sorts by before its
    * parquet write so range predicates on EITHER dimension prune
    * files/row-groups at the scan. Pure exact-integer bit interleave —
    * the oracle unrolls the identical 32 shift/mask terms; the locality
    * summary (rows per 4096-key tile × per-tile dimension spans) shows
    * each tile covering a tight x/y rectangle, which IS the skipping
    * property. */
  private val s11Zorder = Q("s11_zorder_key",
    (s, dir) => {
      val x = pmod(col("l_orderkey"), lit(4096L))
      val y = pmod(col("l_partkey"), lit(4096L))
      Tables.lineitem(s, dir)
        .select(CoreOps.mortonKey(x, y, 12).as("zkey"), x.as("x"), y.as("y"))
        .groupBy((col("zkey") / lit(4096L)).cast("long").as("tile"))
        .agg(count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"))
        .orderBy(col("tile"))
    },
    Some {
      val terms = (0 until 12).map { i =>
        s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))"
      }.mkString(" + ")
      s"""WITH d AS (SELECT l_orderkey % 4096 AS x, l_partkey % 4096 AS y FROM lineitem),
        z AS (SELECT x, y, $terms AS zkey FROM d)
        SELECT CAST(zkey // 4096 AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n,
          max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
        FROM z GROUP BY 1 ORDER BY tile"""
    })

  /** S11 (3-D) — the N-dimensional form of the Z-order layout key
    * ([[graft.ops.CoreOps.mortonKeyN]]): real lakehouse Z-ordering is
    * 3–4 dims (e.g. date × customer × product). Same locality summary
    * as `s11_zorder_key` over three 10-bit dimensions — every 4096-key
    * tile covers a tight x/y/w box, so a range predicate on ANY of the
    * three columns prunes files at the scan. */
  private val s11Zorder3d = Q("s11_zorder_key_3d",
    (s, dir) => {
      val x = pmod(col("l_orderkey"), lit(1024L))
      val y = pmod(col("l_partkey"), lit(1024L))
      val w = pmod(col("l_suppkey"), lit(1024L))
      Tables.lineitem(s, dir)
        .select(CoreOps.mortonKeyN(Seq(x, y, w), 10).as("zkey"),
          x.as("x"), y.as("y"), w.as("w"))
        .groupBy((col("zkey") / lit(262144L)).cast("long").as("tile"))
        .agg(count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"),
          (max(col("w")) - min(col("w"))).as("w_span"))
        .orderBy(col("tile"))
    },
    Some {
      val terms = (0 until 10).flatMap { i =>
        Seq(s"(((x >> $i) & 1) << ${3 * i})",
          s"(((y >> $i) & 1) << ${3 * i + 1})",
          s"(((w >> $i) & 1) << ${3 * i + 2})")
      }.mkString(" + ")
      s"""WITH d AS (SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y,
          l_suppkey % 1024 AS w FROM lineitem),
        z AS (SELECT x, y, w, $terms AS zkey FROM d)
        SELECT CAST(zkey // 262144 AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n,
          max(x) - min(x) AS x_span, max(y) - min(y) AS y_span,
          max(w) - min(w) AS w_span
        FROM z GROUP BY 1 ORDER BY tile"""
    })

  /** S10 — schema-evolution roundtrip: a long-lived table accretes files
    * from different pipeline generations; here generation 1 writes
    * (user_id, value) and generation 2 adds an `event_type` column. A
    * `mergeSchema` read unions the generations by NAME — old files
    * null-fill the new column — which is exactly how a 100 TB parquet
    * table evolves in place with zero rewrites (per-file footers carry
    * their own schema; the merged scan stays fully vectorized and
    * prunable). The oracle rebuilds the same union from the source table
    * with an explicit NULL for generation 1's missing column. */
  private val s10Schema = Q("s10_schema_evolution",
    (s, dir) => {
      val path = "/tmp/graft_s10_schema_" + Tables.scratchTag(s, dir)
      val ev = Tables.events(s, dir)
      ev.where(pmod(col("event_id"), lit(5)) === 0)
        .select(col("event_id"), col("user_id"), col("value"))
        .write.mode("overwrite").parquet(s"$path/gen=1")
      ev.where(pmod(col("event_id"), lit(5)) === 1)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode("overwrite").parquet(s"$path/gen=2")
      s.read.option("mergeSchema", "true").parquet(s"$path/gen=1", s"$path/gen=2")
        .groupBy(coalesce(col("event_type"), lit("__legacy")).as("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""WITH merged AS (
        SELECT event_id, user_id, value, NULL AS event_type
        FROM events WHERE event_id % 5 = 0
        UNION ALL
        SELECT event_id, user_id, value, event_type
        FROM events WHERE event_id % 5 = 1)
      SELECT coalesce(event_type, '__legacy') AS event_type,
        CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
      FROM merged GROUP BY 1 ORDER BY event_type"""),
    eagerPlan = true) // constructing runs the two generation sink writes

  /** X6 — weighted priority sampling (Efraimidis–Spirakis, deterministic
    * hash uniforms): 100 docs drawn without replacement, probability ∝
    * token count. TakeOrderedAndProject plan (PlanSpec-asserted family);
    * the oracle replays the identical key formula and ranking. */
  private val x6Priority = Q("x6_priority_sample",
    (s, dir) => {
      val st = TextOps.textStats(col("text"))
      val weighted = Tables.documents(s, dir).select(col("doc_id"),
        greatest(st.getField("n_tokens").cast("long"), lit(1L)).as("n_tokens"))
      Curation.prioritySample(weighted, "doc_id", col("n_tokens"), k = 100,
          seed = "s7")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS ($docsTokSql),
      w AS (SELECT doc_id, greatest(len(toks), 1) AS w FROM base),
      u AS (SELECT doc_id, w,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's7'), 1, 15)) AS BIGINT)
            / 1152921504606846976.0 AS u
        FROM w),
      k AS (SELECT doc_id, w,
          floor(ln(u) / CAST(w AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS sample_key
        FROM u),
      r AS (SELECT *, row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rk
        FROM k)
      SELECT doc_id, CAST(w AS BIGINT) AS n_tokens, sample_key
      FROM r WHERE rk <= 100 ORDER BY doc_id"""))

  /** X3 — corpus-fit bigram LM perplexity scoring (CCNet-style quality
    * filter; see TextOps.lmPerplexityScore). Count tables probe-joined
    * unhinted (corpus-derived vocab — AQE sizes them); one corpus
    * shuffle. */
  private val x3Lm = Q("x3_lm_perplexity",
    (s, dir) => TextOps.lmPerplexityScore(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      uni AS (SELECT w1, count(*) AS c1
        FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY w1),
      v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
      bi AS (SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS bg
        FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - 1, 0))) AS i
              FROM toks)),
      bc AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg),
      j AS (SELECT doc_id, ln((c2 + 0.5) / (c1 + 0.5 * v)) AS lp
        FROM bi JOIN bc USING (bg)
        JOIN uni ON string_split(bg, ' ')[1] = uni.w1
        CROSS JOIN v)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        floor(avg(lp) * 10000.0 + 0.5) / 10000.0 AS avg_logprob
      FROM j GROUP BY doc_id ORDER BY doc_id"""))

  /** X2 — embedding covariance matrix (upper triangle), the whitening /
    * PCA-prep statistic for the ANN stack. Map-side-combined (i, j)
    * partial sums; portable rounding at 6. */
  private val x2Cov = Q("x2_covariance_matrix",
    (s, dir) => Similarity.covarianceMatrix(Tables.embeddings(s, dir), "embedding")
      .orderBy(col("i"), col("j")),
    Some("""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
      p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
        FROM e, range(64) a(i), range(64) b(j) WHERE i <= j)
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
          / 1000000.0 AS cov
      FROM p GROUP BY i, j ORDER BY i, j"""))

  /** X2 — top principal component via 3 unrolled power iterations over
    * the covariance matrix (see Similarity.pcaPowerIteration); the oracle
    * unrolls the same matvec → round → normalize → round chain. */
  private val x2Pca = Q("x2_pca_power",
    (s, dir) => Similarity.pcaPowerIteration(Tables.embeddings(s, dir),
        "embedding", dim = 64, iters = 3)
      .orderBy(col("i")),
    Some {
      val iterCtes = (1 to 3).map { t =>
        val prev = if (t == 1) "v0" else s"v${t - 1}"
        s"""w$t AS (SELECT cv.i, floor(sum(cov * vj) * 1000000.0 + 0.5) / 1000000.0 AS wi
          FROM cv JOIN $prev ON cv.j = $prev.j GROUP BY cv.i),
        n$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w$t),
        v$t AS (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
          FROM w$t, n$t)"""
      }.mkString(",\n        ")
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
          FROM e, range(64) a(i), range(64) b(j) WHERE i <= j),
        up AS (SELECT i, j,
            floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
              / 1000000.0 AS cov
          FROM p GROUP BY i, j),
        cv AS (SELECT i, j, cov FROM up
               UNION ALL SELECT j AS i, i AS j, cov FROM up WHERE i <> j),
        v0 AS (SELECT i AS j, 1.0 AS vj FROM range(64) t(i)),
        $iterCtes
        SELECT CAST(j AS BIGINT) AS i, vj AS loading FROM v3 ORDER BY i"""
    })

  /** Dataset profiler — one aggregation pass over lineitem yields every
    * (column, metric) health stat, unpivoted to rows (see
    * [[graft.ops.DataProfile]]). The oracle mirrors each metric with a
    * UNION ALL over one flat aggregate CTE. */
  private val profileQ = Q("profile_table",
    (s, dir) => DataProfile.profile(Tables.lineitem(s, dir),
      numericCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
      keyCols = Seq("l_returnflag"))
      .orderBy(col("col_name"), col("metric")),
    Some {
      val numeric = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
        "l_discount" -> "s")
      val aggSql = (numeric.map { case (c, k) =>
        s"""count($c) AS n_$k, sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS z_$k,
           count(DISTINCT $c) AS d_$k, min($c) AS mn_$k, max($c) AS mx_$k,
           floor(avg($c) * 10000.0 + 0.5) / 10000.0 AS me_$k"""
      } :+ """count(l_returnflag) AS n_r,
           sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS z_r,
           count(DISTINCT l_returnflag) AS d_r""").mkString(",\n        ")
      val branches = (numeric.flatMap { case (c, k) =>
        Seq("n" -> s"n_$k", "nulls" -> s"z_$k", "n_distinct" -> s"d_$k",
          "min" -> s"mn_$k", "max" -> s"mx_$k", "mean" -> s"me_$k")
          .map { case (m, f) =>
            s"SELECT '$c' AS col_name, '$m' AS metric, CAST($f AS DOUBLE) AS value FROM a"
          }
      } ++ Seq("n" -> "n_r", "nulls" -> "z_r", "n_distinct" -> "d_r").map {
        case (m, f) =>
          s"SELECT 'l_returnflag' AS col_name, '$m' AS metric, CAST($f AS DOUBLE) AS value FROM a"
      }).mkString("\n        UNION ALL ")
      s"""WITH a AS (SELECT
        $aggSql
      FROM lineitem)
      SELECT col_name, metric, value FROM (
        $branches
      ) ORDER BY col_name, metric"""
    })

  /** X2 — SemDeDup-style semantic dedup (see
    * [[graft.ops.Similarity.semanticDedup]]): nearest-centroid cells
    * (deterministic centroid subset, reproducible in the oracle exactly
    * like x2_ivf_topk's), then within-cell cosine vs every lower-id
    * member. The oracle unrolls the identical argmin (same distance
    * association, centroid-id tie-break) and the identical cosine form,
    * then LEFT-joins the distinct losers back — is_dup must agree
    * row-for-row, proving cell assignment AND pair scoring both match. */
  private val x2SemDedup = Q("x2_semantic_dedup",
    (s, dir) => Similarity.semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        centroidPred = pmod(col("vec_id"), lit(89)) === 7, threshold = 0.3)
      .orderBy(col("pid")),
    Some {
      val dPC = dotSql("e.pv", "c.cv"); val dCC = dotSql("c.cv", "c.cv")
      val dPP = dotSql("e.pv", "e.pv")
      val dLR = dotSql("l.pv", "r.pv")
      val dLL = dotSql("l.pv", "l.pv"); val dRR = dotSql("r.pv", "r.pv")
      s"""WITH e AS (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings),
        c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id % 89 = 7),
        a AS (SELECT pid, pv, cell FROM (
          SELECT e.pid, e.pv, c.centroid_id AS cell,
            row_number() OVER (PARTITION BY e.pid ORDER BY
              (($dPP - 2*$dPC) + $dCC) ASC, c.centroid_id ASC) AS rk
          FROM e CROSS JOIN c) WHERE rk = 1),
        d AS (SELECT DISTINCT r.pid AS pid
          FROM a l JOIN a r ON l.cell = r.cell AND l.pid < r.pid
          WHERE round($dLR / (sqrt($dLL) * sqrt($dRR)), 6) >= 0.3)
        SELECT a.pid, a.cell, (d.pid IS NOT NULL) AS is_dup
        FROM a LEFT JOIN d ON a.pid = d.pid ORDER BY a.pid"""
    })

  /** W7 family — sliding-window anomaly detection (metric-stream
    * observability: flag a reading whose deviation from its own trailing
    * context exceeds 3σ). The context is the previous 20 events per user
    * (current row EXCLUDED — the candidate must not contaminate its own
    * baseline), requiring ≥ 10 context rows. The 3σ test is squared —
    * (x·n − Σx)² > 9·(n·Σx² − (Σx)²) — so both engines compare
    * polynomials of the same windowed sums, no sqrt/division in the
    * predicate. The report emits the SUMS (Σx rounded at 2, n·Σx²−(Σx)²
    * at 4), not μ/σ²: value is 2-decimal data, so the sums' true values
    * are exact multiples of 0.01/0.0001 — never on a rounding half
    * boundary — while the divisions land on dyadic halves (40.125,
    * 454.34375) that a last-ulp window-sum association divergence
    * between engines rounds apart (both observed at sf0.1). One
    * user-keyed shuffle, frame work O(window) per row. */
  private val w8Anomaly = Q("w8_anomaly_zscore",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      val ev = Tables.events(s, dir)
        .withColumn("n_ctx", count(col("value")).over(w))
        .withColumn("s1", sum(col("value")).over(w))
        .withColumn("s2", sum(col("value") * col("value")).over(w))
      ev.where(col("n_ctx") >= 10)
        .where((col("value") * col("n_ctx") - col("s1"))
          * (col("value") * col("n_ctx") - col("s1"))
          > lit(9.0) * (col("n_ctx") * col("s2") - col("s1") * col("s1")))
        .select(col("user_id"), col("event_id"), col("value"),
          col("n_ctx"),
          round(col("s1"), 2).as("ctx_sum"),
          round(col("n_ctx") * col("s2") - col("s1") * col("s1"), 4).as("ctx_m2"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, value,
        count(value) OVER w AS n_ctx, sum(value) OVER w AS s1,
        sum(value*value) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      SELECT user_id, event_id, value, n_ctx,
        round(s1, 2) AS ctx_sum,
        round(n_ctx*s2 - s1*s1, 4) AS ctx_m2
      FROM e
      WHERE n_ctx >= 10
        AND (value*n_ctx - s1)*(value*n_ctx - s1) > 9.0*(n_ctx*s2 - s1*s1)
      ORDER BY user_id, event_id"""))

  /** X6 — curriculum ordering (see [[graft.ops.Curation.curriculumOrder]]):
    * easiest-first (length-as-difficulty proxy) with round-robin source
    * interleave — rank r of every source precedes rank r+1 of any.
    * The oracle replays the identical per-source rank + lexicographic
    * (rk, source) manifest order. */
  /** X6 — size-balanced output shards: round-robin over (size DESC, id)
    * order → doc counts differ ≤ 1 and token totals differ ≤ the largest
    * document per shard. Spark plans the rank through the bucket-prefix
    * decomposition (no global window); the oracle is the naive global
    * row_number, proving the decomposition exact. */
  private val x6Shard = Q("x6_shard_manifest",
    (s, dir) => Curation.shardManifest(Tables.documents(s, dir), "doc_id",
      col("n_chars"), shards = 8)
      .orderBy(col("doc_id")),
    Some("""WITH r AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens,
        row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1 AS rk
      FROM documents)
      SELECT doc_id, n_tokens, CAST(rk % 8 AS BIGINT) AS shard
      FROM r ORDER BY doc_id"""))

  /** X6 — deterministic epoch reshuffle manifest: 3 epochs, each a
    * different md5-derived pseudorandom order, re-derivable as a pure
    * projection (elastic-restart safe; no stored permutation). */
  private val x6Epoch = Q("x6_epoch_shuffle",
    (s, dir) => Curation.epochShuffle(Tables.documents(s, dir), "doc_id", epochs = 3)
      .orderBy(col("epoch"), col("ord"), col("doc_id")),
    Some("""SELECT CAST(e AS BIGINT) AS epoch,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e AS VARCHAR)), 1, 15)) AS BIGINT) AS ord,
        doc_id
      FROM documents, (SELECT unnest(range(3)) AS e)
      ORDER BY epoch, ord, doc_id"""))

  private val x6Curriculum = Q("x6_curriculum_order",
    (s, dir) => Curation.curriculumOrder(Tables.documents(s, dir), "doc_id", "source",
      col("n_chars").cast("double")),
    Some("""SELECT CAST(row_number() OVER (PARTITION BY source
          ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS BIGINT) AS rk,
        source, doc_id, CAST(n_chars AS DOUBLE) AS difficulty
      FROM documents ORDER BY rk, source"""))

  /** X2 — SemDeDup in its PRODUCTION form: cluster the corpus with the
    * trained k-means centroids (x2_kmeans_fit's exact fit, 2 Lloyd
    * iterations), then dedup within each trained cluster — the
    * [[graft.ops.Similarity.semanticDedupWith]] composition. The oracle
    * chains the full unrolled k-means CTEs into the assignment and
    * pairwise stages, so the hash-match proves fit, assignment and pair
    * scoring all agree end-to-end (portable-rounded centroid coords make
    * iteration-2 distances bit-identical across engines). */
  private val x2SemTrained = Q("x2_semantic_dedup_trained",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.kmeansFit(emb, "vec_id", "embedding",
          seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2, roundDigits = 6)
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("coord")))),
          x => x.getField("coord")).as("cv"))
      Similarity.semanticDedupWith(emb, "vec_id", "embedding", cents, threshold = 0.3)
        .orderBy(col("pid"))
    },
    Some {
      val dpc = dotSql("e.pv", "c.cv"); val dcc = dotSql("c.cv", "c.cv")
      def distRk(cents: String) =
        s"""SELECT pid, pv, cell FROM (
          SELECT e.pid, e.pv, c.cell,
            row_number() OVER (PARTITION BY e.pid ORDER BY
              ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
          FROM e CROSS JOIN $cents c) WHERE rk = 1"""
      val dLR = dotSql("l.pv", "r.pv")
      val dLL = dotSql("l.pv", "l.pv"); val dRR = dotSql("r.pv", "r.pv")
      s"""WITH e AS (SELECT pid, pv, ${dotSql("pv", "pv")} AS pn FROM
          (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings)),
      c0 AS (SELECT CAST(vec_id AS BIGINT) AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id % 97 = 3),
      a0 AS (${distRk("c0")}),
      m0 AS (SELECT cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a0, range(64) t(i) GROUP BY cell, i),
      c1 AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m0 GROUP BY cell),
      a1 AS (${distRk("c1")}),
      m1 AS (SELECT cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a1, range(64) t(i) GROUP BY cell, i),
      c2 AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m1 GROUP BY cell),
      a2 AS (${distRk("c2")}),
      d AS (SELECT DISTINCT r.pid AS pid
        FROM a2 l JOIN a2 r ON l.cell = r.cell AND l.pid < r.pid
        WHERE round($dLR / (sqrt($dLL) * sqrt($dRR)), 6) >= 0.3)
      SELECT a2.pid, a2.cell, (d.pid IS NOT NULL) AS is_dup
      FROM a2 LEFT JOIN d ON a2.pid = d.pid ORDER BY a2.pid"""
    })

  /** X2 — trained-artifact persistence round-trip
    * ([[graft.ops.Artifacts]]): the k-means centroid table trains, SAVES
    * as a versioned artifact (parquet + JSON sidecar, staged atomic-
    * rename commit — the reference's checkpoint save-AND-load,
    * fawac.py:555-583, applied to index state), LOADS back in a fresh
    * read, and the whole corpus assigns against the LOADED table. The
    * oracle replays the fit + assignment from the source table directly,
    * so a hash match proves the store is lossless end-to-end — if the
    * round-trip dropped a row, reordered a centroid array, or lost
    * double precision, every downstream cell id would shift. Scale
    * shape: the artifact is k·d rows (broadcast-dim); the corpus-side
    * assignment is the one-row-broadcast argmin fold ([[graft.ops
    * .Similarity.assignCells]]), no corpus shuffle. */
  private val x2ArtifactRt = Q("x2_artifact_roundtrip",
    (s, dir) => {
      val root = "/tmp/graft_art_rt_" + Tables.scratchTag(s, dir)
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.kmeansFit(emb, "vec_id", "embedding",
          seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2, roundDigits = 6)
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("coord")))),
          x => x.getField("coord")).as("cv"))
      val v = Artifacts.saveArtifact(cents, root, "ivf_centroids",
        Map("dim" -> "64", "iters" -> "2", "seeds" -> "vec_id%97=3"))
      val (loaded, meta) = Artifacts.loadArtifactVersion(s, root, v, "ivf_centroids")
      require(meta.params("dim") == "64", "sidecar params must round-trip")
      Similarity.assignCells(emb, "vec_id", "embedding", loaded)
        .select(col("pid"), col("cell"))
        .orderBy(col("pid"))
    },
    Some {
      val dpc = dotSql("e.pv", "c.cv"); val dcc = dotSql("c.cv", "c.cv")
      def distRk(cents: String) =
        s"""SELECT pid, pv, cell FROM (
          SELECT e.pid, e.pv, c.cell,
            row_number() OVER (PARTITION BY e.pid ORDER BY
              ((e.pn - 2*$dpc) + $dcc) ASC, c.cell ASC) AS rk
          FROM e CROSS JOIN $cents c) WHERE rk = 1"""
      s"""WITH e AS (SELECT pid, pv, ${dotSql("pv", "pv")} AS pn FROM
          (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings)),
      c0 AS (SELECT CAST(vec_id AS BIGINT) AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id % 97 = 3),
      a0 AS (${distRk("c0")}),
      m0 AS (SELECT cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a0, range(64) t(i) GROUP BY cell, i),
      c1 AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m0 GROUP BY cell),
      a1 AS (${distRk("c1")}),
      m1 AS (SELECT cell, i AS pos,
          floor(avg(pv[i+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM a1, range(64) t(i) GROUP BY cell, i),
      c2 AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m1 GROUP BY cell),
      a2 AS (${distRk("c2")})
      SELECT pid, cell FROM a2 ORDER BY pid"""
    },
    eagerPlan = true) // constructing commits the artifact version on disk

  /** S9 — bucketed co-located join (SURVEY.md §2.3 scale note): orders and
    * customer are materialized as 8-bucket tables on the customer key,
    * then joined table-to-table. Matching bucket counts let Spark plan the
    * join with NO shuffle exchange on either side (PlanSpec asserts it
    * with broadcast disabled) — at 100 TB this is the pre-partitioning
    * that turns every repeated fact⋈dim join on the same key into a
    * scan-local merge, amortizing ONE write-time shuffle across every
    * downstream join. The oracle computes the same join from the source
    * tables: bucketing must change the plan, never the result. */
  private val s9Bucketed = Q("s9_bucketed_join",
    (s, dir) => {
      val (o, c) = Tables.bucketedOrdersCustomer(s, dir)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        round(sum(o_totalprice), 4) AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    eagerPlan = true) // constructing writes the bucketed tables

  /** X1 — cross-corpus dedup ([[graft.ops.Dedup.dedupAgainstReference]]):
    * a new shard (doc_id ≡ 0 mod 3) diffed against the reference corpus
    * (every other document) on the normalized-content fingerprint; only
    * never-seen content survives. The anti join shuffles 16-byte
    * fingerprints, never text. */
  private val x1CrossCorpus = Q("x1_cross_corpus_dedup",
    (s, dir) => Dedup.dedupAgainstReference(
      Tables.documents(s, dir).where(pmod(col("doc_id"), lit(3)) === 0),
      Tables.documents(s, dir).where(pmod(col("doc_id"), lit(3)) =!= 0),
      "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, text, lang, source, n_chars FROM documents d
      WHERE doc_id % 3 = 0
        AND NOT EXISTS (
          SELECT 1 FROM documents r WHERE r.doc_id % 3 <> 0
            AND md5(regexp_replace(trim(lower(r.text)), '[ \t\n\x0B\f\r]+', ' ', 'g'))
              = md5(regexp_replace(trim(lower(d.text)), '[ \t\n\x0B\f\r]+', ' ', 'g')))
      ORDER BY doc_id"""))

  /** X1 — bloom-prefiltered cross-corpus dedup
    * ([[graft.ops.Dedup.dedupAgainstReferenceBloom]]): same contract as
    * `x1_cross_corpus_dedup` on a different shard split (mod 4), with the
    * reference folded into a distributed bloom sketch so only
    * bloom-positive rows reach the exact anti join. The oracle is the
    * plain NOT EXISTS (anti-join semantics, NULL-safe like the Spark
    * side — the r11 discipline) — the bloom is pure routing and must
    * not change the answer. */
  private val x1CrossCorpusBloom = Q("x1_cross_corpus_bloom",
    (s, dir) => Dedup.dedupAgainstReferenceBloom(
      Tables.documents(s, dir).where(pmod(col("doc_id"), lit(4)) === 0),
      Tables.documents(s, dir).where(pmod(col("doc_id"), lit(4)) =!= 0),
      "doc_id", "text", expectedItems = 4096L)
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, text, lang, source, n_chars FROM documents d
      WHERE doc_id % 4 = 0
        AND NOT EXISTS (
          SELECT 1 FROM documents r WHERE r.doc_id % 4 <> 0
            AND md5(regexp_replace(trim(lower(r.text)), '[ \t\n\x0B\f\r]+', ' ', 'g'))
              = md5(regexp_replace(trim(lower(d.text)), '[ \t\n\x0B\f\r]+', ' ', 'g')))
      ORDER BY doc_id"""))

  /** X1 — sub-document (paragraph-level) dedup
    * ([[graft.ops.Dedup.paragraphDedup]]): every duplicated 8-token unit
    * survives only at its first (doc, position) occurrence corpus-wide;
    * host documents re-assemble around the stripped units. Keep-first
    * semantics — contrast `x3_boilerplate_strip`, which removes high-DF
    * units from every document including the first. */
  private val x1ParaDedup = Q("x1_paragraph_dedup",
    (s, dir) => Dedup.paragraphDedup(Tables.documents(s, dir), "doc_id", "text",
        unitTokens = 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH base AS ($docsTokSql),
      ch AS (SELECT doc_id, i AS idx,
          array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS unit
        FROM (SELECT doc_id, toks,
                unnest(range(CAST(ceil(len(toks)/8.0) AS BIGINT))) AS i
              FROM base)),
      mk AS (SELECT *, row_number() OVER (PARTITION BY unit
          ORDER BY doc_id, idx) AS rk FROM ch)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_units,
        CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        md5(coalesce(string_agg(CASE WHEN rk = 1 THEN unit END, ' '
          ORDER BY idx), '')) AS kept_fp
      FROM mk GROUP BY doc_id ORDER BY doc_id"""))

  /** X3 — BPE merge training ([[graft.ops.TextOps.bpeMerges]]): 3
    * exponentiated merge iterations over corpus word frequencies. The
    * oracle chains the identical iteration CTEs (pair counts → ordered
    * LIMIT 1 argmax → `replace` fuse); weights are integer sums, so the
    * hash-match proves the whole unrolled training loop agrees with no
    * float tolerance at all. */
  /** Shared oracle CTE chain for the 3-iteration BPE training loop
    * (consumed by `x3_bpe_merges` and replayed verbatim by
    * `x3_bpe_apply` so the apply oracle trains the identical table). */
  private val bpeTrainCtes: String = {
    // per-iteration CTE triplet over the previous vocab encoding v{i-1}
    def iterCte(i: Int): String = {
      val (p, t, vPrev, v) = (s"p$i", s"t$i", s"v${i - 1}", s"v$i")
      s"""$p AS (SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_weight
          FROM (SELECT syms[i] AS left_sym, syms[i+1] AS right_sym, freq
            FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
              FROM (SELECT freq, list_filter(string_split(enc, '_'),
                  s -> s <> '') AS syms FROM $vPrev)))
          GROUP BY 1, 2),
        $t AS (SELECT * FROM $p
          ORDER BY pair_weight DESC, left_sym, right_sym LIMIT 1),
        $v AS (SELECT w, freq, replace(enc,
            '_' || (SELECT left_sym FROM $t) || '__' || (SELECT right_sym FROM $t) || '_',
            '_' || (SELECT left_sym FROM $t) || (SELECT right_sym FROM $t) || '_') AS enc
          FROM $vPrev)"""
    }
    s"""w AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t),
      v0 AS (SELECT w, freq, regexp_replace(w, '(.)', '_\\1_', 'g') AS enc FROM w),
      ${iterCte(1)}, ${iterCte(2)}, ${iterCte(3)}"""
  }

  private val x3Bpe = Q("x3_bpe_merges",
    (s, dir) => TextOps.bpeMerges(Tables.documents(s, dir), "doc_id", "text",
        merges = 3)
      .orderBy(col("iter")),
    Some {
      def outRow(i: Int): String =
        s"""SELECT CAST($i AS BIGINT) AS iter, left_sym, right_sym,
          left_sym || right_sym AS merged, pair_weight FROM t$i"""
      s"""WITH base AS ($docsTokSql),
        $bpeTrainCtes
        ${outRow(1)} UNION ALL ${outRow(2)} UNION ALL ${outRow(3)}
        ORDER BY iter"""
    })

  /** X3 — BPE training with the DRIVER-RESIDENT merge loop
    * ([[graft.ops.TextOps.bpeMergesLocal]]): the production shape —
    * corpus-sized word count distributed, vocabulary-bounded merge loop
    * in memory (the connectedComponents driver-path contract). Gated by
    * the SAME oracle as `x3_bpe_merges`: identical pair weights, argmax
    * tie-break, and fuse semantics, so the two engines' merge tables
    * must hash-match each other AND the SQL replay. */
  private val x3BpeFast = Q("x3_bpe_merges_fast",
    (s, dir) => TextOps.bpeMergesLocal(Tables.documents(s, dir), "doc_id", "text",
        merges = 3)
      .orderBy(col("iter")),
    Some {
      def outRow(i: Int): String =
        s"""SELECT CAST($i AS BIGINT) AS iter, left_sym, right_sym,
          left_sym || right_sym AS merged, pair_weight FROM t$i"""
      s"""WITH base AS ($docsTokSql),
        $bpeTrainCtes
        ${outRow(1)} UNION ALL ${outRow(2)} UNION ALL ${outRow(3)}
        ORDER BY iter"""
    },
    eagerPlan = true)

  /** X3 — OPEN-ALPHABET byte-level BPE training
    * ([[graft.ops.TextOps.bpeMergesBytes]]): symbols are UTF-8 BYTES
    * rendered as lowercase hex, so hex concat ≡ byte concat and hex
    * order ≡ unsigned byte order. On the [a-z] token corpus the merge
    * table must equal the char-level trainers' hex-encoded — the oracle
    * replays the identical training CTEs and hex-wraps the symbols, so
    * the byte trainer is gated against the same SQL ground truth (the
    * multi-byte UTF-8 behavior is spec-gated, Round13OpsSpec). */
  private val x3BpeBytes = Q("x3_bpe_bytes",
    (s, dir) => TextOps.bpeMergesBytes(Tables.documents(s, dir), "doc_id", "text",
        merges = 3, wordsOf = TextOps.tokens)
      .orderBy(col("iter")),
    Some {
      def outRow(i: Int): String =
        s"""SELECT CAST($i AS BIGINT) AS iter, lower(hex(left_sym)) AS left_sym,
          lower(hex(right_sym)) AS right_sym,
          lower(hex(left_sym || right_sym)) AS merged, pair_weight FROM t$i"""
      s"""WITH base AS ($docsTokSql),
        $bpeTrainCtes
        ${outRow(1)} UNION ALL ${outRow(2)} UNION ALL ${outRow(3)}
        ORDER BY iter"""
    },
    eagerPlan = true)

  /** X3 — tokenizer APPLY + compression measurement
    * ([[graft.ops.TextOps.bpeApply]] ∘ bpeMerges): every document
    * re-encoded under the trained merges; symbols-before/after and the
    * per-doc compression ratio. The oracle re-trains the identical merge
    * table (shared CTEs) and replays the ordered fuses per document. */
  private val x3BpeApply = Q("x3_bpe_apply",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = TextOps.bpeMerges(docs, "doc_id", "text", merges = 3)
      TextOps.bpeApply(docs, "doc_id", "text", merges, k = 3)
        .orderBy(col("doc_id"))
    },
    Some {
      def fuse(inner: String, t: String): String =
        s"""replace($inner,
          '_' || (SELECT left_sym FROM $t) || '__' || (SELECT right_sym FROM $t) || '_',
          '_' || (SELECT left_sym FROM $t) || (SELECT right_sym FROM $t) || '_')"""
      val enc3 = fuse(fuse(fuse("enc", "t1"), "t2"), "t3")
      s"""WITH base AS ($docsTokSql),
        $bpeTrainCtes,
        d AS (SELECT doc_id, array_to_string(list_transform(toks,
            t -> regexp_replace(t, '(.)', '_\\1_', 'g')), ' ') AS enc FROM base),
        ap AS (SELECT doc_id,
            CAST((strlen(enc) - strlen(replace(enc, '_', ''))) // 2 AS BIGINT)
              AS n_syms_before,
            CAST((strlen($enc3) - strlen(replace($enc3, '_', ''))) // 2 AS BIGINT)
              AS n_syms_after
          FROM d)
        SELECT doc_id, n_syms_before, n_syms_after,
          floor(n_syms_before / n_syms_after * 10000.0 + 0.5) / 10000.0
            AS compression
        FROM ap WHERE n_syms_before > 0 ORDER BY doc_id"""
    })

  /** X3 — trained-TOKENIZER persistence round-trip
    * ([[graft.ops.Artifacts]] × BPE, the string-typed artifact family —
    * `x2_artifact_roundtrip` proves the store on numeric centroid
    * arrays): the 3-merge table trains, commits as a `bpe_merges`
    * artifact version, loads back in a fresh read, and the corpus
    * re-encodes under the LOADED table. The oracle is `x3_bpe_apply`'s
    * replay (identical training CTEs + ordered fuses), so a hash match
    * proves the store preserves merge ORDER and symbol strings exactly —
    * a reordered or truncated merge table would change almost every
    * document's fuse sequence. */
  private val x3BpeArtifact = Q("x3_bpe_artifact_apply",
    (s, dir) => {
      val root = "/tmp/graft_art_bpe_" + Tables.scratchTag(s, dir)
      val docs = Tables.documents(s, dir)
      val merges = TextOps.bpeMerges(docs, "doc_id", "text", merges = 3)
      val v = Artifacts.saveArtifact(merges, root, "bpe_merges",
        Map("merges" -> "3", "alphabet" -> "char"))
      val (loaded, _) = Artifacts.loadArtifactVersion(s, root, v, "bpe_merges")
      TextOps.bpeApply(docs, "doc_id", "text", loaded, k = 3)
        .orderBy(col("doc_id"))
    },
    Some {
      def fuse(inner: String, t: String): String =
        s"""replace($inner,
          '_' || (SELECT left_sym FROM $t) || '__' || (SELECT right_sym FROM $t) || '_',
          '_' || (SELECT left_sym FROM $t) || (SELECT right_sym FROM $t) || '_')"""
      val enc3 = fuse(fuse(fuse("enc", "t1"), "t2"), "t3")
      s"""WITH base AS ($docsTokSql),
        $bpeTrainCtes,
        d AS (SELECT doc_id, array_to_string(list_transform(toks,
            t -> regexp_replace(t, '(.)', '_\\1_', 'g')), ' ') AS enc FROM base),
        ap AS (SELECT doc_id,
            CAST((strlen(enc) - strlen(replace(enc, '_', ''))) // 2 AS BIGINT)
              AS n_syms_before,
            CAST((strlen($enc3) - strlen(replace($enc3, '_', ''))) // 2 AS BIGINT)
              AS n_syms_after
          FROM d)
        SELECT doc_id, n_syms_before, n_syms_after,
          floor(n_syms_before / n_syms_after * 10000.0 + 0.5) / 10000.0
            AS compression
        FROM ap WHERE n_syms_before > 0 ORDER BY doc_id"""
    },
    eagerPlan = true) // constructing commits the merge-table artifact

  /** X3 — BYTE-LEVEL tokenizer APPLY
    * ([[graft.ops.TextOps.bpeApplyBytes]] ∘ bpeMergesBytes): the
    * open-alphabet merge artifact actually RUN over the corpus — UTF-8
    * bytes as hex symbols, trained fuses replayed in order, symbol
    * counts and compression per document. On this [a-z] token corpus the
    * hex rendering is a bijection of the char encoding, so the oracle
    * replays the SAME training CTEs and performs the fuses in hex space
    * (the multi-byte UTF-8 fusion path is spec-gated, Round14OpsSpec). */
  private val x3BpeBytesApply = Q("x3_bpe_bytes_apply",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = TextOps.bpeMergesBytes(docs, "doc_id", "text",
        merges = 3, wordsOf = TextOps.tokens)
      TextOps.bpeApplyBytes(docs, "doc_id", "text", merges, k = 3,
          wordsOf = TextOps.tokens)
        .orderBy(col("doc_id"))
    },
    Some {
      def fuse(inner: String, t: String): String =
        s"""replace($inner,
          '_' || (SELECT lower(hex(left_sym)) FROM $t) || '__'
            || (SELECT lower(hex(right_sym)) FROM $t) || '_',
          '_' || (SELECT lower(hex(left_sym)) FROM $t)
            || (SELECT lower(hex(right_sym)) FROM $t) || '_')"""
      val enc3 = fuse(fuse(fuse("enc", "t1"), "t2"), "t3")
      s"""WITH base AS ($docsTokSql),
        $bpeTrainCtes,
        d AS (SELECT doc_id, array_to_string(list_transform(toks,
            t -> regexp_replace(lower(hex(t)), '(..)', '_\\1_', 'g')), ' ') AS enc
          FROM base),
        ap AS (SELECT doc_id,
            CAST((strlen(enc) - strlen(replace(enc, '_', ''))) // 2 AS BIGINT)
              AS n_syms_before,
            CAST((strlen($enc3) - strlen(replace($enc3, '_', ''))) // 2 AS BIGINT)
              AS n_syms_after
          FROM d)
        SELECT doc_id, n_syms_before, n_syms_after,
          floor(n_syms_before / n_syms_after * 10000.0 + 0.5) / 10000.0
            AS compression
        FROM ap WHERE n_syms_before > 0 ORDER BY doc_id"""
    },
    eagerPlan = true) // the byte trainer inside collects the word table

  /** Profiling — key-skew report ([[graft.ops.DataProfile.keySkewReport]]):
    * the pre-join diagnosis over three lineitem keys spanning the skew
    * spectrum (near-uniform l_suppkey, small-group l_orderkey, and
    * 3-giant-groups l_returnflag). quantile_disc = the helper's exact
    * lower median. */
  private val profSkew = Q("profile_key_skew",
    (s, dir) => DataProfile.keySkewReport(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_returnflag", "l_suppkey"))
      .orderBy(col("key_col")),
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_keys,
          CAST(max(c) AS BIGINT) AS max_key_rows,
          CAST(quantile_disc(c, 0.5) AS DOUBLE) AS median_key_rows,
          floor(max(c) / sum(c) * 1000000.0 + 0.5) / 1000000.0 AS top_share,
          floor(max(c) / quantile_disc(c, 0.5) * 1000000.0 + 0.5) / 1000000.0
            AS skew_ratio
        FROM (SELECT $c AS k, count(*) AS c FROM lineitem GROUP BY 1)"""
      s"""${one("l_orderkey")} UNION ALL ${one("l_returnflag")}
        UNION ALL ${one("l_suppkey")} ORDER BY key_col"""
    })

  /** X4 — frame sampling + resize planning
    * ([[graft.ops.Multimodal.frameSample]] / [[graft.ops.Multimodal.resizeFit]]):
    * every synthetic video yields 4 frame rows (posexplode fan-out) with
    * stub dimensions derived from payload bytes, each fit into a 32×32
    * box with aspect preserved. The oracle replays the byte math from the
    * text the payload encodes (ASCII corpus ⇒ byte = codepoint). */
  private val x4Frames = Q("x4_frame_resize",
    (s, dir) => {
      val enriched = Multimodal.enrich(Tables.documents(s, dir), "doc_id", "text")
      val frames = Multimodal.frameSample(enriched, "doc_id", "media", k = 4)
      // features projected ONCE: duplicating the coalesce(conv(hex))
      // feature tree per dimension trips a Janino codegen bug (isNull
      // slot referenced across split functions → whole-stage fallback)
      val dims = enriched
        .select(col("doc_id"), Multimodal.fakeDecodeFeatures(col("media")).as("__f"))
        .select(col("doc_id"),
          (lit(1L) + element_at(col("__f"), 2).cast("long") % lit(64L)).as("w"),
          (lit(1L) + element_at(col("__f"), 3).cast("long") % lit(64L)).as("h"))
      val (outW, outH) = Multimodal.resizeFit(col("w"), col("h"), 32, 32)
      frames.join(dims, Seq("doc_id"))
        .select(col("doc_id"), col("frame_idx"), col("frame_offset"),
          col("frame_fp"), col("w"), col("h"),
          outW.as("out_w"), outH.as("out_h"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH m AS (SELECT doc_id, text, strlen(text) AS n,
        1 + ascii(substring(text, 1, 1)) % 64 AS w,
        1 + ascii(substring(text, strlen(text), 1)) % 64 AS h
      FROM documents),
      f AS (SELECT doc_id, text, n, w, h, i AS frame_idx,
          CAST(floor(i * n / 4.0) AS BIGINT) AS frame_offset
        FROM (SELECT *, unnest(range(4)) AS i FROM m)),
      r AS (SELECT *, least(32.0 / w, 32.0 / h, 1.0) AS scale FROM f)
      SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, frame_offset,
        md5(text || CAST(frame_offset AS VARCHAR)) AS frame_fp,
        CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        CAST(greatest(floor(w * scale), 1.0) AS BIGINT) AS out_w,
        CAST(greatest(floor(h * scale), 1.0) AS BIGINT) AS out_h
      FROM r ORDER BY doc_id, frame_idx"""))

  /** X3 — corpus drift report ([[graft.ops.TextOps.corpusDriftBySource]]):
    * per-source add-α KL against the whole corpus over the corpus
    * vocabulary. The oracle chains the identical count CTEs and replays
    * the SAME present-tokens + closed-form-missing-tail split as the
    * Spark plan (no sources×vocab grid in either engine), so the two
    * transcendental sums range over the same terms and land on the same
    * rounding lattice. */
  private val x3Drift = Q("x3_corpus_drift",
    (s, dir) => TextOps.corpusDriftBySource(Tables.documents(s, dir), "doc_id",
        "text", "source")
      .orderBy(col("source")),
    Some(s"""WITH base AS ($docsTokSql),
      tok AS (SELECT source, t AS tok FROM
        (SELECT source, unnest(toks) AS t FROM base)),
      corpus AS (SELECT tok, CAST(count(*) AS BIGINT) AS ca FROM tok GROUP BY 1),
      tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na, CAST(count(*) AS DOUBLE) AS v,
        sum(ln(ca + 0.5)) AS sla FROM corpus),
      st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
        FROM tok GROUP BY 1, 2),
      ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM st GROUP BY 1),
      present AS (SELECT s2.source, s2.cs, c.ca, n.ns, t.na, t.v, t.sla
        FROM st s2 JOIN corpus c USING (tok) JOIN ns n ON n.source = s2.source
        CROSS JOIN tot t WHERE s2.cs > 0),
      agg AS (SELECT source, max(ns) AS n_tokens,
          CAST(count(*) AS BIGINT) AS n_vocab_source,
          sum(((cs + 0.5) / (ns + 0.5 * v))
            * ln(((cs + 0.5) / (ns + 0.5 * v)) / ((ca + 0.5) / (na + 0.5 * v))))
            AS psum,
          sum(ln((ca + 0.5) / (na + 0.5 * v))) AS lqp,
          max(v) AS v, max(na) AS na, max(sla) AS sla
        FROM present GROUP BY source)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, n_vocab_source,
        floor((psum + (0.5 / (n_tokens + 0.5 * v))
            * ((v - n_vocab_source) * ln(0.5 / (n_tokens + 0.5 * v))
               - ((sla - v * ln(na + 0.5 * v)) - lqp)))
          * 10000.0 + 0.5) / 10000.0 AS kl_vs_corpus
      FROM agg ORDER BY source"""))

  /** X2 — PCA projection chained onto the trained component
    * ([[graft.ops.Similarity.pcaProject]] ∘ pcaPowerIteration): the apply
    * step of whitening. The oracle replays the full power iteration (same
    * CTEs as x2_pca_power) and then the same broadcast dot — proving
    * training AND application agree end-to-end. */
  private val x2PcaProject = Q("x2_pca_project",
    (s, dir) => {
      val pc = Similarity.pcaPowerIteration(Tables.embeddings(s, dir),
        "embedding", dim = 64, iters = 3)
      Similarity.pcaProject(Tables.embeddings(s, dir), "vec_id", "embedding", pc)
        .orderBy(col("vec_id"))
    },
    Some {
      val iterCtes = (1 to 3).map { t =>
        val prev = if (t == 1) "v0" else s"v${t - 1}"
        s"""w$t AS (SELECT cv.i, floor(sum(cov * vj) * 1000000.0 + 0.5) / 1000000.0 AS wi
          FROM cv JOIN $prev ON cv.j = $prev.j GROUP BY cv.i),
        n$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w$t),
        v$t AS (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
          FROM w$t, n$t)"""
      }.mkString(",\n        ")
      s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
          FROM e, range(64) a(i), range(64) b(j) WHERE i <= j),
        up AS (SELECT i, j,
            floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
              / 1000000.0 AS cov
          FROM p GROUP BY i, j),
        cv AS (SELECT i, j, cov FROM up
               UNION ALL SELECT j AS i, i AS j, cov FROM up WHERE i <> j),
        v0 AS (SELECT i AS j, 1.0 AS vj FROM range(64) t(i)),
        $iterCtes,
        pc AS (SELECT list(vj ORDER BY j) AS pc FROM v3),
        pts AS (SELECT vec_id, embedding::DOUBLE[] AS pv FROM embeddings)
        SELECT vec_id,
          floor(${dotSql("pv", "pc")} * 1000000.0 + 0.5) / 1000000.0 AS score,
          floor((${dotSql("pv", "pv")} - ${dotSql("pv", "pc")} * ${dotSql("pv", "pc")})
            * 1000000.0 + 0.5) / 1000000.0 AS residual_norm2
        FROM pts CROSS JOIN pc ORDER BY vec_id"""
    })

  /** Shared oracle fragment for the top-k PCA pair: the rounded
    * symmetric covariance `cv`, then for each of the two components a
    * full unrolled power iteration (matvec → round → normalize → round,
    * the x2_pca_power discipline), a Rayleigh eigenvalue `lam{c}`, and
    * — between them — the portable-rounded deflation `cvd = cv − λ·vvᵀ`.
    * Every lattice step matches [[Similarity.pcaTopK]]'s driver loop
    * exactly. */
  private val pcaTopKCtes: String = {
    def iterCtes(matrix: String, p: String): String = (1 to 3).map { t =>
      val prev = s"$p${t - 1}"
      s"""w_$p$t AS (SELECT m.i, floor(sum(m.cov * vj) * 1000000.0 + 0.5) / 1000000.0 AS wi
        FROM $matrix m JOIN $prev ON m.j = $prev.j GROUP BY m.i),
      n_$p$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w_$p$t),
      $p$t AS (SELECT i AS j, floor(wi / nrm * 1000000.0 + 0.5) / 1000000.0 AS vj
        FROM w_$p$t, n_$p$t)"""
    }.mkString(",\n      ")
    // MATERIALIZED: the deflated matrix is referenced by every
    // second-component CTE; without it DuckDB re-evaluates the corpus
    // covariance per reference (measured 276 s -> 0.4 s at sf0.01)
    s"""e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
      p AS (SELECT i, j, v[i+1] AS x, v[j+1] AS y
        FROM e, range(64) a(i), range(64) b(j) WHERE i <= j),
      up AS MATERIALIZED (SELECT i, j,
          floor(((sum(x*y) - sum(x)*sum(y)/count(*)) / count(*)) * 1000000.0 + 0.5)
            / 1000000.0 AS cov
        FROM p GROUP BY i, j),
      cv AS MATERIALIZED (SELECT i, j, cov FROM up
             UNION ALL SELECT j AS i, i AS j, cov FROM up WHERE i <> j),
      v0 AS (SELECT i AS j, 1.0 AS vj FROM range(64) t(i)),
      ${iterCtes("cv", "v")},
      lam1 AS (SELECT floor(sum(m.cov * a.vj * b.vj) * 1000000.0 + 0.5)
          / 1000000.0 AS lam
        FROM cv m JOIN v3 a ON m.i = a.j JOIN v3 b ON m.j = b.j),
      cvd AS MATERIALIZED (SELECT m.i, m.j,
          floor((m.cov - lam * a.vj * b.vj) * 1000000.0 + 0.5) / 1000000.0 AS cov
        FROM cv m JOIN v3 a ON m.i = a.j JOIN v3 b ON m.j = b.j
        CROSS JOIN lam1),
      u0 AS (SELECT i AS j, 1.0 AS vj FROM range(64) t(i)),
      ${iterCtes("cvd", "u")},
      lam2 AS (SELECT floor(sum(m.cov * a.vj * b.vj) * 1000000.0 + 0.5)
          / 1000000.0 AS lam
        FROM cvd m JOIN u3 a ON m.i = a.j JOIN u3 b ON m.j = b.j)"""
  }

  /** X2 — top-2 principal components via power iteration + deflation
    * ([[graft.ops.Similarity.pcaTopK]]): component 1 is x2_pca_power's,
    * component 2 comes from the DEFLATED matrix, so the oracle proves
    * the Rayleigh eigenvalue and the rounded rank-1 subtraction both
    * match the driver loop lattice-exactly. */
  private val x2PcaTopK = Q("x2_pca_topk",
    (s, dir) => Similarity.pcaTopK(Tables.embeddings(s, dir),
        "embedding", dim = 64, k = 2, iters = 3)
      .orderBy(col("comp"), col("i")),
    Some(s"""WITH $pcaTopKCtes
      SELECT comp, i, loading, eigenvalue FROM (
        SELECT CAST(1 AS BIGINT) AS comp, CAST(j AS BIGINT) AS i,
          vj AS loading, lam AS eigenvalue FROM v3 CROSS JOIN lam1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(j AS BIGINT), vj, lam
        FROM u3 CROSS JOIN lam2)
      ORDER BY comp, i"""),
    eagerPlan = true) // pcaTopK collects the d^2 covariance on construction

  /** X2 — k-component projection + whitening + residual
    * ([[graft.ops.Similarity.pcaProjectTopK]] ∘ pcaTopK): each embedding
    * scored against BOTH trained components in one broadcast projection,
    * with the unit-variance whitened coordinate score/√λ per component;
    * the residual removes the rounded score energy in ascending-comp
    * order, so the whitening-apply path agrees end-to-end. */
  private val x2PcaProjectTopK = Q("x2_pca_project_topk",
    (s, dir) => {
      val comps = Similarity.pcaTopK(Tables.embeddings(s, dir),
        "embedding", dim = 64, k = 2, iters = 3)
      Similarity.pcaProjectTopK(Tables.embeddings(s, dir), "vec_id",
          "embedding", comps)
        .orderBy(col("vec_id"), col("comp"))
    },
    Some(s"""WITH $pcaTopKCtes,
      pc1 AS (SELECT list(vj ORDER BY j) AS pc FROM v3),
      pc2 AS (SELECT list(vj ORDER BY j) AS pc FROM u3),
      pts AS (SELECT vec_id, embedding::DOUBLE[] AS pv FROM embeddings),
      sc AS (SELECT vec_id,
          floor(${dotSql("pv", "pc1.pc")} * 1000000.0 + 0.5) / 1000000.0 AS s1,
          floor(${dotSql("pv", "pc2.pc")} * 1000000.0 + 0.5) / 1000000.0 AS s2,
          floor((${dotSql("pv", "pv")} - (s1 * s1 + s2 * s2))
            * 1000000.0 + 0.5) / 1000000.0 AS residual_norm2
        FROM pts CROSS JOIN pc1 CROSS JOIN pc2)
      SELECT vec_id, comp, score, white, residual_norm2 FROM (
        SELECT vec_id, CAST(1 AS BIGINT) AS comp, s1 AS score,
          floor(s1 / sqrt((SELECT lam FROM lam1)) * 1000000.0 + 0.5)
            / 1000000.0 AS white,
          residual_norm2 FROM sc
        UNION ALL
        SELECT vec_id, CAST(2 AS BIGINT), s2,
          floor(s2 / sqrt((SELECT lam FROM lam2)) * 1000000.0 + 0.5)
            / 1000000.0,
          residual_norm2 FROM sc)
      ORDER BY vec_id, comp"""),
    eagerPlan = true) // the pcaTopK training inside collects the covariance

  /** X2/X3 — semantic decontamination
    * ([[graft.ops.Similarity.semanticDecontaminate]]): corpus embeddings
    * (outside the mod-97 bench stripe) max-cosine-scored against the
    * bench stripe via one broadcast fold. The oracle's per-row max over
    * an explicit cross join is order-independent, so both engines agree
    * bit-for-bit before the shared rounding. */
  private val x3SemDecon = Q("x3_semantic_decontaminate",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticDecontaminate(
        emb.where(pmod(col("vec_id"), lit(97)) =!= 5), "vec_id", "embedding",
        emb.where(pmod(col("vec_id"), lit(97)) === 5), "embedding", tau = 0.3)
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH b AS (SELECT embedding::DOUBLE[] AS bv FROM embeddings
        WHERE vec_id % 97 = 5),
      p AS (SELECT vec_id, embedding::DOUBLE[] AS pv FROM embeddings
        WHERE vec_id % 97 <> 5),
      m AS (SELECT vec_id,
          floor(max(${dotSql("pv", "bv")}
              / (sqrt(${dotSql("pv", "pv")}) * sqrt(${dotSql("bv", "bv")})))
            * 1000000.0 + 0.5) / 1000000.0 AS max_cos
        FROM p CROSS JOIN b GROUP BY vec_id)
      SELECT vec_id, max_cos, max_cos >= 0.3 AS contaminated
      FROM m ORDER BY vec_id"""))

  /** TPC-H Q6 shape — the canonical scan-filter-aggregate: at 100 TB this
    * query IS the pushdown story (every predicate reaches the parquet
    * reader, no shuffle at all until the final scalar), so it earns a
    * PlanSpec gate on PushedFilters. */
  private val q6Revenue = Q("q6_forecast_revenue",
    (s, dir) => Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items")),
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      CAST(count(*) AS BIGINT) AS n_items FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** VARIANT ops — Spark 4's semi-structured type: `parse_json` shreds
    * `events.props` to a VARIANT once, `variant_get` extracts with a
    * type; aggregation then runs on the extracted column (the modern
    * alternative to per-access `get_json_object` string re-parsing — at
    * 100 TB the parse happens once per row, not once per extraction). */
  private val jsonVariant = Q("json_variant_ops",
    (s, dir) => Tables.events(s, dir)
      .select(parse_json(col("props")).as("v"))
      .select(variant_get(col("v"), "$.k", "bigint").as("k"))
      .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_mod")),
    Some("""SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_mod,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
      FROM events GROUP BY 1 ORDER BY k_mod"""))

  /** X1 — content-defined chunk dedup ([[graft.ops.Dedup.cdcChunkDedup]]):
    * rolling-hash boundaries (w=8, p=31, m=64 → ~64-char chunks), then
    * the same keep-first ledger as x1_paragraph_dedup. Exact BIGINT hash
    * arithmetic means the oracle replays the cut set bit-identically. */
  private val x1CdcChunks = Q("x1_cdc_chunk_dedup",
    (s, dir) => Dedup.cdcChunkDedup(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, text, strlen(text) AS n FROM documents
        WHERE strlen(text) > 0),
      c AS (SELECT doc_id, text, n,
          list_filter(range(8, n + 1), i ->
            (list_sum(list_transform(range(0, 8), k -> ascii(text[i-k])
              * ([1,31,961,29791,923521,28629151,887503681,27512614111])[k+1]))
             % 64) = 0) AS cuts
        FROM d),
      b AS (SELECT doc_id, text, n,
          CASE WHEN len(cuts) > 0 AND cuts[-1] = n THEN cuts
               ELSE list_append(cuts, n) END AS bs
        FROM c),
      ch AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS idx,
          substring(text, CASE WHEN j = 1 THEN 1 ELSE bs[j-1] + 1 END,
            bs[j] - CASE WHEN j = 1 THEN 0 ELSE bs[j-1] END) AS unit
        FROM (SELECT *, unnest(range(1, len(bs) + 1)) AS j FROM b)),
      mk AS (SELECT *, row_number() OVER (PARTITION BY
          md5(regexp_replace(trim(lower(unit)), '[ \t\n\x0B\f\r]+', ' ', 'g'))
          ORDER BY doc_id, idx) AS rk FROM ch)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_units,
        CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        md5(coalesce(string_agg(CASE WHEN rk = 1 THEN unit END, ' '
          ORDER BY idx), '')) AS kept_fp
      FROM mk GROUP BY doc_id ORDER BY doc_id"""))

  /** X3 — PMI collocation mining ([[graft.ops.TextOps.collocations]]):
    * top-20 adjacent pairs by pointwise mutual information with a min
    * pair count of 5. Integer count ratios inside one `ln`, rounded —
    * and a text tie-break so the top-k cut is deterministic. */
  private val x3Colloc = Q("x3_collocations",
    (s, dir) => TextOps.collocations(Tables.documents(s, dir), "doc_id", "text",
      minCount = 5, topK = 20),
    Some("""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS t
        FROM documents),
      uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      nt AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
      bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM
          (SELECT array_to_string(t[i+1:i+2], ' ') AS bg
           FROM (SELECT t, unnest(range(greatest(len(t) - 1, 0))) AS i FROM toks))
        GROUP BY bg HAVING count(*) >= 5)
      SELECT bg, c2 AS pair_count,
        floor(ln(nt.n * c2 / (ua.c1 * ub.c1)) * 10000.0 + 0.5) / 10000.0 AS pmi
      FROM bi
      JOIN uni ua ON ua.w = string_split(bg, ' ')[1]
      JOIN uni ub ON ub.w = string_split(bg, ' ')[2]
      CROSS JOIN nt
      ORDER BY pmi DESC, bg LIMIT 20"""))

  /** Cohort retention — the classic event-analytics matrix: users
    * bucketed by first-seen week, activity counted per (cohort, week
    * offset) as distinct users. Two aggregations over the events table
    * (first-seen, then distinct activity) joined on user — both shuffles
    * keyed on user_id/cohort, no window at all. Week arithmetic is exact
    * integer division on epoch-nanos. */
  private val cohortRet = Q("cohort_retention",
    (s, dir) => {
      val wk = expr("ts div 604800000000000").as("week")
      val ev = Tables.events(s, dir).select(col("user_id"), wk)
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      val activity = ev.distinct()
      activity.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS week
        FROM events),
      c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, week FROM e)
      SELECT cohort_week, week - cohort_week AS week_offset,
        CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
      FROM a JOIN c USING (user_id)
      GROUP BY cohort_week, week_offset
      ORDER BY cohort_week, week_offset"""))

  /** X3 — Unicode canonicalization ([[graft.functions.NfcNormalize]] /
    * [[graft.functions.StripAccents]] codegen kernels): NFC before
    * fingerprinting (composed vs decomposed encodings of the same text
    * are different bytes until normalized — a real dedup-miss class) and
    * accent-stripped fingerprints for fold-insensitive matching. The
    * driver corpus is ASCII, where both kernels short-circuit to the
    * input buffer — the oracle still pins the full (flag, fp, fp) row
    * shape; the non-ASCII semantics are kernel-unit-tested against
    * java.text.Normalizer (TextKernelSpec). */
  private val x3Nfc = Q("x3_unicode_normalize",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir).select(col("doc_id"),
        (expr("graft_nfc(text)") =!= col("text")).as("nfc_changed"),
        md5(expr("graft_nfc(text)")).as("nfc_fp"),
        md5(expr("graft_strip_accents(text)")).as("ascii_fp"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, nfc_normalize(text) <> text AS nfc_changed,
      md5(nfc_normalize(text)) AS nfc_fp, md5(strip_accents(text)) AS ascii_fp
      FROM documents ORDER BY doc_id"""))

  /** X3 — quality-classifier calibration: bucket the corpus by classifier
    * score decile and report each decile's mean corpus-fit LM log-prob —
    * the validation loop that tells you whether the cheap classifier
    * actually orders documents by the expensive signal before you gate a
    * 100 TB crawl on it. Composes [[graft.ops.TextOps.classifierScore]]
    * with [[graft.ops.TextOps.lmPerplexityScore]]; one doc-keyed join of
    * two per-doc tables, then a 10-row aggregate. */
  private val x3Calib = Q("x3_quality_calibration",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = docs.select(col("doc_id"),
        TextOps.classifierScore(col("text")).as("score"))
      val lm = TextOps.lmPerplexityScore(docs, "doc_id", "text")
      scored.join(lm, Seq("doc_id"))
        .groupBy(least(floor(col("score") * lit(10.0)), lit(9.0))
          .cast("long").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          (floor(sum(col("avg_logprob")) * lit(1e4) + lit(0.5)) / lit(1e4))
            .as("sum_logprob"))
        .orderBy(col("decile"))
    },
    Some(s"""WITH base AS ($docsTokSql),
      uni AS (SELECT w1, count(*) AS c1
        FROM (SELECT unnest(toks) AS w1 FROM base) GROUP BY w1),
      v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
      bi AS (SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bg
        FROM (SELECT doc_id, toks, unnest(range(greatest(len(toks) - 1, 0))) AS i
              FROM base)),
      bc AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg),
      j AS (SELECT doc_id, ln((c2 + 0.5) / (c1 + 0.5 * v)) AS lp
        FROM bi JOIN bc USING (bg)
        JOIN uni ON string_split(bg, ' ')[1] = uni.w1
        CROSS JOIN v),
      lm AS (SELECT doc_id,
          floor(avg(lp) * 10000.0 + 0.5) / 10000.0 AS avg_logprob
        FROM j GROUP BY doc_id),
      ft AS (SELECT doc_id,
          least(CAST(length(text) AS DOUBLE)/300.0, 1.0) AS f_len,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS f_punct,
          CAST($enHitsSql AS DOUBLE) / greatest(len(toks), 1) AS f_stop,
          CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS f_digit
        FROM base),
      sc AS (SELECT doc_id,
          round(1.0/(1.0 + exp(-(1.8*f_len - 2.5*f_punct + 3.0*f_stop
            - 1.2*f_digit - 0.7))), 6) AS score
        FROM ft)
      SELECT CAST(least(floor(score * 10.0), 9.0) AS BIGINT) AS decile,
        CAST(count(*) AS BIGINT) AS n_docs,
        floor(sum(avg_logprob) * 10000.0 + 0.5) / 10000.0 AS sum_logprob
      FROM sc JOIN lm USING (doc_id)
      GROUP BY 1 ORDER BY decile"""))

  /** CDC — snapshot differencing ([[graft.streaming.StreamingOps.snapshotDiff]]):
    * the changelog BETWEEN two keyed table versions. Old = orders outside
    * the mod-5 stripe; new = outside the mod-7 stripe with the mod-11
    * stripe's price bumped by exactly +1.0 (a single IEEE add — bit-equal
    * in any engine), so all three ops I/U/D appear and unchanged keys are
    * provably suppressed. */
  private val cdcSnapshot = Q("cdc_snapshot_diff",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val oldSnap = o.where(pmod(col("o_orderkey"), lit(5)) =!= 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
      val newSnap = o.where(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .select(col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(11)) === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")).as("price"))
      StreamingOps.snapshotDiff(oldSnap, newSnap, "o_orderkey", "price")
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH o AS (SELECT o_orderkey AS k, o_totalprice AS old_value
        FROM orders WHERE o_orderkey % 5 <> 0),
      n AS (SELECT o_orderkey AS k,
          CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
               ELSE o_totalprice END AS new_value
        FROM orders WHERE o_orderkey % 7 <> 0),
      d AS (SELECT coalesce(o.k, n.k) AS o_orderkey,
          CASE WHEN o.k IS NULL THEN 'I' WHEN n.k IS NULL THEN 'D'
               WHEN old_value IS DISTINCT FROM new_value THEN 'U'
               ELSE 'N' END AS op, old_value, new_value
        FROM o FULL OUTER JOIN n ON o.k = n.k)
      SELECT o_orderkey, op, old_value, new_value FROM d
      WHERE op <> 'N' ORDER BY o_orderkey"""))

  /** X6 — fill-in-the-middle transform ([[graft.ops.Curation.fimTransform]]):
    * PSM rearrangement of a deterministic half of the corpus; cut points
    * are integer arithmetic on the id, so the oracle replays them exactly. */
  private val x6Fim = Q("x6_fim_transform",
    (s, dir) => Curation.fimTransform(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("fim"), col("text_out"))
      .orderBy(col("doc_id")),
    Some("""WITH b AS (SELECT doc_id, text,
        CAST(length(text) AS BIGINT) AS len,
        greatest(CAST(floor(length(text)/3.0) AS BIGINT), 1) AS third
      FROM documents),
      c AS (SELECT doc_id, text, len,
        1 + (doc_id*7919) % third AS cut1,
        len - 1 - (doc_id*9973) % third AS cut2,
        ((doc_id*2654435761) % 100 < 50 AND len >= 12) AS gated
      FROM b)
      SELECT doc_id, CAST(CASE WHEN gated THEN 1 ELSE 0 END AS BIGINT) AS fim,
        CASE WHEN gated THEN
          '<PRE>' || substring(text, 1, CAST(cut1 AS INT))
          || '<SUF>' || substring(text, CAST(cut2 + 1 AS INT))
          || '<MID>' || substring(text, CAST(cut1 + 1 AS INT), CAST(cut2 - cut1 AS INT))
        ELSE text END AS text_out
      FROM c ORDER BY doc_id"""))

  /** X6 — DoReMi domain reweighting ([[graft.ops.Curation.doremiWeights]]):
    * 3 unrolled exponentiated-gradient iterations over per-source mean
    * quality deficit (1 − min(n_chars/200, 1)). The oracle chains the
    * identical iteration CTEs with the identical portable rounding, so the
    * hash-match proves the whole unrolled update agrees. */
  /** Shared DoReMi oracle CTE chain (d0 → n3, final weight in n3.w) —
    * consumed by `x6_doremi_weights` and replayed verbatim by
    * `x6_doremi_resample` so the resample oracle learns the identical
    * weights. */
  private val doremiCtes: String = {
    def pr(e: String) = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
    s"""d0 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          ${pr("avg(1.0 - least(CAST(n_chars AS DOUBLE)/200.0, 1.0))")} AS domain_loss
        FROM documents GROUP BY source),
      e AS (SELECT *, domain_loss - (SELECT min(domain_loss) FROM d0) AS excess FROM d0),
      i1 AS (SELECT *, ${pr("1.0 * exp(0.5 * excess)")} AS wr FROM e),
      n1 AS (SELECT source, n_docs, domain_loss, excess,
          ${pr("wr / (SELECT sum(wr) FROM i1)")} AS w FROM i1),
      i2 AS (SELECT *, ${pr("w * exp(0.5 * excess)")} AS wr FROM n1),
      n2 AS (SELECT source, n_docs, domain_loss, excess,
          ${pr("wr / (SELECT sum(wr) FROM i2)")} AS w FROM i2),
      i3 AS (SELECT *, ${pr("w * exp(0.5 * excess)")} AS wr FROM n2),
      n3 AS (SELECT source, n_docs, domain_loss, excess,
          ${pr("wr / (SELECT sum(wr) FROM i3)")} AS w FROM i3)"""
  }

  private val doremiLoss: Column =
    lit(1.0) - least(col("n_chars").cast("double") / lit(200.0), lit(1.0))

  private val x6Doremi = Q("x6_doremi_weights",
    (s, dir) => Curation.doremiWeights(Tables.documents(s, dir), "source",
      doremiLoss, eta = 0.5, iters = 3)
      .orderBy(col("source")),
    Some(s"""WITH $doremiCtes
      SELECT source, n_docs, domain_loss, excess, w AS weight
      FROM n3 ORDER BY source"""))

  /** X6 — DoReMi-weighted resample
    * ([[graft.ops.Curation.mixtureSampleBy]] ∘ doremiWeights): the
    * learned domain weights drive the keep-rate table that the corpus is
    * actually filtered with — optimize-then-apply in one DAG, the X6
    * sibling of the bpe/pca trained-artifact chains. The oracle re-learns
    * the identical weights (shared CTEs) and replays the same rate and
    * id-bucket math as x6_source_mixture. */
  private val x6DoremiResample = Q("x6_doremi_resample",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val weights = Curation.doremiWeights(docs, "source", doremiLoss,
        eta = 0.5, iters = 3)
      Curation.mixtureSampleBy(docs, "doc_id", "source", weights, "weight")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), max(col("rate")).as("rate"))
        .orderBy(col("source"))
    },
    Some(s"""WITH $doremiCtes,
      c2 AS (SELECT d0.source, d0.n_docs, n3.w AS share
        FROM d0 JOIN n3 USING (source) WHERE n3.w > 0),
      t AS (SELECT min(CAST(n_docs AS DOUBLE) / share) AS tv FROM c2),
      r AS (SELECT source,
          CAST(floor(100.0 * share * tv / CAST(n_docs AS DOUBLE)) AS BIGINT) AS rate
        FROM c2, t),
      k AS (SELECT d.source, r.rate FROM documents d JOIN r USING (source)
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 100 < r.rate)
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        CAST(max(rate) AS BIGINT) AS rate
      FROM k GROUP BY source ORDER BY source"""))

  // ------------------------------------------------------------------

  val all: Seq[Q] = Seq(
    s1Ingest, s3Preprocess,
    pScalar, pExp, p8Residual, p10Mlp,
    aStats, aLosses,
    j1Sample, j2Td, j3Soft,
    w1Discounted, w2Ema, w3Sessions, w4Best, w4Feasible, w5Cadence, w6TopN,
    cdcLatest, sessWindow, tumbling,
    aggPricing, joinStar, semiJoin, antiJoin, setOps, stringDate, jsonFuncs,
    x1Exact, x1Jaccard, x1Minhash, x2TopK, x3Text, x4Multimodal,
    x1Lsh, x1Simhash, x2Ann, distinctAgg, rollupAgg, intersectUsers,
    runningWindow, s5Checkpoint, s6Metrics, p7Concat, inSubquery,
    statefulEmaQ, x2NearDup, s4Csv,
    asofJoin, rangeJoin, unionUsers, dateFuncs, x4Media, asofCustom,
    x1Pipeline, saltedAgg, rangeFrame, x2Ivf, analyticFuncs, cubeAgg,
    s1CostReturns, notebookSmoothing, p10Actor, evalSummary,
    aCorr, aMinMaxBy, groupingSetsAgg, slidingWindow, nthWindow,
    unpivotMetrics, x1SimhashPairs, x3Tfidf, x2Quantize, s7Partitioned,
    s4Jsonl, configOverlay, x5ApproxDistinct,
    cdcDedupReplay, cdcIntervalJoin, x1Components,
    cdcScd2, cdcChangelog, bloomSemi, existsSubquery, scalarSubquery,
    histogramBuckets, x5ApproxQuantile, x6Reservoir, q5Local,
    x6Split, x6Sample, x6Pack, p10Table, q3Ship,
    resampleLocf, funnelStages,
    asofForward, asofNearest,
    e2eTrain, s3Outliers, w3Capped, asofNativeOracle, p10Deep, j1Gather,
    x3Decon, x3Repetition, x6Chunk,
    x3Pii, x3Domain, x3Clf, x6Mixture, x6Budget, x3Boiler,
    x2Kmeans, x5Heavy, x3Url, profileQ, s8Orc, x6Priority, x3Lm, x2Cov,
    x2Pca, x2SemDedup, s9Bucketed, x6Curriculum, w8Anomaly, s10Schema,
    x7Curation, x6GroupSplit, s3Winsorize, x2SemTrained, s11Zorder,
    e2eTrainLag, evalNorm, s11Zorder3d, x2AnnRecall, x2IvfRecall, x6Temperature,
    x1KeepBest, x3QualityGate, x2IvfNprobe, x6Shard, x6Epoch, s2Generator,
    s2PushCount, x1DupSpans, x2PqTrain, x2PqSearch, x2PqRecall, x5CountMin,
    x1CrossCorpus, cdcSnapshot, x6Fim, x6Doremi, x1CrossCorpusBloom, x1ParaDedup,
    x3Bpe, profSkew, x4Frames, x3Drift, x2PcaProject, x3SemDecon,
    q6Revenue, jsonVariant, x1CdcChunks, x3Colloc, cohortRet, x3BpeApply,
    e2eTrain2, x3Nfc, x3Calib, x2MatRecall, x6DoremiResample,
    x2IvfPq, x2IvfPqRecall, e2eTrainK, x4Decode,
    x2Knn, x2Triplet, x1EditJoin, x6Dsir, x3Zipf, x8Graph, x8Pagerank,
    x5Hll, x6Weighted, x8Paths, x8Ppr, x3Bm25, x8Hits, x8Tri, x2Rrf,
    x8Hops, x6Upsample, x3Strip, x1Containment, x3Train, x3Apply,
    x4MediaDedup, x3Diversity, aMad, x4DecodeReal, x2IvfRerank,
    x2IvfRerankRecall, x4DecodePng, x4PixelStats, x4DecodeJpeg, x4PngRoundtrip,
    x3BpeFast, x2PcaTopK, x2PcaProjectTopK, x3BpeBytes, x4ExifOrientation,
    x4DecodeWav, x4DecodeMp4, x4ImageCuration, x4MediaBudget,
    x3BpeBytesApply, x4DecodeWavExt, x2OpqRecall, x2ArtifactRt, x1SimhashSkew, x2OpqAlloc, x3BpeArtifact,
    x2OpqNp, x2PqArtifactRt, x2PcaArtifactRt,
    x2NearDupTopK, x1EditTopK, x3ClfArtifactRt,
    x2CosineSkew, x2NearDupCapped)

  /** Flagship end-to-end slice (SURVEY.md §7.1): per-episode discounted
    * cost return + feasibility gate — S1 scan, W1 window, W3 groupBy, W4
    * selection in one pipeline. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val withReturn = SeqOps.discountedReturn(Tables.events(spark, dir), "user_id",
      Seq(col("ts"), col("event_id")), col("value"), Gamma, "disc_return")
    withReturn.groupBy(col("user_id")).agg(
      round(max(col("disc_return")), 4).as("max_disc_return"),
      round(sum(col("value")), 4).as("episode_cost"),
      count(lit(1)).as("episode_len"))
      .withColumn("feasible", (col("episode_cost") < lit(20000.0)).cast("double"))
      .orderBy(col("user_id"))
  }
}
