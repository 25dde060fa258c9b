package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables
import graft.streaming.StreamingOps

/** end-to-end training/eval compositions, curation gates, classifier family, DoReMi/DSIR, PageRank prep.
  *
  * Part of the [[Queries]] registry split (r18): the registry grew past
  * 7k LoC in one file, so its definition blocks moved into CHAINED traits
  * — each extends the previous, preserving the original textual
  * definition order (trait linearization initializes them in chain
  * order), member visibility (`private` → `protected`, still invisible
  * outside the object), and `Queries.all`, which is byte-identical. */
private[graft] trait QueriesPipelines extends QueriesBatch2 {
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
  protected val e2eTrain = Q("e2e_train_step",
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
  protected val e2eTrain2 = Q("e2e_train_2step",
    (s, dir) => {
      val tr = Tables.transitions(s, dir)
      val ord = Seq(col("t"), col("state0"), col("reward"), col("cost"), col("done"))
      val sC = col("state0"); val aC = col("cost")
      val rC = col("reward") * lit(RewScale)
      val vNet = element_at(ModelOps.mlp(array(sC), Seq(
        (Seq(Seq(0.3), Seq(-0.15)), Seq(-2.0, 4.0), ModelOps.relu),
        (Seq(Seq(0.5, -0.4)), Seq(0.05), ModelOps.identityAct))), 1)
      // cached (r21): the scaladoc's "TD-target window computes ONCE"
      // promise — step 2's plan embeds base both directly and through the
      // broadcast of step 1's coefficient, so uncached it computed 3×
      val base = JoinOps.tdTarget(tr.withColumn("v", vNet), "episode_id", ord,
        rC, col("done"), col("v"), Gamma, "q_tgt")
        .select(sC, aC, col("v"), col("q_tgt")).cache()
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

  protected val e2eTrainK = Q("e2e_train_kstep",
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
  protected val e2eTrainLag = Q("e2e_train_step_lagrangian",
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
  protected val s3Outliers = Q("s3_outlier_trajectories",
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
  protected val w3Capped = Q("w3_capped_accumulation",
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
  protected val asofNativeOracle = Q("asof_join_native_oracle",
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
  protected val p10Deep = Q("p10_deep_table_inference",
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
  protected val docsTokSql =
    """SELECT doc_id, text, source,
       list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
       FROM documents"""

  /** TextOps.qualityScore over columns (text, toks) — the same fragment
    * the x3_text_analysis oracle inlines, kept verbatim so they stay in
    * lockstep. */
  protected val enHitsSql = {
    val words = TextOps.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> list_contains([$words], t)))"
  }
  protected val qualitySql =
    s"""round((least(CAST(length(text) AS DOUBLE)/200.0, 1.0)
        + greatest(1.0 - (CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1)) * 4.0, 0.0)
        + least((CAST($enHitsSql AS DOUBLE) / greatest(len(toks), 1)) * 4.0, 1.0)) / 3.0, 6)"""

  /** X3 — PII scrub over deterministically injected addresses (the raw
    * documents carry no PII, so the query plants an email / IPv4 / phone
    * per modular doc_id class, then counts and redacts them — both
    * engines build the identical injected text, so the redacted md5 is
    * the full-fidelity check). */
  protected val x3Pii = Q("x3_pii_redaction",
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
  protected val x3Domain = Q("x3_domain_cap",
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
  protected val x3Clf = Q("x3_quality_classifier",
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
  protected val MixTargets = Seq("src0" -> 25, "src1" -> 25, "src2" -> 20,
    "src3" -> 15, "src4" -> 15)
  protected val x6Mixture = Q("x6_source_mixture",
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
  protected val x3QualityGate = Q("x3_quality_gate",
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
  protected val x6Temperature = Q("x6_temperature_mixture",
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
  protected val x6Budget = Q("x6_token_budget",
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
  protected val x3Boiler = Q("x3_boilerplate_strip",
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
  protected val x2Kmeans = Q("x2_kmeans_fit",
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
  protected def pqOracleCtes(seedMod: Int = 97, m: Int = 2,
                             seedCap: Long = 0L): String = {
    val subd = 64 / m
    // seedCap > 0 pins the codebook cardinality at the OPERATING POINT
    // (ids below the cap only), independent of corpus size — the r20
    // scale path; 0 keeps the original corpus-proportional seed stripe
    val capSql = if (seedCap > 0) s" AND pid < $seedCap" else ""
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
        FROM e0 WHERE pid % $seedMod = 3$capSql),
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
  protected val x2PqTrain = Q("x2_pq_train",
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
  protected val x2PqSearch = Q("x2_pq_adc_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 2, dim = 64,
        seedPred = pmod(col("vec_id"), lit(97)) === 3, iters = 2)
        .cache() // r21: referenced by both the encode fold and the ADC table
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
  protected val x2MatRecall = Q("x2_matryoshka_recall",
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
  protected val x1EditJoin = Q("x1_edit_distance_join",
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
  protected val x1EditTopK = Q("x1_edit_join_topk",
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

  /** The Ed-Join long branch's prefix-token derivation as DuckDB CTEs —
    * shared by the r19 skew-report and capped-join oracles, and a literal
    * mirror of [[Dedup.prefixTokens]] at d=2, q=4 on the 40-char key:
    * distinct keys (min-id representative) → positional 4-grams
    * tokenized (gram, occurrence#) → corpus frequency → per-key rarity
    * rank (tf, gram, occ) → the q·d+1 = 9 rarest kept. */
  private def edPrefixCtes: String =
    """k0 AS (SELECT CAST(doc_id AS BIGINT) AS id,
          lower(substr(text, 1, 40)) AS key FROM documents),
      keys AS (SELECT key, min(id) AS id, length(key) AS len
        FROM k0 GROUP BY key),
      longs AS (SELECT * FROM keys WHERE len >= 12),
      grams AS (SELECT id, len, key, p, substr(key, p + 1, 4) AS gram
        FROM (SELECT id, len, key, unnest(range(0, len - 3)) AS p FROM longs)),
      tok AS (SELECT id, len, key, gram,
          row_number() OVER (PARTITION BY id, gram ORDER BY p) AS occ
        FROM grams),
      freq AS (SELECT gram, occ, count(*) AS tf FROM tok GROUP BY gram, occ),
      pfx AS (SELECT id, len, key, gram, occ FROM (
          SELECT t.id, t.len, t.key, t.gram, t.occ,
            row_number() OVER (PARTITION BY t.id
              ORDER BY f.tf ASC, t.gram ASC, t.occ ASC) AS pr
          FROM tok t JOIN freq f ON f.gram = t.gram AND f.occ = t.occ)
        WHERE pr <= 9)"""

  /** X1 — Ed-Join prefix-group skew report ([[Dedup.editGroupReport]],
    * r19): every (gram, occ) prefix token of the long branch with its
    * distinct-key count and the quadratic candidate-pair count the prefix
    * self-join pays there — the diagnosis behind the `maxGroupSize`
    * guard, mirroring `x2_cosine_bucket_skew`/`x1_simhash_bucket_skew`
    * for X1's last unguarded family. The oracle re-derives the ENTIRE
    * prefix chain (positional q-grams, occurrence numbering, corpus
    * rarity, q·d+1 retention), so this gate also pins the blocking key
    * the join and capped queries rely on. */
  protected val x1EditSkew = Q("x1_edit_group_skew",
    (s, dir) => Dedup.editGroupReport(Tables.documents(s, dir), "doc_id",
      lower(substring(col("text"), 1, 40)), maxDist = 2, q = 4, minKeys = 2),
    Some(s"""WITH $edPrefixCtes
      SELECT gram, occ, CAST(count(*) AS BIGINT) AS n_keys,
        CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs
      FROM pfx GROUP BY gram, occ HAVING count(*) >= 2
      ORDER BY n_keys DESC, gram, occ"""))

  /** X1 — hot-group-GUARDED edit-distance join ([[Dedup.editDistanceJoin]]
    * with `maxGroupSize`, r19): prefix groups above the cap degrade to a
    * star verify against the group's lowest-id key — O(n) per group where
    * the lossless form's candidate mass is C(n, 2), the bounded recall
    * trade `x1_edit_group_skew` prices. At sf0.01 cap=7 routes the 84
    * hottest groups (8–10 keys) through the star and the remaining 769
    * through all-pairs, so this oracle pins BOTH branch semantics plus
    * the untouched short-string pool, exact-key collapse, and member
    * expansion. At 100× data the guarded form bounds the candidate join
    * the uncapped `x1_edit_distance_join` pays 78.6 s for. */
  /** The capped chain's member-level pair set as CTEs (builds on
    * [[edPrefixCtes]]; `cappedp` = the star-guarded equivalent of the
    * lossless join's output, cap 7): per-group stats + representative,
    * ≤-cap all-pairs branch, >-cap star branch, short pool, banded
    * verify, pair-level distinct, exact-key member expansion. */
  private def edCappedPairsCtes: String =
    s"""$edPrefixCtes,
      stats AS (SELECT gram, occ, count(*) AS n, min(id) AS repid
        FROM pfx GROUP BY gram, occ),
      rep AS (SELECT s.gram, s.occ, s.n, s.repid, k.key AS repkey,
          k.len AS replen
        FROM stats s JOIN longs k ON k.id = s.repid),
      smallp AS (SELECT l.id AS a_id, r.id AS b_id, l.key AS ka, r.key AS kb
        FROM pfx l JOIN pfx r ON l.gram = r.gram AND l.occ = r.occ
          AND l.id < r.id AND abs(l.len - r.len) <= 2
        JOIN stats s ON s.gram = l.gram AND s.occ = l.occ AND s.n <= 7),
      star AS (SELECT rp.repid AS a_id, m.id AS b_id, rp.repkey AS ka,
          m.key AS kb
        FROM pfx m JOIN rep rp ON rp.gram = m.gram AND rp.occ = m.occ
          AND rp.n > 7 AND m.id <> rp.repid AND abs(m.len - rp.replen) <= 2),
      sp AS (SELECT id AS sa, len AS la, key AS ksa FROM keys WHERE len < 12),
      tp AS (SELECT id AS sb, len AS lb, key AS ksb FROM keys WHERE len < 14),
      shortp AS (SELECT least(sa, sb) AS a_id, greatest(sa, sb) AS b_id,
          ksa AS ka, ksb AS kb
        FROM sp JOIN tp ON sa <> sb AND abs(la - lb) <= 2),
      verified AS (SELECT a_id, b_id,
          CAST(levenshtein(ka, kb) AS BIGINT) AS dist
        FROM (SELECT * FROM shortp UNION ALL
              SELECT * FROM smallp UNION ALL
              SELECT * FROM star)
        WHERE levenshtein(ka, kb) <= 2),
      repp AS (SELECT DISTINCT a_id, b_id, dist FROM verified),
      members AS (SELECT k.id AS rep, k0.id AS id
        FROM k0 JOIN keys k ON k.key = k0.key),
      crossp AS (SELECT least(ma.id, mb.id) AS a_id,
          greatest(ma.id, mb.id) AS b_id, p.dist
        FROM repp p JOIN members ma ON ma.rep = p.a_id
        JOIN members mb ON mb.rep = p.b_id),
      withinp AS (SELECT l.id AS a_id, r.id AS b_id, CAST(0 AS BIGINT) AS dist
        FROM members l JOIN members r ON l.rep = r.rep AND l.id < r.id),
      cappedp AS (SELECT * FROM withinp UNION ALL SELECT * FROM crossp)"""

  protected val x1EditCapped = Q("x1_edit_join_capped",
    (s, dir) => Dedup.editDistanceJoin(Tables.documents(s, dir), "doc_id",
      lower(substring(col("text"), 1, 40)), maxDist = 2, q = 4,
      maxGroupSize = Some(7)),
    Some(s"""WITH $edCappedPairsCtes
      SELECT a_id, b_id, dist FROM cappedp ORDER BY a_id, b_id"""))

  /** X1 — hot-group-guarded BOUNDED-OUTPUT edit-distance view
    * ([[Dedup.editDistanceTopK]] with `maxGroupSize`, r19): the capped
    * candidate chain above, emission further bounded at each id's k=3
    * nearest keys — the pipeline form at 100 TB, where the uncapped
    * `x1_edit_join_topk` pays the full clique-quadratic candidate mass
    * (750.5 s at the sf10 board vs 34.7 s for the capped join's shared
    * candidate stage). Kept as its OWN query so the uncapped view's
    * cross-round board numbers stay comparable. */
  protected val x1EditTopKCapped = Q("x1_edit_topk_capped",
    (s, dir) => Dedup.editDistanceTopK(Tables.documents(s, dir), "doc_id",
      lower(substring(col("text"), 1, 40)), maxDist = 2, q = 4, k = 3,
      maxGroupSize = Some(7))
      .orderBy(col("id"), col("nbr_id")),
    Some(s"""WITH $edCappedPairsCtes,
      sym AS (SELECT a_id AS id, b_id AS nbr_id, dist FROM cappedp
        UNION ALL SELECT b_id AS id, a_id AS nbr_id, dist FROM cappedp),
      rk AS (SELECT id, nbr_id, dist, row_number() OVER (PARTITION BY id
          ORDER BY dist ASC, nbr_id ASC) AS rk FROM sym)
      SELECT id, nbr_id, dist FROM rk WHERE rk <= 3
      ORDER BY id, nbr_id"""))

  /** X6 — DSIR-style target-domain data selection
    * ([[Curation.dsirWeights]]): hashed-token importance weights toward
    * the English slice, top-100 raw docs kept. The feature space is a
    * fixed 128-bucket hash range (corpus-independent — never a
    * vocabulary), the λ table one broadcast map row; the oracle replays
    * the identical closed form with the per-doc fold in token order. */
  protected val x6Dsir = Q("x6_dsir_select",
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
  protected val x3Zipf = Q("x3_zipf_fit", {
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
  protected val x5Hll = Q("x5_hll_distinct",
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
  protected val aMad = Q("a_mad_outliers",
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
  protected val x3Diversity = Q("x3_ngram_diversity",
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
  protected val x3Strip = Q("x3_strip_markup", {
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
  protected def trainCtes(iters: Int): String = {
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

  protected val x3Train = Q("x3_train_classifier",
    (s, dir) => TextOps.trainHashClassifier(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", buckets = 32, iters = 3)
      .orderBy(col("bucket")),
    Some(s"""WITH ${trainCtes(3)}
        SELECT bucket, w AS weight FROM w3 ORDER BY bucket"""),
    eagerPlan = true) // construction materializes each step's weight table

  /** X3 — train-then-apply ([[TextOps.applyHashClassifier]]): the
    * 3-step-trained weights score every document (optimize-then-apply,
    * the DoReMi pattern on the classifier); scores round at 6. */
  protected val x3Apply = Q("x3_classifier_scores",
    (s, dir) => {
      // r21: featurize ONCE and share the cached table between training
      // and scoring — the tokenize+explode+count pass is the corpus-sized
      // part of both; scoring folds the same per-doc feature arrays
      // ([[TextOps.applyFromFeatures]], bit-identical to the re-featurized
      // form — hash-gated)
      val feats = TextOps.classifierFeatures(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", buckets = 32).cache()
      val w = TextOps.trainFromFeatures(feats, buckets = 32, iters = 3)
      TextOps.applyFromFeatures(feats, w)
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
  protected lazy val x3ClfArtifactRt = Q("x3_classifier_artifact_apply",
    (s, dir) => {
      val root = "/tmp/graft_art_clfw_" + Tables.scratchTag(s, dir)
      // r21: one shared cached featurization for train + apply (see
      // x3_classifier_scores); the artifact round-trip is unchanged —
      // the LOADED weights score the corpus
      val feats = TextOps.classifierFeatures(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", buckets = 32).cache()
      val w = TextOps.trainFromFeatures(feats, buckets = 32, iters = 3)
      val v = Artifacts.saveArtifact(w, root, "classifier_weights",
        Map("buckets" -> "32", "iters" -> "3", "label" -> "lang=en"))
      val (loaded, meta) = Artifacts.loadArtifactVersion(s, root, v,
        "classifier_weights")
      require(meta.params("buckets") == "32", "sidecar params must round-trip")
      TextOps.applyFromFeatures(feats, loaded)
        .orderBy(col("doc_id"))
    },
    x3Apply.oracle,
    eagerPlan = true) // constructing commits the artifact version on disk

  /** X6 — per-source epoch upsampling ([[Curation.upsampleBy]]):
    * src0 runs 2.5 epochs, src1 1.3, src2 is downsampled to 40% —
    * whole-copy explode + stable id-bucket slice for the remainder,
    * all-integer replayable rate math. */
  protected val x6Upsample = Q("x6_upsample_epochs",
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
  protected val x6Weighted = Q("x6_weighted_sample",
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
  protected val x8Paths = Q("x8_session_paths",
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
  protected val x8EdgeCtes =
    """s AS (SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        epoch_ns(ts) AS tns, event_id FROM events),
      t AS (SELECT user_id, k AS src, lead(k) OVER (PARTITION BY user_id
          ORDER BY tns, event_id) AS dst FROM s)"""

  protected def x8Edges(s: SparkSession, dir: String): DataFrame =
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
  protected val x8Graph = Q("x8_transition_graph",
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
  protected val x8Pagerank = Q("x8_pagerank_states",
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
  protected val x8Ppr = Q("x8_personalized_pagerank",
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

}
