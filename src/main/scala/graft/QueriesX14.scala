package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables
import graft.streaming.StreamingOps

/** §2.8 LLM-pipeline extensions X1–X4, batch 1: dedup, ANN/similarity, text, multimodal.
  *
  * Part of the [[Queries]] registry split (r18): the registry grew past
  * 7k LoC in one file, so its definition blocks moved into CHAINED traits
  * — each extends the previous, preserving the original textual
  * definition order (trait linearization initializes them in chain
  * order), member visibility (`private` → `protected`, still invisible
  * outside the object), and `Queries.all`, which is byte-identical. */
private[graft] trait QueriesX14 extends QueriesCore {
  // ------------------------------------------------------------------
  // batch 2: LSH/simhash dedup, ANN, set/grouping built-ins, running
  // windows, checkpoint/metric plumbing
  // ------------------------------------------------------------------

  /** Shared CTE chain for the shingle→minhash→banding→verify pipeline —
    * reused by the pairs query and the end-to-end dedup query. */
  protected def lshPairCtes: String = {
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
    * iterative min-label propagation, exact-rep contracted + member
    * re-expanded ([[graft.ops.Dedup.nearDupComponents]], r20); the oracle
    * computes min-reachable-id per node with a recursive CTE over the
    * FULL pair graph — the hash gate is the contraction's losslessness
    * proof on real data. */
  protected val x1Components = Q("x1_dedup_components",
    (s, dir) => Dedup.nearDupComponents(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.8, k = 8, r = 4, estMin = 0.75)
      .select(col("id").as("doc_id"), col("component").as("component_id"))
      .orderBy(col("doc_id")),
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

  protected val x1Lsh = Q("x1_minhash_lsh_pairs",
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
  protected val x1Pipeline = Q("x1_dedup_pipeline",
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
  protected val x1KeepBest = Q("x1_dedup_keep_best",
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

  protected val x1Simhash = Q("x1_simhash",
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

  protected def lshBucketSql(vecExpr: String, bits: Int): String =
    (0 until bits).map { j =>
      s"(CASE WHEN list_sum(list_transform(range(len($vecExpr)), i -> $vecExpr[i+1] * (CAST((i*(${j + 3})) % 11 AS DOUBLE)/10.0 - 0.5))) >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  protected val x2Ann = Q("x2_ann_lsh_topk",
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
  protected val RecallQueryCap = 800L
  protected def cappedStripe(c: Column): Column =
    pmod(c, lit(100)) === 0 && c < lit(RecallQueryCap)

  protected def recallOf(exact: DataFrame, cand: DataFrame, k: Int): DataFrame =
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

  protected val x2AnnRecall = Q("x2_ann_recall",
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

  protected val distinctAgg = Q("distinct_agg",
    (s, dir) => Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(col("l_partkey")).as("n_part"),
      count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  protected val rollupAgg = Q("rollup_agg",
    (s, dir) => Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus")).agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
      CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  protected val intersectUsers = Q("set_ops_intersect",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "purchase").select(col("user_id"))
        .intersect(ev.where(col("event_type") === "signup").select(col("user_id")))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT SELECT user_id FROM events WHERE event_type = 'signup' ORDER BY user_id"""))

  protected val runningWindow = Q("running_window",
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
  protected val s5Checkpoint = Q("s5_checkpoint_roundtrip",
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
  protected val s6Metrics = Q("s6_metrics_pivot",
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
  protected val p7Concat = Q("p7_vector_concat",
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

  protected val inSubquery = Q("in_subquery",
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
  protected val bloomSemi = Q("bloom_semi_join",
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
  protected val existsSubquery = Q("exists_subquery",
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
  protected val scalarSubquery = Q("scalar_subquery",
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
  protected val histogramBuckets = Q("histogram_buckets",
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
  protected val statefulEmaQ = Q("stateful_ema_series",
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

  protected val x2NearDup = Q("x2_cosine_neardup",
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
  protected val x2NearDupTopK = Q("x2_neardup_topk",
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
  protected val x2CosineSkew = Q("x2_cosine_bucket_skew",
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
  protected val x2NearDupCapped = Q("x2_neardup_capped",
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
  protected val s4Csv = Q("s4_csv_roundtrip",
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
  protected val asofJoin = Q("asof_join",
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
  protected val rangeJoin = Q("range_band_join",
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

  protected val unionUsers = Q("set_ops_union",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.where(col("event_type") === "purchase").select(col("user_id"))
        .union(ev.where(col("event_type") === "signup").select(col("user_id")))
        .distinct()
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
      UNION SELECT user_id FROM events WHERE event_type = 'signup' ORDER BY user_id"""))

  protected val dateFuncs = Q("date_funcs",
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
  protected val x4Media = Q("x4_media_metadata",
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
  protected val x4Decode = Q("x4_decode_features",
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
  protected val x4DecodeReal = Q("x4_decode_real",
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
  protected val x4DecodePng = Q("x4_decode_png",
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
  protected val x4PixelStats = Q("x4_pixel_stats",
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
  protected val x4DecodeJpeg = Q("x4_decode_jpeg",
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
  protected val x4ExifOrientation = Q("x4_exif_orientation",
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
  protected val x4DecodeWav = Q("x4_decode_wav",
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
  protected val x4DecodeMp4 = Q("x4_decode_mp4",
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
  protected val x4DecodeWavExt = Q("x4_decode_wav_ext",
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
  protected val x4ImageCuration = Q("x4_image_curation",
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
  protected val x4MediaBudget = Q("x4_media_duration_budget",
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
  protected val x4PngRoundtrip = Q("x4_png_roundtrip",
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
  protected val x4MediaDedup = Q("x4_media_dedup",
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
  protected val asofCustom = Q("asof_join_custom_operator",
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
  protected val asofForward = Q("asof_join_forward",
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
  protected val asofNearest = Q("asof_join_nearest",
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
  protected val rangeFrame = Q("range_frame_window",
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

  protected def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(len($a)), i -> $a[i+1]*$b[i+1]))"

  /** X2 IVF ANN: deterministic centroids → nearest-centroid cells →
    * per-cell search. Cell assignment (argmin squared L2, centroid-id
    * tie-break) is bit-reproducible in the oracle. */
  protected val x2Ivf = Q("x2_ivf_topk",
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
  protected val x2IvfRecall = Q("x2_ivf_recall",
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
  protected val x2IvfNprobe = Q("x2_ivf_nprobe_topk",
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
  protected val saltedAgg = Q("salted_agg",
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
  protected val analyticFuncs = Q("analytic_rank_funcs",
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

  protected val cubeAgg = Q("cube_agg",
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
  protected val notebookSmoothing = Q("notebook_truncate_ema",
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
  protected val p10Actor = Q("p10_actor_head",
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
  protected val evalSummary = Q("eval_summary",
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
  protected val evalNorm = Q("eval_normalized",
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

}
