package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Tables
import graft.streaming.StreamingOps

/** BPE family, PCA top-k pair, artifact round-trips, capped emitters, DoReMi weights, cosine hot-bucket guard queries.
  *
  * Part of the [[Queries]] registry split (r18): the registry grew past
  * 7k LoC in one file, so its definition blocks moved into CHAINED traits
  * — each extends the previous, preserving the original textual
  * definition order (trait linearization initializes them in chain
  * order), member visibility (`private` → `protected`, still invisible
  * outside the object), and `Queries.all`, which is byte-identical. */
private[graft] trait QueriesAssembly extends QueriesEval {
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
  protected val x7Curation = Q("x7_curation_pipeline",
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
  protected val s11Zorder = Q("s11_zorder_key",
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
  protected val s11Zorder3d = Q("s11_zorder_key_3d",
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
  protected val s10Schema = Q("s10_schema_evolution",
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
  protected val x6Priority = Q("x6_priority_sample",
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
  protected val x3Lm = Q("x3_lm_perplexity",
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
  protected val x2Cov = Q("x2_covariance_matrix",
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
  protected val x2Pca = Q("x2_pca_power",
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
  protected val profileQ = Q("profile_table",
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
  protected val x2SemDedup = Q("x2_semantic_dedup",
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
  protected val w8Anomaly = Q("w8_anomaly_zscore",
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
  protected val x6Shard = Q("x6_shard_manifest",
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
  protected val x6Epoch = Q("x6_epoch_shuffle",
    (s, dir) => Curation.epochShuffle(Tables.documents(s, dir), "doc_id", epochs = 3)
      .orderBy(col("epoch"), col("ord"), col("doc_id")),
    Some("""SELECT CAST(e AS BIGINT) AS epoch,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e AS VARCHAR)), 1, 15)) AS BIGINT) AS ord,
        doc_id
      FROM documents, (SELECT unnest(range(3)) AS e)
      ORDER BY epoch, ord, doc_id"""))

  protected val x6Curriculum = Q("x6_curriculum_order",
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
  protected val x2SemTrained = Q("x2_semantic_dedup_trained",
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
  protected val x2ArtifactRt = Q("x2_artifact_roundtrip",
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
  protected val s9Bucketed = Q("s9_bucketed_join",
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
  protected val x1CrossCorpus = Q("x1_cross_corpus_dedup",
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
  protected val x1CrossCorpusBloom = Q("x1_cross_corpus_bloom",
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
  protected val x1ParaDedup = Q("x1_paragraph_dedup",
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
  protected val bpeTrainCtes: String = {
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

  protected val x3Bpe = Q("x3_bpe_merges",
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
  protected val x3BpeFast = Q("x3_bpe_merges_fast",
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
  protected val x3BpeBytes = Q("x3_bpe_bytes",
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
  protected val x3BpeApply = Q("x3_bpe_apply",
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
  protected val x3BpeArtifact = Q("x3_bpe_artifact_apply",
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
  protected val x3BpeBytesApply = Q("x3_bpe_bytes_apply",
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
  protected val profSkew = Q("profile_key_skew",
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
  protected val x4Frames = Q("x4_frame_resize",
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
  protected val x3Drift = Q("x3_corpus_drift",
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
  protected val x2PcaProject = Q("x2_pca_project",
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
  protected val pcaTopKCtes: String = {
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
  protected val x2PcaTopK = Q("x2_pca_topk",
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
  protected val x2PcaProjectTopK = Q("x2_pca_project_topk",
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

  // moved below x2PcaProjectTopK in the r18 trait split: this lazy val
  // shares that query's oracle, and a chained trait cannot see forward
  /** X2 — PCA-COMPONENT artifact round-trip: the trained top-2 component
    * table commits to the versioned store, loads back, and every
    * embedding projects + whitens against the LOADED components
    * ([[graft.ops.Similarity.pcaProjectTopK]]). Oracle = the
    * `x2_pca_project_topk` replay from source rows (identical SQL — the
    * store must be invisible to the result), completing the artifact
    * gate across all four trained families: centroids, PQ codebooks,
    * PCA components, BPE merges. */
  protected lazy val x2PcaArtifactRt = Q("x2_pca_artifact_roundtrip",
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

  /** X2/X3 — semantic decontamination
    * ([[graft.ops.Similarity.semanticDecontaminate]]): corpus embeddings
    * (outside the mod-97 bench stripe) max-cosine-scored against the
    * bench stripe via one broadcast fold. The oracle's per-row max over
    * an explicit cross join is order-independent, so both engines agree
    * bit-for-bit before the shared rounding. */
  protected val x3SemDecon = Q("x3_semantic_decontaminate",
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
  protected val q6Revenue = Q("q6_forecast_revenue",
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
  protected val jsonVariant = Q("json_variant_ops",
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
  protected val x1CdcChunks = Q("x1_cdc_chunk_dedup",
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
  protected val x3Colloc = Q("x3_collocations",
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
  protected val cohortRet = Q("cohort_retention",
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
  protected val x3Nfc = Q("x3_unicode_normalize",
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
  protected val x3Calib = Q("x3_quality_calibration",
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
  protected val cdcSnapshot = Q("cdc_snapshot_diff",
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
  protected val x6Fim = Q("x6_fim_transform",
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
  protected val doremiCtes: String = {
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

  protected val doremiLoss: Column =
    lit(1.0) - least(col("n_chars").cast("double") / lit(200.0), lit(1.0))

  protected val x6Doremi = Q("x6_doremi_weights",
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
  protected val x6DoremiResample = Q("x6_doremi_resample",
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

}
