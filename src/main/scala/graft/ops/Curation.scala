package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators (the X-family's last mile): once a
  * corpus is deduped, filtered and scored, a training pipeline still has
  * to SPLIT it (train/val/test), SAMPLE it (per-source/language mix
  * weights) and PACK it (fixed token budgets per training sequence).
  *
  * Everything is keyed on a deterministic md5-derived bucket of the
  * document id — never `rand()`: the same document lands in the same
  * split/sample on every run, on any engine (the DuckDB oracle replays
  * the identical closed form), and adding documents never reshuffles
  * existing assignments. All three ops are single-pass projections or
  * one-window pipelines — no extra shuffles beyond the stated ones.
  */
object Curation {

  /** Deterministic per-id bucket in [0, buckets): md5 of the id's decimal
    * rendering → 60-bit int → mod. Independent of row order and
    * partitioning; reproducible in SQL as
    * `CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) % buckets`. */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** X6 — fixed-window document chunking with stride overlap (the
    * training-prep transform BEFORE packing: long documents become
    * `chunkTokens`-token windows every `stride` tokens, so sequence
    * boundaries don't lose cross-boundary context; stride < chunkTokens
    * gives the conventional overlap). Pure per-row explode over the
    * projected token array — no shuffle, no state; at 100 TB this is a
    * map-only pass whose output row count is L/stride per doc.
    *
    * Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens). The last
    * chunk per doc may be shorter than `chunkTokens`; windows starting at
    * or past the doc end are never generated. Docs with zero tokens
    * produce zero chunks. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    docs.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("doc_id"), col("__t"),
        posexplode(sequence(lit(0), size(col("__t")) - lit(1), lit(stride))))
      .withColumnRenamed("pos", "chunk_idx")
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__t"), col("col") + lit(1), lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("__t")) - col("col"), lit(chunkTokens)).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Train/val/test assignment by bucket ranges over 100 buckets
    * (default 90/5/5). Stable under corpus growth — a new document never
    * moves an old one between splits (the property random splits lack). */
  def splitAssign(df: DataFrame, idCol: String,
                  trainPct: Int = 90, valPct: Int = 5): DataFrame =
    splitAssignBy(df, col(idCol), trainPct, valPct)

  /** Leakage-safe split assignment by an arbitrary GROUP key (site
    * domain, dedup-cluster representative, author): every member of a
    * group hashes to the SAME bucket, so near-duplicates and same-site
    * pages can never straddle train/test — the contamination a per-doc
    * split invites whenever the corpus still contains related documents.
    * Same stable bucket math as [[splitAssign]] (which is the key=id
    * special case); pure projection, no shuffle. */
  def splitAssignBy(df: DataFrame, key: Column,
                    trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val b = idBucket(key, 100)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Stratified deterministic sample: per-stratum keep-rates in percent
    * (e.g. language mix weights), id-bucket keyed. A stratum absent from
    * `rates` keeps `defaultPct`. This is the mix-weighting op of a
    * training-data pipeline — downsample the over-represented stratum,
    * keep the rare one — with exact reproducibility. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val b = idBucket(col(idCol), 100)
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(b < rate)
  }

  /** X6 — self-calibrating mixture rates: given target percent shares per
    * stratum (e.g. the data-mixture weights of a training recipe), derive
    * per-stratum keep-rates from the OBSERVED counts so the kept corpus
    * hits the target mix exactly at the largest size reachable by
    * downsampling alone (no stratum is ever upsampled): the binding
    * stratum is the one with the smallest count/share ratio; it keeps
    * 100% and every other stratum downsamples proportionally.
    *
    * rate_s = floor(100 · share_s · T / count_s) where
    * T = min_s(count_s / share_s) — all IEEE doubles from identical
    * inputs, so the DuckDB oracle reproduces the rates bit-exactly.
    * Output: (stratum, n_docs, rate). Aggregate-tiny (one row per
    * stratum). */
  def mixtureRates(df: DataFrame, stratumCol: String,
                   targets: Map[String, Int]): DataFrame = {
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__share", targets.foldLeft(lit(0)) { case (acc, (k, v)) =>
        when(col("stratum") === k, lit(v)).otherwise(acc)
      }.cast("double") / lit(100.0))
      .where(col("__share") > 0.0)
    val t = counts.agg(min(col("n_docs").cast("double") / col("__share")).as("__t"))
    counts.crossJoin(broadcast(t))
      .withColumn("rate",
        floor(lit(100.0) * col("__share") * col("__t") / col("n_docs").cast("double"))
          .cast("long"))
      .select(col("stratum"), col("n_docs"), col("rate"))
  }

  /** X6 — deterministic per-stratum UP-sampling ("epochs per dataset"):
    * each stratum repeats `epochsPct/100` times, with the fractional
    * remainder landing on a stable id-bucket slice — e.g. 250 ⇒ every
    * doc appears twice and the stable 50% slice a third time. The
    * pretraining mixture lever [[mixtureSample]] cannot express: rates
    * ABOVE 100 (underrepresented high-quality sources run multiple
    * epochs — the Llama/Gopher recipe), while pct < 100 degenerates to
    * exactly the keep-rate downsample (0 whole copies + a pct% slice),
    * so one integer-percent table drives the whole mixture.
    *
    * Scale shape: the pct table is stratum-cardinality → broadcast; the
    * corpus is repeated in place by an explode over a ≤ ⌈pct/100⌉-element
    * sequence — map-only, no shuffle, output-bounded. All-integer rate
    * math (the [[idBucket]] replay contract): re-running on any engine
    * reproduces the same copies. Output rows carry `copy` (1-based) so
    * downstream epoch shuffles can key on (id, copy). */
  def upsampleBy(df: DataFrame, idCol: String, stratumCol: String,
                 epochsPct: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require(epochsPct.values.forall(_ >= 0) && defaultPct >= 0,
      "epoch percentages must be non-negative")
    val withPct = df.withColumn("__pct",
      epochsPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(v)).otherwise(acc)
      })
    withPct
      .withColumn("__n", (col("__pct") - pmod(col("__pct"), lit(100))) / lit(100)
        + when(idBucket(col(idCol), 100) < pmod(col("__pct"), lit(100)), lit(1))
          .otherwise(lit(0)))
      .where(col("__n") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(1L), col("__n").cast("long"))).as("copy"): _*)
  }

  /** X6 — apply [[mixtureRates]]: id-bucket-keyed keep of `rate`% per
    * stratum. The rate table is stratum-cardinality → broadcast; the
    * corpus is filtered in place with no shuffle (strata absent from the
    * targets drop — their rate table row is absent and the join is
    * inner). */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    targets: Map[String, Int]): DataFrame = {
    val rates = mixtureRates(df, stratumCol, targets)
      .withColumnRenamed("stratum", stratumCol).drop("n_docs")
    df.join(broadcast(rates), Seq(stratumCol))
      .where(idBucket(col(idCol), 100) < col("rate"))
  }

  /** X6 — mixture rates from a LEARNED shares TABLE (stratum, share) —
    * the apply step after [[doremiWeights]] (or any upstream mixture
    * optimizer): identical T = min(n/share) and floor-percent rate math
    * as [[mixtureRates]], with the share column produced by a dataflow
    * instead of a static config map. `shares` must carry the stratum
    * column under the same name; share ≤ 0 strata drop. Aggregate-tiny
    * both sides → broadcast joins only. */
  def mixtureRatesBy(df: DataFrame, stratumCol: String, shares: DataFrame,
                     shareCol: String = "weight"): DataFrame = {
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(shares.select(col(stratumCol).as("stratum"),
        col(shareCol).cast("double").as("__share"))), Seq("stratum"))
      .where(col("__share") > 0.0)
    val t = counts.agg(min(col("n_docs").cast("double") / col("__share")).as("__t"))
    counts.crossJoin(broadcast(t))
      .withColumn("rate",
        floor(lit(100.0) * col("__share") * col("__t") / col("n_docs").cast("double"))
          .cast("long"))
      .select(col("stratum"), col("n_docs"), col("rate"))
  }

  /** Apply [[mixtureRatesBy]] — same id-bucket keep as [[mixtureSample]]. */
  def mixtureSampleBy(df: DataFrame, idCol: String, stratumCol: String,
                      shares: DataFrame, shareCol: String = "weight"): DataFrame = {
    val rates = mixtureRatesBy(df, stratumCol, shares, shareCol)
      .withColumnRenamed("stratum", stratumCol).drop("n_docs")
    df.join(broadcast(rates), Seq(stratumCol))
      .where(idBucket(col(idCol), 100) < col("rate"))
  }

  /** X6 — temperature-based mixture rates (the multilingual/multi-source
    * resampling rule of mT5/XLM-R: sample stratum l with probability
    * ∝ n_l^alpha, alpha ∈ (0,1] — alpha < 1 up-weights small strata so
    * low-resource sources aren't drowned by the head). Given the observed
    * counts, the keep-rate per stratum is
    * `min(1, totalTarget·w_l / (W·n_l))` in per-mille, with w_l = n_l^alpha.
    *
    * Cross-engine float parity (this feeds the oracle-gated filter):
    * `pow` is a transcendental (JVM vs libm may differ in the last ulp) →
    * each w_l is portable-rounded at 4 decimals; the weight SUM would be
    * engine-order-dependent → it folds over `sort_array(collect_list(w))`
    * so both engines add the identical ascending sequence; the remaining
    * rate arithmetic is per-row IEEE on identical operands. Stratum
    * cardinality is tiny (sources/languages), so the collect_list is a
    * few doubles.
    *
    * Scale shape: one stratum-count aggregate (shuffle carries counts
    * only), a one-row broadcast of the weight table, then a map-side
    * id-bucket filter — the corpus never shuffles. */
  def temperatureRates(df: DataFrame, stratumCol: String, alpha: Double,
                       totalTarget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    val w = counts.withColumn("__w",
      floor(pow(col("n_docs").cast("double"), lit(alpha)) * lit(1e4) + lit(0.5)) / lit(1e4))
    val tot = w.agg(
      aggregate(sort_array(collect_list(col("__w"))), lit(0.0),
        (acc, x) => acc + x).as("__sw"))
    w.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1000L),
        floor(lit(1000.0) * lit(totalTarget.toDouble) * col("__w")
          / (col("__sw") * col("n_docs").cast("double"))).cast("long")))
      .select(col("stratum"), col("n_docs"), col("rate"))
  }

  /** X6 — apply [[temperatureRates]]: id-bucket-keyed keep of rate‰ per
    * stratum (same mechanics as [[mixtureSample]], per-mille resolution
    * because temperature targets are usually a small fraction of the
    * head stratum). */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        alpha: Double, totalTarget: Long): DataFrame = {
    val rates = temperatureRates(df, stratumCol, alpha, totalTarget)
      .withColumnRenamed("stratum", stratumCol).drop("n_docs")
    df.join(broadcast(rates), Seq(stratumCol))
      .where(idBucket(col(idCol), 1000) < col("rate"))
  }

  /** X6 — deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis priority sampling): each row draws a
    * reproducible uniform u ∈ [0,1) from md5(id ‖ seed) (60 bits → a
    * dyadic rational, exact in any engine's doubles) and ranks by
    * ln(u)/w — the order-equivalent monotone transform of the classic
    * u^(1/w) key (higher weight → key closer to 0 → likelier kept), using
    * `log` instead of `pow` because one transcendental call is the whole
    * cross-engine FP exposure. The key is portable-rounded at 6 BEFORE
    * ranking, so both the emitted values and the kept set survive a
    * last-ulp `log` divergence (rounding ties break by id).
    *
    * Scale shape: top-k by (key DESC, id ASC) via orderBy + limit, which
    * Spark plans as TakeOrderedAndProject — per-partition heaps merged on
    * the driver at k rows, never a global sort (same shape as
    * reservoirSample, but weight-aware). Weights must be ≥ 1
    * (token-count-like); pass `greatest(w, 1)`. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: Column, k: Int,
                     seed: String = ""): DataFrame = {
    val u = conv(substring(md5(concat(col(idCol).cast("string"), lit(seed))), 1, 15),
      16, 10).cast("double") / lit(math.pow(2.0, 60))
    val key = floor(log(u) / weightCol.cast("double") * lit(1e6) + lit(0.5)) / lit(1e6)
    df.withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** X6 — global quality-ordered selection under a token budget ("keep
    * the best documents until the budget is spent" — the final cut of a
    * training-data recipe). Semantics: order the corpus by
    * (score DESC, id ASC); a document is kept iff the running token total
    * BEFORE it is < `budget` (so the budget can overflow by at most one
    * document — same rule as [[packSequences]] bins).
    *
    * Scale shape — the naive form is a single-partition running-sum
    * window over the whole corpus, a scale-killer this repo's PlanSpec
    * bans outright. Instead, the exact same selection in three
    * corpus-safe steps:
    *  1. per-score bucket token totals (one partial-agg shuffle of
    *     (score, n) pairs — aggregate-tiny output, one row per distinct
    *     score);
    *  2. bucket prefix sums via a broadcast non-equi self-join on that
    *     tiny frame (θ(B²) on B buckets — B is score-granularity-bounded,
    *     ~10⁶ at most, and it never touches the corpus); buckets whose
    *     prefix already exceeds the budget are dropped HERE, so
    *  3. the per-bucket `sum` window (PARTITIONED BY score — never
    *     global) and the final filter only shuffle the documents that can
    *     still win: at 100 TB with a 1% budget, 99% of the corpus never
    *     reaches the window exchange.
    *
    * Output: (doc_id, q, n_tokens, start) for kept docs, `start` = tokens
    * consumed before this document in the global order. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: Column,
                        tokenCol: Column, budget: Long): DataFrame = {
    val scored = df.select(col(idCol).as("doc_id"), scoreCol.as("q"),
      tokenCol.cast("long").as("n_tokens"))
    val byQ = scored.groupBy(col("q")).agg(sum(col("n_tokens")).as("__bt"))
    val pre = byQ.as("a").join(broadcast(byQ.as("b")), col("b.q") > col("a.q"), "left")
      .groupBy(col("a.q").as("q"))
      .agg(coalesce(sum(col("b.__bt")), lit(0L)).as("__prefix"))
      .where(col("__prefix") < budget)
    val w = Window.partitionBy(col("q")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(pre), Seq("q"))
      .withColumn("start",
        col("__prefix") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .where(col("start") < budget)
      .select(col("doc_id"), col("q"), col("n_tokens"), col("start"))
  }

  /** Greedy contiguous sequence packing: within each stratum, documents
    * (in deterministic id order) fill fixed token-budget bins; a document
    * belongs to the bin where its span starts, so bins can overflow by at
    * most one document — the streaming-friendly packing rule (one window
    * cumsum, no bin-packing search). Output adds (n_tokens, bin). */
  def packSequences(df: DataFrame, idCol: String, stratumCol: String,
                    tokenCount: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenCount)
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget.toDouble))
          .cast("long"))
  }

  /** X6 — size-balanced shard manifest: assign every document to one of
    * `shards` output files so per-shard token totals balance — the step
    * that turns a curated corpus into the fixed-width training shards a
    * data loader streams. Semantics: round-robin over the corpus in
    * (size DESC, id ASC) order — shard = global_rank mod `shards` — which
    * guarantees (a) shard doc counts differ by at most one and (b) shard
    * token totals differ by at most the single largest document
    * (telescoping over the descending rounds), with no bin-packing
    * search and full determinism.
    *
    * Scale shape — the global rank decomposes exactly like
    * [[tokenBudgetSelect]]: per-size-level counts (aggregate-tiny, one
    * row per distinct size), level prefix sums via a broadcast non-equi
    * self-join on that tiny frame (never a window, so the PlanSpec
    * unpartitioned-window ban holds even on the tiny side), then a
    * row_number window PARTITIONED BY size level over the corpus —
    * rank = level prefix + within-level position. At 100 TB the only
    * corpus-sized exchange is that size-keyed window; pass a DISCRETIZED
    * size if sizes are near-unique (same caveat as [[curriculumOrder]]).
    *
    * Output: (doc_id, n_tokens, shard). */
  def shardManifest(df: DataFrame, idCol: String, sizeCol: Column,
                    shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be at least 1, got $shards")
    val base = df.select(col(idCol).as("doc_id"), sizeCol.cast("long").as("n_tokens"))
    val byN = base.groupBy(col("n_tokens")).agg(count(lit(1)).as("__n"))
    val pre = byN.as("a").join(broadcast(byN.as("b")),
        col("b.n_tokens") > col("a.n_tokens"), "left")
      .groupBy(col("a.n_tokens").as("n_tokens"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__prefix"))
    val wIn = Window.partitionBy(col("n_tokens")).orderBy(col("doc_id"))
    base.join(broadcast(pre), Seq("n_tokens"))
      .withColumn("__rk", col("__prefix") + row_number().over(wIn).cast("long") - lit(1L))
      .select(col("doc_id"), col("n_tokens"),
        pmod(col("__rk"), lit(shards.toLong)).as("shard"))
  }

  /** X6 — deterministic epoch reshuffle: a training run visits the corpus
    * `epochs` times, each epoch in a DIFFERENT pseudorandom order (same-
    * order epochs measurably hurt convergence), and the order must be
    * reproducible for elastic restarts. Each (doc, epoch) draws its sort
    * key from md5(id ‖ ':' ‖ epoch ‖ seed) — 60 bits, collision-free in
    * practice and identical in any engine — so the manifest for epoch e
    * is just ORDER BY (epoch, ord, doc_id), no stored permutation and no
    * shuffle service: re-deriving any epoch's order is a projection.
    *
    * Scale shape: a map-only explode of `epochs` rows per document (the
    * epoch count is single-digit; the output IS the manifest being
    * requested). No window, no join, no aggregation — at 100 TB this is
    * scan throughput, and a consumer materializing one epoch filters
    * epoch = e at the scan. Output: (epoch, ord, doc_id). */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
                   seed: String = ""): DataFrame = {
    require(epochs >= 1, s"epochs must be at least 1, got $epochs")
    df.select(col(idCol).as("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .select(col("epoch").cast("long").as("epoch"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"), lit(seed))), 1, 15), 16, 10)
          .cast("long").as("ord"),
        col("doc_id"))
  }

  /** X6 — curriculum ordering: easiest-first training order that still
    * interleaves sources round-robin, so early training never sees a
    * single-source (single-distribution) run. Each document ranks within
    * its source by (difficulty ASC, id) and the curriculum is the
    * (rank, source) lexicographic order — rank r of every source appears
    * before rank r+1 of any source.
    *
    * Scale shape: sources are FEW, so a per-source row_number window
    * would funnel the whole corpus through |sources| tasks. Instead the
    * rank decomposes like [[tokenBudgetSelect]]'s prefix trick:
    * per-(source, difficulty-level) counts (a sources×levels table,
    * corpus-tiny) give each level its per-source prefix via a window
    * over that tiny table; the corpus then windows only within
    * (source, level) — cardinality sources×levels, skew-free — and
    * rk = level prefix + within-level position. Pass a DISCRETIZED
    * difficulty at scale (a raw continuous score makes levels unique and
    * the counts table corpus-sized; bucket it first). The final sort is
    * the op's output semantics — an ordered manifest is what a
    * curriculum is — planned as a range-partitioned sort, the same
    * class as the oracle-mandated final ORDER BYs. */
  def curriculumOrder(df: DataFrame, idCol: String, sourceCol: String,
                      difficulty: Column): DataFrame = {
    val base = df.withColumn("difficulty", difficulty)
    val counts = base.groupBy(col(sourceCol), col("difficulty"))
      .agg(count(lit(1)).as("__n"))
    val wPrefix = Window.partitionBy(col(sourceCol)).orderBy(col("difficulty"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = counts
      .withColumn("__prefix", sum(col("__n")).over(wPrefix) - col("__n"))
      .drop("__n")
    val wIn = Window.partitionBy(col(sourceCol), col("difficulty"))
      .orderBy(col(idCol).asc)
    base.join(broadcast(prefix), Seq(sourceCol, "difficulty"))
      .withColumn("rk", col("__prefix") + row_number().over(wIn).cast("long"))
      .select(col("rk"), col(sourceCol), col(idCol), col("difficulty"))
      .orderBy(col("rk"), col(sourceCol))
  }

  /** X6 — fill-in-the-middle (FIM) transform in PSM order (prefix, suffix,
    * middle), the standard pre-training augmentation for infilling-capable
    * code/text models (Bainbridge-style "FIM-rate" gating: a deterministic
    * fraction of documents is rearranged, the rest pass through verbatim).
    *
    * All decisions are integer arithmetic on the document id — the same
    * LCG-style closed form both engines reproduce bit-identically — never
    * `rand()`: re-running the transform on the same corpus yields the same
    * augmented corpus (a replayed shard must not re-roll its splits).
    * The two cut points land in the first and last thirds of the text so
    * prefix, middle, and suffix are all non-empty; documents shorter than
    * `minChars` (or outside the gated fraction) pass through with
    * `fim = 0`. Pure stateless projection: no shuffle, no state — at
    * 100 TB this is scan-throughput work that pipelines into whatever
    * shuffle follows (packing, sharding). */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   sentinelPre: String = "<PRE>", sentinelSuf: String = "<SUF>",
                   sentinelMid: String = "<MID>",
                   ratePct: Int = 50, minChars: Int = 12): DataFrame = {
    val id = col(idCol)
    val len = length(col(textCol)).cast("long")
    val third = greatest(floor(len / lit(3.0)).cast("long"), lit(1L))
    // cut1 ∈ [1, third], cut2 ∈ [len−third, len−1]: both strictly inside
    val cut1 = lit(1L) + pmod(id * lit(7919L), third)
    val cut2 = len - lit(1L) - pmod(id * lit(9973L), third)
    val gated = pmod(id * lit(2654435761L), lit(100L)) < lit(ratePct.toLong) &&
      len >= lit(minChars.toLong)
    val pre = substring(col(textCol), lit(1), cut1.cast("int"))
    val mid = substring(col(textCol), (cut1 + lit(1L)).cast("int"),
      (cut2 - cut1).cast("int"))
    val suf = substring(col(textCol), (cut2 + lit(1L)).cast("int"), lit(Int.MaxValue))
    df.withColumn("fim", when(gated, lit(1L)).otherwise(lit(0L)))
      .withColumn("text_out",
        when(gated, concat(lit(sentinelPre), pre, lit(sentinelSuf), suf,
          lit(sentinelMid), mid))
          .otherwise(col(textCol)))
  }

  /** X6 — DoReMi-style domain reweighting (Xie et al. 2023, "Doremi:
    * optimizing data mixtures speeds up language model pretraining"):
    * starting from uniform domain weights, run `iters` rounds of the
    * exponentiated-gradient update
    * `w ← normalize(w · exp(eta · excess_loss_d))`, where the per-domain
    * excess loss comes from a corpus aggregate (here: mean quality deficit
    * vs the corpus-wide floor — a stand-in for the proxy-model loss gap in
    * the paper; callers supply any per-row loss column).
    *
    * Scale shape: the corpus is touched EXACTLY ONCE (one partial+final
    * aggregate per domain); every update iteration then runs on the
    * domains-sized table (corpus-tiny) with its normalizing constant as a
    * broadcast one-row cross join — the same pattern as `mixtureRates`.
    * Unrolled, not looped-with-actions: the whole computation is one
    * declarative plan, so it rides a single job. The domain loss and each
    * iteration's weights are portable-rounded (floor(x·10^d + 0.5)/10^d)
    * so corpus partial-sum order cannot compound across the unrolled
    * iterations — the same chaining rule as `kmeansFit`/`pcaPowerIteration`. */
  def doremiWeights(df: DataFrame, domainCol: String, lossCol: Column,
                    eta: Double = 0.5, iters: Int = 3,
                    roundDigits: Int = 6): DataFrame = {
    val s = math.pow(10.0, roundDigits)
    def pr(c: Column): Column = floor(c * lit(s) + lit(0.5)) / lit(s)
    val perDomain = df.groupBy(col(domainCol))
      .agg(pr(avg(lossCol)).as("domain_loss"), count(lit(1)).as("n_docs"))
    doremiFromStats(perDomain, domainCol, eta, iters, roundDigits)
  }

  /** [[doremiWeights]] from an ALREADY-AGGREGATED per-domain stat table
    * (domainCol, domain_loss, n_docs) — `domain_loss` must already carry
    * the portable rounding. The streaming reweighting pipeline maintains
    * (loss_sum, n) per source as an additive batch-stamped ledger — the
    * sufficient statistic for the mean, exactly as the drift monitor's
    * token counts are for the KL report — and reconstructs this table
    * each micro-batch; the update iterations only ever touch the
    * domains-sized frame either way. */
  def doremiFromStats(perDomain: DataFrame, domainCol: String,
                      eta: Double = 0.5, iters: Int = 3,
                      roundDigits: Int = 6): DataFrame = {
    val s = math.pow(10.0, roundDigits)
    def pr(c: Column): Column = floor(c * lit(s) + lit(0.5)) / lit(s)
    // excess over the min-loss domain: the best domain gets zero gradient
    val floor0 = perDomain.agg(min(col("domain_loss")).as("__floor"))
    val seeded = perDomain.crossJoin(broadcast(floor0))
      .withColumn("excess", col("domain_loss") - col("__floor"))
      .withColumn("w", lit(1.0))
    val converged = (1 to iters).foldLeft(seeded) { (cur, _) =>
      val scored = cur.withColumn("w", pr(col("w") * exp(lit(eta) * col("excess"))))
      scored.crossJoin(broadcast(scored.agg(sum(col("w")).as("__z"))))
        .withColumn("w", pr(col("w") / col("__z"))).drop("__z")
    }
    converged.select(col(domainCol), col("n_docs"), col("domain_loss"),
      col("excess"), col("w").as("weight"))
  }

  /** X6 — DSIR-style importance scoring (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw document by how much
    * it resembles a TARGET slice under hashed-n-gram bag-of-words models.
    * Per hash bucket b, λ_b = ln p_target(b) − ln p_raw(b) with add-α
    * smoothing; a document's weight is the length-normalized sum of its
    * tokens' λ values. Selecting the top-weighted raw docs tilts the
    * training mix toward the target domain without a trained classifier.
    *
    * Scale shape — the part that matters at 100 TB: the feature space is
    * a FIXED `buckets`-sized hash range, so unlike a vocabulary it does
    * not grow with the corpus (the exact broadcast-killer the drift op
    * had to engineer away). Both count aggregates are map-side-partial
    * groupBys on ≤ `buckets` keys; the λ table collapses to ONE map row
    * broadcast onto the corpus; scoring is then a pure projection — the
    * corpus is never shuffled, and the per-doc fold runs in token order
    * (deterministic, engine-reproducible). Tokens hash through the same
    * portable md5→60-bit form as [[idBucket]].
    *
    * Output: (idCol…, every input column, n_toks, weight) for docs with
    * ≥ 1 token; weight carries the portable rounding at `roundDigits`
    * (λ is log-valued — irrational sums round coarsely per the house
    * parity rules). */
  def dsirWeights(docs: DataFrame, textCol: String, targetPred: Column,
                  buckets: Int = 128, alpha: Double = 0.5,
                  roundDigits: Int = 4): DataFrame =
    dsirWeightsFromCounts(docs, textCol,
      dsirBucketCounts(docs, textCol, targetPred, buckets),
      buckets, alpha, roundDigits)

  /** The portable token-hash bucket shared by the DSIR forms. */
  def dsirBucket(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Per-bucket (raw, target) token counts — the ADDITIVE sufficient
    * statistic for the λ table: integer counts fold losslessly across
    * shards or micro-batches, which is what makes the streaming
    * incremental DSIR selector exactly equal to the batch op. */
  def dsirBucketCounts(docs: DataFrame, textCol: String, targetPred: Column,
                       buckets: Int = 128): DataFrame =
    docs.select(col("*"), explode(TextOps.tokens(col(textCol))).as("__w"))
      .withColumn("bucket", dsirBucket(col("__w"), buckets))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"),
        sum(when(targetPred, lit(1L)).otherwise(lit(0L))).as("ct"))

  /** X6 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, 2006): draw `k` rows with inclusion probability proportional
    * to `weight` by ranking on ln(uᵢ)/wᵢ (the log form of the uᵢ^(1/wᵢ)
    * key — same order, one transcendental) with uᵢ a DETERMINISTIC
    * md5-derived uniform in (0,1], so the same row draws the same key on
    * every run and every engine (the `idBucket` reproducibility
    * contract, extended to continuous uniforms). Keys round at 6 BEFORE
    * ranking — the cosine-recall trade: a 1-ulp libm difference in
    * ln/division can never flip a rank across engines, ties break by id.
    *
    * Scale: pure projection + TakeOrdered top-k (per-partition heaps,
    * no global sort, no window) — the same plan shape as reservoir
    * sampling, with the weight tilt. Rows with weight ≤ 0 are excluded
    * (A-ES requires positive weights). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     seed: String = "ws1"): DataFrame = {
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long")
    // (h + 1) / 2^60 ∈ (0, 1] — exact int → nearest double → exact
    // power-of-two division, identical bits on any IEEE engine
    val u = (h.cast("double") + lit(1.0)) / lit(math.pow(2.0, 60))
    val key = floor(log(u) / weight * lit(1e6) + lit(0.5)) / lit(1e6)
    df.where(weight > 0)
      .withColumn("draw_key", key)
      .orderBy(col("draw_key").desc, col(idCol))
      .limit(k)
  }

  /** [[dsirWeights]] from an ALREADY-AGGREGATED per-bucket count table
    * (bucket, cr, ct) — the entry point for maintained/accreted counts. */
  def dsirWeightsFromCounts(docs: DataFrame, textCol: String, counts: DataFrame,
                            buckets: Int = 128, alpha: Double = 0.5,
                            roundDigits: Int = 4): DataFrame = {
    val s = math.pow(10.0, roundDigits)
    val b = buckets.toLong
    val totals = counts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("ct") + lit(alpha)) / (col("tt") + lit(alpha * buckets)))
          - log((col("cr") + lit(alpha)) / (col("tr") + lit(alpha * buckets))))
          .as("lam"))
    val lamMap = lam.agg(
      map_from_entries(collect_list(struct(col("bucket"), col("lam")))).as("lm"))
    docs.crossJoin(broadcast(lamMap))
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("n_toks", size(col("__toks")).cast("long"))
      .where(col("n_toks") > 0)
      .withColumn("weight",
        floor(aggregate(
          transform(col("__toks"), t => coalesce(
            element_at(col("lm"), pmod(
              conv(substring(md5(t), 1, 15), 16, 10).cast("long"), lit(b))),
            lit(0.0))),
          lit(0.0), (acc, x) => acc + x) / col("n_toks") * lit(s) + lit(0.5))
          / lit(s))
      .drop("__toks", "lm")
  }
}
