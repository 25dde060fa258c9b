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
                  trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val b = idBucket(col(idCol), 100)
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
}
