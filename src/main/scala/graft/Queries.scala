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
object Queries extends QueriesAssembly {
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
    x2CosineSkew, x2NearDupCapped,
    x1EditSkew, x1EditCapped, x1EditTopKCapped, x2PqRecallFixedK)

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
