package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi join — the runtime-filter pattern Spark's
  * `InjectRuntimeFilter` applies automatically for shuffle joins, exposed
  * as an explicit operator for the cases the optimizer can't see (e.g. the
  * filtered key set comes from a different pipeline stage, a previous job,
  * or a sink the planner doesn't join through).
  *
  * Scale shape (the reason this exists at 100 TB): the filtered build side
  * is aggregated DISTRIBUTEDLY into ONE bloom filter (partial sketches
  * merged by OR — `BloomFilterAggregate` is a partial/final aggregate like
  * any other), and only the ~MB sketch travels to the driver and back out
  * as a literal in the probe-side scan filter. The 100-TB probe side is
  * pruned BEFORE its shuffle: rows whose key cannot be in the build set
  * never leave the scan stage. The final semi join then removes the bloom's
  * false positives — the result is exactly `probe SEMI JOIN build`, the
  * bloom only cuts shuffle volume (measured ~n_build/n_probe selectivity
  * pass-through, fpp configurable).
  *
  * Uses Catalyst's own `BloomFilterAggregate`/`BloomFilterMightContain`
  * (both codegen'd, both sides hashed with the same `xxhash64`), not a
  * Scala UDF — the probe filter stays inside whole-stage codegen.
  */
object BloomJoin {

  /** Distributed build: one binary bloom-filter sketch over `key` of
    * `build` (post-filter), merged across partitions. `expectedItems`
    * sizes the filter (overestimating costs bits, underestimating costs
    * false-positive rate). */
  def bloomFilterFor(build: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = GraftPlanBridge.column(
      new BloomFilterAggregate(new XxHash64(Seq(GraftPlanBridge.expression(key))),
        expectedItems).toAggregateExpression())
    build.select(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Probe-side predicate: true iff `key` MIGHT be in the sketch (no false
    * negatives). Codegen'd scalar expression over a literal binary. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftPlanBridge.column(BloomFilterMightContain(
      GraftPlanBridge.expression(lit(bloom)),
      new XxHash64(Seq(GraftPlanBridge.expression(key)))))

  /** `probe SEMI JOIN build ON probeKey = buildKey`, with the probe side
    * bloom-pruned before the join's shuffle. Exact result (false positives
    * removed by the join); the bloom is pure shuffle-volume reduction. */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    expectedItems: Long = 1000000L): DataFrame = {
    val bloom = bloomFilterFor(build, col(buildKey), expectedItems)
    probe.where(mightContain(bloom, col(probeKey)))
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
