package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X5 heavy hitters — the Misra–Gries frequent-items sketch as a typed,
  * MERGEABLE `Aggregator`, the distributed path for "top tokens / top
  * domains over 100 TB" where an exact groupBy would shuffle the whole
  * key universe. Spark's own `stat.freqItems` is per-batch and returns no
  * counts; this is the aggregate-function form, so it composes with
  * `groupBy` (heavy hitters per source/shard) and plans as partial +
  * final aggregation like any built-in — each executor keeps at most
  * `capacity` entries and the shuffle carries one sketch per partition,
  * never the corpus.
  *
  * Guarantees (classic MG): every true count is undercounted by at most
  * N/(capacity+1); any key with frequency above that bound survives.
  * Merging uses the Agarwal et al. (PODS'12) mergeable-summaries rule —
  * pointwise sum, then subtract the (capacity+1)-th largest count and
  * drop non-positives — which preserves the error bound under arbitrary
  * merge trees, exactly what a partial-aggregation plan produces.
  *
  * Exact regime: with ≤ `capacity` distinct keys no decrement ever fires,
  * so counts are exact and merge-order-independent — the property the
  * oracle query relies on (31-token corpus vocabulary, capacity 64). At
  * 100 TB a capacity in the millions is still executor-resident (~tens of
  * MB), covering any realistic "top domains / top tokens" question.
  *
  * Output: entries sorted by (count desc, key asc) — deterministic in the
  * exact regime, stable tie order always.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)                   => b.updated(x, c + 1)
      case None if b.size < capacity => b.updated(x, 1L)
      case None => // full and new key: decrement-all, drop zeros
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, c) => if (c - cut > 0) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
