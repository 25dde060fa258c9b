package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 connector for the reference's external-dataset boundary
  * (S2): `env.get_dataset()` (train_fawac_iql.py:56) downloads a DSRL
  * transition set and returns dict-of-arrays. In a Spark deployment that
  * boundary is a *connector*, not a driver-side download — the dataset
  * endpoint becomes a `TableProvider` whose scan plans one input split
  * per worker, so 1000 executors each pull their own slice and the
  * driver never materializes a row.
  *
  * This implementation generates the transitions from a closed form
  * (`TransitionGen.h`) instead of an HTTP endpoint — the container has
  * no egress — but the *connector machinery* is the real thing:
  *
  *   - split planning: `rows` divided into `splits` contiguous ranges,
  *     one `InputPartition` each (at 100 TB: splits = cluster width);
  *   - column pruning (`SupportsPushDownRequiredColumns`): a query over
  *     2 of the 8 columns generates 2 columns;
  *   - filter pushdown (`SupportsPushDownFilters`): range predicates on
  *     the row id `i` narrow the generated interval *before* planning,
  *     so `WHERE i < 1000` on a trillion-row table plans only the
  *     1000-row prefix — the connector-side analogue of partition
  *     pruning;
  *   - limit pushdown (`SupportsPushDownLimit`): `LIMIT n` truncates the
  *     planned interval (valid because limit-without-order may return
  *     any n rows);
  *   - statistics (`SupportsReportStatistics`): post-pushdown row count
  *     and byte size, so Catalyst/AQE can size joins against the
  *     generated side correctly.
  *
  * The closed form uses only int64 arithmetic and division by 2^20
  * (exact in IEEE double), so a DuckDB `range()` oracle reproduces every
  * value bit-for-bit — the correctness gate covers the whole read path.
  *
  * Registered as `graft-transitions` via `DataSourceRegister`
  * (META-INF/services). Options: `rows` (table size, required),
  * `splits` (read parallelism, default 8).
  */
class TransitionGen extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-transitions"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TransitionGen.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val rows = java.lang.Long.parseLong(
      Option(properties.get("rows")).getOrElse(
        throw new IllegalArgumentException("graft-transitions requires option 'rows'")))
    val splits = Option(properties.get("splits")).map(_.toInt).getOrElse(8)
    require(rows >= 0, s"rows must be >= 0, got $rows")
    require(splits > 0, s"splits must be > 0, got $splits")
    new TransitionTable(rows, splits)
  }
}

object TransitionGen {
  /** Episode length: `done` fires every 100th step (the d4rl-style
    * episode terminal the reference's buffer reconstructs). */
  val EpisodeLen = 100L

  private val Knuth = 2654435761L // Fibonacci-hash multiplier
  private val Denom = 1L << 20    // 2^20: division is exact in double

  /** Closed-form column value: ((i+salt)·2654435761 mod 2^20) / 2^20.
    * Integer-exact for i+salt < 2^42; the quotient is a dyadic rational
    * with a 20-bit numerator, hence bit-exact in any IEEE engine. */
  def h(i: Long, salt: Long): Double =
    (((i + salt) * Knuth) % Denom).toDouble / Denom.toDouble

  val schema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("episode", LongType, nullable = false),
    StructField("step", LongType, nullable = false),
    StructField("obs", DoubleType, nullable = false),
    StructField("action", DoubleType, nullable = false),
    StructField("reward", DoubleType, nullable = false),
    StructField("cost", DoubleType, nullable = false),
    StructField("done", DoubleType, nullable = false)))

  /** Column generator by field name, shared by every reader. */
  def value(field: String, i: Long): Any = field match {
    case "i"       => i
    case "episode" => i / EpisodeLen
    case "step"    => i % EpisodeLen
    case "obs"     => h(i, 0L)
    case "action"  => h(i, 1L)
    case "reward"  => h(i, 2L)
    case "cost"    => h(i, 3L)
    case "done"    => if (i % EpisodeLen == EpisodeLen - 1) 1.0 else 0.0
  }

  /** The DuckDB-SQL rendering of the same closed forms, for oracle
    * authoring (kept adjacent to `value` so they can only drift
    * together). `i` ranges over `range(lo, hi)`. */
  val oracleForms: Map[String, String] = Map(
    "episode" -> "(i // 100)",
    "step"    -> "(i % 100)",
    "obs"     -> "((((i + 0) * 2654435761) % 1048576) / 1048576.0)",
    "action"  -> "((((i + 1) * 2654435761) % 1048576) / 1048576.0)",
    "reward"  -> "((((i + 2) * 2654435761) % 1048576) / 1048576.0)",
    "cost"    -> "((((i + 3) * 2654435761) % 1048576) / 1048576.0)",
    "done"    -> "(CASE WHEN i % 100 = 99 THEN 1.0 ELSE 0.0 END)")
}

private[sources] class TransitionTable(rows: Long, splits: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_transitions($rows)"
  override def schema(): StructType = TransitionGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TransitionScanBuilder(rows, splits)
}

/** Pushdown state: Spark calls pushFilters → pushLimit → pruneColumns,
  * each narrowing what `build()` plans. */
private[sources] class TransitionScanBuilder(rows: Long, splits: Int)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TransitionGen.schema
  private var aggPushed: Option[Aggregation] = None

  /** Accept range/equality predicates on `i` (narrowing [lo, hi)) and
    * IsNotNull on any column (vacuous: the generator never emits null).
    * Everything else stays a post-scan filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("i", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("i", v: Long)        => lo = math.max(lo, v + 1); true
      case LessThan("i", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("i", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("i", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull(_)                     => true
      case _                                => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Limit-without-order may return any n rows; the i-prefix is a valid
    * choice, so the planned interval truncates. Returning true lets
    * Spark drop its own limit when the scan is the whole query. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.addExact(lo, limit.toLong))
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Ungrouped count(*) / min(i) / max(i) are closed forms of the
    * (already filter-narrowed) interval: count = hi−lo, min = lo,
    * max = hi−1. Complete pushdown — the scan emits ONE final row and
    * generates nothing, so `SELECT count(*) FROM t WHERE i < x` on a
    * trillion-row table costs the same as on a hundred-row one. Anything
    * that actually needs row content (grouping, other columns, sums)
    * declines, and Spark aggregates the generated rows as usual. */
  private def closedForm(agg: Aggregation): Boolean = {
    def isI(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference => r.fieldNames.sameElements(Array("i"))
        case _ => false
      }
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min       => isI(m.column)
        case m: Max       => isI(m.column)
        case _            => false
      }
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = closedForm(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = closedForm(agg)
    if (ok) aggPushed = Some(agg)
    ok
  }

  override def build(): Scan = {
    val (l, h) = (math.max(lo, 0L), math.max(hi, lo))
    aggPushed match {
      case Some(agg) => new TransitionAggScan(l, h, agg, pushed)
      case None      => new TransitionScan(l, h, splits, required, pushed)
    }
  }
}

/** One-row scan answering a completely-pushed aggregation in closed form.
  * An empty interval yields SQL semantics for ungrouped aggregates over
  * zero rows: count = 0, min/max = null. */
private[sources] class TransitionAggScan(lo: Long, hi: Long, agg: Aggregation,
                                         pushed: Array[Filter])
  extends Scan with Batch {
  private val n = math.max(hi - lo, 0L)
  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i)            => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-transitions [$lo, $hi) PushedFilters: [${pushed.mkString(", ")}] " +
      s"PushedAggregates: [${agg.aggregateExpressions.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(TransitionPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => n
      case _: Min       => if (n == 0) null else lo
      case _: Max       => if (n == 0) null else hi - 1
      case other => throw new IllegalStateException(s"unpushable aggregate $other")
    }
    new SingleRowReaderFactory(values)
  }
}

private[sources] class SingleRowReaderFactory(values: Array[Any])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
}

private[sources] class TransitionScan(lo: Long, hi: Long, splits: Int,
                                      required: StructType, pushed: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-transitions [$lo, $hi) splits=$splits " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** Contiguous equal ranges — generation cost is uniform per row, so
    * equal ranges are balanced splits with zero shuffle. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val k = math.min(splits.toLong, n).toInt
    Array.tabulate(k) { s =>
      TransitionPartition(lo + n * s / k, lo + n * (s + 1) / k): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TransitionReaderFactory(required.fieldNames)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(hi - lo, 0L)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(n * 8L * math.max(required.size, 1))
  }
}

private[sources] case class TransitionPartition(start: Long, end: Long)
  extends InputPartition

private[sources] class TransitionReaderFactory(fields: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TransitionPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(
          fields.map(f => TransitionGen.value(f, i)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
