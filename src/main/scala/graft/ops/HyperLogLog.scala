package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (X5, Flajolet et al. 2007) in pure
  * declarative form — the third mergeable sketch beside Misra-Gries and
  * Count-Min, and the one every 100 TB cardinality dashboard runs on.
  *
  * The register table IS the sketch: `(group, bucket, m_j)` with
  * `m_j = max rank` — built by a groupBy MAX, so Spark's map-side
  * partial aggregation makes every partition's contribution a ≤ m-row
  * sketch and the shuffle carries sketches, never items (the same
  * partial-combine argument as Count-Min). Merging two sketches is the
  * same MAX — union cardinality costs one more groupBy, demonstrated by
  * [[unionRegisters]].
  *
  * Engine-exact by construction (unusual for HLL, deliberate here):
  *  - the item hash is the portable md5→60-bit integer every dedup op
  *    uses; bucket = low p bits, rank = leading-zero count of the next
  *    `window` bits via a generated integer comparison chain (no float
  *    log2, whose misrounding near powers of two would shift a register);
  *  - registers are integer maxes — order-free;
  *  - Σ 2^−m_j is a sum of ≤ 2^p dyadic rationals with exponents ≥
  *    −(window+1) — every partial sum is exactly representable, so even
  *    engine-ordered aggregation is bit-exact (no rounding needed);
  *  - only the small-range `m·ln(m/V)` branch touches a transcendental,
  *    rounded at the output.
  *
  * `window` bounds the measurable rank (register cap window+1): ranks
  * above it saturate, understating cardinalities ≳ 2^window per bucket —
  * far beyond any per-register load at the tested scales; production
  * would widen the window (the chain grows by one comparison per bit). */
object HyperLogLog {

  /** Portable 60-bit item hash (same form as Dedup.featureHash). */
  def itemHash(item: Column): Column =
    conv(substring(md5(item), 1, 15), 16, 10).cast("long")

  /** Leading-zero rank of the `window`-bit value `w` (1-based; w = 0 →
    * window + 1) as a generated integer comparison chain. */
  private def rankOf(w: Column, window: Int): Column = {
    // r-th position: w >= 2^(window − r) ⇔ exactly r−1 leading zeros at
    // the first satisfied r (coalesce picks the smallest)
    val chain = (1 to window).map(r =>
      when(w >= lit(1L << (window - r)), lit(r.toLong)))
    coalesce(chain :+ lit((window + 1).toLong): _*)
  }

  /** The sketch: per (group, bucket) max rank. Missing buckets (no item
    * hashed there) are implicit zeros, handled at estimate time. */
  def registers(df: DataFrame, groupCol: String, item: Column,
                p: Int = 8, window: Int = 20): DataFrame = {
    val m = 1L << p
    val h = itemHash(item)
    // bucket = low p bits; rank window = the NEXT `window` bits — all
    // integer shifts/mods (a float division of a 2^60 hash would lose
    // the low bits past double's 53-bit mantissa)
    df.select(col(groupCol), pmod(h, lit(m)).as("bucket"),
        rankOf(pmod(shiftright(h, p), lit(1L << window)), window).as("rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rank")).as("m_j"))
  }

  /** Merge sketches across groups into ONE union sketch (the HLL merge:
    * bucket-wise max) under a constant group label. */
  def unionRegisters(regs: DataFrame, groupCol: String,
                     label: String = "__all__"): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("m_j")).as("m_j"))
      .select(lit(label).as(groupCol), col("bucket"), col("m_j"))

  /** Cardinality estimate per group from a register table:
    * E = α_m·m²/Z with Z = (m − observed) + Σ 2^−m_j, small-range
    * corrected to m·ln(m/V) when E ≤ 2.5m and V (zero registers) > 0.
    * Output: (group, v_zero, estimate). */
  def estimate(regs: DataFrame, groupCol: String,
               p: Int = 8, roundDigits: Int = 4): DataFrame = {
    val m = (1L << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val s = math.pow(10.0, roundDigits)
    val agg = regs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("observed"),
      // 1/2^m_j via an exact integer shift — dyadic, order-free
      sum(lit(1.0) / expr("shiftleft(1L, CAST(m_j AS INT))")).as("zsum"))
    val v = lit(m) - col("observed").cast("double")
    val z = v + col("zsum")
    val raw = lit(alpha) * lit(m) * lit(m) / z
    val est = when(raw <= lit(2.5 * m) && v > 0, lit(m) * log(lit(m) / v))
      .otherwise(raw)
    agg.select(col(groupCol), v.cast("long").as("v_zero"),
      (floor(est * lit(s) + lit(0.5)) / lit(s)).as("estimate"))
  }
}
