package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar / projection operators (SURVEY.md §2.2, P1–P11).
  *
  * Every op is a pure `Column => Column` builder over built-in
  * `org.apache.spark.sql.functions` — all codegen'd by Catalyst, no UDFs.
  * That keeps the whole projection inside one WholeStageCodegen span and
  * lets predicate pushdown / column pruning see through them, which is the
  * property that matters at 100 TB (a UDF here would be an optimization
  * barrier on every row of the scan).
  */
object CoreOps {

  /** P1 — ingest-time scalar scaling (reference fawac.py:66-67). */
  def scaled(c: Column, k: Double): Column = c * lit(k)

  /** P2 — boolean OR materialized as a 0/1 double
    * (reference fawac.py:69: `dones = terminals + timeouts`). */
  def boolOrAsDouble(a: Column, b: Column): Column =
    (a.cast("boolean") || b.cast("boolean")).cast("double")

  /** P3 — clamp family (reference fawac.py:175,213,231,384,386,446,532). */
  def clampMin(c: Column, lo: Double = 0.0): Column = greatest(c, lit(lo))
  def clampMax(c: Column, hi: Double): Column       = least(c, lit(hi))
  def clamp(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** P4 — twin-critic pessimism: reward Q = min of heads, cost Q =
    * max of heads clamped at 0 (reference fawac.py:203-213). */
  def twinRewardQ(q1: Column, q2: Column): Column = least(q1, q2)
  def twinCostQ(q1: Column, q2: Column): Column   = clampMin(greatest(q1, q2))

  /** P5 — exponential advantage weight, capped
    * (reference fawac.py:446: `exp(β·adv).clamp(max=cap)`). */
  def expAdvantage(adv: Column, beta: Double, cap: Double): Column =
    least(exp(lit(beta) * adv), lit(cap))

  /** P6 — indicator predicate as 0/1 double (reference fawac.py:100,390-391). */
  def indicator(cond: Column): Column = when(cond, 1.0).otherwise(0.0)

  /** P6 — safety mask: both cost value and cost Q under threshold
    * (reference fawac.py:390-391, θ = safe_qc_vc_threshold). */
  def safetyMask(costV: Column, costQ: Column, theta: Double): Column =
    indicator(costV < lit(theta)) * indicator(costQ < lit(theta))

  /** P6 — penalty gate: λ = maxLag when violation positive else 0
    * (reference fawac.py:440). */
  def penaltyGate(costV: Column, costThresh: Double, maxLag: Double): Column =
    indicator(costV - lit(costThresh) > lit(0.0)) * lit(maxLag)

  /** P11 — penalized net advantage (reference fawac.py:436-446;
    * costAdv arrives already negated per fawac.py:387). */
  def netAdvantage(rewAdv: Column, costAdv: Column, lag: Column): Column =
    rewAdv + lag * costAdv

  /** Derived constant — cost threshold = limit·γ^steps (reference fawac.py:338).
    * Catalyst constant-folds this at plan time. */
  def costThreshold(costLimit: Double, gamma: Double, planningSteps: Double): Double =
    costLimit * math.pow(gamma, planningSteps)

  // ---- array/vector math (P7, P8, P10; also the X2 similarity kernels) ----
  // Higher-order functions (`zip_with`/`aggregate`/`transform`) evaluate
  // per-row without shuffles and without serialization boundaries; at scale
  // they beat UDFs because the lambda is a Catalyst expression tree.

  /** P7 — vector concatenation (reference fawac.py:206 `cat([s, a], dim=1)`). */
  def concatVec(a: Column, b: Column): Column = concat(a, b)

  /** Row-wise sum of an array<double>. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** P8 — squared residual, summed across the vector dimension
    * (reference fawac.py:449: `Σ_dim (π(s) − a)²`). */
  def squaredResidualSum(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => (x - y) * (x - y)))

  /** X2 kernel — dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** X2 kernel — Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** X2 kernel — cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** P10 — one fixed dense layer + ReLU over a vector column: the
    * SQL-expressible core of MLP inference (reference fawac.py:112-144).
    * Weight w_i is a deterministic function of the index so the DuckDB
    * oracle can reproduce it exactly: w_i = ((i mod 7) - 3) / 10.
    * Full multi-layer inference with learned weights goes through
    * [[graft.ops.ModelOps]] (broadcast parameter table). */
  def linearReluFixed(x: Column, bias: Double): Column = {
    val weighted = zip_with(
      x,
      transform(x, (_, i) => ((i % 7).cast("double") - lit(3.0)) / lit(10.0)),
      (v, w) => v * w)
    clampMin(aggregate(weighted, lit(bias), (acc, v) => acc + v))
  }

  /** Z-order (Morton) sort key over N dimensions: interleave the low
    * `bits` bits of each dimension value (dimension j contributes bit i
    * at key position `i*N + j`), so sorting by the key clusters rows
    * that are close in ALL dimensions. Sorting a table by this key
    * before a parquet write gives every file/row-group tight min/max
    * ranges on every dimension simultaneously — range predicates on any
    * dimension then prune files at the scan, which a single-column sort
    * only provides for its leading column. This is the layout technique
    * multi-dimensional data skipping (Delta/Iceberg Z-ordering) is built
    * on — real lakehouse Z-ordering is typically 2–4 dims; here it is a
    * plain exact-integer expression (N·bits shift/mask terms),
    * reproducible bit-for-bit in any engine.
    *
    * Each dimension is masked to its low `bits` bits first, so the
    * truncation behavior is explicit: values ≥ 2^bits wrap (only the
    * low bits place the row — callers should bucket, e.g. `pmod`,
    * before keying), and negative values key by their two's-complement
    * low bits. Within the masked domain [0, 2^bits) per dimension the
    * key is invertible (distinct tuples → distinct keys). */
  def mortonKeyN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and dims*bits <= 63, got $n*$bits")
    val mask = lit((1L << bits) - 1)
    val masked = dims.map(_.cast("long").bitwiseAND(mask))
    (0 until bits).flatMap { i =>
      masked.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ + _)
  }

  /** 2-D convenience form of [[mortonKeyN]] (x at even key bits, y at
    * odd), kept for the common latitude/longitude-style case. */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column =
    mortonKeyN(Seq(x, y), bits)
}
