package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Batch model inference as pure Catalyst expressions (SURVEY.md §2.2
  * P10: the reference's MLP actor/critic forward passes, fawac.py:112-231).
  *
  * A dense layer y = act(W·x + b) over an `array<double>` column is a
  * `transform` over the rows of W, each row a fused multiply-accumulate
  * (`zip_with` + `aggregate`). Weights are plan literals (the Spark
  * analogue of broadcasting frozen parameters to every executor), so the
  * whole forward pass codegens into the projection — no UDF, no shuffle,
  * and column pruning still reaches the scan.
  */
object ModelOps {

  private def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Fused w·x + b for one output unit. */
  def mac(x: Column, w: Seq[Double], b: Double): Column =
    aggregate(zip_with(x, litVec(w), (xi, wi) => xi * wi), lit(b), (acc, v) => acc + v)

  /** One dense layer: weights (outDim × inDim), biases (outDim),
    * activation applied per unit. Output is an array<double> column. */
  def denseLayer(x: Column, weights: Seq[Seq[Double]], biases: Seq[Double],
                 activation: Column => Column): Column =
    array(weights.zip(biases).map { case (w, b) => activation(mac(x, w, b)) }: _*)

  val relu: Column => Column = c => greatest(c, lit(0.0))
  val tanhAct: Column => Column = tanh
  val identityAct: Column => Column = c => c
  /** Softplus ln(1+eˣ) — the lagrangian head's output activation
    * (fawac.py:166-175: `output_activation_fn=nn.Softplus`). */
  val softplusAct: Column => Column = c => log(lit(1.0) + exp(c))

  /** Multi-layer forward pass; layers = (weights, biases, activation).
    * Mirrors reference MLP construction (fawac.py:112-144). */
  def mlp(x: Column, layers: Seq[(Seq[Seq[Double]], Seq[Double], Column => Column)]): Column =
    layers.foldLeft(x) { case (h, (w, b, act)) => denseLayer(h, w, b, act) }

  /** Deterministic pseudo-weights for tests/fixed-inference queries:
    * w(i,j) = ((3i + 5j) mod 13 − 6) / 10 — closed form both engines can
    * reproduce. */
  def pseudoWeights(outDim: Int, inDim: Int): Seq[Seq[Double]] =
    (0 until outDim).map(o => (0 until inDim).map(i => (((3 * o + 5 * i) % 13) - 6) / 10.0))

  /** Tanh-squashed actor head scaled by maxAction (fawac.py:146-157). */
  def actorHead(x: Column, weights: Seq[Seq[Double]], biases: Seq[Double],
                maxAction: Double): Column =
    transform(denseLayer(x, weights, biases, tanhAct), v => v * lit(maxAction))

  /** Deterministic pseudo-bias companion to [[pseudoWeights]]:
    * b(j) = ((5j) mod 7 − 3) / 10. */
  def pseudoBias(j: Column): Column =
    (((lit(5) * j) % 7) - lit(3)).cast("double") / lit(10.0)

  /** P10 at parameter-table scale: dense layer with weights read from a
    * TABLE (i, j, w) instead of plan literals — the shape needed when the
    * parameter count is too large to inline or when the weights are the
    * OUTPUT of the pipeline itself (the soft-update J3 writes exactly
    * this table). The distributed matmul: explode x to (row, i, x),
    * broadcast-join W on the input index, partial+final sum per
    * (row, j) — the input relation shuffles once on (row, j) carrying
    * one double per output unit, and W (params ≪ data) broadcasts.
    * Output: (idCol, j, h) with h = act(Σ_i x_i·w_ij + bias(j)). */
  def denseLayerFromTable(xs: org.apache.spark.sql.DataFrame, idCol: String,
                          vecCol: String, weights: org.apache.spark.sql.DataFrame,
                          bias: Column => Column,
                          activation: Column => Column): org.apache.spark.sql.DataFrame = {
    val x = xs.select(col(idCol), posexplode(col(vecCol).cast("array<double>")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
    denseLayerFromKV(x, idCol, weights, bias, activation)
  }

  /** One table-driven layer over input ALREADY in the (id, i, x) activation
    * -table shape — the chaining form: layer k's (id, j, h) output renames
    * to (id, i, x) and feeds layer k+1. Weight tables stay broadcast
    * (params ≪ data); each layer is one shuffle of the activation table on
    * (id, j), carrying one double per (row, unit). */
  def denseLayerFromKV(xs: org.apache.spark.sql.DataFrame, idCol: String,
                       weights: org.apache.spark.sql.DataFrame,
                       bias: Column => Column,
                       activation: Column => Column): org.apache.spark.sql.DataFrame =
    xs.join(broadcast(weights), "i")
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("x") * col("w")).as("__s"))
      .select(col(idCol), col("j"),
        activation(col("__s") + bias(col("j"))).as("h"))

  /** P10 multi-layer table-driven inference: the production shape of the
    * reference's 2-hidden-layer nets (fawac.py:112-144 builds
    * Linear→ReLU→Linear→ReLU→Linear; weights live in state_dict tables,
    * not literals). Layers = (weightTable(i, j, w), bias, activation,
    * roundDigits): each layer's activations are rounded before feeding the
    * next so partial-sum ordering differences cannot compound across
    * layers — the engine-parity analogue of per-layer quantization.
    * Input: (idCol, vecCol array); output: (idCol, j, h) of the last layer. */
  def mlpFromTables(xs: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
                    layers: Seq[(org.apache.spark.sql.DataFrame, Column => Column,
                                 Column => Column, Int)]): org.apache.spark.sql.DataFrame = {
    require(layers.nonEmpty, "mlpFromTables needs at least one layer")
    val (w0, b0, act0, d0) = layers.head
    val first = denseLayerFromTable(xs, idCol, vecCol, w0, b0, act0)
      .select(col(idCol), col("j"), round(col("h"), d0).as("h"))
    layers.tail.foldLeft(first) { case (prev, (wk, bk, actk, dk)) =>
      val asInput = prev.select(col(idCol), col("j").as("i"), col("h").as("x"))
      denseLayerFromKV(asInput, idCol, wk, bk, actk)
        .select(col(idCol), col("j"), round(col("h"), dk).as("h"))
    }
  }
}
