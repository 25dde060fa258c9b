package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Unit tests for scalar/aggregate ops against hand-computed values
  * (SURVEY.md §5.2) — each mirrors the literal reference semantics. */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("clamp family matches torch.clamp semantics (fawac.py:175,213)") {
    val df = Seq(-2.0, 0.0, 0.5, 3.0).toDF("x")
    val got = df.select(
      CoreOps.clampMin(col("x")).as("lo"),
      CoreOps.clampMax(col("x"), 1.0).as("hi"),
      CoreOps.clamp(col("x"), 0.0, 1.0).as("both")).as[(Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq((0.0, -2.0, 0.0), (0.0, 0.0, 0.0), (0.5, 0.5, 0.5), (3.0, 1.0, 1.0)))
  }

  test("twin critic: reward pessimism = min, cost conservatism = clamped max (fawac.py:203-213)") {
    val df = Seq((1.0, 2.0), (-3.0, -1.0)).toDF("q1", "q2")
    val got = df.select(
      CoreOps.twinRewardQ(col("q1"), col("q2")),
      CoreOps.twinCostQ(col("q1"), col("q2"))).as[(Double, Double)].collect().toSeq
    assert(got == Seq((1.0, 2.0), (-3.0, 0.0)))
  }

  test("exponential advantage weight caps at exp_adv_max (fawac.py:446)") {
    val df = Seq(0.0, 1.0, 10.0).toDF("adv")
    val got = df.select(CoreOps.expAdvantage(col("adv"), 2.0, 100.0))
      .as[Double].collect().toSeq
    assert(got(0) == 1.0 && math.abs(got(1) - math.exp(2.0)) < 1e-12 && got(2) == 100.0)
  }

  test("expectile loss: tau=0.5 is half of MSE (asymmetric_l2_loss, fawac.py:99-100)") {
    val u = Seq(-2.0, -1.0, 0.5, 3.0)
    val df = u.toDF("u")
    val expectile = df.select(AggOps.expectileLoss(col("u"), 0.5)).as[Double].head()
    val halfMse = u.map(x => x * x).sum / u.size / 2.0
    assert(math.abs(expectile - halfMse) < 1e-12)
  }

  test("expectile loss: tau=0.7 hand-computed") {
    val df = Seq(-1.0, 2.0).toDF("u")
    // |0.7-1|*1 = 0.3, |0.7-0|*4 = 2.8 → mean 1.55
    val got = df.select(AggOps.expectileLoss(col("u"), 0.7)).as[Double].head()
    assert(math.abs(got - 1.55) < 1e-12)
  }

  test("lower median matches torch.median (lower of two middles)") {
    val even = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val odd = Seq(5.0, 1.0, 3.0).toDF("x")
    assert(even.select(AggOps.lowerMedian(col("x"))).as[Double].head() == 2.0)
    assert(odd.select(AggOps.lowerMedian(col("x"))).as[Double].head() == 3.0)
  }

  test("table-weights dense layer matches the literal-weights layer") {
    val xs = Seq((1L, Seq(0.5, -1.0, 2.0)), (2L, Seq(1.0, 0.0, -0.5)))
      .toDF("vec_id", "embedding")
    val inDim = 3; val outDim = 2
    val wTable = spark.range(outDim.toLong * inDim).select(
      (col("id") % inDim).as("i"), expr(s"id div $inDim").as("j"),
      ((((lit(3) * expr(s"id div $inDim") + lit(5) * (col("id") % inDim)) % 13) - lit(6))
        .cast("double") / lit(10.0)).as("w"))
    val got = ModelOps.denseLayerFromTable(xs, "vec_id", "embedding",
      wTable, ModelOps.pseudoBias, ModelOps.relu)
      .select("vec_id", "j", "h").as[(Long, Long, Double)].collect()
      .map { case (id, j, h) => (id, j) -> h }.toMap
    val ws = ModelOps.pseudoWeights(outDim, inDim)
    val bs = (0 until outDim).map(j => ((5 * j) % 7 - 3) / 10.0)
    val want = xs.select(col("vec_id"),
      ModelOps.denseLayer(col("embedding"), ws, bs, ModelOps.relu).as("h"))
      .as[(Long, Seq[Double])].collect()
      .flatMap { case (id, hs) => hs.zipWithIndex.map { case (h, j) => (id, j.toLong) -> h } }
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}") }
  }

  test("histogram median equals array-sort lower median per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 9.0),
      ("b", 5.0), ("b", 1.0), ("b", 3.0)).toDF("g", "x")
    val hist = AggOps.exactMedianByValue(df, Seq("g"), "x", "m")
      .as[(String, Double)].collect().toMap
    val arr = df.groupBy(col("g")).agg(AggOps.lowerMedian(col("x")).as("m"))
      .as[(String, Double)].collect().toMap
    assert(hist == arr)
    assert(hist == Map("a" -> 2.0, "b" -> 3.0))
  }

  test("squared residual sum over vector dim (fawac.py:449)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(0.0, 2.0, 5.0))).toDF("a", "b")
    val got = df.select(CoreOps.squaredResidualSum(col("a"), col("b"))).as[Double].head()
    assert(got == 1.0 + 0.0 + 4.0)
  }

  test("cosine similarity: parallel=1, orthogonal=0") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(2.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 5.0))).toDF("a", "b")
    val got = df.select(CoreOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(1)) < 1e-12)
  }

  test("MLP dense layer: hand-computed ReLU unit (fawac.py:112-144)") {
    val df = Seq(Seq(1.0, -2.0)).toDF("x")
    // w = [[1, 1], [3, 1]], b = [0.5, 0.5] → pre-act [-0.5, 1.5] → relu [0, 1.5]
    val y = ModelOps.denseLayer(col("x"), Seq(Seq(1.0, 1.0), Seq(3.0, 1.0)),
      Seq(0.5, 0.5), ModelOps.relu)
    assert(df.select(y).as[Seq[Double]].head() == Seq(0.0, 1.5))
  }

  test("safety mask and penalty gate (fawac.py:390-391,440)") {
    val df = Seq((0.01, 0.01), (0.03, 0.01), (0.01, 0.03)).toDF("v", "q")
    val got = df.select(CoreOps.safetyMask(col("v"), col("q"), 0.02)).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, 0.0))
    val gate = Seq(0.3, 0.4).toDF("vc")
      .select(CoreOps.penaltyGate(col("vc"), 0.366, 20.0)).as[Double].collect().toSeq
    assert(gate == Seq(0.0, 20.0))
  }

  test("ExpectileAggregator (typed UDAF) matches the expression form") {
    val us = Seq(-2.0, -1.0, 0.5, 3.0, 7.5)
    val viaExpr = us.toDF("u").select(AggOps.expectileLoss(col("u"), 0.7)).as[Double].head()
    val viaAgg = us.toDS().select(new ExpectileAggregator(0.7).toColumn).head()
    assert(math.abs(viaExpr - viaAgg) < 1e-12)
  }
}
