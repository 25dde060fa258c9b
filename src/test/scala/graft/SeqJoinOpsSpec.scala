package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Window/sequence + join/sample operators vs the literal reference
  * recurrences computed in plain Scala. */
class SeqJoinOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Literal reference recurrence (fawac.py:88-96). */
  private def discountedCumsumRef(xs: Seq[Double], gamma: Double): Seq[Double] =
    xs.foldRight(List.empty[Double]) {
      case (x, Nil) => List(x)
      case (x, acc) => (x + gamma * acc.head) :: acc
    }

  test("W1 discounted reverse cumsum matches fawac.py:88-96 recurrence") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("ep", "t", "x")
    val got = SeqOps.discountedReturn(df, "ep", Seq(col("t")), col("x"), 0.99, "ret")
      .orderBy("t").select("ret").as[Double].collect().toSeq
    val want = discountedCumsumRef(xs, 0.99)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9, s"$g vs $w") }
  }

  test("W1: gamma=0 is identity") {
    val df = Seq((1L, 0L, 7.0), (1L, 1L, 9.0)).toDF("ep", "t", "x")
    val got = SeqOps.discountedReturn(df, "ep", Seq(col("t")), col("x"), 0.0, "ret")
      .orderBy("t").select("ret").as[Double].collect().toSeq
    assert(got == Seq(7.0, 9.0))
  }

  test("W2 EMA matches notebook recurrence s_i = a*s + (1-a)*x (make_plots cell 5)") {
    val xs = Seq(10.0, 20.0, 30.0, 40.0)
    val want = xs.tail.foldLeft(xs.head)((s, x) => 0.5 * s + 0.5 * x)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }.toDF("k", "t", "v")
    val got = SeqOps.emaFinal(df, "k", Seq("t"), "v", 0.5, "ema")
      .select("ema").as[Double].head()
    assert(got == want) // bit-exact: same fold
  }

  test("W2 EMA: single element is identity") {
    val df = Seq((1L, 0L, 42.0)).toDF("k", "t", "v")
    assert(SeqOps.emaFinal(df, "k", Seq("t"), "v", 0.5, "ema")
      .select("ema").as[Double].head() == 42.0)
  }

  test("W3 session accumulation with length cap (fawac.py:597-611)") {
    val df = (0 until 5).map(i => (1L, i.toLong, 1.0)).toDF("ep", "t", "v")
    val capped = SeqOps.sessionAgg(df, "ep", Seq(col("t")), col("v"), lengthCap = Some(3))
    val row = capped.select("session_sum", "session_len").as[(Double, Long)].head()
    assert(row == ((3.0, 3L)))
  }

  test("W4 best-so-far tie-break: lowest cost then highest reward (train_fawac_iql.py:153)") {
    val df = Seq((1L, 10.0, 5.0), (2L, 10.0, 9.0), (3L, 12.0, 99.0)).toDF("id", "cost", "ret")
    val best = SeqOps.bestPerKey(df.withColumn("g", lit(1)), Seq("g"),
      Seq(col("cost").asc, col("ret").desc))
    assert(best.select("id").as[Long].head() == 2L)
  }

  test("W4 feasible-best: best reward under cost limit (train_fawac_iql.py:157)") {
    val df = Seq((1L, 30.0, 100.0), (2L, 10.0, 50.0), (3L, 15.0, 80.0)).toDF("id", "cost", "ret")
    val got = SeqOps.feasibleBest(df, col("cost"), 20.0, Seq(col("ret").desc, col("id").asc))
    assert(got.select("id").as[Long].head() == 3L)
  }

  test("J1 deterministic sample keeps pk ≡ 0 (mod m)") {
    val df = (0L until 100L).toDF("pk")
    val got = JoinOps.deterministicSample(df, col("pk"), 10).as[Long].collect().toSet
    assert(got == (0L until 100L by 10L).toSet)
  }

  test("J2 TD target: r + (1-done)·γ·V(s') with terminal bootstrap 0 (fawac.py:366)") {
    val df = Seq((1L, 0L, 1.0, 0.0, 10.0), (1L, 1L, 2.0, 0.0, 20.0), (1L, 2L, 3.0, 1.0, 30.0))
      .toDF("ep", "t", "r", "done", "v")
    val got = JoinOps.tdTarget(df, "ep", Seq(col("t")), col("r"), col("done"), col("v"),
      0.5, "td").orderBy("t").select("td").as[Double].collect().toSeq
    assert(got == Seq(1.0 + 0.5 * 20.0, 2.0 + 0.5 * 30.0, 3.0)) // last: (1-1)·γ·0
  }

  test("custom as-of join: match, staleness reset, and no-match null") {
    // left: (key, time); right: (key, time, tag)
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (3L, 50L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 9L, 100L), (1L, 20L, 200L), (2L, 6L, 300L))
      .toDF("rk", "rt", "rv")
    val got = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt")
      .select(col("tag"), col("rv")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got("a") == 100L) // 9 <= 10, latest
    assert(got("b") == 200L) // 20 <= 25 supersedes 9
    assert(got("c") == -1L)  // right time 6 > 5 → no match
    assert(got("d") == -1L)  // key 3 absent → stale key-2 match must not leak
  }

  test("custom as-of join: equal timestamps match inclusively") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 7L)).toDF("rk", "rt", "rv")
    val got = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt")
      .select(col("rv")).as[Long].head()
    assert(got == 7L)
  }

  test("J3 soft update: target==source is a fixpoint (fawac.py:15-17)") {
    val t = Seq((1L, Seq(1.0, 2.0))).toDF("k", "vec")
    val got = JoinOps.softUpdate(t, t.withColumnRenamed("vec", "vec"), "k", "vec", 0.005, "u")
      .select("u").as[Seq[Double]].head()
    assert(got == Seq(1.0, 2.0))
  }

  test("J3 soft update: hand-computed blend") {
    val t = Seq((1L, Seq(0.0))).toDF("k", "vec")
    val s = Seq((1L, Seq(100.0))).toDF("k", "vec")
    val got = JoinOps.softUpdate(t, s, "k", "vec", 0.005, "u")
      .select("u").as[Seq[Double]].head()
    assert(math.abs(got.head - 0.5) < 1e-12)
  }
}
