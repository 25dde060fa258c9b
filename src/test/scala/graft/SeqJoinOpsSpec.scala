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

  test("as-of forward: earliest at-or-after, null when no later row") {
    val left = Seq((1L, 10L, "early"), (1L, 25L, "late"), (2L, 5L, "lone"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 50L), (1L, 12L, 120L), (1L, 20L, 200L))
      .toDF("rk", "rt", "rv")
    val got = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt", direction = "forward")
      .select(col("tag"), col("rv")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got("early") == 120L) // 12 is the first rt >= 10 (5 skipped)
    assert(got("late") == -1L)   // nothing at-or-after 25
    assert(got("lone") == -1L)   // key 2 has no right rows at all
  }

  test("as-of forward: equal-time duplicates match the FIRST right row (pandas parity)") {
    // The sort emits the two rt==t rows in SOME fixed order; backward must
    // return the one emitted last, forward the one emitted first — so with
    // two distinct payloads the directions must disagree, whichever order
    // the sort picked.
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L), (1L, 10L, 2L)).toDF("rk", "rt", "rv")
    val back = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt")
      .select(col("rv")).as[Long].head()
    val fwd = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt", direction = "forward")
      .select(col("rv")).as[Long].head()
    assert(Set(back, fwd) == Set(1L, 2L), s"back=$back fwd=$fwd")
    assert(back != fwd, "forward must take the first equal-time row, backward the last")
  }

  test("as-of nearest: closer side wins, equidistant tie breaks backward") {
    val left = Seq((1L, 10L, "fwd_closer"), (2L, 10L, "tie"),
      (3L, 10L, "only_fwd"), (4L, 10L, "only_back")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 7L, 70L), (1L, 12L, 120L),   // |3| vs |2| → forward
      (2L, 8L, 80L), (2L, 12L, 121L),   // |2| vs |2| → backward
      (3L, 15L, 150L),                  // forward only
      (4L, 2L, 20L)                     // backward only
    ).toDF("rk", "rt", "rv")
    val got = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt", direction = "nearest")
      .select(col("tag"), col("rv")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("fwd_closer" -> 120L, "tie" -> 80L,
      "only_fwd" -> 150L, "only_back" -> 20L))
  }

  test("as-of tolerance: inclusive at the bound, null beyond it, per direction") {
    val left = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("k", "t")
    val right = Seq(
      (1L, 7L, 70L),   // delta 3 == tol → inclusive match
      (2L, 5L, 50L),   // delta 5 > tol → null
      (3L, 14L, 140L)  // forward delta 4 > tol → null forward
    ).toDF("rk", "rt", "rv")
    def run(dir: String) = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt",
      direction = dir, tolerance = Some(3L))
      .select(col("k"), col("rv")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val back = run("backward")
    assert(back == Map(1L -> 70L, 2L -> -1L, 3L -> -1L))
    val fwd = run("forward")
    assert(fwd == Map(1L -> -1L, 2L -> -1L, 3L -> -1L)) // 14 is 4 past 10
    val near = run("nearest")
    assert(near == Map(1L -> 70L, 2L -> -1L, 3L -> -1L))
  }

  test("as-of nearest: only within-tolerance candidates compete") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 4L, 40L), (1L, 15L, 150L)).toDF("rk", "rt", "rv")
    // |10-4|=6 out of tol 5, |15-10|=5 in → nearest returns the forward row
    val got = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt",
      direction = "nearest", tolerance = Some(5L))
      .select(col("rv")).as[Long].head()
    assert(got == 150L)
  }

  test("as-of join on string keys") {
    val left = Seq(("a", 10L), ("b", 5L), ("é", 7L)).toDF("k", "t")
    val right = Seq(("a", 9L, 1L), ("b", 7L, 2L), ("é", 6L, 3L)).toDF("rk", "rt", "rv")
    val got = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt")
      .select(col("k"), col("rv")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map("a" -> 1L, "b" -> -1L, "é" -> 3L))
  }

  test("as-of join on timestamp time columns keeps microsecond precision") {
    // two right rows 1 µs apart around the left time — a seconds-truncating
    // CAST would see all three as equal and pick the wrong row
    val left = Seq((1L, 10_000_001L)).toDF("k", "us")
      .select(col("k"), expr("timestamp_micros(us)").as("t"))
    val right = Seq((1L, 10_000_000L, 100L), (1L, 10_000_002L, 200L))
      .toDF("rk", "rus", "rv")
      .select(col("rk"), expr("timestamp_micros(rus)").as("rt"), col("rv"))
    val back = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt")
      .select(col("rv")).as[Long].head()
    assert(back == 100L)
    val fwd = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt", direction = "forward")
      .select(col("rv")).as[Long].head()
    assert(fwd == 200L)
    // tolerance is in the time column's native unit (µs here): 1 µs reaches
    // the neighbours, 0 µs reaches nothing
    val tight = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt",
      direction = "nearest", tolerance = Some(0L))
    assert(tight.select(col("rv")).collect().head.isNullAt(0))
  }

  test("as-of join on date time columns (day granularity)") {
    val left = Seq((1L, "2024-03-10")).toDF("k", "d")
      .select(col("k"), to_date(col("d")).as("t"))
    val right = Seq((1L, "2024-03-08", 8L), (1L, "2024-03-11", 11L))
      .toDF("rk", "rd", "rv")
      .select(col("rk"), to_date(col("rd")).as("rt"), col("rv"))
    val back = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt")
      .select(col("rv")).as[Long].head()
    assert(back == 8L)
    // tolerance in DAYS (DateType's native unit): 1 day excludes the
    // 2-day-old backward row but admits the 1-day-ahead forward row
    val near = JoinOps.asOfJoin(left, right, "k", "rk", "t", "rt",
      direction = "nearest", tolerance = Some(1L))
      .select(col("rv")).as[Long].head()
    assert(near == 11L)
  }

  test("as-of direction parse rejects junk, accepts any-case names") {
    intercept[IllegalArgumentException] {
      graft.plans.AsOfDirection.parse("sideways")
    }
    assert(graft.plans.AsOfDirection.parse("FORWARD") == graft.plans.AsOfDirection.Forward)
    assert(graft.plans.AsOfDirection.parse("Nearest") == graft.plans.AsOfDirection.Nearest)
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
