package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops._

/** Property-based checks (SURVEY.md §5.3) via scalacheck over the pure
  * recurrence forms — invariants the Spark expressions must encode. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val smallD = Gen.choose(-100.0, 100.0)

  test("clamp is idempotent and bounded") {
    check(Prop.forAll(smallD) { x =>
      val c = math.min(math.max(x, 0.0), 1.0)
      c >= 0.0 && c <= 1.0 && math.min(math.max(c, 0.0), 1.0) == c
    })
  }

  test("EMA stays within [min, max] of the series") {
    check(Prop.forAll(Gen.nonEmptyListOf(smallD)) { xs =>
      val ema = xs.tail.foldLeft(xs.head)((s, x) => 0.5 * s + 0.5 * x)
      ema >= xs.min - 1e-9 && ema <= xs.max + 1e-9
    })
  }

  test("discounted cumsum is linear in the input") {
    check(Prop.forAll(Gen.listOfN(5, smallD), Gen.choose(0.0, 1.0)) { (xs, g) =>
      def cumsum(v: Seq[Double]) = v.foldRight(List.empty[Double]) {
        case (x, Nil) => List(x)
        case (x, acc) => (x + g * acc.head) :: acc
      }
      cumsum(xs.map(_ * 2.0)).zip(cumsum(xs))
        .forall { case (a, b) => math.abs(a - 2 * b) < 1e-6 }
    })
  }

  test("soft update moves toward source; fixpoint at equality") {
    check(Prop.forAll(smallD, smallD) { (t, s) =>
      val u = 0.995 * t + 0.005 * s
      math.abs(u - s) <= math.abs(t - s) + 1e-12 &&
        math.abs((0.995 * t + 0.005 * t) - t) < 1e-9
    })
  }

  test("expectile(0.5) equals half MSE for any sample") {
    check(Prop.forAll(Gen.nonEmptyListOf(smallD)) { us =>
      val expectile = us.map(u => math.abs(0.5 - (if (u < 0) 1.0 else 0.0)) * u * u).sum / us.size
      val halfMse = us.map(u => u * u).sum / us.size / 2.0
      math.abs(expectile - halfMse) < 1e-6
    })
  }

  test("minhash universal hash stays in [0, P) for any token id") {
    check(Prop.forAll(Gen.choose(0L, 10000000L), Gen.choose(0, 31)) { (id, j) =>
      val h = (Dedup.minhashA(j) * id + Dedup.minhashB(j)) % Dedup.MinhashP
      h >= 0 && h < Dedup.MinhashP
    })
  }
}
