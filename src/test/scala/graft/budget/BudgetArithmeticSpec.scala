package graft.budget

import org.scalatest.funsuite.AnyFunSuite

/** Budget operator parity with the reference's parameterized tables
  * (test/unit/test_privacy_budget.py:472-970): division and multiplication
  * by scalars, basic-composition addition (with PureDP/ApproxDP promotion),
  * and subtraction, including the infinite-budget absorption rules.
  */
class BudgetArithmeticSpec extends AnyFunSuite {

  private val inf = Double.PositiveInfinity

  test("division scales every parameter (test_budget_division)") {
    assert(PureDPBudget(1.0) / 2 === PureDPBudget(0.5))
    assert(PureDPBudget(1.0) / 3 === PureDPBudget(Rat(1, 3)))
    assert(ApproxDPBudget(1.0, 0.5) / 2 === ApproxDPBudget(0.5, 0.25))
    assert(RhoZCDPBudget(3.0) / 2 === RhoZCDPBudget(1.5))
    // dividing an infinite budget leaves it infinite
    assert((PureDPBudget(inf) / 2).isInfinite)
    assert((ApproxDPBudget(inf, 0.0) / 2).isInfinite)
    // divisors must be finite and > 0
    for (k <- Seq(0.0, -1.0, inf, Double.NaN)) {
      intercept[IllegalArgumentException] { PureDPBudget(1.0) / k }
      intercept[IllegalArgumentException] { ApproxDPBudget(1.0, 0.1) / k }
      intercept[IllegalArgumentException] { RhoZCDPBudget(1.0) / k }
    }
  }

  test("multiplication scales and caps delta at 1 (test_budget_multiplication)") {
    assert(PureDPBudget(1.0) * 2 === PureDPBudget(2.0))
    assert(PureDPBudget(1.0) * 0 === PureDPBudget(0.0))
    assert(PureDPBudget(1.0) * 0.5 === PureDPBudget(0.5))
    assert(ApproxDPBudget(1.0, 0.5) * 1.5 === ApproxDPBudget(1.5, 0.75))
    // delta product above 1 is capped
    assert(ApproxDPBudget(1.0, 0.5) * 4 === ApproxDPBudget(4.0, 1.0))
    assert(RhoZCDPBudget(2.0) * 2.5 === RhoZCDPBudget(5.0))
    assert((PureDPBudget(inf) * 2).isInfinite)
    for (k <- Seq(-1.0, inf, Double.NaN)) {
      intercept[IllegalArgumentException] { PureDPBudget(1.0) * k }
      intercept[IllegalArgumentException] { ApproxDPBudget(1.0, 0.1) * k }
      intercept[IllegalArgumentException] { RhoZCDPBudget(1.0) * k }
    }
  }

  test("addition is basic composition with type promotion (test_budget_addition)") {
    assert(PureDPBudget(1.0) + PureDPBudget(2.0) === PureDPBudget(3.0))
    // PureDP + ApproxDP promotes (delta of the pure side is 0)
    assert(PureDPBudget(1.0) + ApproxDPBudget(2.0, 0.5) === ApproxDPBudget(3.0, 0.5))
    assert(ApproxDPBudget(2.0, 0.5) + PureDPBudget(1.0) === ApproxDPBudget(3.0, 0.5))
    // delta sums and caps at 1
    assert(ApproxDPBudget(1.0, 0.6) + ApproxDPBudget(1.0, 0.7) === ApproxDPBudget(2.0, 1.0))
    assert(RhoZCDPBudget(1.0) + RhoZCDPBudget(0.5) === RhoZCDPBudget(1.5))
    // an infinite operand absorbs
    assert((PureDPBudget(inf) + PureDPBudget(1.0)).isInfinite)
    assert((PureDPBudget(1.0) + PureDPBudget(inf)).isInfinite)
    assert((ApproxDPBudget(1.0, 1.0) + ApproxDPBudget(1.0, 0.1)).isInfinite)
    // zCDP mixes with nothing else
    intercept[IllegalArgumentException] { RhoZCDPBudget(1.0) + PureDPBudget(1.0) }
    intercept[IllegalArgumentException] { PureDPBudget(1.0) + RhoZCDPBudget(1.0) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(1.0) + ApproxDPBudget(1.0, 0.1) }
  }

  test("subtraction: type rules and infinite absorption (test_budget_subtraction)") {
    assert(PureDPBudget(2.0) - PureDPBudget(0.5) === PureDPBudget(1.5))
    // ApproxDP - PureDP is allowed; the reverse is not
    assert(ApproxDPBudget(2.0, 0.5) - PureDPBudget(1.0) === ApproxDPBudget(1.0, 0.5))
    assert(ApproxDPBudget(2.0, 0.5) - ApproxDPBudget(1.0, 0.25) === ApproxDPBudget(1.0, 0.25))
    intercept[IllegalArgumentException] { PureDPBudget(2.0) - ApproxDPBudget(1.0, 0.1) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(2.0) - PureDPBudget(1.0) }
    // subtracting from an infinite budget leaves it infinite
    assert((PureDPBudget(inf) - PureDPBudget(100.0)).isInfinite)
    assert((ApproxDPBudget(inf, 0.0) - ApproxDPBudget(5.0, 0.5)).isInfinite)
    assert((RhoZCDPBudget(inf) - RhoZCDPBudget(7.0)).isInfinite)
    // over-subtraction is rejected (negative budgets cannot exist)
    intercept[IllegalArgumentException] { PureDPBudget(1.0) - PureDPBudget(2.0) }
    intercept[IllegalArgumentException] {
      ApproxDPBudget(1.0, 0.1) - ApproxDPBudget(0.5, 0.2)
    }
  }

  test("division and multiplication round-trip exactly (no float drift)") {
    // exactness property the Rat representation guarantees: (b / 3) * 3 == b
    val b = PureDPBudget(1.0)
    assert((b / 3) * 3 === b)
    val a = ApproxDPBudget(1.0, 1e-6)
    assert((a / 7) * 7 === a)
    val r = RhoZCDPBudget(2.5)
    assert((r / 9) * 9 === r)
  }

  test("constructors reject NaN and negative parameters (test_constructor_fail_*)") {
    intercept[IllegalArgumentException] { PureDPBudget(-1.0) }
    intercept[IllegalArgumentException] { PureDPBudget(Double.NaN) }
    intercept[IllegalArgumentException] { ApproxDPBudget(-0.5, 0.1) }
    intercept[IllegalArgumentException] { ApproxDPBudget(1.0, -0.1) }
    intercept[IllegalArgumentException] { ApproxDPBudget(1.0, 1.5) }
    intercept[IllegalArgumentException] { ApproxDPBudget(Double.NaN, 0.1) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(-2.0) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(Double.NaN) }
  }

  test("is_infinite matrix (test_is_infinite)") {
    assert(PureDPBudget(inf).isInfinite)
    assert(!PureDPBudget(1.0).isInfinite)
    assert(ApproxDPBudget(inf, 0.0).isInfinite)
    assert(ApproxDPBudget(1.0, 1.0).isInfinite) // delta = 1 is vacuous
    assert(!ApproxDPBudget(1.0, 0.999999).isInfinite)
    assert(RhoZCDPBudget(inf).isInfinite)
    assert(!RhoZCDPBudget(0.0).isInfinite)
  }
}
