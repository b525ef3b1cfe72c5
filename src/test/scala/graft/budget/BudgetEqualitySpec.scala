package graft.budget

import org.scalatest.funsuite.AnyFunSuite

/** The reference's privacy-budget equality, hashing, and is_infinite
  * tables (test/unit/test_privacy_budget.py): budgets of different kinds
  * never compare equal, infinite ApproxDP budgets are all one budget, and
  * construction rejects negative / NaN / out-of-range parameters.
  */
class BudgetEqualitySpec extends AnyFunSuite {

  test("is_infinite across every kind (reference table)") {
    assert(ApproxDPBudget(Rat.Inf, Rat.one).isInfinite)
    assert(ApproxDPBudget(Rat(1, 1), Rat.one).isInfinite)
    assert(ApproxDPBudget(Rat.Inf, Rat.zero).isInfinite)
    assert(!ApproxDPBudget(Rat(1, 1), Rat(1, 10)).isInfinite)
    assert(!ApproxDPBudget(Rat(1, 1), Rat.zero).isInfinite)
    assert(RhoZCDPBudget(Rat.Inf).isInfinite)
    assert(!RhoZCDPBudget(Rat(1, 1)).isInfinite)
    assert(PureDPBudget(Rat.Inf).isInfinite)
    assert(!PureDPBudget(Rat(1, 1)).isInfinite)
  }

  test("equality: same kind and value only (reference table)") {
    assert(PureDPBudget(Rat(1, 1)) === PureDPBudget(Rat(1, 1)))
    assert(PureDPBudget(Rat(1, 1)) !== PureDPBudget(Rat(2, 1)))
    assert(PureDPBudget(Rat(1, 1)) !== ApproxDPBudget(Rat(1, 1), Rat.zero))
    assert(PureDPBudget(Rat(1, 1)) !== RhoZCDPBudget(Rat(1, 1)))
    assert(ApproxDPBudget(Rat(1, 1), Rat(1, 10)) ===
      ApproxDPBudget(Rat(1, 1), Rat(1, 10)))
    assert(ApproxDPBudget(Rat(1, 1), Rat(1, 10)) !==
      ApproxDPBudget(Rat(2, 1), Rat(1, 10)))
    assert(ApproxDPBudget(Rat(1, 1), Rat(1, 10)) !==
      ApproxDPBudget(Rat(1, 1), Rat(1, 100)))
    assert(RhoZCDPBudget(Rat(1, 1)) === RhoZCDPBudget(Rat(1, 1)))
    assert(RhoZCDPBudget(Rat(1, 1)) !== RhoZCDPBudget(Rat.Inf))
  }

  test("all infinite ApproxDP budgets are one budget (reference semantics)") {
    val infs = Seq(
      ApproxDPBudget(Rat.Inf, Rat.one),
      ApproxDPBudget(Rat(1, 1), Rat.one),
      ApproxDPBudget(Rat.zero, Rat.one),
      ApproxDPBudget(Rat.Inf, Rat.zero))
    for (a <- infs; b <- infs) {
      assert(a === b, s"$a vs $b")
      assert(a.hashCode === b.hashCode)
    }
    // but a finite budget never equals an infinite one
    assert(ApproxDPBudget(Rat(1, 1), Rat(1, 10)) !== infs.head)
  }

  test("budgets hash consistently for use as map keys") {
    val m = Map(
      PureDPBudget(Rat(1, 1)) -> "p",
      ApproxDPBudget(Rat(1, 1), Rat(1, 10)) -> "a",
      RhoZCDPBudget(Rat(1, 1)) -> "z")
    assert(m(PureDPBudget(Rat(1, 1))) === "p")
    assert(m(ApproxDPBudget(Rat(1, 1), Rat(1, 10))) === "a")
    assert(m(RhoZCDPBudget(Rat(1, 1))) === "z")
  }

  test("the reference's full cross-kind equality table " +
      "(test_privacy_budget.py:290-345)") {
    val inf = Double.PositiveInfinity
    val cases: Seq[(PrivacyBudget, PrivacyBudget, Boolean)] = Seq(
      (PureDPBudget(1.0), PureDPBudget(1.0), true),
      (PureDPBudget(1.0), PureDPBudget(2.0), false),
      (PureDPBudget(1.0), ApproxDPBudget(1.0, 1e-10), false),
      (PureDPBudget(1.0), RhoZCDPBudget(1.0), false),
      // even delta = 0 does not identify ApproxDP with PureDP
      (PureDPBudget(1.0), ApproxDPBudget(1.0, 0.0), false),
      (ApproxDPBudget(1.0, 1e-10), ApproxDPBudget(1.0, 1e-10), true),
      (ApproxDPBudget(1.0, 1e-10), ApproxDPBudget(2.0, 1e-10), false),
      (ApproxDPBudget(1.0, 1e-10), ApproxDPBudget(1.0, 1e-11), false),
      (ApproxDPBudget(1.0, 0.0), PureDPBudget(1.0), false),
      (RhoZCDPBudget(1.0), RhoZCDPBudget(1.0), true),
      (RhoZCDPBudget(1.0), RhoZCDPBudget(2.0), false),
      (RhoZCDPBudget(1.0), PureDPBudget(1.0), false),
      (RhoZCDPBudget(1.0), ApproxDPBudget(1.0, 1e-10), false),
      (PureDPBudget(inf), PureDPBudget(inf), true),
      (PureDPBudget(1.0), PureDPBudget(inf), false),
      // every infinite ApproxDP budget is one budget
      (ApproxDPBudget(inf, 1.0), ApproxDPBudget(inf, 1.0), true),
      (ApproxDPBudget(1.0, 1.0), ApproxDPBudget(inf, 1.0), true),
      (ApproxDPBudget(0.0, 1.0), ApproxDPBudget(inf, 1.0), true),
      (RhoZCDPBudget(inf), RhoZCDPBudget(inf), true),
      (RhoZCDPBudget(1.0), RhoZCDPBudget(inf), false),
      // int-vs-float construction paths compare equal
      (PureDPBudget(1.0), PureDPBudget(Rat(1)), true),
      (PureDPBudget(1.0), PureDPBudget(1.1), false),
      // 0.25 is exact in binary, so the Rat and Double paths coincide
      // (0.01 would NOT: Rat(0.01) is the binary double's exact value,
      // deliberately different from 1/100 — see BudgetSpec)
      (ApproxDPBudget(Rat.one, Rat(1, 4)), ApproxDPBudget(1.0, 0.25), true),
      (RhoZCDPBudget(1.0), RhoZCDPBudget(Rat(1)), true))
    for (((a, b, expect), i) <- cases.zipWithIndex) {
      assert((a == b) === expect, s"case $i: $a == $b")
      assert((b == a) === expect, s"case $i sym: $b == $a")
      if (expect) assert(a.hashCode === b.hashCode, s"case $i hash")
    }
  }

  test("construction rejects negatives, NaN, and delta outside [0, 1]") {
    intercept[IllegalArgumentException] { PureDPBudget(-1.0) }
    intercept[IllegalArgumentException] { PureDPBudget(Double.NaN) }
    intercept[IllegalArgumentException] { ApproxDPBudget(-1.0, 0.1) }
    intercept[IllegalArgumentException] { ApproxDPBudget(1.0, -0.1) }
    intercept[IllegalArgumentException] { ApproxDPBudget(1.0, 1.5) }
    intercept[IllegalArgumentException] { ApproxDPBudget(1.0, Double.NaN) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(-0.5) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(Double.NaN) }
    // non-negative ints and floats construct fine
    PureDPBudget(0.0); PureDPBudget(2.5)
    ApproxDPBudget(0.0, 0.0); ApproxDPBudget(0.5, 1e-10)
    RhoZCDPBudget(0.0); RhoZCDPBudget(1.5)
  }
}
