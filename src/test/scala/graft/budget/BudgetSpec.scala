package graft.budget

import org.scalatest.funsuite.AnyFunSuite

class BudgetSpec extends AnyFunSuite {

  test("Rat arithmetic is exact and normalized") {
    assert(Rat(1, 3) + Rat(1, 6) === Rat(1, 2))
    assert(Rat(2, 4) === Rat(1, 2))
    assert(Rat(1, 3) * Rat(3, 5) === Rat(1, 5))
    assert(Rat(1, 2) - Rat(1, 3) === Rat(1, 6))
    assert((Rat(1, 3) / Rat(2, 3)) === Rat(1, 2))
    assert(Rat(-1, -2) === Rat(1, 2))
    assert(Rat(1, -2) < Rat.zero)
  }

  test("repeated composition never drifts") {
    // 10x spends of eps/10 exactly exhaust the budget - the FP failure mode
    // the exact representation exists to prevent
    val eps = Rat(1)
    val part = eps / Rat(10)
    val total = (1 to 10).map(_ => part).reduce(_ + _)
    assert(total === eps)
  }

  test("infinity absorbs") {
    assert((Rat.Inf + Rat(5)) === Rat.Inf)
    assert(Rat.Inf.isInfinite)
    assert((Rat(5) / Rat.zero) === Rat.Inf)
    assert(Rat(0.5) === Rat(1, 2))
  }

  test("double conversion is exact for representable values") {
    assert(Rat(0.25) === Rat(1, 4))
    // 0.1 is not exactly 1/10 in binary; conversion captures the true value
    assert(Rat(0.1) !== Rat(1, 10))
    assert(math.abs(Rat(0.1).toDouble - 0.1) === 0.0)
  }

  test("budget ordering and subtraction") {
    val b = PureDPBudget(1.0)
    assert(b >= PureDPBudget(0.5))
    assert(!(PureDPBudget(0.5) >= b))
    val rem = b - PureDPBudget(0.25)
    assert(rem === PureDPBudget(0.75))
    intercept[IllegalArgumentException] { b - RhoZCDPBudget(0.1) }
  }

  test("approx budget: pure spend allowed, delta tracked") {
    val b = ApproxDPBudget(1.0, 0.5)
    val rem = b - ApproxDPBudget(Rat(0.5), Rat(0.25))
    assert(rem === ApproxDPBudget(Rat(0.5), Rat(0.25)))
    assert(b >= PureDPBudget(1.0))
  }

  test("infinite budgets survive any spend") {
    val inf = PureDPBudget(Rat.Inf)
    assert((inf - PureDPBudget(100.0)).isInfinite)
    assert(RhoZCDPBudget(Rat.Inf).isInfinite)
  }

  test("split refuses n < 1 — Rat division would turn /0 into an " +
      "INFINITE budget") {
    intercept[IllegalArgumentException] { PureDPBudget(1.0).split(0) }
    intercept[IllegalArgumentException] {
      ApproxDPBudget(1.0, 0.5).split(-3)
    }
    assert(PureDPBudget(1.0).split(2) === PureDPBudget(0.5))
  }

  test("Rat.ceilLong refuses values outside Long range instead of " +
      "silently wrapping") {
    val big = Rat(BigInt(2).pow(64) + 5, BigInt(1))
    intercept[ArithmeticException] { big.ceilLong }
    assert(Rat(BigInt(7), BigInt(2)).ceilLong === 4L)
    assert(Rat(-7).ceilLong === -7L)
  }
}
