package graft.budget

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded random sampling) for the exact rational
  * arithmetic backing all privacy accounting — field laws and order
  * compatibility must hold exactly, since budget drift is a privacy
  * violation, not a rounding error.
  */
class RatPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(20260812L)
  private def randRat(): Rat =
    Rat(BigInt(rng.between(-1000000L, 1000000L)), BigInt(rng.between(1L, 1000000L)))
  private def trials(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("addition/multiplication are commutative and associative") {
    trials(500) {
      val (a, b, c) = (randRat(), randRat(), randRat())
      assert(a + b === b + a)
      assert(a * b === b * a)
      assert((a + b) + c === a + (b + c))
      assert((a * b) * c === a * (b * c))
    }
  }

  test("distributivity and inverses") {
    trials(500) {
      val (a, b, c) = (randRat(), randRat(), randRat())
      assert(a * (b + c) === a * b + a * c)
      assert(a - a === Rat.zero)
      if (!b.isZero) assert((a / b) * b === a)
    }
  }

  test("ordering is total and compatible with addition") {
    trials(500) {
      val (a, b, c) = (randRat(), randRat(), randRat())
      assert((a <= b) || (b <= a))
      if (a <= b) assert(a + c <= b + c)
    }
  }

  test("n equal splits recompose exactly") {
    trials(200) {
      val a = randRat()
      val n = rng.between(1, 50)
      val part = a / Rat(n)
      assert(Seq.fill(n)(part).reduce(_ + _) === a)
    }
  }

  test("double round-trip for dyadic rationals is exact") {
    trials(500) {
      val n = rng.between(-4096, 4096)
      val k = rng.between(0, 20)
      val d = n.toDouble / (1L << k).toDouble
      assert(Rat(d).toDouble === d)
    }
  }
}
