package graft.exec

import org.scalatest.funsuite.AnyFunSuite

import graft.budget.Rat

/** The exact discrete-selection primitives (VERDICT r7 next-round #3):
  * CKS Bernoulli(exp(-gamma)) for rational gamma and permute-and-flip
  * selection — the pieces that close the floating-point sampling surface
  * for the binned-quantile and GetBounds finishers the way the CKS integer
  * samplers close it for additive noise. Statistical checks run seeded.
  */
class ExactSelectionSpec extends AnyFunSuite {

  private def freq(gamma: Rat, seed: Long, n: Int = 20000): Double = {
    val rng = new java.util.Random(seed)
    (1 to n).count(_ => Noise.bernoulliExp(gamma, rng)).toDouble / n
  }

  test("bernoulliExp(0) is always heads; huge gamma is (essentially) never") {
    val rng = new java.util.Random(1)
    assert((1 to 1000).forall(_ => Noise.bernoulliExp(Rat(0), rng)))
    assert((1 to 1000).count(_ => Noise.bernoulliExp(Rat(50), rng)) === 0)
  }

  test("bernoulliExp frequency matches exp(-gamma) across regimes") {
    // fractional, unit, >1 with fractional part, and big-denominator gammas
    val cases = Seq(
      Rat(BigInt(1), BigInt(3)) -> math.exp(-1.0 / 3.0),
      Rat(1) -> math.exp(-1.0),
      Rat(BigInt(7), BigInt(2)) -> math.exp(-3.5),
      // denominator far past Long: exercises the BigInt uniform path
      Rat(BigInt(2).pow(70), BigInt(2).pow(71)) -> math.exp(-0.5))
    cases.zipWithIndex.foreach { case ((g, p), i) =>
      val f = freq(g, seed = 100L + i)
      assert(math.abs(f - p) < 0.02, s"gamma=$g: freq $f vs exp ${p}")
    }
  }

  test("bernoulliExp rejects negative and infinite gamma") {
    val rng = new java.util.Random(2)
    intercept[IllegalArgumentException] {
      Noise.bernoulliExp(Rat(0) - Rat(1), rng)
    }
    intercept[IllegalArgumentException] { Noise.bernoulliExp(Rat.Inf, rng) }
  }

  test("permuteAndFlip always releases the sole zero-gamma candidate " +
      "against hopeless competition") {
    val rng = new java.util.Random(3)
    val gammas = IndexedSeq(Rat(60), Rat(0), Rat(60), Rat(60))
    assert((1 to 500).forall(_ => Noise.permuteAndFlip(gammas, rng) == 1))
  }

  test("permuteAndFlip is uniform over all-zero gammas") {
    val rng = new java.util.Random(4)
    val picks = (1 to 6000).map(_ =>
      Noise.permuteAndFlip(IndexedSeq(Rat(0), Rat(0), Rat(0)), rng))
    val hist = picks.groupBy(identity).view.mapValues(_.size).toMap
    (0 to 2).foreach { c =>
      assert(math.abs(hist(c) - 2000.0) < 200, s"candidate $c: ${hist(c)}")
    }
  }

  test("permuteAndFlip prefers lower gamma, monotonically") {
    val rng = new java.util.Random(5)
    val gammas = IndexedSeq(Rat(0), Rat(1), Rat(3))
    val picks = (1 to 8000).map(_ => Noise.permuteAndFlip(gammas, rng))
    val counts = (0 to 2).map(c => picks.count(_ == c))
    assert(counts(0) > counts(1) && counts(1) > counts(2), counts.toString)
  }

  test("seeded runs are reproducible") {
    def run(seed: Long) = {
      val rng = new java.util.Random(seed)
      (1 to 50).map(_ =>
        Noise.permuteAndFlip(IndexedSeq(Rat(0), Rat(1, 2), Rat(2)), rng))
    }
    assert(run(77) === run(77))
    assert(run(77) !== run(78))
  }
}
