package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** Statistical checks of the samplers against their documented
  * distributions (reference noise-scale ground truth: a count at
  * PureDP(0.5) uses geometric noise with scale 2 - session.py:1037-1043).
  */
class NoiseSpec extends AnyFunSuite {
  private val N = 200000

  test("geometric: mean 0, variance 2a/(1-a)^2 at b=2") {
    val b = 2.0
    val xs = Array.fill(N)(Noise.sampleGeometric(b).toDouble)
    val mean = xs.sum / N
    val varEmp = xs.map(x => (x - mean) * (x - mean)).sum / N
    val a = math.exp(-1.0 / b)
    val varTrue = 2.0 * a / ((1 - a) * (1 - a))
    assert(math.abs(mean) < 0.05, s"mean $mean")
    assert(math.abs(varEmp - varTrue) / varTrue < 0.05, s"var $varEmp vs $varTrue")
  }

  test("laplace: variance 2b^2") {
    val b = 3.0
    val xs = Array.fill(N)(Noise.sampleLaplace(b))
    val mean = xs.sum / N
    val varEmp = xs.map(x => (x - mean) * (x - mean)).sum / N
    assert(math.abs(mean) < 0.1)
    assert(math.abs(varEmp - 2 * b * b) / (2 * b * b) < 0.05, s"var $varEmp")
  }

  test("gaussian: variance sigma^2") {
    val s2 = 4.0
    val xs = Array.fill(N)(Noise.sampleGaussian(s2))
    val varEmp = xs.map(x => x * x).sum / N
    assert(math.abs(varEmp - s2) / s2 < 0.05)
  }

  test("discrete gaussian: integer-valued, variance ~ sigma^2") {
    val s2 = 9.0
    val xs = Array.fill(N)(Noise.sampleDiscreteGaussian(s2).toDouble)
    val varEmp = xs.map(x => x * x).sum / N
    // CKS discrete Gaussian variance is within O(1) of sigma^2 for sigma >= 1
    assert(math.abs(varEmp - s2) / s2 < 0.1, s"var $varEmp vs $s2")
  }

  test("zero scale is exactly noiseless") {
    assert((1 to 1000).forall(_ => Noise.sampleGeometric(0.0) == 0L))
    assert((1 to 1000).forall(_ => Noise.sampleLaplace(0.0) == 0.0))
    assert((1 to 1000).forall(_ => Noise.sampleGaussian(0.0) == 0.0))
    assert((1 to 1000).forall(_ => Noise.sampleDiscreteGaussian(0.0) == 0L))
    assert(NoiseMechanism.Geometric(0.0).isNoiseless)
    assert(NoiseMechanism.Exponential(Double.PositiveInfinity).isNoiseless)
  }
}
