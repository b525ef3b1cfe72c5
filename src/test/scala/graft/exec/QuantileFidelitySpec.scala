package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** Statistical acceptance tests for the binned DP quantile at finite epsilon
  * (VERDICT r4 missing #2). The engine deliberately deviates from the
  * reference's interval-scoring mechanism — it scores 2048 fixed bins so
  * per-group state stays bounded at any group size (DpQuantile.scala header)
  * — so its finite-eps output distribution cannot be compared to the
  * reference draw-for-draw. What CAN be pinned is the exponential
  * mechanism's utility guarantee, which both mechanisms inherit:
  *
  *   P[ rankError > u_opt + (2 * uSens / eps) * (ln(numBins) + t) ] <= e^-t
  *
  * with uSens = 1 + q and u_opt the best achievable rank error. The tests
  * drive the mechanism directly (seeded RNG, no Spark) over a fixed corpus
  * of 1000 evenly spaced values and assert, at eps in {0.1, 1, 10}:
  *  - the empirical 90th-percentile rank error stays under the t = 3
  *    (95%) theoretical bound — a seeded-deterministic check that would
  *    catch any mis-calibration of the exp(eps * u / (2 * uSens)) weights
  *    (e.g. a dropped factor of 2, or sensitivity 1 instead of 1 + q);
  *  - error decreases as eps grows (more budget, better answers);
  *  - eps = infinity is exact.
  */
class QuantileFidelitySpec extends AnyFunSuite {

  private val N = 1000
  private val Low = 0.0
  private val High = 1000.0
  // values i + 0.5 for i in 0..999: evenly spaced, at most one per bin
  // (1000 values across 2048 bins), so bin rank == value rank
  private val values: Array[Double] = Array.tabulate(N)(_ + 0.5)

  private def countsOf(vs: Array[Double]): Array[Long] = {
    val counts = new Array[Long](DpQuantile.Bins)
    vs.foreach { v =>
      val b = math.min(
        math.floor((v - Low) / (High - Low) * DpQuantile.Bins).toInt,
        DpQuantile.Bins - 1)
      counts(b) += 1
    }
    counts
  }

  /** Empirical rank error of one released value against the true corpus. */
  private def rankError(released: Double, q: Double): Double =
    math.abs(values.count(_ < released) - q * N)

  private def draws(q: Double, eps: Double, reps: Int, seed: Long): Seq[Double] = {
    val rng = new java.util.Random(seed)
    val counts = countsOf(values)
    (1 to reps).map(_ =>
      DpQuantile.finish(counts, q, Low, High, eps, rng))
  }

  /** t = 3 (95%) rank-error bound. u_opt on this corpus is ~0.5 (each bin
    * holds one value; the best bin's midpoint-rank misses the target by
    * half a count).
    */
  private def bound(q: Double, eps: Double): Double =
    0.5 + 2.0 * (1.0 + q) / eps * (math.log(DpQuantile.Bins) + 3.0)

  private def p90(xs: Seq[Double]): Double = xs.sorted.apply((xs.size * 9) / 10)

  for (eps <- Seq(0.1, 1.0, 10.0))
    test(f"median rank error at eps = $eps%.1f stays under the 95%% " +
        f"exponential-mechanism bound (${bound(0.5, eps)}%.1f ranks)") {
      val errs = draws(q = 0.5, eps = eps, reps = 200, seed = 42L)
        .map(rankError(_, 0.5))
      assert(p90(errs) <= bound(0.5, eps),
        s"p90 rank error ${p90(errs)} exceeds theoretical bound ${bound(0.5, eps)}")
    }

  test("median rank error shrinks monotonically as eps grows") {
    def mean(eps: Double): Double = {
      val errs = draws(q = 0.5, eps = eps, reps = 200, seed = 7L)
        .map(rankError(_, 0.5))
      errs.sum / errs.size
    }
    val (e01, e1, e10) = (mean(0.1), mean(1.0), mean(10.0))
    assert(e10 < e1 && e1 < e01,
      s"mean rank errors should decrease with eps: $e01 (0.1), $e1 (1), $e10 (10)")
    // and the high-budget regime is genuinely tight: within ~5 ranks of 1000
    assert(e10 < 5.0)
  }

  test("p90 quantile at eps = 1 honors its (larger) 1 + q sensitivity bound") {
    val errs = draws(q = 0.9, eps = 1.0, reps = 200, seed = 11L)
      .map(rankError(_, 0.9))
    assert(p90(errs) <= bound(0.9, 1.0))
  }

  test("infinite eps is exact: the released median's rank error is < 1") {
    val released = draws(q = 0.5, eps = Double.PositiveInfinity,
      reps = 1, seed = 1L).head
    assert(rankError(released, 0.5) <= 1.0)
    assert(math.abs(released - 500.0) <= (High - Low) / DpQuantile.Bins)
  }

  test("released values always land inside the clamp range") {
    val all = Seq(0.1, 1.0, 10.0).flatMap(e =>
      draws(q = 0.5, eps = e, reps = 50, seed = 13L))
    assert(all.forall(v => v >= Low && v <= High))
  }
}
