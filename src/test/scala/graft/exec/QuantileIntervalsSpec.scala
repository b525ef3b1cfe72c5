package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir.QueryBuilder
import graft.session.Session

/** The opt-in interval-scoring quantile (VERDICT r4 missing #2): the
  * reference's mechanism shape — exponential mechanism over the n + 1
  * intervals between a group's sorted values (core
  * `create_quantile_measurement`, _base_measurement_visitor.py:1060-1072)
  * — selectable via spark conf `spark.graft.quantile.method = intervals`.
  * Kernel tests drive [[DpQuantile.finishIntervals]] with a seeded RNG;
  * session tests check the conf wiring end to end.
  */
class QuantileIntervalsSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  private def seeded(seed: Long): () => Double = {
    val rng = new scala.util.Random(seed)
    () => rng.nextDouble()
  }

  // --- kernel ---

  test("eps=inf median lands between the two middle values") {
    val vs = Array(1.0, 3.0, 5.0, 7.0, 9.0, 11.0)
    // n=6, target 3: interval 3 spans [v3, v4] = [5, 7]
    val m = DpQuantile.finishIntervals(vs, 0.5, 0, 100, Double.PositiveInfinity,
      seeded(1))
    assert(m === 6.0)
  }

  test("eps=inf skips zero-width intervals") {
    // n=4, target 2: interval 2 spans [5, 5] (width 0) -> nearest
    // positive-width max-utility neighbor wins instead
    val vs = Array(2.0, 5.0, 5.0, 8.0)
    val m = DpQuantile.finishIntervals(vs, 0.5, 0, 10, Double.PositiveInfinity,
      seeded(1))
    assert((m > 2.0 && m < 5.0) || (m > 5.0 && m < 8.0), s"median $m")
  }

  test("all-identical values: quantile answers near the mass") {
    val vs = Array.fill(100)(42.0)
    val m = DpQuantile.finishIntervals(vs, 0.5, 0, 100, Double.PositiveInfinity,
      seeded(1))
    // only intervals 0 ([0,42]) and 100 ([42,100]) have width; both are
    // ~50 ranks from the target, midpoints 21 or 71
    assert(m === 21.0 || m === 71.0, s"got $m")
  }

  test("degenerate clamp range returns the point") {
    assert(DpQuantile.finishIntervals(Array(3.0, 4.0), 0.5, 5, 5,
      Double.PositiveInfinity, seeded(1)) === 5.0)
  }

  test("empty group: uniform over the clamp range, midpoint at eps=inf") {
    assert(DpQuantile.finishIntervals(Array.empty, 0.5, 0, 10,
      Double.PositiveInfinity, seeded(1)) === 5.0)
    val finite = DpQuantile.finishIntervals(Array.empty, 0.5, 0, 10, 1.0,
      seeded(2))
    assert(finite >= 0 && finite <= 10)
  }

  test("finite eps stays within the clamp range and clamps outliers") {
    val vs = Array(-50.0, 2.0, 4.0, 6.0, 8.0, 500.0)
    val draws = (1 to 200).map(i =>
      DpQuantile.finishIntervals(vs, 0.5, 0, 10, 1.0, seeded(i.toLong)))
    assert(draws.forall(d => d >= 0 && d <= 10))
  }

  test("rank error shrinks as eps grows (seeded)") {
    val vs = Array.tabulate(1000)(_ + 0.5)
    def medianRankErr(eps: Double, seed: Int): Double = {
      val errs = (1 to 200).map { i =>
        val d = DpQuantile.finishIntervals(vs, 0.5, 0, 1000, eps,
          seeded(seed.toLong * 1000 + i))
        math.abs(vs.count(_ < d) - 500.0)
      }.sorted
      errs(errs.length / 2)
    }
    val e01 = medianRankErr(0.1, 1)
    val e1 = medianRankErr(1.0, 2)
    val e10 = medianRankErr(10.0, 3)
    // eps=10: 2*uSens/eps*ln(n+1) ~ 2.1 ranks; eps=0.1 is ~100x looser
    assert(e10 <= 8, s"eps=10 median rank error $e10")
    assert(e1 <= 40, s"eps=1 median rank error $e1")
    assert(e10 <= e1 && e1 <= e01, s"not monotone: $e01 / $e1 / $e10")
  }

  test("utility bound holds at eps=1 (95th percentile within theory)") {
    // P[err > u_opt + (2*uSens/eps)(ln(n+1) + t)] <= e^-t; t=3 -> ~30 ranks
    val vs = Array.tabulate(1000)(_ + 0.5)
    val errs = (1 to 300).map { i =>
      val d = DpQuantile.finishIntervals(vs, 0.5, 0, 1000, 1.0,
        seeded(7000L + i))
      math.abs(vs.count(_ < d) - 500.0)
    }.sorted
    val p95 = errs((errs.length * 95) / 100)
    val bound = 0.5 + 2.0 * 1.5 / 1.0 * (math.log(1001.0) + 3.0)
    assert(p95 <= bound, s"p95 rank error $p95 > bound $bound")
  }

  // --- session wiring ---

  private def withIntervals[A](f: => A): A = {
    spark.conf.set("spark.graft.quantile.method", "intervals")
    try f finally spark.conf.unset("spark.graft.quantile.method")
  }

  private def sess(values: Seq[Double]) = {
    val df = makeDf(StructType(Seq(dblCol("x"))), values.map(Row(_)))
    Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
  }

  test("session: intervals method answers the exact median at eps=inf") {
    withIntervals {
      val s = sess(Seq(1.0, 3.0, 5.0, 7.0, 9.0, 11.0))
      val m = s.evaluate(QueryBuilder("t").median("x", 0, 100), Inf)
        .collect().head.getDouble(0)
      assert(m === 6.0)
    }
  }

  test("session: grouped intervals quantile fills keyset groups") {
    withIntervals {
      val df = makeDf(
        StructType(Seq(strCol("g"), dblCol("x"))),
        Seq(Row("a", 1.0), Row("a", 3.0), Row("b", 10.0)))
      val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
      val ks = graft.keyset.KeySet.fromTuples(
        Seq(Seq("a"), Seq("b"), Seq("c")), StructType(Seq(strCol("g"))))
      val rows = s.evaluate(
        QueryBuilder("t").groupby(ks).median("x", 0, 20), Inf)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rows("a") === 2.0) // interval [1, 3] midpoint
      assert(rows.contains("c")) // empty group still released
      assert(rows("c") === 10.0) // [0, 20] midpoint
    }
  }

  test("session: a group past the residency bound is refused, naming the binned path") {
    spark.conf.set("spark.graft.quantile.intervals.maxGroupRows", "4")
    try withIntervals {
      val s = sess(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
      val e = intercept[Exception] {
        s.evaluate(QueryBuilder("t").median("x", 0, 10), Inf).collect()
      }
      // the refusal surfaces through Spark's task-failure wrapping; the
      // root message must name the bound conf and the binned escape hatch
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).mkString(" | ")
      assert(msgs.contains("maxGroupRows"), msgs)
      assert(msgs.contains("binned"), msgs)
    } finally spark.conf.unset("spark.graft.quantile.intervals.maxGroupRows")
  }

  test("session: intervals bound at exactly the group size still answers") {
    spark.conf.set("spark.graft.quantile.intervals.maxGroupRows", "6")
    try withIntervals {
      val s = sess(Seq(1.0, 3.0, 5.0, 7.0, 9.0, 11.0))
      val m = s.evaluate(QueryBuilder("t").median("x", 0, 100), Inf)
        .collect().head.getDouble(0)
      assert(m === 6.0)
    } finally spark.conf.unset("spark.graft.quantile.intervals.maxGroupRows")
  }

  test("session: unknown quantile method is rejected") {
    spark.conf.set("spark.graft.quantile.method", "nope")
    try {
      val s = sess(Seq(1.0, 2.0))
      val e = intercept[IllegalArgumentException] {
        s.evaluate(QueryBuilder("t").median("x", 0, 10), Inf).collect()
      }
      assert(e.getMessage.contains("spark.graft.quantile.method"))
    } finally spark.conf.unset("spark.graft.quantile.method")
  }

  test("NaN values are excluded: all-NaN groups release from the clamp " +
      "range instead of crashing, partial NaN does not bias the target") {
    val rng = new scala.util.Random(7)
    val allNan = DpQuantile.finishIntervals(
      Array(Double.NaN, Double.NaN), 0.5, 0.0, 10.0,
      Double.PositiveInfinity, () => rng.nextDouble())
    assert(allNan >= 0.0 && allNan <= 10.0 && !allNan.isNaN)
    // with the NaN dropped, the group is just [5]: the eps=inf release
    // must match the NaN-free call exactly
    val withNan = DpQuantile.finishIntervals(
      Array(5.0, Double.NaN), 0.5, 0.0, 10.0,
      Double.PositiveInfinity, () => rng.nextDouble())
    val clean = DpQuantile.finishIntervals(
      Array(5.0), 0.5, 0.0, 10.0,
      Double.PositiveInfinity, () => rng.nextDouble())
    assert(withNan === clean)
  }
}
