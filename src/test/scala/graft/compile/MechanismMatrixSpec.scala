package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget._
import graft.ir._
import graft.session.Session

/** The full DEFAULT/LAPLACE/GAUSSIAN -> concrete mechanism matrix, mirroring
  * test/unit/query_expr_compiler/test_rewrite_rules.py:77-365 case-for-case:
  * counts and integer measures discretize (GEOMETRIC / DISCRETE_GAUSSIAN),
  * float measures use the continuous family (LAPLACE / GAUSSIAN), a LAPLACE
  * hint under zCDP converts to the pure-DP family, and GAUSSIAN under
  * PureDP/ApproxDP is rejected.
  */
class MechanismMatrixSpec extends SparkSpec {
  import MechanismHint._

  private def df = makeDf(
    StructType(Seq(longCol("int_col"), dblCol("float_col"))), Seq(Row(1L, 1.0)))

  private sealed trait Kind
  private case object Pure extends Kind
  private case object Approx extends Kind
  private case object Zcdp extends Kind

  private def sess(k: Kind) = Session.fromDataFrame(spark, k match {
    case Pure   => PureDPBudget(Rat.Inf)
    case Approx => ApproxDPBudget(Rat.Inf, Rat.zero)
    case Zcdp   => RhoZCDPBudget(Rat.Inf)
  }, "t", df, AddOneRow())

  private def budget(k: Kind): PrivacyBudget = k match {
    case Pure   => PureDPBudget(1.0)
    case Approx => ApproxDPBudget(Rat.one, Rat(1, 1000))
    case Zcdp   => RhoZCDPBudget(1.0)
  }

  /** Name of the mechanism noising the primary output column. */
  private def mechName(k: Kind, q: Query): String =
    sess(k).noiseInfo(q, budget(k)).head.mechanism.name

  private val countAggs: Seq[(String, MechanismHint => Query)] = Seq(
    "count" -> (m => QueryBuilder("t").count(mechanism = m)),
    "count_distinct" -> (m => QueryBuilder("t").countDistinct(mechanism = m)))

  private def numericAggs(c: String): Seq[(String, MechanismHint => Query)] = Seq(
    "sum" -> (m => QueryBuilder("t").sum(c, 0, 10, mechanism = m)),
    "average" -> (m => QueryBuilder("t").average(c, 0, 10, mechanism = m)),
    "variance" -> (m => QueryBuilder("t").variance(c, 0, 10, mechanism = m)),
    "stdev" -> (m => QueryBuilder("t").stdev(c, 0, 10, mechanism = m)))

  test("counts: {DEFAULT, LAPLACE} x {PureDP, ApproxDP} -> GEOMETRIC " +
      "(test_noise_selection_counts)") {
    for ((nm, mk) <- countAggs; hint <- Seq(Default, Laplace);
        k <- Seq[Kind](Pure, Approx))
      assert(mechName(k, mk(hint)) === "Geometric", s"$nm $hint $k")
  }

  test("counts: {DEFAULT, GAUSSIAN} x zCDP -> DISCRETE_GAUSSIAN; " +
      "LAPLACE x zCDP -> GEOMETRIC") {
    for ((nm, mk) <- countAggs) {
      for (hint <- Seq(Default, Gaussian))
        assert(mechName(Zcdp, mk(hint)) === "DiscreteGaussian", s"$nm $hint")
      assert(mechName(Zcdp, mk(Laplace)) === "Geometric", s"$nm laplace")
    }
  }

  test("numeric aggregations on an integer measure mirror the count matrix " +
      "(test_noise_selection_numeric_aggregations)") {
    for ((nm, mk) <- numericAggs("int_col")) {
      for (hint <- Seq(Default, Laplace); k <- Seq[Kind](Pure, Approx))
        assert(mechName(k, mk(hint)) === "Geometric", s"$nm $hint $k")
      for (hint <- Seq(Default, Gaussian))
        assert(mechName(Zcdp, mk(hint)) === "DiscreteGaussian", s"$nm $hint")
      assert(mechName(Zcdp, mk(Laplace)) === "Geometric", s"$nm laplace zcdp")
    }
  }

  test("numeric aggregations on a float measure use the continuous family") {
    for ((nm, mk) <- numericAggs("float_col")) {
      for (hint <- Seq(Default, Laplace); k <- Seq[Kind](Pure, Approx))
        assert(mechName(k, mk(hint)) === "Laplace", s"$nm $hint $k")
      for (hint <- Seq(Default, Gaussian))
        assert(mechName(Zcdp, mk(hint)) === "Gaussian", s"$nm $hint")
      assert(mechName(Zcdp, mk(Laplace)) === "Laplace", s"$nm laplace zcdp")
    }
  }

  test("GAUSSIAN under PureDP/ApproxDP is rejected " +
      "(test_noise_selection_invalid_noise)") {
    for (k <- Seq[Kind](Pure, Approx)) {
      for ((nm, mk) <- countAggs)
        intercept[IllegalArgumentException] { mechName(k, mk(Gaussian)) }
      for ((nm, mk) <- numericAggs("int_col") ++ numericAggs("float_col"))
        intercept[IllegalArgumentException] { mechName(k, mk(Gaussian)) }
    }
  }

  test("recursive selection: the hint threads through transforms " +
      "(test_recursive_noise_selection)") {
    val q = QueryBuilder("t").filter("int_col >= 0").rename(Map("int_col" -> "i"))
      .sum("i", 0, 10, mechanism = MechanismHint.Laplace)
    assert(mechName(Pure, q) === "Geometric")
    assert(mechName(Zcdp, q) === "Geometric")
  }

  test("average and variance count parts always discretize (counts are " +
      "integers regardless of the measure column type)") {
    val infos = sess(Pure).noiseInfo(
      QueryBuilder("t").average("float_col", 0, 10), budget(Pure))
    assert(infos.map(_.mechanism.name) === Seq("Laplace", "Geometric"))
    val zinfos = sess(Zcdp).noiseInfo(
      QueryBuilder("t").variance("float_col", 0, 10), budget(Zcdp))
    assert(zinfos.head.mechanism.name === "Gaussian")
    assert(zinfos.last.mechanism.name === "DiscreteGaussian")
  }
}
