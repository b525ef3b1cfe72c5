package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget._
import graft.exec.NoiseMechanism._
import graft.ir._
import graft.session.Session

/** The DEFAULT -> concrete mechanism selection matrix (reference
  * _rewrite_rules.py:91-199): counts and integer sums discretize, decimal
  * sums stay continuous; PureDP/ApproxDP -> geometric/Laplace, zCDP ->
  * discrete Gaussian/Gaussian; explicit Laplace under zCDP converts via
  * eps = sqrt(2 rho); Gaussian under PureDP is an error.
  */
class MechanismSelectionSpec extends SparkSpec {

  private def df = makeDf(
    StructType(Seq(longCol("i"), dblCol("d"))), Seq(Row(1L, 1.0)))

  private def sess(b: PrivacyBudget) =
    Session.fromDataFrame(spark, b, "t", df, AddOneRow())

  private def mech(b: PrivacyBudget, q: Query) =
    sess(b match {
      case _: PureDPBudget   => PureDPBudget(Rat.Inf)
      case _: ApproxDPBudget => ApproxDPBudget(Rat.Inf, Rat.zero)
      case _: RhoZCDPBudget  => RhoZCDPBudget(Rat.Inf)
    }).noiseInfo(q, b).head.mechanism

  private val eps = PureDPBudget(0.5)
  private val approx = ApproxDPBudget(Rat(1, 2), Rat(1, 1000))
  private val rho = RhoZCDPBudget(0.5)

  test("counts: geometric under PureDP/ApproxDP, discrete Gaussian under zCDP") {
    assert(mech(eps, QueryBuilder("t").count()) === Geometric(2.0))
    assert(mech(approx, QueryBuilder("t").count()) === Geometric(2.0))
    assert(mech(rho, QueryBuilder("t").count()) === DiscreteGaussian(1.0))
  }

  test("integer sums discretize; decimal sums stay continuous") {
    // sum bounds [0,4]: sensitivity 4 -> scale 4/0.5 = 8
    assert(mech(eps, QueryBuilder("t").sum("i", 0, 4)) === Geometric(8.0))
    assert(mech(eps, QueryBuilder("t").sum("d", 0, 4)) === Laplace(8.0))
    // zCDP: sigma^2 = 16/(2*0.5) = 16
    assert(mech(rho, QueryBuilder("t").sum("i", 0, 4)) === DiscreteGaussian(16.0))
    assert(mech(rho, QueryBuilder("t").sum("d", 0, 4)) === Gaussian(16.0))
  }

  test("explicit hints: Laplace under zCDP converts, Gaussian needs zCDP") {
    // eps = sqrt(2*0.5) = 1 -> scale 4/1 = 4
    assert(mech(rho, QueryBuilder("t").sum("i", 0, 4,
      mechanism = MechanismHint.Laplace)) === Geometric(4.0))
    assert(mech(rho, QueryBuilder("t").sum("d", 0, 4,
      mechanism = MechanismHint.Laplace)) === Laplace(4.0))
    intercept[IllegalArgumentException] {
      mech(eps, QueryBuilder("t").sum("i", 0, 4, mechanism = MechanismHint.Gaussian))
    }
  }

  test("multi-part budgets split: average halves, variance thirds") {
    val avg = sess(PureDPBudget(Rat.Inf))
      .noiseInfo(QueryBuilder("t").average("d", 0, 4), eps)
    // sum part: sens (hi-lo)/2 = 2 at eps/2 -> 2/(0.25) = 8; count: 1/0.25 = 4
    assert(avg.map(_.mechanism) === Seq(Laplace(8.0), Geometric(4.0)))
    val varInfo = sess(PureDPBudget(Rat.Inf))
      .noiseInfo(QueryBuilder("t").variance("d", 0, 4), PureDPBudget(Rat(3, 2)))
    // thirds of eps=3/2 -> 1/2 each; sd sens 2 -> 4; sq sens 4 -> 8; n -> 2
    assert(varInfo.map(_.mechanism) === Seq(Laplace(4.0), Laplace(8.0), Geometric(2.0)))
  }

  test("exponential mechanism epsilon: direct under PureDP, sqrt(8 rho) under zCDP") {
    val q = QueryBuilder("t").median("d", 0, 4)
    assert(mech(eps, q) === Exponential(0.5))
    assert(mech(rho, q) === Exponential(2.0)) // sqrt(8*0.5)
  }

  test("grouped constrained count-distinct: MaxGroupsPerID bounds sensitivity") {
    import graft.accounting.AddRowsWithID
    import graft.constraints.MaxGroupsPerID
    import graft.keyset.KeySet
    val idDf = makeDf(
      StructType(Seq(longCol("uid"), strCol("grp"))), Seq(Row(1L, "a")))
    def idSess(b: PrivacyBudget) = Session.fromDataFrame(spark, b,
      "t", idDf, AddRowsWithID("uid"))
    val keys = KeySet.fromColumn("grp", Seq("a", "b"))
    val q = QueryBuilder("t").enforce(MaxGroupsPerID("grp", 2))
      .groupby(keys).countDistinct(Seq("uid"))
    // one ID touches at most 2 groups: sens 2 at eps 0.5 -> scale 4;
    // no per-group ROW bound needed even though this is a grouped agg
    assert(idSess(PureDPBudget(Rat.Inf)).noiseInfo(q, eps).head.mechanism
      === Geometric(4.0))
    // zCDP: L2 across the <=2 touched groups -> Delta_2 = sqrt(2), carried
    // as the exact square 2 (no ceil) -> sigma^2 = Delta_2^2/(2 rho) = 2,
    // matching the reference's symbolic calibration
    assert(idSess(RhoZCDPBudget(Rat.Inf)).noiseInfo(q, rho).head.mechanism
      === DiscreteGaussian(2.0))
  }
}
