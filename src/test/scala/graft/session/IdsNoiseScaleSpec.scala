package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddRowsWithID
import graft.budget.{PureDPBudget, Rat, RhoZCDPBudget}
import graft.constraints.MaxRowsPerID
import graft.ir.QueryBuilder
import graft.keyset.KeySet

/** The L1-truncation noise-scale matrix, mirroring the reference's
  * test/system/session/ids/test_l1_truncation.py:291-341 value-for-value:
  * under MaxRowsPerID(k), a count at PureDP(1) uses geometric scale k; an
  * average splits the budget between a deviation-sum and a count; under
  * zCDP(1) the discrete Gaussian variance is sens^2/(2 rho).
  */
class IdsNoiseScaleSpec extends SparkSpec {

  private def df = makeDf(
    StructType(Seq(longCol("id"), longCol("n"), dblCol("float_n"))),
    Seq(Row(1L, 2L, 2.0), Row(1L, 3L, 3.0), Row(2L, 5L, 5.0)))

  private def sess(zcdp: Boolean) = Session.fromDataFrame(spark,
    if (zcdp) RhoZCDPBudget(Rat.Inf) else PureDPBudget(Rat.Inf),
    "id_a1", df, AddRowsWithID("id"))

  private def scales(zcdp: Boolean, q: graft.ir.Query,
      b: graft.budget.PrivacyBudget): Seq[Double] =
    sess(zcdp).noiseInfo(q, b).map(_.mechanism.scale)

  test("PureDP(1): count under MaxRowsPerID(k) has geometric scale k " +
      "(test_noise_scale_puredp)") {
    for (k <- Seq(1, 2, 5)) {
      val q = QueryBuilder("id_a1").enforce(MaxRowsPerID(k)).count()
      assert(scales(zcdp = false, q, PureDPBudget(1.0)) === Seq(k.toDouble))
    }
  }

  test("PureDP(1): average splits eps between deviation-sum and count " +
      "(test_noise_scale_puredp)") {
    // [sum scale, count scale]: sum sensitivity k*(high-low)/2 at eps/2,
    // count sensitivity k at eps/2
    val cases = Seq(
      (1, 10.0, Seq(10.0, 2.0)),
      (5, 10.0, Seq(50.0, 10.0)),
      (1, 20.0, Seq(20.0, 2.0)),
      (5, 20.0, Seq(100.0, 10.0)))
    for ((k, high, expect) <- cases) {
      val q = QueryBuilder("id_a1").enforce(MaxRowsPerID(k)).average("n", 0, high)
      assert(scales(zcdp = false, q, PureDPBudget(1.0)) === expect,
        s"k=$k high=$high")
    }
  }

  test("zCDP(1): count variance is k^2/(2 rho) (test_noise_scale_zcdp)") {
    val expect = Map(1 -> 0.5, 2 -> 2.0, 5 -> 12.5)
    for ((k, s) <- expect) {
      val q = QueryBuilder("id_a1").enforce(MaxRowsPerID(k)).count()
      assert(scales(zcdp = true, q, RhoZCDPBudget(1.0)) === Seq(s))
    }
  }

  test("zCDP(1): average variances for integer and float measures " +
      "(test_noise_scale_zcdp)") {
    val cases = Seq(
      ("n", 1, 10.0, Seq(25.0, 1.0)),
      ("n", 5, 10.0, Seq(625.0, 25.0)),
      ("n", 1, 20.0, Seq(100.0, 1.0)),
      ("n", 5, 20.0, Seq(2500.0, 25.0)),
      ("float_n", 1, 20.0, Seq(100.0, 1.0)),
      ("float_n", 5, 20.0, Seq(2500.0, 25.0)))
    for ((col, k, high, expect) <- cases) {
      val q = QueryBuilder("id_a1").enforce(MaxRowsPerID(k)).average(col, 0, high)
      assert(scales(zcdp = true, q, RhoZCDPBudget(1.0)) === expect,
        s"col=$col k=$k high=$high")
    }
  }

  test("L0 x L-inf: PureDP scales multiply groups and rows-per-group " +
      "(test_l0_linf_truncation.py test_noise_scale_puredp)") {
    val keys = KeySet.fromColumn("n", Seq(2L, 3L, 5L))
    def q(g: Int, r: Int) = QueryBuilder("id_a1")
      .enforce(graft.constraints.MaxGroupsPerID("n", g))
      .enforce(graft.constraints.MaxRowsPerGroupPerID("n", r))
    assert(scales(zcdp = false, q(1, 1).count(), PureDPBudget(1.0)) === Seq(1.0))
    assert(scales(zcdp = false, q(1, 1).groupby(keys).count(), PureDPBudget(1.0))
      === Seq(1.0))
    assert(scales(zcdp = false, q(2, 1).count(), PureDPBudget(1.0)) === Seq(2.0))
    assert(scales(zcdp = false, q(2, 1).groupby(keys).count(), PureDPBudget(1.0))
      === Seq(2.0))
    // average (0,10): dev-sum sens 5*g*r at eps/2, count sens g*r at eps/2
    assert(scales(zcdp = false, q(2, 3).average("float_n", 0, 10), PureDPBudget(1.0))
      === Seq(60.0, 12.0))
  }

  test("L0 x L-inf: zCDP grouped on the constraint column earns the sqrt(g) " +
      "L2 credit (test_l0_linf_truncation.py test_noise_scale_zcdp)") {
    val keys = KeySet.fromColumn("n", Seq(2L, 3L, 5L))
    def q(g: Int, r: Int) = QueryBuilder("id_a1")
      .enforce(graft.constraints.MaxGroupsPerID("n", g))
      .enforce(graft.constraints.MaxRowsPerGroupPerID("n", r))
    assert(scales(zcdp = true, q(1, 1).count(), RhoZCDPBudget(1.0)) === Seq(0.5))
    assert(scales(zcdp = true, q(1, 1).groupby(keys).count(), RhoZCDPBudget(1.0))
      === Seq(0.5))
    // ungrouped: L1 distance g*r = 2 -> sigma^2 = 4/2 = 2
    assert(scales(zcdp = true, q(2, 1).count(), RhoZCDPBudget(1.0)) === Seq(2.0))
    // grouped on the constraint column: L2 distance r*sqrt(g) -> sigma^2 = 1
    assert(scales(zcdp = true, q(2, 1).groupby(keys).count(), RhoZCDPBudget(1.0))
      === Seq(1.0))
    // average (0,10) g=2 r=3, parts at rho/2: ungrouped [900, 36],
    // grouped with the credit [450, 18]
    assert(scales(zcdp = true, q(2, 3).average("float_n", 0, 10), RhoZCDPBudget(1.0))
      === Seq(900.0, 36.0))
    assert(scales(zcdp = true, q(2, 3).groupby(keys).average("float_n", 0, 10),
      RhoZCDPBudget(1.0)) === Seq(450.0, 18.0))
  }

  private def gdf = makeDf(
    StructType(Seq(longCol("id"), strCol("group"), strCol("group2"))),
    Seq(Row(1L, "A", "X"), Row(1L, "A", "Y"), Row(2L, "B", "X")))

  private def gsess(zcdp: Boolean) = Session.fromDataFrame(spark,
    if (zcdp) RhoZCDPBudget(Rat.Inf) else PureDPBudget(Rat.Inf),
    "id_a1", gdf, AddRowsWithID("id"))

  test("constraint selection picks the lowest-noise truncation " +
      "(test_constraint_selection_puredp)") {
    val keys = KeySet.fromColumn("group", Seq("A", "B"))
    val keys2 = KeySet.fromColumn("group2", Seq("X", "Y"))
    def base(r: Int) = QueryBuilder("id_a1").enforce(MaxRowsPerID(5))
      .enforce(graft.constraints.MaxGroupsPerID("group", 2))
      .enforce(graft.constraints.MaxRowsPerGroupPerID("group", r))
    def sc(q: graft.ir.Query): Seq[Double] =
      gsess(zcdp = false).noiseInfo(q, PureDPBudget(1.0)).map(_.mechanism.scale)
    // {5, 2x3}: min(5, 6) = 5 everywhere
    assert(sc(base(3).count()) === Seq(5.0))
    assert(sc(base(3).groupby(keys).count()) === Seq(5.0))
    // {5, 2x2}: min(5, 4) = 4, grouped or not
    assert(sc(base(2).groupby(keys).count()) === Seq(4.0))
    assert(sc(base(2).groupby(keys2).count()) === Seq(4.0))
  }

  test("constraint selection under zCDP compares SQUARED L2 bounds " +
      "(test_constraint_selection_zcdp)") {
    val keys = KeySet.fromColumn("group", Seq("A", "B"))
    val keys2 = KeySet.fromColumn("group2", Seq("X", "Y"))
    def base = QueryBuilder("id_a1").enforce(MaxRowsPerID(5))
      .enforce(graft.constraints.MaxGroupsPerID("group", 2))
      .enforce(graft.constraints.MaxRowsPerGroupPerID("group", 3))
    def sc(q: graft.ir.Query): Seq[Double] =
      gsess(zcdp = true).noiseInfo(q, RhoZCDPBudget(1.0)).map(_.mechanism.scale)
    // ungrouped: min(5^2, 6^2) = 25 -> sigma^2 = 25/2
    assert(sc(base.count()) === Seq(12.5))
    // grouped on the pair's column: min(25, 3^2*2 = 18) = 18 -> sigma^2 = 9
    assert(sc(base.groupby(keys).count()) === Seq(9.0))
    // grouped on an unrelated column: no credit -> min(25, 36) -> 12.5
    assert(sc(base.groupby(keys2).count()) === Seq(12.5))
  }

  test("grouped count after truncation keeps the same scale (keyset join " +
      "does not change sensitivity)") {
    val keys = KeySet.fromColumn("n", Seq(2L, 3L, 5L))
    val q = QueryBuilder("id_a1").enforce(MaxRowsPerID(2)).groupby(keys).count()
    assert(scales(zcdp = false, q, PureDPBudget(1.0)) === Seq(2.0))
    assert(scales(zcdp = true, q, RhoZCDPBudget(1.0)) === Seq(2.0))
  }
}
