package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddRowsWithID
import graft.budget.{PureDPBudget, Rat}
import graft.constraints.MaxRowsPerID
import graft.ir._
import graft.session.Session
import graft.types.{ColumnDescriptor, ColumnType}

/** IDs-world stability propagation, mirroring the reference's
  * transformation-visitor add-keys suite (transformation_visitor/
  * test_add_keys.py): under AddRemoveKeys the per-ID distance is invariant
  * through row-level transforms — only the enforced constraint at
  * aggregation time sets the sensitivity, no matter how many rows a
  * transform fan-out created per ID.
  */
class IdsStabilitySpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)
  private val eps1 = PureDPBudget(1.0)

  private def df = makeDf(
    StructType(Seq(longCol("uid"), strCol("flag"), longCol("qty"))),
    Seq(Row(1L, "A", 1L), Row(1L, "B", 2L), Row(2L, "A", 3L)))

  private def sess() = Session.fromDataFrame(spark, Inf, "t", df, AddRowsWithID("uid"))

  private def scale(qb: QueryBuilder): Double =
    sess().noiseInfo(qb.enforce(MaxRowsPerID(3)).count(), eps1)
      .head.mechanism.scale

  test("row transforms never change the per-ID distance") {
    assert(scale(QueryBuilder("t")) === 3.0)
    assert(scale(QueryBuilder("t").filter("qty > 0")) === 3.0)
    assert(scale(QueryBuilder("t").rename(Map("qty" -> "q2"))) === 3.0)
    assert(scale(QueryBuilder("t").map(identity,
      Seq("z" -> ColumnDescriptor(ColumnType.Integer)), augment = true)) === 3.0)
  }

  test("flat-map fan-out per ID is re-bounded by the enforced constraint") {
    // the flat map doubles each ID's rows, but enforce(MaxRowsPerID(3))
    // AFTER it re-truncates, so sensitivity is still 3 — the reference's
    // AddRemoveKeys metric measures IDs, not rows
    val q = QueryBuilder("t").flatMap(r => Seq(r, r),
      Seq("c" -> ColumnDescriptor(ColumnType.Integer)),
      maxRows = 2, augment = true)
    assert(scale(q) === 3.0)
  }

  test("flat_map_by_id keeps the ID metric without any constraint scaling") {
    val q = QueryBuilder("t").flatMapByID(rs => rs.take(5),
      Seq("n" -> ColumnDescriptor(ColumnType.Integer)))
    // downstream enforcement bounds rows per ID as usual
    assert(sess().noiseInfo(
      q.enforce(MaxRowsPerID(2)).count(), eps1).head.mechanism.scale === 2.0)
  }

  test("same-space private joins stay in the IDs world at the same distance") {
    val q = QueryBuilder("t").joinPrivate(
      QueryBuilder("t").rename(Map("flag" -> "f2", "qty" -> "q2")), Seq("uid"))
    assert(scale(q) === 3.0)
  }

  test("maxIDs scales the per-ID distance linearly") {
    val s = Session.fromDataFrame(spark, Inf, "t", df,
      AddRowsWithID("uid", maxIDs = 2))
    assert(s.noiseInfo(
      QueryBuilder("t").enforce(MaxRowsPerID(3)).count(), eps1)
      .head.mechanism.scale === 6.0)
  }
}
