package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddRowsWithID
import graft.budget.{PureDPBudget, Rat, RhoZCDPBudget}
import graft.constraints._
import graft.ir._
import graft.types.{ColumnDescriptor, ColumnType}

/** System-level constraint propagation through create_view, mirroring
  * test/system/session/ids/test_constraint_propagation.py: a view built
  * from a transformed IDs query carries exactly the constraints the
  * reference's propagation table predicts — verified via the session's
  * per-table constraint registry, not the unit-level propagation function.
  */
class ConstraintPropagationSystemSpec extends SparkSpec {

  // the reference's canonical enforced set (_CONSTRAINTS0)
  private val C0: Seq[Constraint] = Seq(
    MaxRowsPerID(5),
    MaxGroupsPerID("group", 4),
    MaxGroupsPerID("group2", 3),
    MaxRowsPerGroupPerID("group", 2),
    MaxRowsPerGroupPerID("group2", 1))

  private def fixture = makeDf(
    StructType(Seq(longCol("id"), strCol("group"), strCol("group2"), longCol("n"))),
    Seq(Row(1L, "a", "x", 5L), Row(1L, "b", "y", 8L), Row(2L, "a", "x", 7L)))

  private def sessions = Seq(
    Session.fromDataFrame(spark, PureDPBudget(Rat.Inf), "t", fixture,
      AddRowsWithID("id")),
    Session.fromDataFrame(spark, RhoZCDPBudget(Rat.Inf), "t", fixture,
      AddRowsWithID("id")))

  private def propagated(
      f: QueryBuilder => QueryBuilder,
      constraints: Seq[Constraint] = C0): Seq[Set[Constraint]] =
    sessions.map { s =>
      val q = constraints.foldLeft(QueryBuilder("t"))((b, c) => b.enforce(c))
      s.createView(f(q), "view", cache = false)
      s.getConstraints("view").toSet
    }

  test("rename: constraints follow the renamed column; id renames keep all") {
    val expected = Set[Constraint](
      MaxRowsPerID(5),
      MaxGroupsPerID("g", 4), MaxGroupsPerID("group2", 3),
      MaxRowsPerGroupPerID("g", 2), MaxRowsPerGroupPerID("group2", 1))
    propagated(_.rename(Map("group" -> "g"))).foreach(c => assert(c === expected))
    propagated(_.rename(Map("id" -> "id2"))).foreach(c => assert(c === C0.toSet))
  }

  test("filter keeps every constraint (rows only drop)") {
    propagated(_.filter("n > 6")).foreach(c => assert(c === C0.toSet))
  }

  test("select drops constraints whose column vanished") {
    val expected = Set[Constraint](
      MaxRowsPerID(5), MaxGroupsPerID("group", 4), MaxRowsPerGroupPerID("group", 2))
    propagated(_.select("id", "group", "n")).foreach(c => assert(c === expected))
  }

  test("augmenting map keeps all constraints") {
    propagated(_.map(r => Map("m" -> 1L),
      Seq("m" -> ColumnDescriptor(ColumnType.Integer)), augment = true))
      .foreach(c => assert(c === C0.toSet))
  }

  test("flat map keeps only the groups-per-id bounds") {
    val expected = Set[Constraint](
      MaxGroupsPerID("group", 4), MaxGroupsPerID("group2", 3))
    propagated(_.flatMap(r => Seq(Map("m" -> 1L)),
      Seq("m" -> ColumnDescriptor(ColumnType.Integer)), maxRows = 2, augment = true))
      .foreach(c => assert(c === expected))
  }

  test("special-value transforms keep every constraint") {
    propagated(_.replaceNullAndNan()).foreach(c => assert(c === C0.toSet))
    propagated(_.replaceInfinity()).foreach(c => assert(c === C0.toSet))
    propagated(_.dropNullAndNan("n")).foreach(c => assert(c === C0.toSet))
    propagated(_.dropInfinity()).foreach(c => assert(c === C0.toSet))
  }

  test("the view's constraints actually authorize aggregation") {
    // a view carrying MaxRowsPerID(5) needs no re-enforcement downstream
    val s = sessions.head
    s.createView(QueryBuilder("t").enforce(MaxRowsPerID(5)).filter("n > 0"),
      "capped", cache = false)
    val out = s.evaluate(QueryBuilder("capped").count(),
      PureDPBudget(Rat.Inf)).collect().head.getLong(0)
    assert(out === 3L)
  }
}
