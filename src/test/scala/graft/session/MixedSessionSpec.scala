package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddRowsWithID
import graft.budget.{PrivacyBudget, PureDPBudget, Rat, RhoZCDPBudget}
import graft.constraints.{MaxGroupsPerID, MaxRowsPerGroupPerID, MaxRowsPerID}
import graft.ir.QueryBuilder

/** Views over IDs tables with continued transformations, mirroring
  * test/system/session/mixed/test_mixed_session.py on the reference's
  * id_a1 / id_a2 fixtures: view constraints persist, a flat map
  * invalidates row constraints (but stays in the IDs world), and
  * re-enforcing enables aggregation with the reference's exact counts.
  */
class MixedSessionSpec extends SparkSpec {

  private def id1 = makeDf(
    StructType(Seq(longCol("id"), strCol("group"), strCol("group2"),
      longCol("n"), dblCol("float_n"))),
    Seq(Row(1L, "A", "X", 4L, 4.0), Row(1L, "A", "Y", 5L, 5.0),
      Row(1L, "A", "X", 6L, 6.0), Row(2L, "A", "Y", 7L, 7.0),
      Row(3L, "A", "X", 8L, 8.0), Row(3L, "B", "Y", 9L, 9.0)))

  private def id2 = makeDf(
    StructType(Seq(longCol("id"), strCol("group"), longCol("x"))),
    Seq(Row(1L, "A", 12L), Row(1L, "B", 15L), Row(1L, "A", 18L),
      Row(2L, "B", 21L), Row(3L, "A", 24L), Row(3L, "B", 27L)))

  private def sess(b: PrivacyBudget) = new Session.Builder()
    .withPrivacyBudget(b)
    .withIdSpace("a")
    .withPrivateDataFrame("id_a1", id1, AddRowsWithID("id", "a"))
    .withPrivateDataFrame("id_a2", id2, AddRowsWithID("id", "a"))
    .build(spark)

  private val budgets = Seq[PrivacyBudget](
    PureDPBudget(Rat.Inf), RhoZCDPBudget(Rat.Inf))

  test("view constraints are saved and dropped with the view " +
      "(test_view_constraint)") {
    for (b <- budgets) {
      val s = sess(b)
      s.createView(QueryBuilder("id_a1").enforce(MaxRowsPerID(1))
        .enforce(MaxGroupsPerID("group", 1))
        .enforce(MaxRowsPerGroupPerID("group", 1)), "view", cache = false)
      assert(s.getConstraints("view") === Seq(MaxRowsPerID(1),
        MaxGroupsPerID("group", 1), MaxRowsPerGroupPerID("group", 1)))
      s.deleteView("view")
      assert(!s.privateSources.contains("view"))
    }
  }

  test("views aggregate immediately or continue as IDs transformations " +
      "(test_evaluate_view)") {
    // (view builder, filter condition, count(view), count after
    // flat_map -> filter -> enforce(MaxRowsPerID(1)))
    val cases: Seq[(QueryBuilder, String, Long, Long)] = Seq(
      (QueryBuilder("id_a1").enforce(MaxRowsPerID(3)), "n > 4", 6L, 3L),
      (QueryBuilder("id_a1").enforce(MaxRowsPerID(1)), "n < 4", 3L, 0L),
      (QueryBuilder("id_a2").enforce(MaxRowsPerID(3)), "x < 24", 6L, 2L),
      (QueryBuilder("id_a1").enforce(MaxGroupsPerID("group", 3))
        .enforce(MaxRowsPerGroupPerID("group", 2)), "n > 4", 5L, 3L))
    for (b <- budgets; ((builder, cond, first, second), i) <- cases.zipWithIndex) {
      val s = sess(b)
      s.createView(builder, "query_view", cache = false)
      val got = s.evaluate(QueryBuilder("query_view").count(), b)
        .collect().head.getLong(0)
      assert(got === first, s"case $i first")
      // an augmenting flat map stays in the IDs world but invalidates the
      // per-ID row constraints: aggregating without re-enforcing fails
      val q2base = QueryBuilder("query_view")
        .flatMap(_ => Seq(Map.empty), Nil, maxRows = 1, augment = true)
        .filter(cond)
      val e = intercept[IllegalArgumentException] {
        s.evaluate(q2base.count(), b)
      }
      assert(e.getMessage.contains("constraint"))
      val second0 = s.evaluate(q2base.enforce(MaxRowsPerID(1)).count(), b)
        .collect().head.getLong(0)
      assert(second0 === second, s"case $i second")
      s.deleteView("query_view")
    }
  }

  test("one session answers both IDs and rows queries (test_mixed_session)") {
    for (b <- budgets) {
      val s = new Session.Builder()
        .withPrivacyBudget(b)
        .withIdSpace("a")
        .withPrivateDataFrame("id_a1", id1, AddRowsWithID("id", "a"))
        .withPrivateDataFrame("rows", id2, graft.accounting.AddOneRow())
        .build(spark)
      val idsCount = s.evaluate(
        QueryBuilder("id_a1").enforce(MaxRowsPerID(3)).count(), b)
        .collect().head.getLong(0)
      assert(idsCount === 6L)
      val rowsCount = s.evaluate(QueryBuilder("rows").count(), b)
        .collect().head.getLong(0)
      assert(rowsCount === 6L)
    }
  }
}
