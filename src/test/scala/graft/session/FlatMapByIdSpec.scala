package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddRowsWithID
import graft.budget.{PureDPBudget, Rat}
import graft.constraints.MaxRowsPerID
import graft.ir._
import graft.types.{ColumnDescriptor, ColumnType}

/** Flat-map-by-ID system behavior on the reference's 4-row fixture
  * (test/system/session/ids/queries/test_flat_map_by_id.py): the lambda
  * sees exactly one user's rows per call, the ID column is preserved and
  * protected, and releases match the reference's expected values.
  */
class FlatMapByIdSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  private def fixture = makeDf(
    StructType(Seq(longCol("id"), longCol("x"))),
    Seq(Row(1L, 2L), Row(1L, 6L), Row(2L, 3L), Row(3L, 4L)))

  private def sess = Session.fromDataFrame(spark, Inf, "t", fixture,
    AddRowsWithID("id"))

  test("per-id reduction: one output row per user, summed downstream") {
    val q = QueryBuilder("t")
      .flatMapByID(rs => Seq(Map("sum" -> rs.map(_("x").asInstanceOf[Long]).sum)),
        Seq("sum" -> ColumnDescriptor(ColumnType.Integer)))
      .enforce(MaxRowsPerID(1))
      .sum("sum", 0, 10, "sum")
    assert(sess.evaluate(q, Inf).collect().head.getAs[Number](0).doubleValue === 15.0)
  }

  test("the lambda receives exactly one user's rows per invocation") {
    val q = QueryBuilder("t")
      .flatMapByID({ rs =>
        val ids = rs.map(_("id")).distinct
        // a mixed-user group would break the per-ID stability argument
        require(ids.size == 1, s"mixed ids in one group: $ids")
        val expected = ids.head.asInstanceOf[Long] match {
          case 1L => Set(2L, 6L)
          case 2L => Set(3L)
          case 3L => Set(4L)
        }
        require(rs.map(_("x").asInstanceOf[Long]).toSet == expected,
          s"wrong rows for id ${ids.head}")
        Seq(Map("n" -> rs.size.toLong))
      }, Seq("n" -> ColumnDescriptor(ColumnType.Integer)))
      .enforce(MaxRowsPerID(1))
      .count()
    assert(sess.evaluate(q, Inf).collect().head.getLong(0) === 3L)
  }

  test("emitting a column that collides with the id column is rejected") {
    intercept[Exception] {
      sess.evaluate(QueryBuilder("t")
        .flatMapByID(_ => Seq(Map("id" -> 1L)),
          Seq("id" -> ColumnDescriptor(ColumnType.Integer)))
        .enforce(MaxRowsPerID(1))
        .count(), Inf)
    }
  }

  test("no output columns: pure per-id fan-out feeding a count") {
    val q = QueryBuilder("t")
      .flatMapByID(rs => rs.flatMap(r =>
        Seq.fill(r("x").asInstanceOf[Long].toInt)(Map.empty[String, Any])),
        Seq.empty)
      .enforce(MaxRowsPerID(10))
      .count()
    assert(sess.evaluate(q, Inf).collect().head.getLong(0) === 15L)
  }

  test("output schema: id kept non-null, new columns nullable") {
    val out = QueryBuilder("t")
      .flatMapByID(rs => Seq(Map("v" -> 1L)),
        Seq("v" -> ColumnDescriptor(ColumnType.Integer)))
      .expr.schema(graft.ir.CatalogSchemas(
        Map("t" -> graft.types.TableSchema.fromSpark(fixture.schema,
          idColumn = Some("id"), idSpace = Some("default"))),
        Map.empty))
    assert(out.idColumn === Some("id"))
    assert(out.columns.toMap.apply("v").allowNull)
    assert(out.columns.map(_._1).contains("id"))
  }
}
