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

  test("emitted nulls, NaNs, and infinities flow through declared-special " +
      "columns (test_nulls_nans_infs_allowed)") {
    // one user's lambda emits a special value per row; the declared schema
    // admits them, so counts see every row and a replace+sum can use them
    def q(v: Long => Any) = QueryBuilder("t")
      .flatMapByID(rs => rs.map(r =>
          Map("v" -> v(r("id").asInstanceOf[Long]))),
        Seq("v" -> ColumnDescriptor(ColumnType.Decimal,
          allowNull = true, allowNaN = true, allowInf = true)))
      .enforce(MaxRowsPerID(10))
    def count(f: Long => Any): Long =
      sess.evaluate(q(f).count(), Inf).collect().head.getLong(0)
    assert(count(id => if (id == 1L) null else 1.0) === 4L)
    assert(count(id => if (id == 1L) Double.NaN else 1.0) === 4L)
    assert(count(id => if (id == 1L) Double.PositiveInfinity else 1.0) === 4L)
    // replace handles each special kind before a clamped sum: user 1's two
    // rows become 0, the other two rows contribute 1 each
    val replaced = sess.evaluate(
      q(id => if (id == 1L) Double.NaN else 1.0)
        .replaceNullAndNan(Map("v" -> 0.0)).sum("v", 0.0, 1.0, "s"), Inf)
      .collect().head.getDouble(0)
    assert(replaced === 2.0)
    val infReplaced = sess.evaluate(
      q(id => if (id == 1L) Double.PositiveInfinity else 1.0)
        .replaceInfinity(Map("v" -> (0.0, 0.0))).sum("v", 0.0, 1.0, "s"), Inf)
      .collect().head.getDouble(0)
    assert(infReplaced === 2.0)
  }
}
