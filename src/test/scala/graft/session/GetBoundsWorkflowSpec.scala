package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir.QueryBuilder

/** The get_bounds -> sum workflow, mirroring
  * test_add_max_rows.py:436-548: the discovered power-of-two bounds feed a
  * sum whose clamping then loses at most the 5% tail the 0.95-threshold
  * scorer permits, across positive / negative / mixed / float data.
  */
class GetBoundsWorkflowSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  private def check(values: Seq[Double], asLong: Boolean): Unit = {
    val df =
      if (asLong) makeDf(StructType(Seq(longCol("X"))),
        values.map(v => Row(v.toLong)))
      else makeDf(StructType(Seq(dblCol("X"))), values.map(Row(_)))
    val s = Session.fromDataFrame(spark, Inf, "private", df, AddOneRow())
    val b = s.evaluate(QueryBuilder("private").getBounds("X"), Inf).collect()
    assert(b.length === 1)
    val (lower, upper) =
      if (asLong) (b.head.getLong(0).toDouble, b.head.getLong(1).toDouble)
      else (b.head.getDouble(0), b.head.getDouble(1))
    assert(lower < upper)
    val got: Double = s.evaluate(
      QueryBuilder("private").sum("X", lower, upper, "sum"), Inf).collect()
      .head.get(0) match {
      case l: java.lang.Long   => l.toDouble
      case d: java.lang.Double => d.doubleValue()
      case other               => fail(s"unexpected sum type: $other")
    }
    val trueSum = values.sum
    assert((trueSum < 0) === (got < 0), s"sign: $got vs $trueSum")
    assert(math.abs(got) >= 0.9 * math.abs(trueSum) &&
      math.abs(got) <= 1.1 * math.abs(trueSum), s"$got vs $trueSum")
  }

  test("positive ints (test_get_bounds_inf_budget_sum: positive)") {
    check((0 until 100).map(_.toDouble), asLong = true)
  }
  test("negative ints (case negative)") {
    check((-99 until 0).map(_.toDouble), asLong = true)
  }
  test("mixed-sign ints (case positive_and_negative)") {
    check((-99 until 100).map(_.toDouble), asLong = true)
  }
  test("floats (case floats)") {
    check((-99 until 100).map(_ + 0.5), asLong = false)
  }

  test("get_bounds error paths name the offending column " +
      "(test_get_bounds_invalid_columns)") {
    val strDf = makeDf(StructType(Seq(strCol("str_column"))),
      Seq(Row("0"), Row("1")))
    val s = Session.fromDataFrame(spark, Inf, "private", strDf, AddOneRow())
    val e1 = intercept[IllegalArgumentException] {
      s.evaluate(QueryBuilder("private").getBounds("str_column"), Inf)
    }
    assert(e1.getMessage.contains("str_column"))
    val e2 = intercept[IllegalArgumentException] {
      s.evaluate(QueryBuilder("private").getBounds("column_does_not_exist"), Inf)
    }
    assert(e2.getMessage.contains("column_does_not_exist"))
    // the privacy ID column cannot be a measure column
    val idDf = makeDf(StructType(Seq(longCol("id_column"), longCol("int_column"))),
      Seq(Row(0L, 10L), Row(1L, 20L)))
    val s2 = Session.fromDataFrame(spark, Inf, "p", idDf,
      graft.accounting.AddRowsWithID("id_column"))
    intercept[IllegalArgumentException] {
      s2.evaluate(QueryBuilder("p").getBounds("id_column"), Inf)
    }
  }
}
