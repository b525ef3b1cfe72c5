package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir._
import graft.keyset.KeySet

/** End-to-end null/NaN/Inf behavior (reference: test_special_values.py —
  * the compiler auto-inserts DropNullAndNan + Inf clamping around measure
  * columns, _rewrite_rules.py:202-257).
  */
class SpecialValuesSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  private def df = makeDf(
    StructType(Seq(strCol("g"), StructField("x", DoubleType, nullable = true))),
    Seq(Row("A", 1.0), Row("A", null), Row("A", Double.NaN),
      Row("A", Double.PositiveInfinity), Row("A", Double.NegativeInfinity),
      Row("B", 5.0)))

  private def sess = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())

  test("sum: nulls/NaNs dropped, infinities clamp to the bounds") {
    val out = sess.evaluate(
      QueryBuilder("t").groupby(KeySet.fromColumn("g", Seq("A", "B")))
        .sum("x", 0.0, 10.0), Inf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // A: 1.0 + (+Inf -> 10) + (-Inf -> 0); null and NaN rows dropped
    assert(out === Map("A" -> 11.0, "B" -> 5.0))
  }

  test("count keeps special-value rows; count after explicit drop does not") {
    val n = sess.evaluate(QueryBuilder("t").count(), Inf).collect().head.getLong(0)
    assert(n === 6L)
    val n2 = sess.evaluate(
      QueryBuilder("t").dropNullAndNan("x").dropInfinity("x").count(), Inf)
      .collect().head.getLong(0)
    assert(n2 === 2L)
  }

  test("replace_null_and_nan then sum counts the replaced values") {
    val out = sess.evaluate(
      QueryBuilder("t").replaceNullAndNan(Map("x" -> 2.0))
        .replaceInfinity(Map("x" -> (0.0, 10.0)))
        .groupby(KeySet.fromColumn("g", Seq("A")))
        .average("x", 0.0, 10.0), Inf)
      .collect().head.getDouble(1)
    // A values: 1, 2, 2, 10, 0 -> mean 3.0
    assert(math.abs(out - 3.0) < 1e-12)
  }

  test("replace with empty map applies type defaults everywhere") {
    val d2 = makeDf(
      StructType(Seq(StructField("s", StringType, nullable = true),
        StructField("x", DoubleType, nullable = true))),
      Seq(Row(null, null), Row("a", 1.0)))
    val s = Session.fromDataFrame(spark, Inf, "t", d2, AddOneRow())
    val out = s.evaluate(
      QueryBuilder("t").replaceNullAndNan()
        .filter("s = '' AND x = 0.0").count(), Inf)
      .collect().head.getLong(0)
    assert(out === 1L)
  }

  test("quantile ignores special values via the same rewrite") {
    val med = sess.evaluate(
      QueryBuilder("t").groupby(KeySet.fromColumn("g", Seq("A")))
        .median("x", 0.0, 10.0), Inf)
      .collect().head.getDouble(1)
    // surviving A values after drop: 1.0, +Inf->10, -Inf->0 (clamped)
    assert(med >= 0.0 && med <= 10.0)
  }
}
