package graft.session

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.{AddOneRow, AddRowsWithID}
import graft.budget.{PureDPBudget, Rat}
import graft.constraints.MaxRowsPerID
import graft.ir._
import graft.keyset.KeySet

/** End-to-end null/NaN/Inf behavior across the full aggregation x
  * drop/replace matrix, mirroring the reference system suite
  * (test/system/session/test_special_values.py — the compiler auto-inserts
  * DropNullAndNan + Inf clamping around measure columns,
  * _rewrite_rules.py:202-257). The 30-row fixture is the reference's:
  * 20 normal rows plus one row per kind of special value.
  */
class SpecialValuesSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  private val date = Date.valueOf("2000-01-01")
  private val time = Timestamp.valueOf("2020-01-01 00:00:00")

  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("int_no_null", LongType, nullable = false),
    StructField("int_nulls", LongType, nullable = true),
    StructField("float_no_special", DoubleType, nullable = false),
    StructField("float_nulls", DoubleType, nullable = true),
    StructField("float_nans", DoubleType, nullable = false),
    StructField("float_infs", DoubleType, nullable = false),
    StructField("float_all_special", DoubleType, nullable = true),
    StructField("date_nulls", DateType, nullable = true),
    StructField("time_nulls", TimestampType, nullable = true)))

  private def fixture = makeDf(schema,
    (0 until 20).map(i => Row(s"normal_$i", 1L, 1L, 1.0, 1.0, 1.0, 1.0, 1.0, date, time)) ++
      Seq(
        Row(null, 1L, 1L, 1.0, 1.0, 1.0, 1.0, 1.0, date, time),
        Row("u2", 1L, null, 1.0, 1.0, 1.0, 1.0, 1.0, date, time),
        Row("u3", 1L, 1L, 1.0, null, 1.0, 1.0, null, date, time),
        Row("u4", 1L, 1L, 1.0, 1.0, 1.0, 1.0, 1.0, null, time),
        Row("u5", 1L, 1L, 1.0, 1.0, 1.0, 1.0, 1.0, date, null),
        Row("a6", 1L, 1L, 1.0, 1.0, Double.NaN, 1.0, Double.NaN, date, time),
        Row("i7", 1L, 1L, 1.0, 1.0, 1.0, Double.PositiveInfinity, Double.PositiveInfinity, date, time),
        Row("i8", 1L, 1L, 1.0, 1.0, 1.0, Double.NegativeInfinity, Double.NegativeInfinity, date, time),
        Row("i9", 1L, 1L, 1.0, 1.0, 1.0, Double.PositiveInfinity, 1.0, date, time),
        Row("i10", 1L, 1L, 1.0, 1.0, 1.0, Double.NegativeInfinity, 1.0, date, time)))

  private def sess = Session.fromDataFrame(spark, Inf, "t", fixture, AddOneRow())
  private def idSess = Session.fromDataFrame(spark, Inf, "t", fixture,
    AddRowsWithID("id"))

  // integer-column sums come back as Long, decimal ones as Double
  private def oneDouble(q: Query, s: Session = sess): Double =
    s.evaluate(q, Inf).collect().head.getAs[Number](0).doubleValue
  private def oneLong(q: Query, s: Session = sess): Long =
    s.evaluate(q, Inf).collect().head.getLong(0)

  // ------------------------------------------------------- default behavior

  test("default: sums drop nulls, count_distinct counts special values") {
    // 29 ones + 1 null (dropped by the auto-rewrite)
    assert(oneDouble(QueryBuilder("t").sum("int_nulls", 0.0, 1.0)) === 29.0)
    // null, NaN, +Inf, -Inf, 1.0 are five distinct values
    assert(oneLong(QueryBuilder("t").countDistinct(Seq("float_all_special"))) === 5L)
    // 1.0, +Inf, -Inf — duplicates of each infinity collapse
    assert(oneLong(QueryBuilder("t").countDistinct(Seq("float_infs"))) === 3L)
    // 26 ones, null + NaN dropped, -Inf -> -100, +Inf -> 300
    assert(oneDouble(QueryBuilder("t").sum("float_all_special", -100.0, 300.0))
      === 226.0)
  }

  test("default: null is a valid group-by key") {
    val keys = KeySet.fromColumn("date_nulls", Seq(date, null))
    val out = sess.evaluate(QueryBuilder("t").groupby(keys).count(), Inf)
      .collect().map(r => Option(r.getDate(0)).map(_.toString) -> r.getLong(1)).toMap
    assert(out === Map(Some("2000-01-01") -> 29L, None -> 1L))
  }

  test("count keeps special-value rows; count after explicit drops does not") {
    assert(oneLong(QueryBuilder("t").count()) === 30L)
    assert(oneLong(QueryBuilder("t")
      .dropNullAndNan("float_all_special")
      .dropInfinity("float_all_special").count()) === 26L)
  }

  // -------------------------------------------------- replace null and nan

  test("replace_null_and_nan: explicit, untouched, and default replacements") {
    def avg(replaceWith: Map[String, Any], c: String, lo: Double, hi: Double) =
      oneDouble(QueryBuilder("t").replaceNullAndNan(replaceWith).average(c, lo, hi))
    // no-op on a column with no special values
    assert(avg(Map("int_no_null" -> 42L), "int_no_null", 0, 1) === 1.0)
    // (29 + 31) / 30
    assert(avg(Map("int_nulls" -> 31L), "int_nulls", 0, 100) === 2.0)
    // (29 + 61) / 30
    assert(avg(Map("float_nulls" -> 61.0), "float_nulls", 0, 100) === 3.0)
    // (29 + 91) / 30
    assert(avg(Map("float_nans" -> 91.0), "float_nans", 0, 100) === 4.0)
    // 26 ones, null -> 15, NaN -> 15, -Inf -> 0, +Inf -> 34: 90 / 30
    assert(avg(Map("float_all_special" -> 15.0), "float_all_special", 0, 34) === 3.0)
    // empty map = type defaults (0.0) everywhere
    assert(math.abs(avg(Map.empty, "float_nulls", 0, 1) - 29.0 / 30) < 1e-12)
    assert(math.abs(avg(Map.empty, "float_nans", 0, 1) - 29.0 / 30) < 1e-12)
  }

  // ------------------------------------------------------ drop null and nan

  test("drop_null_and_nan: targeted and whole-table drops") {
    assert(oneDouble(QueryBuilder("t").dropNullAndNan("int_nulls")
      .sum("int_nulls", 0.0, 1.0)) === 29.0)
    // dropping on an unrelated clean column is a no-op for this measure
    assert(oneDouble(QueryBuilder("t").dropNullAndNan("float_no_special")
      .sum("int_nulls", 0.0, 1.0)) === 29.0)
    // no argument = all columns: the 6 rows holding any null/NaN vanish
    assert(oneDouble(QueryBuilder("t").dropNullAndNan()
      .sum("float_no_special", 0.0, 1.0)) === 24.0)
  }

  // --------------------------------------------------------- infinity paths

  test("replace_infinity: explicit targets, clamping, and defaults") {
    def avg(replaceWith: Map[String, (Double, Double)], lo: Double, hi: Double) =
      oneDouble(QueryBuilder("t").replaceInfinity(replaceWith).average("float_infs", lo, hi))
    // 26 + 0 + 0 + 17 + 17 = 60 over 30 rows
    assert(avg(Map("float_infs" -> (0.0, 17.0)), -100, 100) === 2.0)
    // replacements clamp like any other value: 26 - 5 - 5 + 22 + 22 = 60
    assert(avg(Map("float_infs" -> (-4217.0, 300.0)), -5, 22) === 2.0)
    // replacing an unrelated column leaves the measure clamped to bounds:
    // 26 - 10 - 10 + 27 + 27 = 60
    assert(avg(Map("float_all_special" -> (-4217.0, 300.0)), -10, 27) === 2.0)
    // empty map = all infinities in all decimal columns -> 0.0
    assert(math.abs(avg(Map.empty, -10, 10) - 26.0 / 30) < 1e-12)
  }

  test("replace_infinity feeds sum/variance/stdev consistently") {
    def q(b: QueryBuilder => Query) = b(QueryBuilder("t")
      .replaceInfinity(Map("float_infs" -> (1.0, 1.0))))
    assert(oneDouble(q(_.sum("float_infs", 0.0, 1.0))) === 30.0)
    assert(oneDouble(q(_.variance("float_infs", 0.0, 1.0))) === 0.0)
    assert(oneDouble(q(_.stdev("float_infs", 0.0, 1.0))) === 0.0)
    // untouched measure column: infinities clamp to [0, 1] -> 28 ones, 2 zeros
    def q2(b: QueryBuilder => Query) = b(QueryBuilder("t")
      .replaceInfinity(Map("float_all_special" -> (1.0, 1.0))))
    assert(oneDouble(q2(_.sum("float_infs", 0.0, 1.0))) === 28.0)
    val expectVar = (2 * math.pow(28.0 / 30, 2) + 28 * math.pow(2.0 / 30, 2)) / 29
    assert(math.abs(oneDouble(q2(_.variance("float_infs", 0.0, 1.0))) - expectVar) < 1e-9)
    assert(math.abs(oneDouble(q2(_.stdev("float_infs", 0.0, 1.0))) - math.sqrt(expectVar)) < 1e-9)
    // default: all infinities -> 0: 26 ones, 4 zeros
    def q3(b: QueryBuilder => Query) = b(QueryBuilder("t").replaceInfinity())
    assert(oneDouble(q3(_.sum("float_infs", 0.0, 1.0))) === 26.0)
    val expectVar3 = (4 * math.pow(26.0 / 30, 2) + 26 * math.pow(4.0 / 30, 2)) / 29
    assert(math.abs(oneDouble(q3(_.variance("float_infs", 0.0, 1.0))) - expectVar3) < 1e-9)
  }

  test("drop_infinity: targeted, unrelated, cross-column, and whole-table") {
    def s(cols: Seq[String]) = oneDouble(
      QueryBuilder("t").dropInfinity(cols: _*).sum("float_infs", 0.0, 1.0))
    assert(s(Seq("float_infs")) === 26.0)
    // unrelated clean column: the 4 infinities clamp to the bounds instead
    assert(s(Seq("float_no_special")) === 28.0)
    // i7/i8 are infinite in BOTH columns; i9/i10 only in float_infs -> one
    // +Inf (clamped to 1) and one -Inf (clamped to 0) survive
    assert(s(Seq("float_all_special")) === 27.0)
    // no argument = all decimal columns
    assert(s(Nil) === 26.0)
  }

  // -------------------------------------------------------------- get_bounds

  test("get_bounds ignores nulls, NaNs, and infinities") {
    def bounds(b: QueryBuilder => Query): (Double, Double) = {
      val r = sess.evaluate(b(QueryBuilder("t")), Inf).collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    val (l1, u1) = bounds(_.getBounds("float_nans"))
    assert((l1, u1) === (-1.0, 1.0))
    val (l2, u2) = bounds(_.getBounds("float_infs"))
    assert((l2, u2) === (-1.0, 1.0))
    // after dropping null/NaN rows and mapping infinities to +-3, the 95%
    // envelope is the next power of two: 4
    val (l3, u3) = bounds(q => q.dropNullAndNan()
      .replaceInfinity(Map("float_infs" -> (-3.0, 3.0))).getBounds("float_infs"))
    assert((l3, u3) === (-4.0, 4.0))
  }

  // -------------------------------------------------------------- IDs tables

  test("privacy IDs: special values survive truncation; id nulls are kept") {
    // 26 ones + null -> 100 + NaN -> 100, infinities dropped
    assert(oneDouble(QueryBuilder("t").enforce(MaxRowsPerID(1))
      .replaceNullAndNan(Map("float_all_special" -> 100.0))
      .dropInfinity("float_all_special")
      .sum("float_all_special", 0.0, 200.0), idSess) === 226.0)
    // implicit handling: null/NaN dropped, -Inf -> -50, +Inf -> 100
    assert(oneDouble(QueryBuilder("t").enforce(MaxRowsPerID(1))
      .sum("float_all_special", -50.0, 100.0), idSess) === 76.0)
    // no-arg drop_null_and_nan never drops the privacy ID column: only the
    // 5 rows with nulls/NaNs in OTHER columns go (the null-id row stays)
    assert(oneDouble(QueryBuilder("t").dropNullAndNan()
      .enforce(MaxRowsPerID(1))
      .sum("int_no_null", 0.0, 1.0), idSess) === 25.0)
  }

  // ------------------------------------------------------------------- joins

  test("joins match on null and NaN keys; left join keeps unmatched rows") {
    val pub = makeDf(
      StructType(Seq(StructField("float_all_special", DoubleType, nullable = true),
        StructField("tag", StringType, nullable = false))),
      Seq(Row(null, "isnull"), Row(Double.NaN, "isnan"), Row(1.0, "isone")))
    val s = new Session.Builder().withPrivacyBudget(Inf)
      .withPrivateDataFrame("t", fixture, AddOneRow())
      .withPublicDataFrame("pub", pub)
      .build(spark)
    // inner: 26 ones + 1 null + 1 NaN match; the 2 infinities do not
    val inner = s.evaluate(QueryBuilder("t")
      .joinPublic("pub", Seq("float_all_special")).count(), Inf)
      .collect().head.getLong(0)
    assert(inner === 28L)
    // left: infinities survive with a null tag
    val left = s.evaluate(QueryBuilder("t")
      .joinPublic("pub", Seq("float_all_special"), how = "left")
      .filter("tag IS NULL").count(), Inf)
      .collect().head.getLong(0)
    assert(left === 2L)
  }

  test("private join on special-value keys preserves the values") {
    val s = new Session.Builder().withPrivacyBudget(Inf)
      .withIdSpace("ids")
      .withPrivateDataFrame("a", fixture.select("id", "float_all_special"),
        AddRowsWithID("id", "ids"))
      .withPrivateDataFrame("b", fixture.select("id", "int_no_null"),
        AddRowsWithID("id", "ids"))
      .build(spark)
    // join on the id column (which includes a null id): every row matches
    // itself null-safely, so all 30 survive
    val joined = s.evaluate(QueryBuilder("a")
      .joinPrivate(QueryBuilder("b"), Seq("id"))
      .enforce(MaxRowsPerID(1)).count(), Inf)
      .collect().head.getLong(0)
    assert(joined === 30L)
    // and the special values are intact after the join
    val sum = s.evaluate(QueryBuilder("a")
      .joinPrivate(QueryBuilder("b"), Seq("id"))
      .enforce(MaxRowsPerID(1))
      .dropInfinity("float_all_special")
      .replaceNullAndNan(Map("float_all_special" -> 100.0))
      .sum("float_all_special", 0.0, 200.0), Inf)
      .collect().head.getDouble(0)
    assert(sum === 26.0 + 100.0 + 100.0)
  }

  // ------------------------- full auto-rewrite matrix, hand-derived values

  test("auto-rewrite: sum over every float column with clamp [0,2]") {
    // float_nulls: 29 ones, null dropped
    assert(oneDouble(QueryBuilder("t").sum("float_nulls", 0.0, 2.0)) === 29.0)
    // float_nans: 29 ones, NaN dropped
    assert(oneDouble(QueryBuilder("t").sum("float_nans", 0.0, 2.0)) === 29.0)
    // float_infs: 26 ones, two +Inf -> 2, two -Inf -> 0
    assert(oneDouble(QueryBuilder("t").sum("float_infs", 0.0, 2.0)) === 30.0)
    // float_all_special: 26 ones, null+NaN dropped, +Inf -> 2, -Inf -> 0
    assert(oneDouble(QueryBuilder("t").sum("float_all_special", 0.0, 2.0)) === 28.0)
  }

  test("auto-rewrite: average over special-value columns") {
    // float_infs: (26 + 2 + 2 + 0 + 0) / 30
    assert(oneDouble(QueryBuilder("t").average("float_infs", 0.0, 2.0)) === 1.0)
    // float_all_special: 28 surviving rows summing to 28
    assert(oneDouble(QueryBuilder("t").average("float_all_special", 0.0, 2.0)) === 1.0)
    // int_nulls: 29 surviving ones
    assert(oneDouble(QueryBuilder("t").average("int_nulls", 0.0, 2.0)) === 1.0)
  }

  test("auto-rewrite: variance sees clamped infinities as real deviations") {
    // float_infs clamped [0,2]: deviations from mid 1 are 26 zeros, +1,
    // +1, -1, -1 -> sumdev 0, sumdev^2 4, n 30 -> 4/29
    assert(math.abs(oneDouble(
      QueryBuilder("t").variance("float_infs", 0.0, 2.0)) - 4.0 / 29.0) < 1e-12)
    // float_all_special: 26 zeros, +1, -1 among n=28 -> 2/27
    assert(math.abs(oneDouble(
      QueryBuilder("t").variance("float_all_special", 0.0, 2.0)) - 2.0 / 27.0) < 1e-12)
    // a constant column has zero variance
    assert(oneDouble(QueryBuilder("t").variance("float_no_special", 0.0, 2.0)) === 0.0)
  }

  test("auto-rewrite: median lands on the data mode despite special values") {
    val m = oneDouble(QueryBuilder("t").median("float_all_special", 0.0, 2.0))
    assert(m >= 0.5 && m <= 1.5, s"median $m should be near the 26 ones")
    val m2 = oneDouble(QueryBuilder("t").median("int_nulls", 0.0, 2.0))
    assert(m2 >= 0.5 && m2 <= 1.5)
  }

  test("count_distinct over column pairs keeps special combinations distinct") {
    // (float_infs, float_nans) pairs: (1,1) x25, (1,NaN), (+Inf,1) x2,
    // (-Inf,1) x2 -> 4 distinct pairs
    assert(oneLong(QueryBuilder("t")
      .countDistinct(Seq("float_infs", "float_nans"))) === 4L)
  }

  test("grouped sum with a null group key aggregates the null group") {
    val keys = KeySet.fromColumn("date_nulls", Seq(date, null))
    val out = sess.evaluate(
      QueryBuilder("t").groupby(keys).sum("int_no_null", 0.0, 1.0), Inf)
      .collect().map(r => Option(r.getDate(0)).map(_.toString) -> r.getAs[Number](1).doubleValue).toMap
    assert(out === Map(Some("2000-01-01") -> 29.0, None -> 1.0))
  }

  test("explicit drops compose and are idempotent") {
    val q = QueryBuilder("t")
      .dropNullAndNan("float_all_special")
      .dropNullAndNan("float_all_special")
      .dropInfinity("float_all_special")
      .dropInfinity("float_all_special")
      .count()
    assert(oneLong(q) === 26L)
    // order does not matter
    val q2 = QueryBuilder("t")
      .dropInfinity("float_all_special")
      .dropNullAndNan("float_all_special")
      .count()
    assert(oneLong(q2) === 26L)
  }

  test("replace then aggregate: infinities replaced before clamping") {
    // replace +-Inf with (0, 10), then clamp [0,2]: 26 ones + 10->2 + 0
    assert(oneDouble(QueryBuilder("t")
      .replaceInfinity(Map("float_infs" -> (0.0, 10.0)))
      .sum("float_infs", 0.0, 2.0)) === 26.0 + 2.0 + 2.0 + 0.0 + 0.0)
  }

  test("ids world: special measure values survive per-id truncation") {
    val n = idSess.evaluate(QueryBuilder("t")
      .enforce(MaxRowsPerID(1))
      .sum("float_all_special", 0.0, 2.0), Inf)
      .collect().head.getDouble(0)
    // every id keeps one row; specials clamp/drop as usual: ids are the 20
    // normal ids + null + u2..u5 + a6 + i7..i10 = 30 distinct ids, but
    // null/NaN measures drop 2 rows and +-Inf clamp to 2/0
    assert(n === 26.0 + 2.0 + 0.0)
  }

  // ------------------------------------------------------------- error paths

  test("invalid queries fail at analysis, not execution") {
    // unknown measure column
    intercept[Exception] {
      sess.evaluate(QueryBuilder("t").sum("nope", 0.0, 1.0), Inf)
    }
    // aggregating a varchar column
    intercept[Exception] {
      sess.evaluate(QueryBuilder("t").sum("id", 0.0, 1.0), Inf)
    }
    // group-by key not in the schema
    intercept[Exception] {
      sess.evaluate(QueryBuilder("t")
        .groupby(KeySet.fromColumn("ghost", Seq("x"))).count(), Inf)
    }
    // unknown source table
    intercept[Exception] {
      sess.evaluate(QueryBuilder("missing").count(), Inf)
    }
    // IDs aggregation without an enforced constraint
    intercept[Exception] {
      idSess.evaluate(QueryBuilder("t").sum("int_no_null", 0.0, 1.0), Inf)
    }
  }
}
