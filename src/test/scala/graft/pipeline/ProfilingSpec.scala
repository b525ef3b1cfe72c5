package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** benfordAudit, categoricalProfile, pairAffinity. */
class ProfilingSpec extends SparkSpec {

  private val vSchema = StructType(Seq(longCol("v")))
  private def vals(rows: java.lang.Long*) =
    makeDf(vSchema, rows.map(Row(_)))

  test("benfordAudit releases all nine digits with exact ppm") {
    val out = Quality.benfordAudit(
      vals(1L, 1L, 2L, 19L, 100L, -5L, 0L, null), "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === (1L to 9L).toSet)
    // positives: 1,1,2,19,100 -> digit 1 x4, digit 2 x1; total 5
    assert(out(1L) === ((4L, 800000L, 301029L, 498971L)))
    assert(out(2L) === ((1L, 200000L, 176091L, 23909L)))
    assert(out(9L) === ((0L, 0L, 45757L, -45757L)))
  }

  test("benfordAudit survives an all-dropped input (zero total)") {
    val out = Quality.benfordAudit(vals(0L, -3L, null), "v").collect()
    assert(out.length === 9)
    assert(out.forall(r => r.getLong(1) === 0L && r.getLong(2) === 0L))
  }

  test("benfordAudit rejects non-integral columns") {
    intercept[IllegalArgumentException] {
      Quality.benfordAudit(
        vals(1L).withColumn("v", col("v").cast("double")), "v")
    }
  }

  test("benfordAudit requantizes the expected table to ppmScale, so " +
      "observed and expected share units at any scale") {
    // ppb scale: every 1e6-scale pin multiplies by 1000 exactly
    val out = Quality.benfordAudit(
      vals(1L, 1L, 2L, 19L, 100L, -5L, 0L, null), "v",
      ppmScale = 1000000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((4L, 800000000L, 301029000L, 498971000L)))
    assert(out(2L) === ((1L, 200000000L, 176091000L, 23909000L)))
    assert(out(9L) === ((0L, 0L, 45757000L, -45757000L)))
  }

  test("benfordAudit observed share survives the 1e12 scale cap at " +
      "10M-row digit counts (decimal widening, no long overflow)") {
    // 10M rows, all leading digit 1: n * 1e12 = 1e19 > Long.MaxValue —
    // the pre-widening code overflowed here (ANSI error / wrapped sign)
    val big = spark.range(10000000L).selectExpr("id + 10000000 AS v")
    val out = Quality.benfordAudit(big, "v", ppmScale = 1000000000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((10000000L, 1000000000000L))) // all mass on digit 1
    assert(out(9L)._1 === 0L)
  }

  private val catSchema = StructType(Seq(strCol("x"), strCol("y")))

  test("categoricalProfile: exact shares, gini recurrence, null ledger") {
    val df = makeDf(catSchema, Seq(
      Row("a", null), Row("a", null), Row("a", null),
      Row("b", null), Row(null, null)))
    val out = Quality.categoricalProfile(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getLong(1) === 4L)           // n_values
    assert(x.getLong(2) === 1L)           // n_nulls
    assert(x.getLong(3) === 2L)           // n_distinct
    assert(x.getString(4) === "a")        // top_value
    assert(x.getLong(5) === 3L)           // top_count
    assert(x.getLong(6) === 750000L)      // top_share_ppm
    // gini = 1e6 - ((3*1e6 div 4)*3 + (1*1e6 div 4)*1) div 4 = 375000
    assert(x.getLong(7) === 375000L)
    val y = out("y")
    assert(y.getLong(1) === 0L && y.getLong(2) === 5L && y.getLong(3) === 0L)
    assert(y.isNullAt(4) && y.isNullAt(6) && y.isNullAt(7))
  }

  test("categoricalProfile modal tie goes to the least string") {
    val df = makeDf(catSchema,
      Seq(Row("b", "z"), Row("a", "z"), Row("c", "z")))
    val out = Quality.categoricalProfile(df, Seq("x"))
      .collect().head
    assert(out.getString(4) === "a" && out.getLong(5) === 1L)
  }

  test("categoricalProfile is partition-invariant") {
    val rows = (1 to 50).map(i => Row(s"v${i % 7}", s"w${i % 3}"))
    val df = makeDf(catSchema, rows)
    val a = Quality.categoricalProfile(df, Seq("x", "y"))
      .collect().map(_.toSeq).toSet
    val b = Quality.categoricalProfile(df.repartition(11), Seq("x", "y"))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  private val biSchema = StructType(Seq(strCol("b"), strCol("i")))

  test("pairAffinity releases exact lift and directional confidence") {
    val df = makeDf(biSchema, Seq(
      Row("b1", "x"), Row("b1", "y"),
      Row("b2", "x"), Row("b2", "y"),
      Row("b3", "x"), Row("b3", "z"),
      Row("b4", "y")))
    val out = CorpusStats.pairAffinity(df, "b", "i", minSupport = 2L)
      .collect()
    assert(out.length === 1)
    val r = out.head
    // columns: item_b, item_a order depends on join key order; read by name
    val m = r.getValuesMap[Any](Seq("item_a", "item_b", "support",
      "support_a", "support_b", "n_baskets", "lift_ppm",
      "conf_a_to_b_ppm", "conf_b_to_a_ppm"))
    assert(m("item_a") === "x" && m("item_b") === "y")
    assert(m("support") === 3L || m("support") === 2L)
    // supports: x in b1,b2,b3 = 3; y in b1,b2,b4 = 3; pair in b1,b2 = 2
    assert(m("support") === 2L)
    assert(m("support_a") === 3L && m("support_b") === 3L)
    assert(m("n_baskets") === 4L)
    // lift = 2*4*1e6 div (3*3) = 888888; conf = 2e6 div 3 = 666666
    assert(m("lift_ppm") === 888888L)
    assert(m("conf_a_to_b_ppm") === 666666L)
    assert(m("conf_b_to_a_ppm") === 666666L)
  }

  test("pairAffinity deduplicates repeated (basket, item) rows") {
    val df = makeDf(biSchema, Seq(
      Row("b1", "x"), Row("b1", "x"), Row("b1", "y"),
      Row("b2", "x"), Row("b2", "y")))
    val r = CorpusStats.pairAffinity(df, "b", "i", minSupport = 2L)
      .collect().head
    assert(r.getAs[Long]("support") === 2L)
    assert(r.getAs[Long]("support_a") === 2L)
    assert(r.getAs[Long]("n_baskets") === 2L)
    // lift = 2*2*1e6 div (2*2) = 1000000 (perfectly dependent = both
    // items in every basket -> independence baseline exactly)
    assert(r.getAs[Long]("lift_ppm") === 1000000L)
  }

  private val xyzSchema =
    StructType(Seq(longCol("x"), longCol("y"), longCol("z")))

  test("correlationSums: exact pairwise normal sums, pairwise deletion") {
    val df = makeDf(xyzSchema, Seq(
      Row(1L, 2L, null), Row(2L, 4L, 5L), Row(3L, 6L, 1L)))
    val out = CorpusStats.correlationSums(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    // (x, y): all 3 rows; y = 2x exactly
    assert(out(("x", "y")) === ((3L, 6L, 12L, 14L, 56L, 28L)))
    // (x, z): the null-z row drops for THIS pair only
    assert(out(("x", "z")) === ((2L, 5L, 6L, 13L, 26L, 13L)))
    assert(out(("y", "z")) === ((2L, 10L, 6L, 52L, 26L, 26L)))
  }

  test("correlationSums is one exchange of one row (single aggregate)") {
    val df = makeDf(xyzSchema,
      (1 to 40).map(i => Row(i.toLong, (i * 2).toLong, (i % 7).toLong)))
    val out = CorpusStats.correlationSums(df, Seq("x", "y"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    // perfectly linear: r^2 numerator == denominator product
    val r = out.collect().head
    val (n, sx, sy, sxx, syy, sxy) = (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    val num = n * sxy - sx * sy
    assert(num * num === (n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("correlationSums raises on decimal(38,0) overflow instead of " +
      "releasing a silent 0 (empty-input NULL still releases zeros)") {
    // ~40 rows of |x| ~ 3.1e18 push sum(x*x) past 38 digits. Under ANSI
    // (Spark 4 default) the decimal SUM itself raises
    // NUMERIC_VALUE_OUT_OF_RANGE; with ANSI off it NULLs out, and the
    // operator's n>0-with-NULL-sum guard raises instead — BOTH paths are
    // loud, neither coalesces to a silent 0
    val big = makeDf(StructType(Seq(longCol("x"), longCol("y"))),
      (1 to 40).map(_ => Row(3100000000000000000L, 1L)))
    val e = intercept[Exception] {
      CorpusStats.correlationSums(big, Seq("x", "y")).collect()
    }
    assert(e.getMessage.contains("overflow") ||
      e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      e.getMessage.contains("cannot be represented"),
      s"expected a loud overflow, got: ${e.getMessage}")
    // a pair with zero joint rows releases n=0 and all-zero sums
    val empty = makeDf(StructType(Seq(longCol("x"), longCol("y"))),
      Seq(Row(1L, null), Row(null, 2L)))
    val r = CorpusStats.correlationSums(empty, Seq("x", "y"))
      .collect().head
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L && r.getLong(7) === 0L)
  }

  test("correlationSums rejects non-integral and too many columns") {
    val df = makeDf(xyzSchema, Seq(Row(1L, 2L, 3L)))
    intercept[IllegalArgumentException] {
      CorpusStats.correlationSums(
        df.withColumn("x", col("x").cast("double")), Seq("x", "y"))
    }
    intercept[IllegalArgumentException] {
      CorpusStats.correlationSums(df, Seq("x"))
    }
  }
}
