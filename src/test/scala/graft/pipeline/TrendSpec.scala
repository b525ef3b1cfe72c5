package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** groupTrend exact rational regression and sessionConversion. */
class TrendSpec extends SparkSpec {

  private val ptSchema =
    StructType(Seq(strCol("g"), longCol("x"), longCol("y")))
  private def pts(rows: (String, Long, Long)*) =
    makeDf(ptSchema, rows.map { case (g, x, y) => Row(g, x, y) })

  test("groupTrend releases exact normal-equation rationals") {
    val out = CorpusStats.groupTrend(
      pts(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
        ("b", 0L, 5L), ("b", 2L, 5L), ("b", 4L, 8L)),
      Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: y = 2x exactly -> slope 12/6 = 2, intercept 0/6
    assert(out("a") === ((3L, 12L, 6L, 0L)))
    // b: n=3 sx=6 sy=18 sxx=20 sxy=42 -> num=3*42-108=18, den=60-36=24,
    // icept=18*20-6*42=108  (slope 3/4, intercept 4.5)
    assert(out("b") === ((3L, 18L, 24L, 108L)))
  }

  test("groupTrend flags degenerate groups with slope_den = 0") {
    val out = CorpusStats.groupTrend(
      pts(("one", 7L, 3L), ("flat", 5L, 1L), ("flat", 5L, 9L)),
      Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("one") === 0L)
    assert(out("flat") === 0L)
  }

  test("groupTrend drops NULL points and is partition-invariant") {
    val withNull = makeDf(ptSchema,
      Seq(Row("a", 1L, 2L), Row("a", null, 9L), Row("a", 2L, null),
        Row("a", 2L, 4L), Row("a", 3L, 6L)))
    val a = CorpusStats.groupTrend(withNull, Seq("g"), "x", "y")
      .collect().toSet
    val b = CorpusStats.groupTrend(withNull.repartition(7), Seq("g"),
      "x", "y").collect().toSet
    assert(a === b)
    assert(a.head.getLong(2) === 12L) // the NULL rows contributed nothing
  }

  test("groupTrend rejects non-integral columns") {
    intercept[IllegalArgumentException] {
      CorpusStats.groupTrend(
        pts().withColumn("x", col("x").cast("double")), Seq("g"), "x", "y")
    }
  }

  private val evSchema =
    StructType(Seq(strCol("u"), longCol("t"), strCol("y")))
  private def ev(rows: (String, Long, String)*) =
    makeDf(evSchema, rows.map { case (u, t, y) => Row(u, t, y) })

  test("sessionConversion: entry type per gap-split session, ppm truncates") {
    val out = Relational.sessionConversion(
      ev(("A", 1L, "view"), ("A", 2L, "click"), ("A", 3L, "buy"),
        ("A", 700L, "click"),
        ("B", 1L, "buy"),
        ("C", 1L, "view"), ("C", 650L, "view"), ("C", 1300L, "view"),
        ("C", 1301L, "buy")),
      "u", "t", "y", gapUnits = 600L, convType = "buy")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // view entries: A-s1 (conv), C-s1, C-s2, C-s3 (conv) -> 2/4
    // click entries: A-s2 (no) ; buy entries: B-s1 (conv at entry)
    assert(out === Map(
      "view" -> ((4L, 2L, 500000L)),
      "click" -> ((1L, 0L, 0L)),
      "buy" -> ((1L, 1L, 1000000L))))
  }

  test("sessionConversion: same-time entry ties break to the smaller type") {
    val out = Relational.sessionConversion(
      ev(("A", 5L, "zeta"), ("A", 5L, "alpha")),
      "u", "t", "y", 600L, "buy")
      .collect().map(r => r.getString(0)).toSeq
    assert(out === Seq("alpha"))
  }

  test("sessionConversion guards: gap, ppmScale, non-integral time") {
    intercept[IllegalArgumentException] {
      Relational.sessionConversion(ev(), "u", "t", "y", 0L, "buy")
    }
    intercept[IllegalArgumentException] {
      Relational.sessionConversion(ev(), "u", "t", "y", 600L, "buy",
        ppmScale = 1L)
    }
    intercept[IllegalArgumentException] {
      Relational.sessionConversion(
        ev().withColumn("t", col("t").cast("double")), "u", "t", "y",
        600L, "buy")
    }
  }
}
