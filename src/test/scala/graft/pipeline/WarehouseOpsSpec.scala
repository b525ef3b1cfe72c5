package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** mergeIntervals gaps-and-islands union, periodDeltas, rfmSegments. */
class WarehouseOpsSpec extends SparkSpec {

  private val ivSchema =
    StructType(Seq(strCol("k"), longCol("lo"), longCol("hi")))
  private def iv(rows: (String, Long, Long)*) =
    makeDf(ivSchema, rows.map { case (k, l, h) => Row(k, l, h) })

  test("mergeIntervals merges touching and contained intervals") {
    val out = Relational.mergeIntervals(
      iv(("k", 1L, 3L), ("k", 3L, 5L), ("k", 7L, 9L), ("k", 1L, 2L)),
      Seq("k"), "lo", "hi")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // [1,3) + [3,5) touch (half-open adjacency), [1,2) is contained;
    // [7,9) stands alone
    assert(out === Set((1L, 5L, 3L), (7L, 9L, 1L)))
  }

  test("mergeIntervals keeps keys independent and is partition-invariant") {
    val df = iv(("a", 0L, 10L), ("a", 5L, 6L), ("b", 5L, 6L),
      ("b", 20L, 30L), ("b", 29L, 31L))
    val expect = Set(("a", 0L, 10L, 2L), ("b", 5L, 6L, 1L),
      ("b", 20L, 31L, 2L))
    def run(d: org.apache.spark.sql.DataFrame) =
      Relational.mergeIntervals(d, Seq("k"), "lo", "hi").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(run(df) === expect)
    assert(run(df.repartition(7)) === expect)
  }

  test("mergeIntervals drops NULL keys, raises on NULL endpoint / empty") {
    val withNullKey = makeDf(ivSchema,
      Seq(Row(null, 1L, 2L), Row("k", 1L, 2L)))
    assert(Relational.mergeIntervals(withNullKey, Seq("k"), "lo", "hi")
      .count() === 1L)
    val nullHi = makeDf(ivSchema, Seq(Row("k", 1L, null)))
    val e1 = intercept[Exception] {
      Relational.mergeIntervals(nullHi, Seq("k"), "lo", "hi").collect()
    }
    assert(e1.getMessage.contains("NULL endpoint"))
    val inverted = iv(("k", 5L, 5L))
    val e2 = intercept[Exception] {
      Relational.mergeIntervals(inverted, Seq("k"), "lo", "hi").collect()
    }
    assert(e2.getMessage.contains("empty or inverted"))
  }

  test("mergeIntervals rejects non-numeric endpoints") {
    intercept[IllegalArgumentException] {
      Relational.mergeIntervals(
        iv().withColumn("lo", col("lo").cast("string")),
        Seq("k"), "lo", "hi")
    }
  }

  test("mergeIntervals and scdAudit reject fractional endpoint types " +
      "(a silent cast would truncate and change merge/overlap results)") {
    val e1 = intercept[IllegalArgumentException] {
      Relational.mergeIntervals(
        iv(("k", 1L, 3L)).withColumn("lo", col("lo").cast("double")),
        Seq("k"), "lo", "hi")
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      Relational.scdAudit(
        iv(("k", 1L, 3L)).withColumn("hi", col("hi").cast("decimal(10,2)")),
        Seq("k"), "lo", "hi")
    }
    assert(e2.getMessage.contains("integral"))
  }

  private val evSchema =
    StructType(Seq(strCol("g"), longCol("p")))
  private def ev(rows: (String, Long)*) =
    makeDf(evSchema, rows.map { case (g, p) => Row(g, p) })

  test("periodDeltas releases lag, delta and exact truncating growth") {
    val out = Relational.periodDeltas(
      ev(("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L), ("a", 2L), ("a", 5L)),
      Seq("g"), "p")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5))))).toMap
    // first observed period: NULL prev/delta/growth
    assert(out(1L) === ((2L, None, None, None)))
    // 2 -> 3 events: growth 3e6 div 2 = 1500000
    assert(out(2L) === ((3L, Some(2L), Some(1L), Some(1500000L))))
    // previous OBSERVED period (2), not calendar period 4
    assert(out(5L) === ((1L, Some(3L), Some(-2L), Some(333333L))))
  }

  test("periodDeltas drops NULL keys/periods and is partition-invariant") {
    val df = makeDf(evSchema,
      Seq(Row("a", 1L), Row(null, 1L), Row("a", null), Row("a", 2L)))
    def run(d: org.apache.spark.sql.DataFrame) =
      Relational.periodDeltas(d, Seq("g"), "p").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Set(("a", 1L, 1L), ("a", 2L, 1L))
    assert(run(df) === expect)
    assert(run(df.repartition(5)) === expect)
  }

  private val rfmSchema = StructType(
    Seq(strCol("e"), longCol("t"), longCol("amt")))

  test("rfmSegments scores tile 1 = best on all three axes") {
    val events = makeDf(rfmSchema, Seq(
      Row("e1", 10L, 5L), Row("e1", 20L, 5L),
      Row("e2", 5L, 100L),
      Row("e3", 15L, 1L), Row("e3", 16L, 1L), Row("e3", 17L, 1L),
      Row("e4", 2L, 50L)))
    val out = Relational.rfmSegments(events, "e", "t", "amt", tiles = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // e1 (rec 20, freq 2, mon 10) and e3 (17, 3, 3): recent + frequent
    // but low spend -> cell (1,1,2); e2/e4: stale + rare but high spend
    assert(out === Map(
      (1L, 1L, 2L) -> ((2L, 13L)),
      (2L, 2L, 1L) -> ((2L, 150L))))
  }

  test("rfmSegments is partition-invariant (id tie-break)") {
    val rows = (1 to 20).map(i =>
      Row(s"e$i", (i % 4).toLong, (i % 3).toLong + 1L))
    val df = makeDf(rfmSchema, rows)
    val a = Relational.rfmSegments(df, "e", "t", "amt", tiles = 4)
      .collect().map(_.toSeq).toSet
    val b = Relational.rfmSegments(df.repartition(9), "e", "t", "amt",
      tiles = 4).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("rfmSegments rejects non-integral time/amount") {
    val df = makeDf(rfmSchema, Seq(Row("e", 1L, 1L)))
    intercept[IllegalArgumentException] {
      Relational.rfmSegments(
        df.withColumn("amt", col("amt").cast("double")), "e", "t", "amt")
    }
  }

  private val ptSchema =
    StructType(Seq(strCol("g"), longCol("d1"), longCol("d2")))
  private def pts(rows: (String, Long, Long)*) =
    makeDf(ptSchema, rows.map { case (g, a, b) => Row(g, a, b) })

  test("paretoFrontier keeps exactly the non-dominated rows; duplicates survive") {
    val df = pts(("g", 1L, 5L), ("g", 2L, 3L), ("g", 2L, 3L),
      ("g", 2L, 4L), ("g", 3L, 3L), ("g", 4L, 1L), ("g", 4L, 4L))
    val out = Relational.paretoFrontier(df, Seq("g"), "d1", "d2")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // (2,4) dominated by (2,3); (3,3) by (2,3); (4,4) by (4,1) and (2,3)
    assert(out.sorted.toSeq === Seq((1L, 5L), (2L, 3L), (2L, 3L), (4L, 1L)))
  }

  test("paretoFrontier treats keys independently and drops NULL dims") {
    val df = makeDf(ptSchema, Seq(
      Row("a", 1L, 1L), Row("a", 2L, 2L),
      Row("b", 2L, 2L), Row("b", null, 0L), Row(null, 0L, 0L)))
    val out = Relational.paretoFrontier(df, Seq("g"), "d1", "d2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // b's (2,2) survives in ITS key even though a has a better point
    assert(out === Set(("a", 1L), ("b", 2L)))
  }

  test("paretoFrontier matches the quadratic NOT-EXISTS definition") {
    val rows = (1 to 60).map(i =>
      ("k", ((i * 17) % 13).toLong, ((i * 29) % 11).toLong))
    val df = pts(rows: _*)
    val fast = Relational.paretoFrontier(df, Seq("g"), "d1", "d2")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    val all = rows.map(t => (t._2, t._3))
    val slow = all.filter(p => !all.exists(q =>
      q._1 <= p._1 && q._2 <= p._2 && (q._1 < p._1 || q._2 < p._2))).sorted
    assert(fast.toSeq === slow)
  }
}
