package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** funnelLatency, coverageCurve, fdViolations, reciprocalRankFusion. */
class FusionSpec extends SparkSpec {

  private val evSchema =
    StructType(Seq(longCol("u"), strCol("y"), longCol("t")))

  test("funnelLatency: exact rank-ceil quantiles per step in exact regime") {
    // five users convert view->buy with gaps 1..5; two more only view
    val rows = (1 to 5).flatMap(i =>
      Seq(Row(i.toLong, "view", 10L), Row(i.toLong, "buy", 10L + i))) ++
      Seq(Row(8L, "view", 10L), Row(9L, "view", 10L))
    val out = Relational.funnelLatency(
      makeDf(evSchema, rows), "u", "y", "t", Seq("view", "buy"),
      percentiles = Seq(0.5, 0.9))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getInt(0) === 2 && r.getString(1) === "buy")
    assert(r.getLong(2) === 5L)                  // n_entities
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 5.0)
    assert(r.getLong(5) === 0L)                  // err_units: exact regime
    assert(r.getDouble(6) === 3.0)               // p50 = ceil(0.5*5)=3rd
    assert(r.getDouble(7) === 5.0)               // p90 = ceil(0.9*5)=5th
  }

  test("funnelLatency guards: steps, percentiles, non-numeric time") {
    val df = makeDf(evSchema, Seq(Row(1L, "view", 1L)))
    intercept[IllegalArgumentException] {
      Relational.funnelLatency(df, "u", "y", "t", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Relational.funnelLatency(df, "u", "y", "t", Seq("view", "buy"),
        percentiles = Nil)
    }
    intercept[IllegalArgumentException] {
      Relational.funnelLatency(df.withColumn("t", col("t").cast("string")),
        "u", "y", "t", Seq("view", "buy"))
    }
  }

  private val docSchema = StructType(Seq(longCol("id"), strCol("text")))

  test("coverageCurve: ranked Zipf mass with truncating cumulative ppm") {
    val docs = makeDf(docSchema, Seq(
      Row(1L, "a a a b b c"), Row(2L, "a b c d")))
    // counts: a=4 b=3 c=2 d=1, total 10
    val out = CorpusStats.coverageCurve(docs, "text", topN = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "a", 4L, 400000L), (2L, "b", 3L, 700000L),
      (3L, "c", 2L, 900000L)))
  }

  test("coverageCurve bounds its single-partition sort via topN") {
    intercept[IllegalArgumentException] {
      CorpusStats.coverageCurve(makeDf(docSchema, Nil), "text",
        topN = 100001)
    }
  }

  private val fdSchema =
    StructType(Seq(strCol("det"), strCol("dep")))

  test("fdViolations: only multi-valued determinants, NULL dep counts") {
    val df = makeDf(fdSchema, Seq(
      Row("a", "x"), Row("a", "x"),            // clean
      Row("b", "x"), Row("b", "y"),            // violated
      Row("c", "x"), Row("c", null),           // violated by NULL
      Row(null, "z")))                         // NULL det drops
    val out = Quality.fdViolations(df, Seq("det"), "dep")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map("b" -> ((2L, 2L)), "c" -> ((2L, 2L))))
  }

  private val rkSchema =
    StructType(Seq(strCol("q"), longCol("id"), longCol("rank")))

  test("reciprocalRankFusion: exact integer scores, doc-id ties") {
    // ranking A: d1, d2 ; ranking B: d2, d3  (kConst=60, scale=1e12)
    val rk = makeDf(rkSchema, Seq(
      Row("q", 1L, 1L), Row("q", 2L, 2L),
      Row("q", 2L, 1L), Row("q", 3L, 2L)))
    val out = Retrieval.reciprocalRankFusion(rk, "q", "id", "rank", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val s61 = 1000000000000L / 61
    val s62 = 1000000000000L / 62
    // d2 appears in both (rank2 + rank1), d1 rank1, d3 rank2
    assert(out.toSeq === Seq(
      (2L, s61 + s62, 1L), (1L, s61, 2L), (3L, s62, 3L)))
  }

  test("reciprocalRankFusion fails loudly on a non-positive rank") {
    val rk = makeDf(rkSchema, Seq(Row("q", 1L, 0L)))
    val ex = intercept[Exception] {
      Retrieval.reciprocalRankFusion(rk, "q", "id", "rank", k = 3).collect()
    }
    assert(ex.getMessage.contains("non-positive rank"))
  }
}
