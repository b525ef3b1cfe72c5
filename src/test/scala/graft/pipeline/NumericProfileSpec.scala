package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Exact per-group numeric profiles: quantile_cont interpolation semantics,
  * percentile column naming, null discipline, and guards.
  */
class NumericProfileSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("g"), dblCol("v")))

  private def df(rows: (String, java.lang.Double)*) =
    makeDf(schema, rows.map { case (g, v) => Row(g, v) })

  test("interpolated percentiles match the p*(n-1) definition by hand") {
    // g1 = [1, 2, 3, 4]: p50 -> idx 1.5 -> 2.5; p25 -> idx 0.75 -> 1.75
    // g2 = [10]: every percentile is 10
    val out = CorpusStats.numericProfile(
      df("g1" -> 1.0, "g1" -> 2.0, "g1" -> 3.0, "g1" -> 4.0, "g2" -> 10.0),
      Seq("g"), "v", Seq(0.25, 0.5, 1.0))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out("g1") === ((4L, 1.0, 4.0, 1.75, 2.5, 4.0)))
    assert(out("g2") === ((1L, 10.0, 10.0, 10.0, 10.0, 10.0)))
  }

  test("percentile columns are named after their percentage, fractions too") {
    val cols = CorpusStats.numericProfile(
      df("g" -> 1.0), Seq("g"), "v", Seq(0.05, 0.5, 0.975)).columns.toSeq
    assert(cols === Seq("g", "n_rows", "vmin", "vmax", "p5", "p50", "p97_5"))
  }

  test("nulls are skipped, not counted; all-null groups profile as empty") {
    val out = CorpusStats.numericProfile(
      df("g1" -> 1.0, "g1" -> null, "g2" -> null), Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("g1") === 1L)
    assert(out("g2") === 0L) // group survives with n_rows = 0, null stats
  }

  test("guards: empty groups/percentiles, out-of-range p, duplicate labels") {
    val d = df("g" -> 1.0)
    intercept[IllegalArgumentException] {
      CorpusStats.numericProfile(d, Seq.empty, "v")
    }
    intercept[IllegalArgumentException] {
      CorpusStats.numericProfile(d, Seq("g"), "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.numericProfile(d, Seq("g"), "v", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      CorpusStats.numericProfile(d, Seq("g"), "v", Seq(0.5, 0.5))
    }
  }

  test("corpusMix: one pass yields every rollup level; data NULLs keep " +
      "their own group, disambiguated by grouping_level") {
    val schema = StructType(Seq(strCol("lang"), strCol("src"), strCol("text")))
    val df = makeDf(schema, Seq(
      Row("en", "web", "a b"), Row("en", "web", "c"), Row("en", "book", "d e f"),
      Row(null, "web", "x y"))) // a DATA null, not a rollup null
    val out = CorpusStats.corpusMix(df, Seq("lang", "src"), "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(("en", "web", 0)) === ((2L, 3L)))
    assert(out(("en", "book", 0)) === ((1L, 3L)))
    assert(out((null, "web", 0)) === ((1L, 2L))) // data null at level 0
    assert(out(("en", null, 1)) === ((3L, 6L))) // per-lang rollup
    assert(out((null, null, 1)) === ((1L, 2L))) // data-null lang rolled up
    assert(out((null, null, 3)) === ((4L, 8L))) // grand total
    assert(out.size === 6)
  }

  test("profile is partition-invariant (1 vs 17 partitions)") {
    val rnd = new scala.util.Random(4)
    val rows = (1 to 500).map(i =>
      ("g" + i % 3) -> java.lang.Double.valueOf(rnd.nextInt(40).toDouble))
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.numericProfile(d, Seq("g"), "v", Seq(0.25, 0.5, 0.9))
        .collect().map(_.toSeq).toSet
    assert(run(df(rows: _*).repartition(1)) === run(df(rows: _*).repartition(17)))
  }
}
