package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir.QueryBuilder
import graft.keyset.KeySet
import graft.session.Session

class DpQuantileSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)
  private val binWidth = 100.0 / DpQuantile.Bins

  private def sess(values: Seq[Double]) = {
    val df = makeDf(StructType(Seq(dblCol("x"))), values.map(Row(_)))
    Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
  }

  test("infinite-budget median lands within a bin of the true median") {
    val s = sess((1 to 99).map(_.toDouble))
    val m = s.evaluate(QueryBuilder("t").median("x", 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(math.abs(m - 50.0) <= binWidth + 0.5, s"median $m")
  }

  test("skewed data: p90 tracks the true quantile") {
    val vals = (1 to 90).map(_ => 5.0) ++ (1 to 10).map(_ => 95.0)
    val s = sess(vals)
    val q = s.evaluate(QueryBuilder("t").quantile("x", 0.9, 0, 100), Inf)
      .collect().head.getDouble(0)
    // 90th percentile sits at the boundary between the 5s and the 95s
    assert(q > 4.0 && q < 96.0, s"p90 $q")
  }

  test("min/max sugar stay below/above the data at infinite budget") {
    // at q=0 every bin below the data minimum has zero rank error, so the
    // exponential mechanism legitimately answers anywhere in [low, min(x)]
    // (same tie structure as the reference's interval mechanism); max is
    // symmetric
    val s = sess((10 to 90).map(_.toDouble))
    val mn = s.evaluate(QueryBuilder("t").min("x", 0, 100), Inf)
      .collect().head.getDouble(0)
    val mx = s.evaluate(QueryBuilder("t").max("x", 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(mn >= 0.0 && mn <= 10.0 + binWidth, s"min $mn")
    assert(mx >= 90.0 - binWidth && mx <= 100.0, s"max $mx")
  }

  test("empty group yields the q-anchored default, grouped keys fill in") {
    val df = makeDf(StructType(Seq(strCol("g"), dblCol("x"))),
      Seq(Row("A", 10.0), Row("A", 20.0)))
    val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
    val out = s.evaluate(
      QueryBuilder("t").groupby(KeySet.fromColumn("g", Seq("A", "Z")))
        .median("x", 0, 100), Inf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("A") > 5.0 && out("A") < 25.0)
    assert(math.abs(out("Z") - 50.0) <= binWidth, s"empty-group median ${out("Z")}")
  }

  test("quantile estimates are monotone in q at infinite budget") {
    val vals = Seq.tabulate(200)(i => (i % 97).toDouble)
    val s = sess(vals)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9).map { q =>
      s.evaluate(QueryBuilder("t").quantile("x", q, 0, 100), Inf)
        .collect().head.getDouble(0)
    }
    assert(qs === qs.sorted, s"quantiles must be nondecreasing: $qs")
  }

  test("quantiles are deterministic and clamp-window insensitive at eps=inf") {
    val vals = (1 to 50).map(_.toDouble * 2.0 - 1.0) // odd numbers 1..99
    val a = sess(vals).evaluate(QueryBuilder("t").median("x", 0, 100), Inf)
      .collect().head.getDouble(0)
    val b = sess(vals).evaluate(QueryBuilder("t").median("x", 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(a === b) // argmax has no sampling at infinite budget
    // widening the clamp window moves bins but the estimate tracks the
    // true median within the (wider) bin resolution
    val wide = sess(vals).evaluate(QueryBuilder("t").median("x", -100, 300), Inf)
      .collect().head.getDouble(0)
    assert(math.abs(wide - 50.0) <= 400.0 / DpQuantile.Bins + 1.0, s"wide $wide")
  }

  test("integer measure columns quantile like their double values") {
    val df = makeDf(StructType(Seq(longCol("n"))), (1L to 99L).map(Row(_)))
    val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
    val m = s.evaluate(QueryBuilder("t").median("n", 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(math.abs(m - 50.0) <= binWidth + 0.5, s"int median $m")
  }

  test("all-identical data: the median hits the mass, extremes stay side-consistent") {
    // rank-error utility: for q=0.5 the data bin's error is 0 and it wins;
    // for q=0.1 every bin BELOW the mass has error |0 - 4| = 4 versus the
    // mass bin's |20 - 4| = 16, so answering below the mass is the correct
    // exponential-mechanism argmax (the reference behaves the same way)
    val s = sess(Seq.fill(40)(42.0))
    val med = s.evaluate(QueryBuilder("t").quantile("x", 0.5, 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(math.abs(med - 42.0) <= binWidth + 0.5, s"median $med")
    val lo = s.evaluate(QueryBuilder("t").quantile("x", 0.1, 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(lo <= 42.0 + binWidth, s"q=0.1 -> $lo")
    val hi = s.evaluate(QueryBuilder("t").quantile("x", 0.9, 0, 100), Inf)
      .collect().head.getDouble(0)
    assert(hi >= 42.0 - binWidth, s"q=0.9 -> $hi")
  }

  test("finite budget stays in range and clamps") {
    val s = sess(Seq(-1000.0, 5.0, 10.0, 2000.0))
    val q = s.evaluate(QueryBuilder("t").median("x", 0, 100), PureDPBudget(1.0))
      .collect().head.getDouble(0)
    assert(q >= 0.0 && q <= 100.0)
  }
}
