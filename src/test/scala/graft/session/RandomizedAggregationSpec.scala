package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir.QueryBuilder
import graft.keyset.KeySet

/** Randomized noiseless-equivalence property: for random small tables and
  * random grouped aggregations, evaluate() at infinite budget must equal
  * the same aggregation computed directly (the reference pins these
  * semantics with large hand-written tables; a seeded generator covers the
  * same space more densely per line of test code).
  */
class RandomizedAggregationSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  test("random grouped counts, sums, and averages match direct computation") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 12) {
      val groups = Seq("A", "B", "C", null)
      val n = 1 + rnd.nextInt(40)
      val rows = Seq.fill(n)(Row(
        groups(rnd.nextInt(groups.size)),
        rnd.nextInt(21).toLong - 10L))
      val df = makeDf(StructType(Seq(
        StructField("g", StringType, nullable = true), longCol("v"))), rows)
      val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())

      // keyset: a random subset of the group domain plus one absent key
      val keyVals: Seq[Any] =
        rnd.shuffle(groups).take(1 + rnd.nextInt(groups.size)) :+ "Z"
      val keys = KeySet.fromTuples(keyVals.map(Seq(_)),
        StructType(Seq(StructField("g", StringType, nullable = true))))
      val keySet = keyVals.toSet

      val lo = -(1 + rnd.nextInt(5)).toDouble
      val hi = (1 + rnd.nextInt(8)).toDouble
      def clamp(v: Long): Double = math.min(math.max(v.toDouble, lo), hi)
      val byKey = rows.groupBy(r => r.getString(0)).filter {
        case (k, _) => keySet.contains(k)
      }

      // count
      val counts = s.evaluate(QueryBuilder("t").groupby(keys).count(), Inf)
        .collect().map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
      assert(counts.size === keySet.size, s"trial $trial: one row per key")
      for ((k, c) <- counts)
        assert(c === byKey.get(k).map(_.size).getOrElse(0), s"trial $trial count($k)")

      // clamped sum (integer measure -> long result, exact)
      val sums = s.evaluate(
        QueryBuilder("t").groupby(keys).sum("v", lo, hi, "s"), Inf)
        .collect().map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
      for ((k, v) <- sums) {
        val expect = byKey.get(k).map(_.map(r => clamp(r.getLong(1))).sum)
          .getOrElse(0.0)
        assert(v.toDouble === expect, s"trial $trial sum($k) in [$lo,$hi]")
      }

      // average: replicate the midpoint-shift lowering arithmetic
      val avgs = s.evaluate(
        QueryBuilder("t").groupby(keys).average("v", lo, hi, "a"), Inf)
        .collect().map(r => Option(r.getString(0)).orNull -> r.getDouble(1)).toMap
      for ((k, v) <- avgs) {
        val vs = byKey.get(k).map(_.map(r => clamp(r.getLong(1)))).getOrElse(Nil)
        // integer measure with whole bounds -> the lowering floors the
        // midpoint (visible only for EMPTY groups, where the shift cannot
        // cancel and the released value IS the midpoint)
        val mid = math.floor((lo + hi) / 2.0)
        val expect = vs.map(_ - mid).sum / math.max(vs.size, 1).toDouble + mid
        assert(math.abs(v - expect) < 1e-9, s"trial $trial avg($k): $v vs $expect")
      }

      // count_distinct over the measure column
      val cds = s.evaluate(
        QueryBuilder("t").groupby(keys).countDistinct(Seq("v"), "cd"), Inf)
        .collect().map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
      for ((k, v) <- cds)
        assert(v === byKey.get(k).map(_.map(_.getLong(1)).distinct.size).getOrElse(0),
          s"trial $trial count_distinct($k)")

      // variance/stdev: the released value is the clamped sample variance
      // in midpoint-shifted form (the q08/q09 oracle formula); stdev is its
      // square root, so pinning both checks the shared dev-sum lowering
      val mid = math.floor((lo + hi) / 2.0)
      val maxVar = (hi - lo) * (hi - lo) / 4.0
      def directVar(k: String): Double = {
        val vs = byKey.get(k).map(_.map(r => clamp(r.getLong(1)) - mid)).getOrElse(Nil)
        val n0 = math.max(vs.size.toDouble, 1.0)
        val raw = (vs.map(d => d * d).sum - vs.sum * vs.sum / n0) /
          math.max(n0 - 1.0, 1.0)
        math.min(math.max(raw, 0.0), maxVar)
      }
      val vars = s.evaluate(
        QueryBuilder("t").groupby(keys).variance("v", lo, hi, "vv"), Inf)
        .collect().map(r => Option(r.getString(0)).orNull -> r.getDouble(1)).toMap
      for ((k, v) <- vars)
        assert(math.abs(v - directVar(k)) < 1e-9, s"trial $trial var($k)")
      val sds = s.evaluate(
        QueryBuilder("t").groupby(keys).stdev("v", lo, hi, "sd"), Inf)
        .collect().map(r => Option(r.getString(0)).orNull -> r.getDouble(1)).toMap
      for ((k, v) <- sds)
        assert(math.abs(v - math.sqrt(directVar(k))) < 1e-9, s"trial $trial sd($k)")
    }
  }

  test("random quantiles stay within the clamped data envelope") {
    val rnd = new scala.util.Random(4210L)
    for (trial <- 1 to 6) {
      val n = 5 + rnd.nextInt(30)
      val rows = Seq.fill(n)(Row(rnd.nextInt(100).toLong))
      val df = makeDf(StructType(Seq(longCol("v"))), rows)
      val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
      val q = rnd.nextDouble()
      val out = s.evaluate(QueryBuilder("t").quantile("v", q, 0, 100, "qv"), Inf)
        .collect().head.getDouble(0)
      assert(out >= 0.0 && out <= 100.0, s"trial $trial: $out in clamp range")
      // the released quantile is within one bin (100/2048) of a data-
      // consistent rank position at infinite budget: between min and max
      val vs = rows.map(_.getLong(0).toDouble)
      assert(out >= vs.min - 0.1 && out <= vs.max + 0.1,
        s"trial $trial: $out within data envelope [${vs.min}, ${vs.max}]")
    }
  }
}
