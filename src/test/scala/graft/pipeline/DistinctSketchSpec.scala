package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Mergeable HLL distinct-count sketches: exactness in set mode, error
  * bounds in dense mode, rollup determinism, and the estimator caveat
  * (HIP vs standard — see rollupDistinctSketch's header).
  */
class DistinctSketchSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("g"), strCol("h"), longCol("v")))

  private def rows(n: Int, groups: Int = 2, subs: Int = 2) =
    makeDf(schema, (0 until n).map(i =>
      Row("g" + (i % groups), "h" + (i % subs), (i / (groups * subs)).toLong * (groups * subs) + i % (groups * subs))))

  test("estimate is exact while the sketch stays in set mode") {
    // 300 distinct values per group at lgK=14: far below dense promotion
    val df = rows(600)
    val out = CorpusStats.distinctSketch(df, Seq("g"), "v")
      .select(col("g"), col("n_distinct_est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("g0" -> 300L, "g1" -> 300L))
  }

  test("dense-mode estimate lands within the 5% contract at 40k distinct") {
    val big = makeDf(StructType(Seq(strCol("g"), longCol("v"))),
      (0 until 40000).map(i => Row("all", i.toLong)))
    val est = CorpusStats.distinctSketch(big, Seq("g"), "v")
      .select(col("n_distinct_est")).collect().head.getLong(0)
    assert(math.abs(est - 40000.0) <= 0.05 * 40000, s"estimate $est")
  }

  test("rollup estimate equals a direct union regardless of merge order") {
    // union register state is order-free: rolling (g, h) -> g in one stage
    // must match first collapsing h-parity then finishing the rollup
    val df = rows(2000, groups = 2, subs = 4)
    val fine = CorpusStats.distinctSketch(df, Seq("g", "h"), "v")
    val oneStage = CorpusStats.rollupDistinctSketch(fine, Seq("g"))
      .select(col("g"), col("n_distinct_est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoStage = CorpusStats.rollupDistinctSketch(
      CorpusStats.rollupDistinctSketch(
        fine.withColumn("hp", substring(col("h"), -1, 1).cast("int") % 2),
        Seq("g", "hp")),
      Seq("g"))
      .select(col("g"), col("n_distinct_est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oneStage === twoStage)
  }

  test("rollup and sketch results are partition-invariant (1 vs 17)") {
    val base = rows(3000, groups = 3, subs = 3)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val fine = CorpusStats.distinctSketch(df, Seq("g", "h"), "v")
      CorpusStats.rollupDistinctSketch(fine, Seq("g"))
        .select(col("g"), col("n_distinct_est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(run(base.repartition(1)) === run(base.repartition(17)))
  }

  test("guards: empty grouping, unknown sketch column, lgK range") {
    val df = rows(10)
    intercept[IllegalArgumentException] {
      CorpusStats.distinctSketch(df, Seq.empty, "v")
    }
    intercept[IllegalArgumentException] {
      CorpusStats.distinctSketch(df, Seq("g"), "v", lgK = 3)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.rollupDistinctSketch(df, Seq("g"), "nope")
    }
  }
}
