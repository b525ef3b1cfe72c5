package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Two-phase global ordering: rank and NTILE equality with the
  * single-window forms, partition invariance, and guards.
  */
class RanksSpec extends SparkSpec with graft.PlanCapture {

  private val schema = StructType(Seq(strCol("k"), longCol("v")))

  private def data(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    makeDf(schema, (0 until n).map(i => Row(f"k$i%04d", rnd.nextInt(50).toLong)))
  }

  test("globalRowNumber equals the single-window row_number under a " +
      "total order") {
    val df = data(500, 3)
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("k"))).cast("long") - 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    def run(parts: Int) = Ranks.globalRowNumber(
      df.repartition(parts), Seq(col("v").desc, col("k")), "rn")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(run(1) === expected)
    assert(run(17) === expected)
  }

  test("globalNtile equals the window ntile for even, ragged, and " +
      "fewer-rows-than-buckets cases") {
    for ((n, buckets) <- Seq((400, 4), (403, 7), (5, 9), (1, 3))) {
      val df = data(n, n + buckets)
      val expected = df.withColumn("b",
        ntile(buckets).over(Window.orderBy(col("v").desc, col("k"))).cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val got = Ranks.globalNtile(
        df.repartition(7), Seq(col("v").desc, col("k")), buckets, "b")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got === expected, s"n=$n buckets=$buckets")
    }
  }

  test("guards: empty order, bad n, reserved columns") {
    val df = data(10, 1)
    intercept[IllegalArgumentException] { Ranks.globalRowNumber(df, Nil) }
    intercept[IllegalArgumentException] {
      Ranks.globalNtile(df, Seq(col("v")), 0)
    }
    intercept[IllegalArgumentException] {
      Ranks.globalRowNumber(df.withColumn("__rk_pid", lit(1)), Seq(col("v")))
    }
  }

  test("plan has no single-task global sort: every exchange is range or " +
      "hash, never SinglePartition") {
    // the range-partitioned phase hides behind the operator's internal
    // localCheckpoint, so the returned frame alone cannot prove this —
    // capture EVERY action plan the operator runs (checkpoint included)
    val rnd = new scala.util.Random(9)
    val pdf = planDf(schema,
      (0 until 300).map(i => Row(f"k$i%04d", rnd.nextInt(50).toLong)))
    // drop the harness's own final count() action — a global count's
    // one-row final aggregate legitimately lands on a single partition;
    // the contract covers the OPERATOR's actions (checkpoint + offsets)
    val caps = capturedPlans(
      Ranks.globalRowNumber(pdf, Seq(col("v").desc, col("k")), "rn"))
      .filterNot(_.action == "count")
    assert(caps.nonEmpty)
    caps.foreach(c => assert(!c.text.contains("SinglePartition"),
      s"single-partition exchange found in:\n${c.text}"))
  }
}
