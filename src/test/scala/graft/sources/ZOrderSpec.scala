package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  private val xy = StructType(Seq(longCol("x"), longCol("y")))

  test("morton code matches hand-computed interleavings") {
    val df = makeDf(xy, Seq(Row(3L, 5L), Row(0L, 0L), Row(7L, 0L), Row(0L, 7L)))
      .withColumn("z", ZOrder.zValue2(col("x"), col("y"), bits = 3))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x bit i -> position 2i, y bit i -> position 2i+1
    assert(got((3L, 5L)) === 39L) // 0b100111
    assert(got((0L, 0L)) === 0L)
    assert(got((7L, 0L)) === 21L) // 0b010101
    assert(got((0L, 7L)) === 42L) // 0b101010
  }

  test("three-column interleave places column j's bit i at i*n+j") {
    val df = makeDf(StructType(Seq(longCol("a"), longCol("b"), longCol("c"))),
      Seq(Row(1L, 1L, 1L), Row(2L, 0L, 0L)))
      .withColumn("z",
        ZOrder.zValue(Seq(col("a"), col("b"), col("c")), bits = 2))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got((1L, 1L, 1L)) === 7L)  // bits 0,1,2
    assert(got((2L, 0L, 0L)) === 8L)  // a's bit 1 -> position 3
  }

  test("values are masked to the bit budget, not wrapped") {
    val df = makeDf(xy, Seq(Row(256L + 3L, 5L)))
      .withColumn("z", ZOrder.zValue2(col("x"), col("y"), bits = 3))
    assert(df.collect().head.getLong(2) === 39L)
  }

  test("z-ordered layout gives BOTH dimensions compact per-file ranges") {
    // a full 64x64 grid in 16 range partitions: a plain sort by x would
    // leave y spanning the full 0..63 in every file; the z-order layout
    // must keep each file's x AND y spans near sqrt(4096/16) = 16
    val grid = spark.range(64L * 64)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    ZOrder.writeZOrdered(grid, dir, Seq("x", "y"), bits = 6, partitions = 16)
    val spans = spark.read.parquet(dir)
      .withColumn("__f", input_file_name())
      .groupBy("__f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length >= 8, "the range shuffle must spread files")
    // sampled range boundaries straddle quadrants, so individual files may
    // exceed the ideal 15; a sort-by-x layout would put 63 in EVERY file's
    // y span, so the per-file cap and the mean both separate the layouts
    spans.foreach { r =>
      assert(r.getLong(1) <= 48 && r.getLong(2) <= 48,
        s"file spans (${r.getLong(1)}, ${r.getLong(2)}) should cover a " +
          "compact rectangle, not a full-width slab")
    }
    val meanSpan = spans.map(r => (r.getLong(1) + r.getLong(2)) / 2.0).sum / spans.length
    assert(meanSpan <= 28.0, s"mean span $meanSpan says the curve localized poorly")
  }

  test("the z projection is codegen-friendly: no UDF in the plan") {
    val df = spark.range(100)
      .select(col("id").as("x"), (col("id") * 7 % 100).as("y"))
      .withColumn("z", ZOrder.zValue2(col("x"), col("y"), bits = 8))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"z-value must stay a native expression:\n$plan")
  }

  test("negative inputs fail the row instead of collapsing to all-ones") {
    val df = makeDf(xy, Seq(Row(-1L, 5L)))
      .withColumn("z", ZOrder.zValue2(col("x"), col("y"), bits = 3))
    val e = intercept[Exception] { df.collect() }
    assert(e.getMessage.contains("non-negative"))
  }

  test("capacity and arity guards") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("x")), bits = 8)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("x"), col("y")), bits = 32)
    }
  }

  test("a user column named __z refuses loudly instead of being replaced " +
      "and silently dropped from the written layout") {
    val df = makeDf(xy, Seq(Row(1L, 2L))).withColumn("__z", col("x"))
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(df,
        java.nio.file.Files.createTempDirectory("zg").toString + "/t",
        Seq("x", "y"))
    }
    assert(e.getMessage.contains("__z"))
  }
}
