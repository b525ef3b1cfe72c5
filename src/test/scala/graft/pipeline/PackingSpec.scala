package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  private val schema = StructType(Seq(longCol("id"), longCol("ntok")))

  private def frame(rows: (Long, Long)*) =
    makeDf(schema, rows.map { case (i, t) => Row(i, t) })

  private def packed(df: org.apache.spark.sql.DataFrame, budget: Long) =
    Packing.packChunks(df, "id", "ntok", budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

  test("offsets are the exclusive prefix sum in id order") {
    val df = frame(3L -> 10L, 1L -> 5L, 2L -> 7L, 4L -> 1L)
    assert(packed(df, 100L) === Seq(
      (1L, 5L, 0L, 0L), (2L, 7L, 5L, 0L), (3L, 10L, 12L, 0L), (4L, 1L, 22L, 0L)))
  }

  test("chunk id cuts every `budget` tokens of the concatenated stream") {
    val df = frame((1L to 10L).map(i => i -> 4L): _*)
    // starts 0,4,8,...,36; budget 10 -> chunks 0,0,0,1,1,2,2,2,3,3
    assert(packed(df, 10L).map(_._4) ===
      Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
  }

  test("assignment is invariant to input partitioning and order") {
    val rows = (1L to 500L).map(i => i -> (i % 17 + 1))
    val a = packed(frame(rows: _*), 256L)
    val b = packed(frame(scala.util.Random.shuffle(rows): _*).repartition(13), 256L)
    val c = packed(frame(rows.reverse: _*).coalesce(1), 256L)
    assert(a === b)
    assert(a === c)
  }

  test("sparse, negative, and clustered ids pack in global id order") {
    // exercises the value-derived bucket math: huge gaps, a negative
    // cluster, and ids far beyond double's contiguous-integer range edge
    val ids = Seq(-1000000L, -999999L, -5L, 0L, 3L, 999999999L, 1000000000L)
    val out = packed(frame(ids.map(_ -> 10L): _*), 25L)
    assert(out.map(_._1) === ids.sorted)
    assert(out.map(_._3) === ids.indices.map(_ * 10L))
    assert(out.map(_._4) === Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L))
  }

  test("zero-token documents keep their place without advancing the stream") {
    val df = frame(1L -> 3L, 2L -> 0L, 3L -> 4L)
    assert(packed(df, 5L) === Seq(
      (1L, 3L, 0L, 0L), (2L, 0L, 3L, 0L), (3L, 4L, 3L, 0L)))
  }

  test("empty corpus packs to an empty frame") {
    assert(packed(frame(), 10L).isEmpty)
  }

  test("chunkProfile aggregates docs and tokens per chunk") {
    val df = frame((1L to 6L).map(i => i -> 3L): _*)
    // starts 0,3,6,9,12,15; budget 6 -> chunks 0,0,1,1,2,2
    val prof = Packing.chunkProfile(df, "id", "ntok", 6L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(prof === Seq((0L, 2L, 6L), (1L, 2L, 6L), (2L, 2L, 6L)))
  }

  test("non-integral id column is rejected") {
    val df = makeDf(StructType(Seq(strCol("id"), longCol("ntok"))),
      Seq(Row("a", 1L)))
    val e = intercept[IllegalArgumentException] {
      Packing.packChunks(df, "id", "ntok", 10L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("non-positive chunk budget is rejected") {
    val e = intercept[IllegalArgumentException] {
      Packing.packChunks(frame(1L -> 1L), "id", "ntok", 0L)
    }
    assert(e.getMessage.contains("positive"))
  }
}
