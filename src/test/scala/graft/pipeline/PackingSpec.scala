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

  test("chunkSlices: boundary-spanning docs emit one slice per chunk touched") {
    // budget 10: doc1 [0,4), doc2 [4,25) spans chunks 0..2, doc3 [25,25)
    // zero tokens emits nothing, doc4 [25,30)
    val df = frame(1L -> 4L, 2L -> 21L, 3L -> 0L, 4L -> 5L)
    val out = Packing.chunkSlices(df, "id", "ntok", 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out === Seq(
      (1L, 0L, 0L, 4L),
      (2L, 0L, 4L, 6L), (2L, 1L, 0L, 10L), (2L, 2L, 0L, 5L),
      (4L, 2L, 5L, 5L)))
    // conservation: slice lengths per doc sum to the doc's tokens, and
    // per chunk they tile the chunk exactly (full chunks) or its prefix
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc === Map(1L -> 4L, 2L -> 21L, 4L -> 5L))
    val chunk1 = out.filter(_._2 === 1L)
    assert(chunk1.map(_._4).sum === 10L)
  }

  test("strip/pack properties: boilerplate strip is idempotent") {
    // stripping twice equals stripping once: struck lines are gone, kept
    // lines kept their (sub-threshold) doc counts
    val docs = makeDf(
      StructType(Seq(longCol("id"), strCol("text"))),
      (1L to 20L).map(i => Row(i, s"SHARED BANNER\nbody $i\nfooter ${i % 2}")))
    def strip(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.stripBoilerplateLines(df, "id", "text", minDocs = 8)
    val once = strip(docs).select("id", "text")
    val twice = strip(once).select("id", "text")
    assert(once.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
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
