package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** streamingUpsert: keep-latest per key across batches, stale-change
  * suppression, delete tombstones that cannot be resurrected, loud ops.
  */
class UpsertSpec extends SparkSpec {

  // (key, version, op, payload)
  private type Chg = (String, Long, String, String)

  private def run(batches: Seq[Chg]*): Map[String, Seq[(Long, String, Option[String])]] = {
    val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val in = MemoryStream[Chg]
    val out = Streaming.streamingUpsert(
      in.toDF().toDF("k", "v", "op", "payload"), "k", "v", "op", "payload")
    val name = s"ups${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      for (b <- batches) { in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          Option(r.getString(3))))
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3, t._4)).toSeq).toMap
    } finally q.stop()
  }

  test("highest version per key wins within and across batches") {
    val emitted = run(
      Seq(("a", 1L, "I", "a1"), ("a", 3L, "U", "a3"), ("b", 1L, "I", "b1")),
      Seq(("a", 2L, "U", "a2"), ("b", 4L, "U", "b4")))
    // batch 1: a@3, b@1 emitted; batch 2: a's v2 is STALE (no emission),
    // b advances to 4
    assert(emitted("a") === Seq((3L, "U", Some("a3"))))
    assert(emitted("b") === Seq((1L, "I", Some("b1")), (4L, "U", Some("b4"))))
  }

  test("a delete tombstones the key and a stale upsert cannot resurrect it") {
    val emitted = run(
      Seq(("k", 5L, "D", "ignored")),
      Seq(("k", 3L, "U", "old")))
    assert(emitted("k") === Seq((5L, "D", None)))
  }

  test("a NEWER upsert after a delete re-creates the key") {
    val emitted = run(
      Seq(("k", 5L, "D", null)),
      Seq(("k", 7L, "U", "fresh")))
    assert(emitted("k") === Seq((5L, "D", None), (7L, "U", Some("fresh"))))
  }

  test("an unknown op fails the stream loudly") {
    val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val in = MemoryStream[Chg]
    val out = Streaming.streamingUpsert(
      in.toDF().toDF("k", "v", "op", "payload"), "k", "v", "op", "payload")
    val q = out.writeStream.format("memory")
      .queryName(s"upsbad${System.nanoTime()}")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("k", 1L, "X", "p"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(ex.getMessage.contains("unknown op") ||
        Option(ex.getCause).exists(_.getMessage.contains("unknown op")))
    } finally q.stop()
  }

  test("TTL knobs are mutually exclusive and positive") {
    val df = spark.range(1).selectExpr("'k' AS k", "1L AS v",
      "'U' AS op", "'p' AS payload")
    intercept[IllegalArgumentException] {
      Streaming.streamingUpsert(df, "k", "v", "op", "payload",
        entityTtlMs = Some(0L))
    }
    intercept[IllegalArgumentException] {
      Streaming.streamingUpsert(df, "k", "v", "op", "payload",
        entityTtlMs = Some(1L),
        eventTimeTtl = Some(Streaming.EventTimeTtl("ts", "1 minute", 1L)))
    }
  }
}
