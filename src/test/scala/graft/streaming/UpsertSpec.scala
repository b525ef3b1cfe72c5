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

  test("active-but-stale traffic keeps the tombstone alive: the TTL " +
      "re-arms on every touched batch, so the deadline rides the newest " +
      "event time ever seen, and a late stale upsert cannot resurrect") {
    val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    // (key, version, op, payload, ts-minute)
    val in = MemoryStream[(String, Long, String, String, Long)]
    def min(m: Long) = new java.sql.Timestamp(m * 60000L)
    val src = in.toDF().toDF("k", "v", "op", "payload", "m")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_millis(org.apache.spark.sql.functions.col("m") * 60000L))
      .drop("m")
    val out = Streaming.streamingUpsert(
      src, "k", "v", "op", "payload",
      eventTimeTtl = Some(Streaming.EventTimeTtl("ts", "0 seconds",
        ttlMs = 10 * 60000L)))
    val name = s"upsttl${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      // delete at minute 1 (v10): tombstone deadline = event-minute 11
      in.addData(("k", 10L, "D", "x", 1L)); q.processAllAvailable()
      // stale-but-ACTIVE traffic at minute 20: suppressed, but the fix
      // re-arms the deadline to 20+10=30 (pre-fix: deadline stays 11)
      in.addData(("k", 3L, "U", "old", 20L)); q.processAllAvailable()
      // a k-less batch whose watermark (25) sits BETWEEN the never-re-
      // armed deadline (11) and the re-armed one (30): pre-fix k times
      // out here and the tombstone is lost; post-fix 25 < 30 keeps it
      in.addData(("other", 1L, "I", "o", 25L)); q.processAllAvailable()
      // the stale v5 upsert must still be suppressed by the tombstone
      in.addData(("k", 5L, "U", "ghost", 26L)); q.processAllAvailable()
      val rows = spark.table(name).collect()
        .filter(_.getString(0) == "k")
        .map(r => (r.getLong(1), r.getString(2), Option(r.getString(3))))
      assert(rows.toSeq === Seq((10L, "D", None)),
        s"only the delete may ever emit for k, got ${rows.toSeq}")
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
