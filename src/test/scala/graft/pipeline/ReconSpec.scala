package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** imputeMode repair and tableDigest reconciliation. */
class ReconSpec extends SparkSpec {

  private val kvSchema = StructType(Seq(strCol("g"), strCol("v")))

  test("imputeMode fills NULLs with the group mode, ties to least value") {
    val df = makeDf(kvSchema, Seq(
      Row("g1", "a"), Row("g1", "a"), Row("g1", "b"), Row("g1", null),
      Row("g2", "x"), Row("g2", "y"), Row("g2", null)))
    val out = Quality.imputeMode(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(2)))
    assert(out.count(_ == (("g1", "a", true))) === 1)  // filled with mode
    // g2 ties x/y 1-1 -> least value x wins
    assert(out.count(_ == (("g2", "x", true))) === 1)
    assert(out.count(_._3) === 2) // exactly the two null rows flagged
  }

  test("imputeMode leaves all-null groups and null-keyed rows untouched") {
    val df = makeDf(kvSchema, Seq(
      Row("empty", null), Row("empty", null), Row(null, null)))
    val out = Quality.imputeMode(df, Seq("g"), "v").collect()
    assert(out.length === 3)
    assert(out.forall(r => r.isNullAt(1) && !r.getBoolean(2)))
  }

  test("imputeMode rejects the reserved output column") {
    val df = makeDf(kvSchema, Seq(Row("g", "a")))
      .withColumn("was_imputed", lit(true))
    intercept[IllegalArgumentException] {
      Quality.imputeMode(df, Seq("g"), "v")
    }
  }

  private val rowSchema =
    StructType(Seq(longCol("id"), strCol("status"), strCol("note")))
  private def snap(rows: (Long, String, String)*) =
    makeDf(rowSchema, rows.map { case (i, s, n) => Row(i, s, n) })

  test("tableDigest: identical content digests identically, any partitioning") {
    val df = snap((1L, "A", "x"), (2L, "B", "y"), (3L, "A", "z"))
    val a = Quality.tableDigest(df, Seq("id"), Seq("status", "note"), 8)
      .collect().map(_.toSeq).toSet
    val b = Quality.tableDigest(df.repartition(5), Seq("id"),
      Seq("status", "note"), 8).collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }

  test("tableDigest: a payload edit flips ONLY its key's bucket") {
    val base = (1L to 40L).map(i => (i, s"s$i", s"n$i"))
    val edited = base.map { case (i, s, n) =>
      if (i == 17L) (i, s, "CHANGED") else (i, s, n) }
    val d1 = Quality.tableDigest(snap(base: _*), Seq("id"),
      Seq("status", "note"), 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val d2 = Quality.tableDigest(snap(edited: _*), Seq("id"),
      Seq("status", "note"), 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val moved = d1.keySet.filter(k => d1(k) != d2(k))
    assert(moved.size === 1, s"exactly one bucket must differ: $moved")
    // row COUNT in the moved bucket is unchanged — only content moved
    assert(d1(moved.head)._1 === d2(moved.head)._1)
  }

  test("tableDigest: a duplicated row escapes XOR but not count/sum") {
    val df = snap((1L, "A", "x"), (2L, "B", "y"))
    val dup = snap((1L, "A", "x"), (1L, "A", "x"), (2L, "B", "y"))
    val d1 = Quality.tableDigest(df, Seq("id"), Seq("status", "note"), 1)
      .collect().head
    val d2 = Quality.tableDigest(dup, Seq("id"), Seq("status", "note"), 1)
      .collect().head
    assert(d1.getLong(1) !== d2.getLong(1)) // n_rows catches it
    assert(d1.getLong(3) !== d2.getLong(3)) // sum digest catches it
  }

  test("tableDigest: NULL payload differs from the empty string") {
    val a = Quality.tableDigest(snap((1L, null, "x")), Seq("id"),
      Seq("status", "note"), 1).collect().head
    val b = Quality.tableDigest(snap((1L, "", "x")), Seq("id"),
      Seq("status", "note"), 1).collect().head
    assert(a.getLong(2) !== b.getLong(2))
  }
}
