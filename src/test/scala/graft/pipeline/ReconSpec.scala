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
    // the internal working column is reserved too: an input '__mode'
    // would make the fill join ambiguous / silently vanish
    val df2 = makeDf(kvSchema, Seq(Row("g", "a")))
      .withColumn("__mode", lit("x"))
    intercept[IllegalArgumentException] {
      Quality.imputeMode(df2, Seq("g"), "v")
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

  private val scdSchema = StructType(
    Seq(strCol("k"), longCol("from"), longCol("to")))

  test("scdAudit classifies overlaps, gaps, touches, and open rows") {
    val df = makeDf(scdSchema, Seq(
      Row("k", 1L, 5L), Row("k", 4L, 8L),    // overlap
      Row("k", 10L, 12L),                     // gap after 8
      Row("k", 12L, 14L),                     // touch: neither
      Row("k", 20L, null)))                   // gap + the open row
    val r = Relational.scdAudit(df, Seq("k"), "from", "to").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((5L, 1L, 2L, 1L)))
  }

  test("scdAudit counts double-current rows as overlap AND n_open = 2") {
    val df = makeDf(scdSchema, Seq(Row("k", 1L, null), Row("k", 5L, null)))
    val r = Relational.scdAudit(df, Seq("k"), "from", "to").collect().head
    assert((r.getLong(2), r.getLong(4)) === ((1L, 2L)))
  }

  test("scdAudit raises on NULL from and inverted intervals") {
    val e1 = intercept[Exception] {
      Relational.scdAudit(makeDf(scdSchema, Seq(Row("k", null, 5L))),
        Seq("k"), "from", "to").collect()
    }
    assert(e1.getMessage.contains("NULL from"))
    val e2 = intercept[Exception] {
      Relational.scdAudit(makeDf(scdSchema, Seq(Row("k", 5L, 5L))),
        Seq("k"), "from", "to").collect()
    }
    assert(e2.getMessage.contains("empty or inverted"))
  }

  private val nmSchema = StructType(Seq(strCol("id"), strCol("nm")))

  test("sortedNeighborPairs emits exactly the rank-window candidates") {
    val df = makeDf(nmSchema, Seq(
      Row("a", "apple"), Row("b", "apply"), Row("c", "banana"),
      Row("d", "appla"), Row("e", "zebra")))
    val out = Dedup.sortedNeighborPairs(df, "id", "nm", windowSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // sort order: appla(d) apple(a) apply(b) banana(c) zebra(e)
    assert(out === Set(("d", "a", 1L), ("d", "b", 2L), ("a", "b", 1L),
      ("a", "c", 2L), ("b", "c", 1L), ("b", "e", 2L), ("c", "e", 1L)))
  }

  test("sortedNeighborPairs: n*w bound, partition-invariant, dup ids raise") {
    val df = makeDf(nmSchema,
      (1 to 40).map(i => Row(s"id$i", f"k${(i * 7) % 40}%03d")))
    val a = Dedup.sortedNeighborPairs(df, "id", "nm", 3)
    assert(a.count() === 40L * 3 - 6) // n*w - w(w+1)/2
    val b = Dedup.sortedNeighborPairs(df.repartition(7), "id", "nm", 3)
    assert(a.collect().map(_.toSeq).toSet === b.collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborPairs(
        makeDf(nmSchema, Seq(Row("x", "a"), Row("x", "b"))), "id", "nm", 2)
    }
  }
}
