package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** applyChangelog (CDC merge), transitionMatrix, and survivorship:
  * exact hand-fixture results and the loud-guard contracts.
  */
class ChangelogSpec extends SparkSpec {

  private val baseSchema =
    StructType(Seq(longCol("k"), strCol("status"), strCol("note")))
  private val chSchema = StructType(Seq(longCol("k"), strCol("status"),
    strCol("note"), longCol("v"), strCol("op")))

  private def base(rows: (Long, String, String)*) =
    makeDf(baseSchema, rows.map { case (k, s, n) => Row(k, s, n) })
  private def ch(rows: (Long, String, String, Long, String)*) =
    makeDf(chSchema, rows.map { case (k, s, n, v, o) => Row(k, s, n, v, o) })

  test("applyChangelog: upsert, insert, delete, and ride-through") {
    val out = Relational.applyChangelog(
      base((1L, "A", "one"), (2L, "B", "two"), (3L, "C", "three")),
      ch((2L, "B2", "two'", 10L, "U"), (3L, "-", null, 11L, "D"),
        (4L, "D", "four", 12L, "I")),
      Seq("k"), "v", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out === Map(1L -> ("A", "one"), 2L -> ("B2", "two'"),
      4L -> ("D", "four")))
  }

  test("applyChangelog: highest version wins, out-of-order arrival") {
    val out = Relational.applyChangelog(
      base((1L, "A", "x")),
      ch((1L, "v5", "b", 5L, "U"), (1L, "v1", "a", 1L, "U"),
        (1L, "-", null, 3L, "D")),
      Seq("k"), "v", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, "v5", "b")))
  }

  test("applyChangelog: a delete at the highest version removes the key") {
    val out = Relational.applyChangelog(
      base((1L, "A", "x")),
      ch((1L, "v1", "a", 1L, "U"), (1L, "-", null, 9L, "D")),
      Seq("k"), "v", "op")
    assert(out.count() === 0L)
  }

  test("applyChangelog: NULL keys drop on both sides") {
    val out = Relational.applyChangelog(
      makeDf(baseSchema, Seq(Row(null, "A", "x"), Row(1L, "B", "y"))),
      makeDf(chSchema, Seq(Row(null, "C", "z", 1L, "U"))),
      Seq("k"), "v", "op")
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L))
  }

  test("applyChangelog guards: dup base key, dup (key,version), NULL version") {
    intercept[IllegalArgumentException] {
      Relational.applyChangelog(
        base((1L, "A", "x"), (1L, "B", "y")), ch(), Seq("k"), "v", "op")
    }
    intercept[IllegalArgumentException] {
      Relational.applyChangelog(base((1L, "A", "x")),
        ch((2L, "a", "b", 1L, "U"), (2L, "c", "d", 1L, "U")),
        Seq("k"), "v", "op")
    }
    intercept[IllegalArgumentException] {
      Relational.applyChangelog(base((1L, "A", "x")),
        makeDf(chSchema, Seq(Row(2L, "a", "b", null, "U"))),
        Seq("k"), "v", "op")
    }
  }

  test("applyChangelog fails loudly on an unknown op") {
    val ex = intercept[Exception] {
      Relational.applyChangelog(base((1L, "A", "x")),
        ch((2L, "a", "b", 1L, "X")), Seq("k"), "v", "op").collect()
    }
    assert(ex.getMessage.contains("unknown op"))
  }

  private val evSchema = StructType(
    Seq(strCol("u"), longCol("t"), strCol("ty")))
  private def ev(rows: (String, Long, String)*) =
    makeDf(evSchema, rows.map { case (u, t, y) => Row(u, t, y) })

  test("transitionMatrix: session gaps reset transitions; ppm truncates") {
    val out = Relational.transitionMatrix(
      ev(("u", 1L, "A"), ("u", 2L, "B"), ("u", 700L, "C"), ("u", 701L, "A"),
        ("w", 1L, "X"), ("w", 2L, "Y"), ("w", 3L, "X"), ("w", 4L, "Z")),
      "u", "t", "ty", gapUnits = 600L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // u: [A,B] | [C,A]  ->  A->B, C->A ; w: X->Y, Y->X, X->Z
    assert(out === Map(
      ("A", "B") -> (1L, 1000000L), ("C", "A") -> (1L, 1000000L),
      ("X", "Y") -> (1L, 500000L), ("X", "Z") -> (1L, 500000L),
      ("Y", "X") -> (1L, 1000000L)))
  }

  test("transitionMatrix: truncating thirds sum below ppmScale") {
    val out = Relational.transitionMatrix(
      ev(("u", 1L, "A"), ("u", 2L, "B"), ("u", 3L, "A"), ("u", 4L, "C"),
        ("u", 5L, "A"), ("u", 6L, "D")),
      "u", "t", "ty", gapUnits = 600L)
      .where(col("from_type") === "A")
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(out === Map("B" -> 333333L, "C" -> 333333L, "D" -> 333333L))
  }

  test("transitionMatrix guards: gap, ppmScale, non-integral time") {
    intercept[IllegalArgumentException] {
      Relational.transitionMatrix(ev(), "u", "t", "ty", gapUnits = 0L)
    }
    intercept[IllegalArgumentException] {
      Relational.transitionMatrix(ev(), "u", "t", "ty", 600L, ppmScale = 1L)
    }
    intercept[IllegalArgumentException] {
      Relational.transitionMatrix(
        ev().withColumn("t", col("t").cast("double")), "u", "t", "ty", 600L)
    }
  }

  private val docSchema = StructType(Seq(longCol("id"), longCol("score")))
  private val cluSchema = StructType(Seq(longCol("id"), longCol("cluster_id")))

  test("survivorship keeps max score, ties to smallest id, counts members") {
    val docs = makeDf(docSchema,
      Seq(Row(1L, 10L), Row(2L, 30L), Row(3L, 30L), Row(4L, 5L)))
    val clus = makeDf(cluSchema,
      Seq(Row(1L, 1L), Row(2L, 1L), Row(3L, 1L))) // 4 unassigned
    val out = Dedup.survivorship(docs, "id", "score", clus)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // cluster 1: ids {1,2,3}, best score 30 tie -> id 2; id 4 singleton
    assert(out === Set((2L, 1L, 3L), (4L, 4L, 1L)))
  }

  test("survivorship: NULL scores lose to any non-null score") {
    val docs = makeDf(docSchema, Seq(Row(1L, null), Row(2L, 3L)))
    val clus = makeDf(cluSchema, Seq(Row(1L, 1L), Row(2L, 1L)))
    val out = Dedup.survivorship(docs, "id", "score", clus)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(2L))
  }

  test("survivorship fails loudly on a duplicate cluster assignment") {
    val docs = makeDf(docSchema, Seq(Row(1L, 1L)))
    val clus = makeDf(cluSchema, Seq(Row(1L, 1L), Row(1L, 2L)))
    // the guard is inline (raise_error on the assignment's own id window,
    // zero extra actions), so it fires on consumption of the release
    val e = intercept[Exception] {
      Dedup.survivorship(docs, "id", "score", clus).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate id in the cluster assignment")))
  }
}
