package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.pipeline.Quality.Expect._

/** Data-quality expectations: per-rule violation counts by hand, null
  * semantics, single-pass row-local rules, and guards.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    longCol("id"), strCol("status"), dblCol("qty"), strCol("code")))

  private def data = makeDf(schema, Seq(
    Row(1L, "A", 10.0, "X1"),
    Row(2L, "B", 200.0, "X2"),   // qty out of range
    Row(3L, null, 5.0, "bad"),   // null status; code fails regex
    Row(3L, "A", 1.0, "X3"),     // duplicate id
    Row(4L, "Z", null, "X4")))   // status not in set; null qty

  test("every rule class counts violations exactly; a row with a null " +
      "violates not-null, range, set, and regex alike") {
    val report = Quality.report(data, Seq(
      NotNull("status"),
      InRange("qty", 0.0, 100.0),
      InSet("status", Seq("A", "B")),
      MatchesRegex("code", "X[0-9]"),
      Unique(Seq("id"))))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(report("not_null(status)") === ((5L, 1L, false)))
    assert(report("in_range(qty, 0.0, 100.0)") === ((5L, 2L, false))) // 200 + null
    assert(report("in_set(status)") === ((5L, 2L, false))) // null + Z
    assert(report("matches_regex(code)") === ((5L, 1L, false)))
    assert(report("unique(id)") === ((5L, 1L, false))) // one extra row at id 3
    // report preserves rule order
    val order = Quality.report(data, Seq(Unique(Seq("id")), NotNull("status")))
      .select("rule").as[String].collect().toSeq
    assert(order === Seq("unique(id)", "not_null(status)"))
  }

  test("foreign keys: non-null misses count; null keys are skipped (SQL " +
      "FK semantics); passing rules report pass = true") {
    val facts = makeDf(StructType(Seq(longCol("fk"), strCol("x"))), Seq(
      Row(1L, "a"), Row(2L, "b"), Row(99L, "c"), Row(null, "d")))
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val report = Quality.report(facts, Seq(
      ForeignKey(Seq("fk"), dim, Seq("pk"), "dim"),
      NotNull("x")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(report("foreign_key(fk -> dim)") === ((1L, false))) // only 99
    assert(report("not_null(x)") === ((0L, true)))
  }

  test("guards: empty rules, duplicate rule names, missing columns, " +
      "empty input reports zero violations") {
    intercept[IllegalArgumentException] { Quality.report(data, Nil) }
    intercept[IllegalArgumentException] {
      Quality.report(data, Seq(NotNull("status"), NotNull("status")))
    }
    intercept[IllegalArgumentException] {
      Quality.report(data, Seq(NotNull("nope")))
    }
    intercept[IllegalArgumentException] {
      Quality.report(data, Seq(InRange("qty", 5.0, 1.0)))
    }
    val empty = Quality.report(data.where("id < 0"),
      Seq(NotNull("status"), Unique(Seq("id"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(empty.forall(r => r._2 == 0L && r._3 == 0L && r._4))
  }

  test("quarantine tags exactly the violating rows with every rule they " +
      "break, in rule order; clean rows never appear") {
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.quarantine(data, Seq(
      NotNull("status"),
      InRange("qty", 0.0, 100.0),
      Unique(Seq("id")),
      ForeignKey(Seq("id"), dim, Seq("pk"), "dim")))
      .select("id", "status", "violated_rules")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getSeq[String](2))
      .toMap
    // row 1 is clean — absent
    assert(!out.contains((1L, "A")))
    assert(out((2L, "B")) === Seq("in_range(qty, 0.0, 100.0)"))
    // BOTH members of the duplicated id-3 group are tagged (quarantine
    // cannot pick a keeper); the null-status copy also breaks not_null
    assert(out((3L, null)) === Seq("not_null(status)", "unique(id)"))
    assert(out((3L, "A")) === Seq("unique(id)"))
    // id 4 breaks the range rule (null qty) and the FK
    assert(out((4L, "Z")) ===
      Seq("in_range(qty, 0.0, 100.0)", "foreign_key(id -> dim)"))
    assert(out.size === 4)
  }

  test("quarantine FK skips null keys; null-safe uniqueness groups NULL " +
      "keys together; reserved-name and rule guards apply") {
    val facts = makeDf(StructType(Seq(longCol("fk"), strCol("x"))), Seq(
      Row(1L, "a"), Row(99L, "c"), Row(null, "d"), Row(null, "e")))
    val dim = Seq(1L, 2L).toDF("pk")
    val out = Quality.quarantine(facts, Seq(
      ForeignKey(Seq("fk"), dim, Seq("pk"), "dim"),
      Unique(Seq("fk"))))
      .collect()
      .map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    assert(out("c") === Seq("foreign_key(fk -> dim)")) // 99 misses the dim
    // the two NULL-keyed rows form one duplicate group but are NOT FK
    // violations (SQL semantics)
    assert(out("d") === Seq("unique(fk)"))
    assert(out("e") === Seq("unique(fk)"))
    assert(out.size === 3)
    intercept[IllegalArgumentException] {
      Quality.quarantine(data.withColumn("violated_rules",
        org.apache.spark.sql.functions.lit("x")), Seq(NotNull("status")))
    }
    intercept[IllegalArgumentException] { Quality.quarantine(data, Nil) }
  }

  test("row-local rules and uniqueness share ONE scan (a single aggregate " +
      "over the input)") {
    val report = Quality.report(data, Seq(
      NotNull("status"), InRange("qty", 0.0, 100.0), Unique(Seq("id"))))
    assert(report.count() === 3L)
  }
}
