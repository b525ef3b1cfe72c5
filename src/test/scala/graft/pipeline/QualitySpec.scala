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

  test("robustOutliers: exact-regime fences match the hand model, NULLs " +
      "are unjudged, grouped fences differ per group") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(strCol("g"), dblCol("v")))
    // group a: 1..11 plus a 100.0 spike; group b: tight cluster, no spike
    val rows = (1 to 11).map(i => Row("a", i.toDouble)) ++
      Seq(Row("a", 100.0), Row("a", null),
        Row("b", 5.0), Row("b", 5.5), Row("b", 6.0), Row("b", 6.5))
    val got = Quality.robustOutliers(
      makeDf(schema, rows), Seq("g"), "v", k = 64)
    val a = got.where(org.apache.spark.sql.functions.col("g") === "a")
      .collect().map(r => (r.getAs[Any]("v"),
        if (r.isNullAt(r.fieldIndex("is_outlier"))) null
        else r.getBoolean(r.fieldIndex("is_outlier")))).toSet
    // group a (12 non-null values): rank-ceil q1 = 3.0, q3 = 9.0, IQR 6
    // -> fences [-6, 18]: only the 100.0 spike is out; NULL unjudged
    assert(a === ((1 to 11).map(i => (i.toDouble: Any, false: Any)).toSet ++
      Set((100.0: Any, true: Any), (null: Any, null: Any))))
    val aRow = got.where(org.apache.spark.sql.functions.col("g") === "a")
      .select("lo_fence", "hi_fence", "err_units").head
    assert(aRow.getDouble(0) === -6.0 && aRow.getDouble(1) === 18.0 &&
      aRow.getLong(2) === 0L)
    val b = got.where(org.apache.spark.sql.functions.col("g") === "b")
    assert(b.where(org.apache.spark.sql.functions.col("is_outlier")).count() === 0L)
    assert(b.select("lo_fence").distinct().head.getDouble(0) !== -6.0)
  }

  test("robustOutliers: ungrouped single-fence broadcast; estimator regime " +
      "carries a certificate; guards reject bad inputs") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(dblCol("v")))
    val big = makeDf(schema, (1 to 2000).map(i => Row(i.toDouble)))
    val est = Quality.robustOutliers(big, Nil, "v", k = 32)
    val r = est.head
    assert(r.getAs[Long]("err_units") > 0L) // compactions happened
    val exact = Quality.robustOutliers(big, Nil, "v", k = 4096)
    val e = exact.head
    // 2000 values: q1 = 500, q3 = 1500 -> fences [-1000, 3000], none out
    assert(e.getAs[Double]("lo_fence") === -1000.0 &&
      e.getAs[Double]("hi_fence") === 3000.0 &&
      e.getAs[Long]("err_units") === 0L)
    assert(exact.where(org.apache.spark.sql.functions.col("is_outlier")).count() === 0L)
    intercept[IllegalArgumentException](
      Quality.robustOutliers(big, Nil, "missing"))
    intercept[IllegalArgumentException](
      Quality.robustOutliers(big, Seq("v"), "v"))
    intercept[IllegalArgumentException](
      Quality.robustOutliers(big, Nil, "v", factor = -1.0))
    intercept[IllegalArgumentException](
      Quality.robustOutliers(big.withColumn("is_outlier",
        org.apache.spark.sql.functions.lit(true)), Nil, "v"))
  }

  test("robustZScores: exact-regime median/MAD match the hand model, " +
      "zero MAD and NULLs score NULL, grouped stats differ per group") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    val schema = StructType(Seq(strCol("g"), dblCol("v")))
    // group a: 1..7 (median 4, |x-4| gives MAD 2) plus a spike and a NULL;
    // group b: constant -> MAD 0 -> NULL scores
    val rows = (1 to 7).map(i => Row("a", i.toDouble)) ++
      Seq(Row("a", 100.0), Row("a", null),
        Row("b", 5.0), Row("b", 5.0), Row("b", 5.0))
    val got = Quality.robustZScores(
      makeDf(schema, rows), Seq("g"), "v", k = 64)
    val a = got.where(col("g") === "a").collect().map { r =>
      (r.getAs[Any]("v"), r.getDouble(r.fieldIndex("median")),
        r.getDouble(r.fieldIndex("mad")),
        if (r.isNullAt(r.fieldIndex("robust_z"))) null
        else r.getDouble(r.fieldIndex("robust_z")))
    }.toSet
    // 8 non-null values 1..7,100: rank-ceil median = 4, deviations
    // {3,2,1,0,1,2,3,96} -> rank-ceil MAD = 2
    assert(a === ((1 to 7).map(i =>
      (i.toDouble: Any, 4.0, 2.0, ((i - 4.0) / (2.0 * 1.4826)): Any)).toSet ++
      Set((100.0: Any, 4.0, 2.0, (96.0 / (2.0 * 1.4826)): Any),
        (null: Any, 4.0, 2.0, null: Any))))
    // constant group: MAD 0 -> truthfully unjudgeable, never Infinity
    val b = got.where(col("g") === "b")
      .select("median", "mad", "robust_z").collect()
    assert(b.forall(r => r.getDouble(0) == 5.0 && r.getDouble(1) == 0.0 &&
      r.isNullAt(2)))
    // certificates: both passes exact here
    assert(got.select("median_err_units", "mad_err_units").collect()
      .forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
    intercept[IllegalArgumentException](
      Quality.robustZScores(makeDf(schema, rows), Seq("g"), "v",
        scaleFactor = 0.0))
    intercept[IllegalArgumentException](
      Quality.robustZScores(makeDf(schema, rows)
        .withColumn("mad", org.apache.spark.sql.functions.lit(1.0)),
        Seq("g"), "v"))
  }

  test("winsorize: values clip at the per-group rank-ceil quantile " +
      "fences, NULLs pass through unjudged, guards refuse bad bounds") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    val schema = StructType(Seq(strCol("g"), dblCol("v")))
    // 1..10: rank-ceil p10 = 1, p90 = 9 -> 10 clips to 9, rest unchanged
    val rows = (1 to 10).map(i => Row("a", i.toDouble)) :+ Row("a", null)
    val got = Quality.winsorize(
      makeDf(schema, rows), Seq("g"), "v", pLo = 0.1, pHi = 0.9, k = 64)
      .collect().map(r => (r.getAs[Any]("v"),
        if (r.isNullAt(r.fieldIndex("winsorized"))) null
        else r.getDouble(r.fieldIndex("winsorized")))).toSet
    assert(got === ((1 to 9).map(i => (i.toDouble: Any, i.toDouble: Any))
      .toSet ++ Set((10.0: Any, 9.0: Any), (null: Any, null: Any))))
    intercept[IllegalArgumentException](Quality.winsorize(
      makeDf(schema, rows), Seq("g"), "v", pLo = 0.9, pHi = 0.1))
    intercept[IllegalArgumentException](Quality.winsorize(
      makeDf(schema, rows).withColumn("winsorized",
        org.apache.spark.sql.functions.lit(1.0)), Seq("g"), "v"))
  }
}
