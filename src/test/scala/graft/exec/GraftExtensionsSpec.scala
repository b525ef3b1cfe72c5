package graft.exec

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface for graft's custom expressions (via
  * spark.sql.extensions in fresh sessions, or GraftExtensions.register for
  * running ones).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.SparkSpec.session.newSession()
    GraftExtensions.register(s)
    s
  }

  test("dp_noise is callable from SQL; zero scale is exact") {
    val v = spark.sql("SELECT dp_noise(41L, 'geometric', 0.0) AS x")
      .collect().head.getLong(0)
    assert(v === 41L)
  }

  test("dp_noise perturbs at positive scale with the right spread") {
    spark.range(20000).createOrReplaceTempView("r")
    val stats = spark.sql(
      "SELECT avg(d) AS m, variance(d) AS v FROM " +
        "(SELECT dp_noise(id, 'geometric', 2.0) - id AS d FROM r)").collect().head
    assert(math.abs(stats.getDouble(0)) < 0.2)
    assert(math.abs(stats.getDouble(1) - 7.84) < 1.0)
  }

  test("dp_noise rejects bad mechanisms") {
    val e = intercept[Exception] {
      spark.sql("SELECT dp_noise(1L, 'bogus', 1.0)").collect()
    }
    assert(e.getMessage.contains("bogus"))
  }

  test("pipeline primitives are callable from pure SQL") {
    val row = spark.sql("""
      SELECT token_count('a quick brown fox') AS tc,
             language_id('the quick brown fox jumps over the lazy dog and the end') AS lang,
             simhash64('alpha beta') = simhash64('alpha beta') AS shEq,
             ngram_jaccard('a b c', 'a b c', 2) AS j,
             cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos
    """).collect().head
    assert(row.getAs[Number]("tc").longValue === 4L)
    assert(row.getString(1) === "en")
    assert(row.getBoolean(2))
    assert(row.getDouble(3) === 1.0)
    assert(math.abs(row.getDouble(4) - 1.0) < 1e-12)
    val rep = spark.sql("""
      SELECT duplicate_line_fraction('a\nb\na\na') AS dl,
             repeated_ngram_fraction('go go go go', 2) AS rn
    """).collect().head
    assert(rep.getDouble(0) === 0.5)
    assert(rep.getDouble(1) === 2.0 / 3.0)
  }

  test("bounded_collect_list works as a SQL aggregate") {
    spark.range(100).selectExpr("id % 2 AS k", "id AS v").createOrReplaceTempView("bc")
    val out = spark.sql(
      "SELECT k, size(bounded_collect_list(v, 7)) AS n FROM bc GROUP BY k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(0L -> 7, 1L -> 7)) // both groups capped at the limit
  }

  test("round-7 primitives are callable from pure SQL") {
    val row = spark.sql("""
      SELECT z_value(3L, 5L, 3) AS z,
             compression_ratio(repeat('spam ham ', 200)) AS cr,
             image_phash(CAST(NULL AS BINARY)) AS ph,
             audio_fingerprint(CAST(NULL AS BINARY)) AS af
    """).collect().head
    assert(row.getLong(0) === 39L)
    assert(row.getDouble(1) < 0.05)
    assert(row.isNullAt(2) && row.isNullAt(3))
    // real payloads through the SQL surface
    val png = graft.pipeline.Multimodal.synthesizePng(8, 8, 0x336699)
    val tone = graft.pipeline.Multimodal.synthesizeTonePcm(512, 16)
    import spark.implicits._
    val media = Seq((png, tone)).toDF("img", "clip")
    media.createOrReplaceTempView("media")
    val m = spark.sql(
      "SELECT image_phash(img) AS ph, audio_fingerprint(clip) AS af FROM media")
      .collect().head
    assert(!m.isNullAt(0) && !m.isNullAt(1))
  }

  test("space_saving_topk works as a SQL aggregate (exact regime)") {
    spark.range(90).selectExpr("CAST(id % 3 AS STRING) AS k")
      .createOrReplaceTempView("ss")
    val out = spark.sql("""
      SELECT h.key, h.count, h.error
      FROM (SELECT space_saving_topk(k, 16, 3) AS top FROM ss)
      LATERAL VIEW explode(top) t AS h
    """).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set(("0", 30L, 0L), ("1", 30L, 0L), ("2", 30L, 0L)))
  }

  test("kll and kmv sketches work from pure SQL: grouped quantiles, " +
      "sketch->union rollup, distinct estimate — exact regimes") {
    import spark.implicits._
    (1 to 100).map(i => (if (i <= 60) "a" else "b", i.toDouble))
      .toDF("g", "v").createOrReplaceTempView("kx")
    // grouped direct quantiles (exact: n < k)
    val q = spark.sql("""
      SELECT g, s.n, s.err_units, s.values FROM
        (SELECT g, kll_quantiles(v, 256, 0.5, 0.9) AS s FROM kx GROUP BY g)
    """).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getSeq[Double](3)))).toMap
    assert(q("a") === ((60L, 0L, Seq(30.0, 54.0))))
    assert(q("b") === ((40L, 0L, Seq(80.0, 96.0))))
    // sketch per group then union to the global quantile
    val u = spark.sql("""
      SELECT u.n, u.values[0] FROM
        (SELECT kll_union(sk, 256, 0.5) AS u FROM
          (SELECT g, kll_sketch(v, 256) AS sk FROM kx GROUP BY g))
    """).head
    assert(u.getLong(0) === 100L && u.getDouble(1) === 50.0)
    // kmv distinct estimate, exact under k
    val d = spark.sql(
      "SELECT kmv_estimate(kmv_sketch(g, 32), 32) FROM kx").head.getDouble(0)
    assert(d === 2.0)
  }
}
