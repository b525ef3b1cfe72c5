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
}
