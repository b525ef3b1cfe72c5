package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.exec.NearestCentroid

/** The kMeansMicro assignment must stay inside whole-stage codegen at the
  * largest k the driver-residency budget admits. The composed formulation it
  * replaced (array_min over k aggregate(zip_with(...)) structs) paid an
  * interpreted CodegenFallback eval per centroid per row and, past k in the
  * hundreds, broke whole-stage codegen entirely (VERDICT r13 item 3); the
  * NearestCentroid expression is one compiled loop regardless of k.
  */
class KMeansCodegenSpec extends SparkSpec {

  test("NearestCentroid matches the lexicographic array_min rule: min " +
      "distance, ties to the smallest centroid index") {
    val tab = Array(Array(0L, 0L), Array(10L, 0L), Array(0L, 10L))
    // strict winner
    assert(NearestCentroid.argmin(tab, Array(9L, 0L)) === ((1L, 1)))
    // (5,5) ties ALL THREE cells at d=50: the smallest index wins
    assert(NearestCentroid.argmin(tab, Array(5L, 5L)) === ((50L, 0)))
    // (7,7): cells 1 and 2 tie at d=58 (cell 0 loses at 98): index 1 wins
    assert(NearestCentroid.argmin(tab, Array(7L, 7L)) === ((58L, 1)))
    // equidistant to ALL three (centroid 0 ties too): index 0 wins
    val tri = Array(Array(6L, 0L), Array(0L, 6L), Array(6L, 6L))
    assert(NearestCentroid.argmin(tri, Array(3L, 3L)) === ((18L, 0)))
  }

  test("assignment plan stays codegen'd at large k: compiles under " +
      "codegen.fallback=false and agrees with the interpreted eval path") {
    val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    // k = 2048 centroids of dim 4 — the regime where the old k-wide
    // projection tree hit Janino limits and silently went interpreted
    val k = 2048
    val n = 4096
    val df = spark.range(n).select(col("id"),
      array(col("id") % 97, col("id") % 89, col("id") % 83, col("id") % 79)
        .as("v"))
    def run(): Map[Long, (Int, Long)] =
      Clustering.kMeansMicro(df, "id", "v", k = k, iters = 2, scale = 1L)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
        .toMap
    // fallback=false turns "whole-stage codegen failed, interpreting" from
    // a silent 10x into a test failure
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val compiled = try run()
    finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    assert(compiled.size === n)
    // and the interpreted expression path (wholeStage off) agrees bit for
    // bit — doGenCode and nullSafeEval implement one kernel
    val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
    assert(compiled === interpreted)
  }

  test("kMeansMicro releases are unchanged by the expression swap: " +
      "3 well-separated blobs recover their centers") {
    val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    val pts = (0 until 30).map { i =>
      val c = i % 3
      (i.toLong, Seq(c * 1000.0 + (i % 5), c * -500.0 + (i % 7)))
    }
    val df = pts.toDF("id", "v")
    val out = Clustering.kMeansMicro(df, "id", "v", k = 3, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every point clusters with the other members of its blob
    val byBlob = pts.groupBy(_._1 % 3).view.mapValues(_.map(p => out(p._1)))
    byBlob.foreach { case (_, cs) => assert(cs.toSet.size === 1) }
    assert(out.values.toSet.size === 3)
  }
}
