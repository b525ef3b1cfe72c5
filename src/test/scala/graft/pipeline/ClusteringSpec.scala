package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  private def schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", ArrayType(DoubleType))))

  /** Pure-Scala Lloyd model mirroring the operator's integer contract. */
  private def model(
      vecs: Seq[(Long, Seq[Double])], k: Int, iters: Int,
      scale: Long): Map[Long, (Int, Long)] = {
    val micro = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x * scale)).toArray }
    var cents = micro.sortBy(_._1).take(k).map(_._2.clone())
    var assign = Map.empty[Long, (Int, Long)]
    for (_ <- 1 to iters) {
      assign = micro.map { case (id, v) =>
        val ds = cents.map(c =>
          c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
        val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }
        id -> ((best._2, best._1))
      }.toMap
      cents = cents.zipWithIndex.map { case (c, i) =>
        val members = micro.collect {
          case (id, v) if assign(id)._1 == i => v }
        if (members.isEmpty) c
        else Array.tabulate(c.length)(d =>
          members.map(_(d)).sum / members.size) // JVM / truncates like div
      }
    }
    assign
  }

  test("kMeansMicro matches the integer Lloyd model across iterations " +
      "and is partitioning-invariant; well-separated blobs recover") {
    val rng = new scala.util.Random(7)
    // three separated 4-d blobs
    val vecs = (0 until 60).map { i =>
      val center = i % 3 match {
        case 0 => Seq(0.0, 0.0, 0.0, 0.0)
        case 1 => Seq(5.0, 5.0, 0.0, 0.0)
        case _ => Seq(-5.0, 0.0, 5.0, 0.0)
      }
      (i.toLong, center.map(_ + rng.nextGaussian() * 0.3))
    }
    val df = makeDf(schema, vecs.map { case (id, v) => Row(id, v) })
    for (iters <- Seq(1, 3); parts <- Seq(1, 5)) {
      val got = Clustering.kMeansMicro(
        df.repartition(parts), "id", "v", k = 3, iters = iters)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2)))).toMap
      assert(got === model(vecs, 3, iters, 1000000L),
        s"iters=$iters parts=$parts")
    }
    // after 3 rounds the blobs separate: each cluster is pure
    val stable = Clustering.kMeansMicro(df, "id", "v", k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byBlob = stable.groupBy(_._1 % 3).values.map(_.map(_._2).distinct)
    assert(byBlob.forall(_.size == 1), s"blobs must be pure: $byBlob")
  }

  test("kMeansMicro guards: nulls, mixed dims, duplicate ids, k > n, " +
      "non-array input refuse loudly") {
    val base = makeDf(schema, Seq(Row(1L, Seq(1.0, 2.0)),
      Row(2L, Seq(3.0, 4.0))))
    intercept[IllegalArgumentException](
      Clustering.kMeansMicro(base, "id", "v", k = 3, iters = 1))
    intercept[IllegalArgumentException](
      Clustering.kMeansMicro(base, "id", "v", k = 0, iters = 1))
    intercept[IllegalArgumentException](
      Clustering.kMeansMicro(base, "id", "v", k = 1, iters = 0))
    intercept[IllegalArgumentException](Clustering.kMeansMicro(
      makeDf(schema, Seq(Row(1L, Seq(1.0)), Row(1L, Seq(2.0)))),
      "id", "v", 1, 1))
    intercept[IllegalArgumentException](Clustering.kMeansMicro(
      makeDf(schema, Seq(Row(1L, Seq(1.0)), Row(2L, null))),
      "id", "v", 1, 1))
    intercept[IllegalArgumentException](Clustering.kMeansMicro(
      makeDf(schema, Seq(Row(1L, Seq(1.0)), Row(2L, Seq(1.0, 2.0)))),
      "id", "v", 1, 1))
    intercept[IllegalArgumentException](Clustering.kMeansMicro(
      base.withColumn("v", col("id")), "id", "v", 1, 1))
  }
}
