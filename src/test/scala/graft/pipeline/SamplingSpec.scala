package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = makeDf(
    StructType(Seq(longCol("id"))), (1 to n).map(i => Row(i.toLong)))

  test("hash32 matches a JVM md5 reference implementation") {
    val got = ids(50).select(col("id"), Sampling.hash32(col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    for ((id, h) <- got) assert(h === ref(id.toString), s"id $id")
  }

  test("deterministic sample: stable, subset-monotone in the fraction") {
    val df = ids(1000)
    val s20a = Sampling.deterministicSample(df, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    val s20b = Sampling.deterministicSample(df, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(s20a === s20b) // no RNG state anywhere
    val s50 = Sampling.deterministicSample(df, "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(s20a.subsetOf(s50)) // thresholds nest
    // a uniform hash keeps the rate roughly right
    assert(s20a.size > 120 && s20a.size < 280, s"got ${s20a.size}")
    assert(Sampling.deterministicSample(df, "id", 0.0).count() === 0L)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() === 1000L)
  }

  test("hash split: disjoint, exhaustive when fractions sum to 1, stable") {
    val df = ids(1000)
    val out = Sampling.hashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.length === 1000)
    assert(out.forall(_._2 != null)) // fractions cover the whole range
    val byLabel = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train") > 700 && byLabel("train") < 900)
    // membership agrees with the sample operator at the same cutoff
    val sampled = Sampling.deterministicSample(df, "id", 0.8)
      .collect().map(_.getLong(0)).toSet
    val trained = out.filter(_._2 == "train").map(_._1).toSet
    assert(sampled === trained)
  }

  test("corpus profile: exact counts per column, single aggregation") {
    val df = makeDf(
      StructType(Seq(longCol("id"), strCol("a"), strCol("b"))),
      Seq(Row(1L, "xy", null), Row(2L, null, "zzz"), Row(3L, "q", "w")))
    val out = CorpusStats.profile(df, Seq("a", "b", "id"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") === ((3L, 1L, 3L)))  // "xy" + "q"
    assert(out("b") === ((3L, 1L, 4L)))  // "zzz" + "w"
    assert(out("id") === ((3L, 0L, 3L))) // "1","2","3"
    // distinct estimate is sane on tiny data
    val approx = CorpusStats.profile(df, Seq("a"))
      .collect().head.getLong(4)
    assert(approx === 2L)
    intercept[IllegalArgumentException] {
      CorpusStats.profile(df, Seq("ghost"))
    }
    // the whole profile is one partial->final aggregate
    val plan = { val p = CorpusStats.profile(df, Seq("a", "b")); p.count(); p }
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("stratified quota: exact per-group caps, deterministic membership") {
    val df = makeDf(
      StructType(Seq(strCol("grp"), longCol("id"))),
      (1 to 90).map(i => Row(if (i <= 60) "big" else "small", i.toLong)))
    val out = Sampling.stratifiedQuota(df, "grp", "id", quota = 20)
    val byGroup = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // groups above the quota are capped; groups below keep everything
    assert(byGroup === Map("big" -> 20L, "small" -> 20L))
    val small = Sampling.stratifiedQuota(df, "grp", "id", quota = 40)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(small === Map("big" -> 40L, "small" -> 30L))
    // membership is stable across reruns and partitionings
    def members() = Sampling.stratifiedQuota(
      df.repartition(7), "grp", "id", quota = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(members() === members())
    assert(members() === out.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // quotas nest: quota-20 survivors are a subset of quota-40 survivors
    val m40 = Sampling.stratifiedQuota(df, "grp", "id", quota = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(members().subsetOf(m40))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedQuota(df, "grp", "id", quota = 0)
    }
  }

  test("hash split validates its fractions") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(1), "id", Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(1), "id", Seq("a" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(1), "id", Nil)
    }
  }
}
