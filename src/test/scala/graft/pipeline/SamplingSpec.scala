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

  test("mixture upsample: whole copies exact, fractional copies hash-gated") {
    val df = makeDf(
      StructType(Seq(strCol("grp"), longCol("id"))),
      (1 to 300).map(i => Row(if (i <= 100) "up" else if (i <= 200) "down"
        else "drop", i.toLong)))
    val out = Sampling.mixtureUpsample(df, "grp", "id",
      Seq("up" -> 2.5, "down" -> 0.5, "drop" -> 0.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGroup = out.groupBy(_._1).view.mapValues(_.length).toMap
    // "up": every row twice plus ~50% a third time; "down": ~50% once
    assert(byGroup("up") >= 200 && byGroup("up") <= 300)
    assert(byGroup.getOrElse("down", 0) > 20 && byGroup("down") < 80)
    assert(!byGroup.contains("drop"))
    // copies are numbered 1..n with no gaps
    val copies = out.filter(_._1 == "up").groupBy(_._2).values
    assert(copies.forall(c => c.map(_._3).sorted.toSeq == (1L to c.length)))
    // the fractional third copy is exactly the id-hash sample at 0.5
    val sampled = Sampling.deterministicSample(
      df.filter(col("grp") === "up"), "id", 0.5)
      .collect().map(_.getLong(1)).toSet
    val third = out.filter(t => t._1 == "up" && t._3 == 3L).map(_._2).toSet
    assert(third === sampled)
    // unlisted groups get the default weight
    val dflt = Sampling.mixtureUpsample(df, "grp", "id", Seq("up" -> 2.0))
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dflt === Map("up" -> 200L, "down" -> 100L, "drop" -> 100L))
    // deterministic under repartitioning
    val again = Sampling.mixtureUpsample(df.repartition(7), "grp", "id",
      Seq("up" -> 2.5, "down" -> 0.5, "drop" -> 0.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === out.toSet)
    intercept[IllegalArgumentException] {
      Sampling.mixtureUpsample(df, "grp", "id", Seq("up" -> -1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureUpsample(df, "grp", "id", Seq("up" -> 1.0, "up" -> 2.0))
    }
  }

  test("weightedQuota: selection frequency tracks the weights") {
    // 400 rows, weight 9 for ids % 4 == 0 and 1 otherwise, quota 100 of
    // 400: the heavy quarter (total mass 900 of 1200) must dominate the
    // sample. With A-ES inclusion ~ mass, expect far more than its 25%
    // uniform share; the draw is deterministic, so the bound cannot flake.
    val schema = StructType(Seq(strCol("g"), longCol("id"), dblCol("w")))
    val df = makeDf(schema, (1 to 400).map(i =>
      Row("g", i.toLong, if (i % 4 == 0) 9.0 else 1.0)))
    val picked = Sampling.weightedQuota(df, "g", "id", "w", 100)
      .collect().map(_.getLong(1)).toSet
    assert(picked.size === 100)
    val heavy = picked.count(_ % 4 == 0)
    assert(heavy >= 55, s"heavy rows picked: $heavy of 100")
  }

  test("weightedQuota: a practically-infinite weight always survives; " +
      "null/zero/negative/NaN weights carry no mass") {
    val schema = StructType(Seq(strCol("g"), longCol("id"), dblCol("w")))
    val df = makeDf(schema, Seq(
      Row("g", 1L, 1e18), Row("g", 2L, 1.0), Row("g", 3L, 1.0),
      Row("g", 4L, null), Row("g", 5L, 0.0), Row("g", 6L, -2.0),
      Row("g", 7L, Double.NaN)))
    val out = Sampling.weightedQuota(df, "g", "id", "w", 2)
      .collect().map(_.getLong(1)).toSet
    assert(out.contains(1L), "the 1e18-weight row must be selected")
    assert(out.size === 2)
    assert(!Seq(4L, 5L, 6L, 7L).exists(out.contains),
      "massless rows must never be selected")
  }

  test("weightedQuota is partition-invariant and keeps short groups whole") {
    val schema = StructType(Seq(strCol("g"), longCol("id"), dblCol("w")))
    val rows = (1 to 90).map(i => Row("g" + i % 3, i.toLong, (i % 7 + 1).toDouble))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedQuota(d, "g", "id", "w", 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val base = makeDf(schema, rows)
    assert(run(base.repartition(1)) === run(base.repartition(17)))
    // a group smaller than the quota survives entirely
    val tiny = Sampling.weightedQuota(
      makeDf(schema, Seq(Row("t", 1L, 2.0), Row("t", 2L, 3.0))),
      "g", "id", "w", 10).count()
    assert(tiny === 2L)
    intercept[IllegalArgumentException] {
      Sampling.weightedQuota(base, "g", "id", "w", 0)
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

  private val pairSchema = StructType(Seq(strCol("u"), strCol("i")))
  private def pairs(rows: (String, String)*) =
    makeDf(pairSchema, rows.map { case (u, i) => Row(u, i) })

  test("negativeSamples: negatives come from the universe, never the " +
      "user's own positives, bounded by k per positive") {
    val pos = pairs(("u1", "a"), ("u1", "b"), ("u2", "c"),
      ("u3", "a"), ("u3", "d"), ("u2", "e"))
    val out = Sampling.negativeSamples(pos, "u", "i", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val universe = Set("a", "b", "c", "d", "e")
    val positives = Set(("u1", "a"), ("u1", "b"), ("u2", "c"),
      ("u3", "a"), ("u3", "d"), ("u2", "e"))
    assert(out.nonEmpty)
    assert(out.forall { case (_, n) => universe.contains(n) })
    assert(out.forall(p => !positives.contains(p)))
    val perUser = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perUser.getOrElse("u1", 0) <= 6) // 2 positives x k
    assert(perUser.getOrElse("u2", 0) <= 6)
  }

  test("negativeSamples is deterministic and partition-invariant") {
    val pos = pairs((1 to 40).map(x =>
      (s"u${x % 8}", s"i${(x * 7) % 15}")): _*)
    val a = Sampling.negativeSamples(pos, "u", "i", 2)
      .collect().map(_.toSeq).toSet
    val b = Sampling.negativeSamples(pos.repartition(9), "u", "i", 2)
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
    // a different salt draws a different (deterministic) sample
    val c = Sampling.negativeSamples(pos, "u", "i", 2, salt = "epoch2")
      .collect().map(_.toSeq).toSet
    assert(c === Sampling.negativeSamples(pos.repartition(3), "u", "i", 2,
      salt = "epoch2").collect().map(_.toSeq).toSet)
  }

  test("negativeSamples refuses a degenerate universe") {
    intercept[IllegalArgumentException] {
      Sampling.negativeSamples(pairs(("u1", "a"), ("u2", "a")), "u", "i", 2)
    }
  }

  test("negativeSamplesExact: exactly k rows per positive, never the " +
      "user's own positives, when n_items >= 2k") {
    // 12-item universe, k=2: every user holds few positives, so exactly-k
    // is reachable for all
    val pos = pairs((1 to 30).map(x =>
      (s"u${x % 6}", s"i${(x * 5) % 12}")): _*)
    val positives = pos.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val out = Sampling.negativeSamplesExact(pos, "u", "i", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val perPositive = out.groupBy(t => (t._1, t._2))
    assert(perPositive.keySet === positives)
    perPositive.foreach { case (p, negs) =>
      assert(negs.length === 2, s"positive $p released ${negs.length} != 2")
      assert(negs.map(_._3).distinct.length === 2,
        s"positive $p released duplicate negatives")
    }
    out.foreach { case (u, _, n) =>
      assert(!positives.contains((u, n)),
        s"released a true positive ($u, $n) as a negative")
    }
  }

  test("negativeSamplesExact is deterministic, partition-invariant, and " +
      "salt-sensitive") {
    val pos = pairs((1 to 40).map(x =>
      (s"u${x % 8}", s"i${(x * 7) % 15}")): _*)
    val a = Sampling.negativeSamplesExact(pos, "u", "i", 2)
      .collect().map(_.toSeq).toSet
    val b = Sampling.negativeSamplesExact(pos.repartition(9), "u", "i", 2)
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
    val c = Sampling.negativeSamplesExact(pos, "u", "i", 2, salt = "epoch2")
      .collect().map(_.toSeq).toSet
    assert(c !== a)
  }

  test("negativeSamplesExact raises loudly when a positive cannot reach " +
      "k negatives") {
    // u1 holds the entire 2-item universe: zero reachable negatives
    val pos = pairs(("u1", "a"), ("u1", "b"), ("u2", "a"))
    val e = intercept[IllegalStateException] {
      Sampling.negativeSamplesExact(pos, "u", "i", k = 1).collect()
    }
    assert(e.getMessage.contains("fewer than k=1"))
  }
}
