package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized property tests for the as-of join's tie discipline
  * (VERDICT r7 next-round #7). The operator's subtle edge is equal
  * timestamps: a strict join must NOT see a same-instant right row, a
  * non-strict one must, and right rows tied with each other must resolve
  * to ONE deterministic winner under ANY input partitioning (the window
  * orders ties by a payload hash, so the outcome cannot depend on which
  * partition delivered a row first). Data is seeded and deliberately
  * collision-heavy: few keys, few distinct timestamps, duplicate rows.
  */
class AsOfJoinPropertySpec extends SparkSpec {

  private val keySchema = StructType(Seq(strCol("k"), longCol("t"), dblCol("x")))
  private val rightSchema = StructType(Seq(strCol("k"), longCol("t"), dblCol("y")))

  private def randomSide(rnd: scala.util.Random, n: Int, schema: StructType) =
    makeDf(schema, Seq.fill(n) {
      // 3 keys x 5 timestamps: heavy collisions by construction
      Row("k" + rnd.nextInt(3), rnd.nextInt(5).toLong, rnd.nextInt(40).toDouble)
    })

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double, Option[Double])] = {
    import df.sparkSession.implicits._
    df.as[(String, Long, Double, Option[Double])].collect().toSeq.sorted
  }

  for (strict <- Seq(true, false))
    test(s"strict=$strict: result is invariant under partitioning, " +
        "row-preserving, and time-disciplined (20 seeded trials)") {
      for (seed <- 1 to 20) {
        val rnd = new scala.util.Random(seed)
        val left = randomSide(rnd, 30, keySchema)
        val right = randomSide(rnd, 30, rightSchema)

        val base = canon(Relational.asOfJoin(left, right, Seq("k"), "t", strict))
        // every left row survives exactly once (left-join semantics) —
        // compare full multisets, not counts
        val leftRows = left.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
        assert(base.map(m => (m._1, m._2, m._3)) === leftRows, s"seed=$seed")

        // tie discipline: the matched y must come from an eligible right
        // row at the MAXIMUM eligible timestamp for that (key, t)
        val rightRows = right.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        def eligible(k: String, t: Long) = rightRows.filter { case (rk, rt, _) =>
          rk == k && (if (strict) rt < t else rt <= t)
        }
        base.foreach { case (k, t, _, m) =>
          val el = eligible(k, t)
          if (el.isEmpty) assert(m.isEmpty, s"seed=$seed: phantom match at ($k,$t)")
          else {
            val tMax = el.map(_._2).max
            val atMax = el.filter(_._2 == tMax).map(_._3).toSet
            assert(m.nonEmpty && atMax.contains(m.get),
              s"seed=$seed: match $m at ($k,$t) not among max-time eligibles $atMax")
          }
        }

        // determinism: reshuffled inputs (different partition counts AND a
        // random row order) must reproduce the identical multiset,
        // including which tied right row won
        for (p <- Seq(1, 3, 7)) {
          val again = canon(Relational.asOfJoin(
            left.repartition(p), right.orderBy(org.apache.spark.sql.functions.rand(seed))
              .repartition(11 - p), Seq("k"), "t", strict))
          assert(again === base, s"seed=$seed partitions=$p")
        }
      }
    }

  test("rangeJoin: result is invariant to the cellWidth tuning knob " +
      "and matches a direct containment filter (10 seeded trials)") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val fact = makeDf(StructType(Seq(dblCol("v"))),
        Seq.fill(40)(Row((rnd.nextInt(200) - 100) / 10.0)))
      val dim = makeDf(StructType(Seq(strCol("band"), dblCol("lo"), dblCol("hi"))),
        Seq.tabulate(8) { i =>
          val lo = (rnd.nextInt(160) - 80) / 10.0
          Row("b" + i, lo, lo + rnd.nextInt(30) / 10.0) // may be empty (hi == lo)
        })
      // the oracle nobody would run at scale: filter the cross product
      val expected = fact.crossJoin(dim)
        .where(col("v") >= col("lo") && col("v") < col("hi"))
        .select("v", "band").collect().map(r => (r.getDouble(0), r.getString(1)))
        .toSeq.sorted
      // cellWidth is pure tuning: any positive width must reproduce it
      for (w <- Seq(0.3, 1.0, 7.5)) {
        val got = Relational.rangeJoin(fact, "v", dim, "lo", "hi", cellWidth = w)
          .select("v", "band").collect().map(r => (r.getDouble(0), r.getString(1)))
          .toSeq.sorted
        assert(got === expected, s"seed=$seed cellWidth=$w")
      }
    }
  }

  test("strict vs non-strict differ exactly on same-instant matches") {
    for (seed <- 21 to 30) {
      val rnd = new scala.util.Random(seed)
      val left = randomSide(rnd, 25, keySchema)
      val right = randomSide(rnd, 25, rightSchema)
      val s = canon(Relational.asOfJoin(left, right, Seq("k"), "t", strict = true))
      val n = canon(Relational.asOfJoin(left, right, Seq("k"), "t", strict = false))
      val rightRows = right.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // where they disagree, the left row must have a same-instant right
      // row, and the non-strict match must be drawn from that instant
      s.zip(n).foreach { case ((k, t, x, ms), (k2, t2, x2, mn)) =>
        assert((k, t, x) === (k2, t2, x2))
        if (ms != mn) {
          val sameInstant = rightRows.filter(r => r._1 == k && r._2 == t)
          assert(sameInstant.nonEmpty,
            s"seed=$seed: divergence at ($k,$t) without a same-instant right row")
          assert(mn.nonEmpty && sameInstant.map(_._3).toSet.contains(mn.get))
        }
      }
    }
  }
}
