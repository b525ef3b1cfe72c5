package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized cross-implementation property tests for
  * [[Sampling.negativeSamplesExact]]: the operator's DEFINED release is
  * "the first k distinct non-positive items of the deterministic hash
  * stream over draws t = 0 until 10k" — a rule any engine can replay.
  * This spec re-implements that rule INDEPENDENTLY, driver-side, from
  * nothing but java MessageDigest md5 (no Spark expressions shared with
  * the operator), and demands bit-identical releases over seeded random
  * positive sets. The engine's lazy two-phase evaluation (2k draws for
  * everyone, the 8k remainder for stragglers only) must be
  * observationally identical to the one-shot full-range rule — the
  * equivalence the operator's docstring claims.
  */
class NegativeSamplesPropertySpec extends SparkSpec {

  private val pairSchema = StructType(Seq(strCol("u"), strCol("i")))

  /** The operator's portable hash, reproduced independently: first 8 hex
    * chars of md5(utf8) as a long (Sampling.hash32's documented contract).
    */
  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** Driver-side re-implementation of the full-range first-k rule. */
  private def expectedExact(
      positives: Set[(String, String)], k: Int,
      salt: String): Either[Set[(String, String)], Set[(String, String, String)]] = {
    val items = positives.map(_._2).toSeq.sorted
    val n = items.size.toLong
    val byUser = positives.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = scala.collection.mutable.Set.empty[(String, String, String)]
    val short = scala.collection.mutable.Set.empty[(String, String)]
    for ((u, i) <- positives) {
      val accepted = scala.collection.mutable.LinkedHashSet.empty[String]
      var t = 0
      while (t < 10 * k && accepted.size < k) {
        val idx = math.floorMod(
          hash32(s"$u\u0001$i\u0001$t\u0001$salt"), n).toInt
        val cand = items(idx)
        if (!byUser(u).contains(cand)) accepted += cand
        t += 1
      }
      if (accepted.size < k) short += ((u, i))
      else accepted.foreach(c => out += ((u, i, c)))
    }
    if (short.nonEmpty) Left(short.toSet) else Right(out.toSet)
  }

  test("engine release == independent driver-side replay of the " +
      "first-k rule (30 seeded random positive sets)") {
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(seed)
      val nUsers = 2 + rnd.nextInt(5)
      val nItems = 6 + rnd.nextInt(12)
      val nPairs = 5 + rnd.nextInt(30)
      val k = 1 + rnd.nextInt(3)
      val positives = Seq.fill(nPairs)(
        (s"u${rnd.nextInt(nUsers)}", s"i${rnd.nextInt(nItems)}")).toSet
      val df = makeDf(pairSchema,
        positives.toSeq.map { case (u, i) => Row(u, i) })
        .repartition(1 + rnd.nextInt(5)) // partitioning must not matter
      expectedExact(positives, k, "neg") match {
        case Right(expected) =>
          val got = Sampling.negativeSamplesExact(df, "u", "i", k)
            .collect()
            .map(r => (r.getString(0), r.getString(1), r.getString(2)))
            .toSet
          assert(got === expected,
            s"seed=$seed k=$k: engine and independent replay disagree")
        case Left(shortPairs) =>
          val e = intercept[IllegalStateException] {
            Sampling.negativeSamplesExact(df, "u", "i", k).collect()
          }
          assert(e.getMessage.contains(s"fewer than k=$k"),
            s"seed=$seed: expected loud shortfall for $shortPairs")
      }
    }
  }
}
