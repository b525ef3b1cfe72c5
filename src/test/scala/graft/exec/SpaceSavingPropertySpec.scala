package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the SpaceSaving sketch under arbitrary
  * partition-and-merge trees (seeded, so failures replay). These are the
  * properties the distributed aggregate relies on: Spark may split the
  * input into any partitioning and merge partials in any tree shape, and
  *  - with distinct keys <= capacity, the result must equal exact counts
  *    (the CORRECTNESS-anchor regime), and
  *  - under saturation, every reported count must bracket the truth:
  *    count - error <= true <= count.
  * No SparkSession needed — the sketch algebra is tested directly.
  */
class SpaceSavingPropertySpec extends AnyFunSuite {

  private def randomStream(seed: Long, n: Int, distinct: Int): Vector[String] = {
    val rnd = new scala.util.Random(seed)
    // zipf-ish: low ids far more frequent — the workload top-k exists for
    Vector.fill(n)("k" + math.min(distinct - 1,
      (distinct * math.pow(rnd.nextDouble(), 3)).toInt))
  }

  /** Split into random partitions, sketch each, merge in a random tree. */
  private def sketchPartitioned(
      keys: Vector[String], capacity: Int, parts: Int, seed: Long): SpaceSavingTopK.Sketch = {
    val rnd = new scala.util.Random(seed)
    val partitions = Vector.fill(parts)(
      scala.collection.mutable.ArrayBuffer.empty[String])
    keys.foreach(k => partitions(rnd.nextInt(parts)) += k)
    val sketches = partitions.map { p =>
      val s = new SpaceSavingTopK.Sketch(capacity)
      p.foreach(s.add(_))
      s
    }
    // random merge tree: repeatedly merge two random sketches
    val pool = scala.collection.mutable.ArrayBuffer(sketches: _*)
    while (pool.size > 1) {
      val i = rnd.nextInt(pool.size)
      val a = pool.remove(i)
      val j = rnd.nextInt(pool.size)
      pool(j).mergeWith(a)
    }
    pool.head
  }

  for (seed <- Seq(11L, 12L, 13L); parts <- Seq(1, 4, 16))
    test(s"exact below capacity under any partitioning (seed=$seed, parts=$parts)") {
      val keys = randomStream(seed, 2000, distinct = 20)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val merged = sketchPartitioned(keys, capacity = 32, parts, seed * 7)
      assert(!merged.evicted)
      assert(merged.counters.map { case (k, (c, _)) => k -> c } === truth)
      assert(merged.counters.valuesIterator.forall(_._2 == 0L))
    }

  for (seed <- Seq(21L, 22L, 23L); parts <- Seq(1, 4, 16); cap <- Seq(8, 16))
    test(s"saturation bracket: count-error <= true <= count " +
        s"(seed=$seed, parts=$parts, cap=$cap)") {
      val keys = randomStream(seed, 5000, distinct = 200)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val merged = sketchPartitioned(keys, cap, parts, seed * 13)
      merged.top(cap).foreach { case (k, c, e) =>
        val t = truth.getOrElse(k, 0L)
        assert(t <= c, s"$k: reported $c under-estimates true $t")
        assert(c - e <= t, s"$k: lower bound ${c - e} exceeds true $t")
      }
    }

  for (seed <- Seq(31L, 32L))
    test(s"the dominant key survives any merge tree (seed=$seed)") {
      val rnd = new scala.util.Random(seed)
      val keys = Vector.fill(4000)(
        if (rnd.nextInt(10) < 4) "whale" else "m" + rnd.nextInt(800))
      val merged = sketchPartitioned(keys, capacity = 32, parts = 8, seed)
      assert(merged.top(1).head._1 === "whale")
    }
}
