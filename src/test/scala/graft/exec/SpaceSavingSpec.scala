package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.exec.SpaceSaving.spaceSavingTopK

class SpaceSavingSpec extends SparkSpec {

  private def keysDf(keys: Seq[String]) = makeDf(
    StructType(Seq(strCol("k"))), keys.map(Row(_))).repartition(4)

  private def topOf(df: org.apache.spark.sql.DataFrame, capacity: Int, k: Int) =
    df.agg(spaceSavingTopK(col("k"), capacity, k).as("top"))
      .select(explode(col("top")).as("h"))
      .select("h.key", "h.count", "h.error")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: distinct keys under capacity reproduce groupBy counts") {
    val keys = (1 to 200).map(i => s"k${i % 7}")
    val got = topOf(keysDf(keys), capacity = 16, k = 7)
    val want = keys.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (k, c) => (-c, k) }
    assert(got.map(h => (h._1, h._2)) === want)
    assert(got.forall(_._3 == 0L), "no eviction, so every error must be 0")
  }

  test("overestimate invariant under saturation: count-error <= true <= count") {
    // zipf-ish skew with 40 distinct keys through an 8-counter sketch
    val rng = new scala.util.Random(7)
    val keys = Seq.fill(3000)(s"k${math.min(39, (1 / (rng.nextDouble() + 0.02)).toInt)}")
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = topOf(keysDf(keys), capacity = 8, k = 8)
    got.foreach { case (k, c, e) =>
      val t = truth.getOrElse(k, 0L)
      assert(t <= c, s"$k: reported $c must overestimate true $t")
      assert(c - e <= t, s"$k: count-error ${c - e} must lower-bound true $t")
    }
  }

  test("a true heavy hitter past the classic N/m noise floor is always kept") {
    // one key holds 50% of a 4000-element stream; every other key is rare.
    // SpaceSaving guarantees any key with true count > N/capacity is
    // resident, so the majority key must be reported at rank 1.
    val rng = new scala.util.Random(13)
    val keys = Seq.fill(4000)(
      if (rng.nextBoolean()) "whale" else s"m${rng.nextInt(500)}")
    val got = topOf(keysDf(keys), capacity = 32, k = 1)
    assert(got.head._1 === "whale")
  }

  test("sketch merge credits a saturated side's floor, never under-estimates") {
    val a = new SpaceSavingTopK.Sketch(2)
    Seq("x", "x", "y", "z").foreach(a.add(_)) // z evicts y or z floor=1
    assert(a.evicted)
    val b = new SpaceSavingTopK.Sketch(2)
    Seq("y", "y", "y").foreach(b.add(_)) // exact side
    a.mergeWith(b)
    // y's merged estimate must cover its true total of 4 (1 in a + 3 in b):
    // b is exact, a is saturated so y inherits a's floor
    val y = a.counters.get("y")
    if (y.isDefined) assert(y.get._1 >= 4L)
  }

  test("unsaturated absent keys contribute a true zero on merge") {
    val a = new SpaceSavingTopK.Sketch(8)
    Seq("x", "x").foreach(a.add(_))
    val b = new SpaceSavingTopK.Sketch(8)
    Seq("y").foreach(b.add(_))
    a.mergeWith(b)
    assert(a.counters("x") === ((2L, 0L)))
    assert(a.counters("y") === ((1L, 0L)))
    assert(!a.evicted)
  }

  test("insert after a lossy merge inherits the floor (no under-estimate)") {
    val a = new SpaceSavingTopK.Sketch(2)
    Seq("p", "p", "p", "q", "q", "r").foreach(a.add(_))
    assert(a.evicted)
    val b = new SpaceSavingTopK.Sketch(2)
    Seq("p", "q", "q", "q").foreach(b.add(_))
    a.mergeWith(b)
    // force below-capacity saturation state, then insert an unseen key
    if (a.counters.size == a.capacity) a.remove(a.counters.keys.head)
    val floor = a.counters.valuesIterator.map(_._1).min
    a.add("fresh")
    val (c, e) = a.counters("fresh")
    assert(c === floor + 1 && e === floor)
  }

  test("serialization round-trips counters and the saturation flag") {
    val s = new SpaceSavingTopK.Sketch(2)
    Seq("a", "a", "b", "c").foreach(s.add(_))
    val back = SpaceSavingTopK.Sketch.fromBytes(s.toBytes, 2)
    assert(back.counters === s.counters)
    assert(back.evicted === s.evicted)
  }

  test("keys past 64 KB round-trip (length-framed, not writeUTF)") {
    val big = "k" * 100000 + "é" // multibyte tail crosses byte/char counts
    val s = new SpaceSavingTopK.Sketch(2)
    s.add(big); s.add(big); s.add("small")
    val back = SpaceSavingTopK.Sketch.fromBytes(s.toBytes, 2)
    assert(back.counters(big) === ((2L, 0L)))
    assert(back.counters("small") === ((1L, 0L)))
  }

  test("string keys only: a non-string child is rejected at analysis time") {
    val df = keysDf(Seq("1", "2"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(spaceSavingTopK(col("k").cast("long"), 4, 2)).collect()
    }
    assert(e.getMessage.contains("string"))
  }
}
