package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** KMV/theta distinct sketches: exact regime, estimator accuracy past k,
  * set-operation consistency, and null/partition discipline.
  */
class KmvSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("side"), longCol("v")))

  private def df(rows: (String, java.lang.Long)*) =
    makeDf(schema, rows.map { case (s, v) => Row(s, v) })

  private def range2(side: String, lo: Int, hi: Int) =
    (lo until hi).map(i => side -> java.lang.Long.valueOf(i.toLong))

  test("exact regime: estimate, union, and intersection are exact counts") {
    // A = [0, 300), B = [200, 500): |A|=|B|=300, |A u B|=500, |A n B|=100
    val data = df(range2("a", 0, 300) ++ range2("b", 200, 500): _*)
    val k = 1024
    val sk = data.groupBy("side").agg(Kmv.sketch(col("v"), k).as("sk"))
    val row = sk.filter(col("side") === "a").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("side") === "b").select(col("sk").as("skb")))
      .select(
        Kmv.estimate(col("ska"), k).as("na"),
        Kmv.estimate(col("skb"), k).as("nb"),
        Kmv.estimate(Kmv.union(col("ska"), col("skb"), k), k).as("nu"),
        Kmv.intersectEstimate(col("ska"), col("skb"), k).as("ni"),
        Kmv.jaccardEstimate(col("ska"), col("skb"), k).as("j"))
      .head()
    assert(row.getDouble(0) === 300.0)
    assert(row.getDouble(1) === 300.0)
    assert(row.getDouble(2) === 500.0)
    assert(row.getDouble(3) === 100.0)
    assert(row.getDouble(4) === 100.0 / 500.0)
  }

  test("estimation regime: 60k distinct at k=1024 lands within 4 sigma") {
    val n = 60000
    val data = makeDf(StructType(Seq(longCol("v"))),
      (0 until n).map(i => Row(i.toLong)))
    val k = 1024
    val est = data.agg(Kmv.sketch(col("v"), k).as("sk"))
      .select(Kmv.estimate(col("sk"), k)).head().getDouble(0)
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n) <= 4 * rse * n, s"estimate $est for $n")
  }

  test("union estimate matches a single-pass sketch of the combined data") {
    // the merged sketch IS the k smallest of the union — bit-identical to
    // sketching the concatenated stream, the mergeability contract
    val k = 64
    val a = df(range2("a", 0, 500): _*)
    val b = df(range2("b", 300, 900): _*)
    val both = df(range2("x", 0, 500) ++ range2("x", 300, 900): _*)
    val ska = a.agg(Kmv.sketch(col("v"), k).as("s")).head().getSeq[Long](0)
    val skb = b.agg(Kmv.sketch(col("v"), k).as("s")).head().getSeq[Long](0)
    val direct = both.agg(Kmv.sketch(col("v"), k).as("s")).head().getSeq[Long](0)
    val unioned = a.agg(Kmv.sketch(col("v"), k).as("ska"))
      .crossJoin(b.agg(Kmv.sketch(col("v"), k).as("skb")))
      .select(Kmv.union(col("ska"), col("skb"), k)).head().getSeq[Long](0)
    assert(unioned === direct)
    assert(ska.size === k && skb.size === k)
  }

  test("intersection estimate past k tracks the true overlap") {
    // |A| = |B| = 30k, overlap 10k, k = 2048
    val k = 2048
    val a = df(range2("a", 0, 30000): _*)
    val b = df(range2("b", 20000, 50000): _*)
    val est = a.agg(Kmv.sketch(col("v"), k).as("ska"))
      .crossJoin(b.agg(Kmv.sketch(col("v"), k).as("skb")))
      .select(Kmv.intersectEstimate(col("ska"), col("skb"), k))
      .head().getDouble(0)
    assert(math.abs(est - 10000.0) <= 0.15 * 10000.0, s"estimate $est")
  }

  test("grouped rollup sketches are BIT-IDENTICAL to direct sketches " +
      "(no HLL-style estimator split)") {
    val k = 128
    // fine grain: (g, h) sketches; rollup to g must equal sketching g's
    // rows directly — k-smallest-of-union is exactly what one pass keeps
    val data = df((0 until 3000).map(i =>
      ("g" + i % 2 + "_h" + i % 4) -> java.lang.Long.valueOf((i % 700).toLong)): _*)
      .withColumn("g", substring(col("side"), 1, 2))
    val fine = data.groupBy("side", "g").agg(Kmv.sketch(col("v"), k).as("sk"))
    val rolled = fine.groupBy("g").agg(Kmv.unionAgg(col("sk"), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = data.groupBy("g").agg(Kmv.sketch(col("v"), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rolled === direct)
  }

  test("nulls are skipped like count(DISTINCT); empty input sketches empty") {
    val k = 16
    val data = df("a" -> 1L, "a" -> null, "a" -> 2L)
    val sk = data.agg(Kmv.sketch(col("v"), k).as("s"))
    assert(sk.select(Kmv.estimate(col("s"), k)).head().getDouble(0) === 2.0)
    val empty = df("a" -> null).filter(col("v").isNotNull)
      .agg(Kmv.sketch(col("v"), k).as("s"))
    assert(empty.select(Kmv.estimate(col("s"), k)).head().getDouble(0) === 0.0)
    assert(empty.crossJoin(empty.select(col("s").as("s2")))
      .select(Kmv.intersectEstimate(col("s"), col("s2"), k))
      .head().getDouble(0) === 0.0)
  }

  test("sketches are partition-invariant (1 vs 17 partitions)") {
    val data = df(range2("a", 0, 5000): _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(Kmv.sketch(col("v"), 256).as("s")).head().getSeq[Long](0)
    assert(run(data.repartition(1)) === run(data.repartition(17)))
  }

  test("k guard rejects degenerate sketches") {
    val e = intercept[Exception] {
      df("a" -> 1L).agg(Kmv.sketch(col("v"), 1).as("s")).head()
    }
    assert(e.getMessage.contains("k >= 2"))
  }

  test("estimators reject a sketch built with a LARGER k (size > k proves " +
      "the mismatch); a smaller-k sketch is documented as the caller's " +
      "invariant") {
    // 100 distinct at k=64: the sketch saturates at 64 hashes, so passing
    // k=16 to any estimator is structurally detectable
    val data = df(range2("a", 0, 100): _*)
    val sk = data.agg(Kmv.sketch(col("v"), 64).as("s"))
    val eEst = intercept[Exception] {
      sk.select(Kmv.estimate(col("s"), 16)).head()
    }
    assert(eEst.getMessage.contains("built with a larger k"))
    val eUnion = intercept[Exception] {
      sk.select(Kmv.union(col("s"), col("s"), 16)).head()
    }
    assert(eUnion.getMessage.contains("built with a larger k"))
    // matching k still estimates fine on the same sketch
    val est = sk.select(Kmv.estimate(col("s"), 64)).head().getDouble(0)
    assert(est > 0.0)
  }
}
