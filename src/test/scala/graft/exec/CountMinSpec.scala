package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Count-Min sketches: the never-undercount guarantee, bounded
  * overestimates under forced collisions, exact merges, and guards.
  */
class CountMinSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("k")))

  private def df(keys: Seq[String]) = makeDf(schema, keys.map(Row(_)))

  test("estimates NEVER undercount, even with heavy forced collisions") {
    // 500 distinct keys into width 16: collisions everywhere by design
    val rnd = new scala.util.Random(3)
    val keys = Seq.fill(3000)("k" + rnd.nextInt(500))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (depth, width) = (4, 16)
    val sk = df(keys).agg(CountMin.sketch(col("k"), depth, width).as("sk"))
    val probes = truth.keys.toSeq.sorted
    val ests = sk.crossJoin(df(probes).select(col("k").as("probe")))
      .select(col("probe"),
        CountMin.estimate(col("sk"), col("probe"), depth, width))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (k <- probes)
      assert(ests(k) >= truth(k), s"undercount at $k: ${ests(k)} < ${truth(k)}")
  }

  test("overestimates stay inside the collision-mass bound at sane widths") {
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)("k" + rnd.nextInt(50))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (depth, width) = (4, 512)
    val sk = df(keys).agg(CountMin.sketch(col("k"), depth, width).as("sk"))
    val probes = truth.keys.toSeq.sorted
    val ests = sk.crossJoin(df(probes).select(col("k").as("probe")))
      .select(col("probe"),
        CountMin.estimate(col("sk"), col("probe"), depth, width))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // eps ~ e/width; 4x slack on N*eps keeps this deterministic-yet-tight
    val bound = math.ceil(4.0 * keys.size / width).toLong
    for (k <- probes)
      assert(ests(k) <= truth(k) + bound, s"$k: ${ests(k)} vs ${truth(k)}")
  }

  test("merged split sketches are bit-identical to the single-pass sketch") {
    val keys = (1 to 400).map(i => "k" + i % 37)
    val (depth, width) = (4, 64)
    val whole = df(keys).agg(CountMin.sketch(col("k"), depth, width).as("s"))
      .head().getSeq[Long](0)
    val a = df(keys.take(150)).agg(CountMin.sketch(col("k"), depth, width).as("a"))
    val b = df(keys.drop(150)).agg(CountMin.sketch(col("k"), depth, width).as("b"))
    val merged = a.crossJoin(b)
      .select(CountMin.merge(col("a"), col("b"))).head().getSeq[Long](0)
    assert(merged === whole)
  }

  test("nulls are skipped; unseen keys estimate their colliding mass only") {
    val (depth, width) = (4, 64)
    val d = makeDf(schema, Seq(Row("a"), Row(null), Row("a")))
    val sk = d.agg(CountMin.sketch(col("k"), depth, width).as("s"))
    val est = sk.select(
      CountMin.estimate(col("s"), lit("a"), depth, width).as("ea"),
      CountMin.estimate(col("s"), lit("zz-unseen"), depth, width).as("ez"))
      .head()
    assert(est.getLong(0) === 2L) // the null never counted anywhere
    assert(est.getLong(1) <= 2L) // unseen: at most total colliding mass
  }

  test("sketches are partition-invariant; guards reject bad dimensions") {
    val keys = (1 to 300).map(i => "k" + i % 21)
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(CountMin.sketch(col("k"), 4, 32).as("s")).head().getSeq[Long](0)
    assert(run(df(keys).repartition(1)) === run(df(keys).repartition(17)))
    intercept[Exception] {
      df(keys).agg(CountMin.sketch(col("k"), 0, 32).as("s")).head()
    }
    intercept[Exception] {
      df(keys).agg(CountMin.sketch(col("k"), 4, 1).as("s")).head()
    }
  }

  test("mismatched sketch dimensions fail loudly in merge and estimate") {
    val keys = (1 to 50).map(i => "k" + i)
    val a = df(keys).agg(CountMin.sketch(col("k"), 4, 32).as("a"))
    val b = df(keys).agg(CountMin.sketch(col("k"), 4, 64).as("b"))
    val eMerge = intercept[Exception] {
      a.crossJoin(b).select(CountMin.merge(col("a"), col("b"))).head()
    }
    assert(eMerge.getMessage.contains("sketch sizes differ"))
    val eEst = intercept[Exception] {
      a.select(CountMin.estimate(col("a"), lit("k1"), 4, 64)).head()
    }
    assert(eEst.getMessage.contains("different dimensions"))
  }
}
