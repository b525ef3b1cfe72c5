package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.exec.BoundedCollect.boundedCollectList

class BoundedCollectSpec extends SparkSpec {

  test("below the limit it equals collect_list (as a multiset)") {
    val df = makeDf(StructType(Seq(strCol("k"), longCol("v"))),
      (1L to 20L).map(i => Row(if (i % 2 == 0) "e" else "o", i)))
      .repartition(4) // force partial aggregation + buffer serialization
    val out = df.groupBy("k")
      .agg(boundedCollectList(col("v"), 100).as("b"), collect_list(col("v")).as("c"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1).sorted, r.getSeq[Long](2).sorted)).toMap
    out.values.foreach { case (b, c) => assert(b === c) }
    assert(out("e")._1 === (2L to 20L by 2).toSeq)
  }

  test("the buffer never exceeds the limit, marking oversized groups") {
    val df = makeDf(StructType(Seq(strCol("k"), longCol("v"))),
      (1L to 1000L).map(i => Row("hot", i)) ++ Seq(Row("cold", 1L), Row("cold", 2L)))
      .repartition(8)
    val out = df.groupBy("k")
      .agg(size(boundedCollectList(col("v"), 17)).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("hot") === 17) // capped: the "at least limit" signal
    assert(out("cold") === 2) // exact below the cap
  }

  test("struct elements round-trip through the serialized buffer") {
    val df = makeDf(
      StructType(Seq(strCol("k"), longCol("id"),
        StructField("vec", ArrayType(DoubleType), nullable = false))),
      Seq(Row("a", 1L, Seq(1.0, 2.0)), Row("a", 2L, Seq(3.0, 4.0)),
        Row("b", 3L, Seq(5.0, 6.0))))
      .repartition(3)
    val out = df.groupBy("k")
      .agg(boundedCollectList(struct(col("id"), col("vec")), 10).as("rows"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getLong(0), x.getSeq[Double](1))).sortBy(_._1))
      .toMap
    assert(out("a") === Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))))
    assert(out("b") === Seq((3L, Seq(5.0, 6.0))))
  }

  test("nulls are skipped like collect_list") {
    val df = makeDf(StructType(Seq(strCol("k"), StructField("v", LongType, nullable = true))),
      Seq(Row("a", 1L), Row("a", null), Row("a", 3L)))
    val out = df.groupBy("k").agg(boundedCollectList(col("v"), 10).as("b"))
      .collect().head.getSeq[Long](1).sorted
    assert(out === Seq(1L, 3L))
  }
}
