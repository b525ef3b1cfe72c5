package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.pipeline.Sampling

class ShardedWriterSpec extends SparkSpec {

  private def corpus(n: Int) = makeDf(
    StructType(Seq(longCol("id"), strCol("text"))),
    (1 to n).map(i => Row(i.toLong, s"document body $i")))

  test("shard assignment is the portable hash mod, independent of layout") {
    val df = corpus(200)
    val a = ShardedWriter.shardAssignment(df, "id", 4)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the assignment is hash32(id) mod n — checkable row by row
    val expected = df.select(col("id"),
        pmod(Sampling.hash32(col("id")), lit(4L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === expected)
    assert(a.values.toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // every shard is populated at this size
    assert(a.values.toSet.size === 4)
    // repartitioned input maps identically
    val b = ShardedWriter.shardAssignment(df.repartition(7), "id", 4)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b === a)
  }

  test("written shards partition by directory and reproduce byte-for-byte") {
    val dir = Files.createTempDirectory("shards").toFile
    val p1 = s"${dir.getAbsolutePath}/run1"
    val p2 = s"${dir.getAbsolutePath}/run2"
    try {
      ShardedWriter.writeShards(corpus(120), "id", 3, p1)
      ShardedWriter.writeShards(corpus(120).repartition(11), "id", 3, p2)
      val r1 = spark.read.parquet(p1)
      assert(r1.select("shard").distinct().collect().map(_.get(0).toString).toSet
        === Set("0", "1", "2"))
      assert(r1.count() === 120)
      // same rows in the same shards regardless of input partitioning
      def contents(p: String) = spark.read.parquet(p)
        .select("shard", "id", "text").collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getString(2))).toSet
      assert(contents(p1) === contents(p2))
      // intra-shard order is (hash, id): check shard 0's file order matches
      val shard0 = spark.read.parquet(s"$p1/shard=0")
      val ids = shard0.select("id").collect().map(_.getLong(0)).toSeq
      val sorted = shard0.select(col("id"))
        .withColumn("h", Sampling.hash32(col("id")))
        .orderBy("h", "id").collect().map(_.getLong(0)).toSeq
      assert(ids === sorted)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("invalid shard count is rejected") {
    val e = intercept[IllegalArgumentException] {
      ShardedWriter.shardAssignment(corpus(5), "id", 0)
    }
    assert(e.getMessage.contains("positive"))
  }
}
