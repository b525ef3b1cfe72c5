package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class BucketedTablesSpec extends SparkSpec {

  test("bucketed+sorted tables join without a shuffle exchange") {
    val left = makeDf(StructType(Seq(longCol("k"), strCol("a"))),
      (1L to 200L).map(i => Row(i, s"a$i")))
    val right = makeDf(StructType(Seq(longCol("k"), strCol("b"))),
      (1L to 200L).map(i => Row(i, s"b$i")))
    BucketedTables.writeBucketed(left, "bt_left", Seq("k"), buckets = 4)
    BucketedTables.writeBucketed(right, "bt_right", Seq("k"), buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = BucketedTables.read(spark, "bt_left")
        .join(BucketedTables.read(spark, "bt_right"), Seq("k"))
      assert(joined.count() === 200L)
      assert(BucketedTables.isShuffleFree(joined),
        s"expected no shuffle:\n${joined.queryExecution.executedPlan}")
      // same join from raw (unbucketed) frames DOES shuffle - the contrast
      val raw = left.join(right, Seq("k"))
      raw.count()
      assert(!BucketedTables.isShuffleFree(raw))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bt_left")
      spark.sql("DROP TABLE IF EXISTS bt_right")
    }
  }
}
