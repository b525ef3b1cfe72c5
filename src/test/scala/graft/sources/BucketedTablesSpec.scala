package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class BucketedTablesSpec extends SparkSpec {

  test("partitioned writes prune to matching partition files at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = makeDf(StructType(Seq(longCol("id"), strCol("src"))),
      (1L to 90L).map(i => Row(i, s"s${i % 3}")))
    BucketedTables.writePartitioned(df, dir, Seq("src"))
    val all = spark.read.parquet(dir)
    val pruned = all.filter(col("src") === "s1")
    assert(pruned.count() === 30L)
    val prunedFiles = BucketedTables.filesRead(pruned)
    val totalFiles = BucketedTables.filesRead(all)
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"expected pruning: $prunedFiles of $totalFiles files")
  }

  test("salted join equals the plain join and spreads the hot key") {
    import graft.sources.Salting
    // one hot key (k=1) with many rows, plus a tail
    val skewed = makeDf(StructType(Seq(longCol("k"), longCol("v"))),
      (1L to 300L).map(i => Row(if (i <= 250) 1L else i, i)))
    val dim = makeDf(StructType(Seq(longCol("k"), strCol("name"))),
      (1L to 300L).map(i => Row(i, s"n$i")))
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), buckets = 8)
      .select("k", "v", "name")
    assert(salted.collect().toSet === plain.collect().toSet)
    // the hot key's rows land in several salt buckets
    val spread = skewed
      .withColumn("s", Salting.saltExpr(skewed.columns.map(col).toSeq, 8))
      .filter(col("k") === 1L).select("s").distinct().count()
    assert(spread > 1, s"hot key stayed in $spread salt bucket(s)")
  }

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

  test("isShuffleFree sees range and single-partition exchanges too, " +
      "not only hash partitioning") {
    val df = spark.range(100).toDF("id")
    // sort on a derived column: a plain orderBy("id") over range is
    // removed by EliminateSorts (range is already globally ordered)
    val sorted = df.selectExpr("id % 7 AS x").orderBy("x") // rangepartitioning
    sorted.count()
    assert(!BucketedTables.isShuffleFree(sorted),
      s"${sorted.queryExecution.executedPlan}")
    val mapped = df.selectExpr("id * 2 AS x") // pure projection
    mapped.count()
    assert(BucketedTables.isShuffleFree(mapped))
  }

  test("isShuffleFree still sees the shuffle AFTER the frame's own plan has " +
      "executed under AQE (stages rewrap exchanges as ShuffleQueryStageExec)") {
    val df = spark.range(100).selectExpr("id % 7 AS k")
      .groupBy("k").count()
    // collect() executes THIS Dataset's QueryExecution, so AQE finalizes
    // the frame's own executedPlan: the hash exchange is now a materialized
    // ShuffleQueryStageExec leaf, not a ShuffleExchangeLike node
    df.collect()
    assert(!BucketedTables.isShuffleFree(df),
      s"executed-plan shuffle missed:\n${df.queryExecution.executedPlan}")
    val flat = spark.range(100).selectExpr("id * 3 AS x")
    flat.collect()
    assert(BucketedTables.isShuffleFree(flat))
  }
}
