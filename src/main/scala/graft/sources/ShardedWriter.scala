package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Deterministic sharded export: the write-side layout for training data.
  * Documents land in `shard = hash32(id) mod numShards` (the same
  * engine-portable md5 hash as [[graft.pipeline.Sampling]]'s splits, so a
  * shard manifest reproduces in SQL), and each shard's rows are sorted by
  * (hash, id) — a pseudo-random but fully reproducible training order,
  * the "global shuffle" every pretraining pipeline performs, without any
  * RNG state or partition sensitivity.
  *
  * Scale shape: one hash exchange keyed on the shard id, a
  * sort-within-partitions (spillable, no global sort), and a partitioned
  * parquet write — `spark.sql.shuffle.partitions` does not bound
  * `numShards`, since partitionBy splits files by directory within each
  * task. Re-running the export on the same input produces byte-identical
  * shard contents on any cluster size.
  */
object ShardedWriter {

  /** The shard assignment and intra-shard order as columns, for callers
    * that want the layout without writing (or want to inspect it).
    */
  def shardAssignment(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be positive, got $numShards")
    df.withColumn("__order", Sampling.hash32(col(idCol)))
      .withColumn("shard", pmod(col("__order"), lit(numShards.toLong)))
  }

  /** Write `df` as `numShards` hash-sharded directories under `path`,
    * each sorted by (hash, id).
    */
  def writeShards(
      df: DataFrame, idCol: String, numShards: Int, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    shardAssignment(df, idCol, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__order"), col(idCol))
      .drop("__order")
      .write
      .mode(mode)
      .partitionBy("shard")
      .parquet(path)
}
