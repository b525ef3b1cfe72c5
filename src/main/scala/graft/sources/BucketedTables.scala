package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins. At 100 TB the dominant cost
  * of fact-to-fact joins is the shuffle; writing both sides bucketed and
  * sorted on the join key lets Spark plan a SortMergeJoin with NO exchange
  * on either side (bucket pruning + per-bucket merge). The DP layer's
  * private-join truncation windows also partition by the join key, so they
  * ride the same bucketing.
  *
  * Ingestion stays plain `spark.read` (reference has no file-format layer
  * of its own, SURVEY §2.7); these helpers add the write-side layout
  * control a production deployment needs.
  */
object BucketedTables {

  /** Write `df` as a bucketed, sorted parquet table registered in the
    * session catalog. `buckets` should match the downstream join
    * parallelism (e.g. executors x cores).
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketColumns: Seq[String],
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketColumns.nonEmpty, "writeBucketed needs at least one bucket column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, bucketColumns.head, bucketColumns.tail: _*)
      .sortBy(bucketColumns.head, bucketColumns.tail: _*)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True iff the executed plan of `df` contains no shuffle exchange —
    * the check that a bucketed join actually avoided the shuffle. Walks
    * the plan tree for ShuffleExchange nodes (including inside AQE
    * wrappers) rather than string-matching one partitioning flavor:
    * range-partitioned sorts and single-partition aggregates shuffle too.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    // Three disguises a shuffle wears: the exchange itself; an AQE wrapper
    // whose current plan holds one; and — once a plan has EXECUTED under
    // AQE — a ShuffleQueryStageExec LEAF that replaced the materialized
    // exchange (it is a QueryStageExec, not a ShuffleExchangeLike, so the
    // naive match reports an already-executed frame shuffle-free).
    def hasShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
      }.nonEmpty ||
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q
        }.exists {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            hasShuffle(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            hasShuffle(q.plan)
        }
    !hasShuffle(df.queryExecution.executedPlan)
  }

  /** Write `df` hive-partitioned on `partitionColumns`: a reader filtering
    * on those columns scans only the matching directories (partition
    * pruning — the scan's `PartitionFilters`, not a post-scan filter). The
    * layout of choice for date- or source-partitioned 100 TB corpora.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionColumns: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionColumns: _*).parquet(path)

  /** The partition-pruning evidence for a scan: the number of data files
    * the plan will actually read (after partition pruning).
    */
  def filesRead(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.totalNumberOfFiles
    }.sum
}
