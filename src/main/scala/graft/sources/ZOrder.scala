package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout for multi-dimensional data skipping.
  *
  * Parquet readers skip row groups whose column min/max stats exclude the
  * predicate. Sorting by ONE column gives that column tight per-file
  * ranges and leaves every other column's ranges wide; interleaving the
  * bits of two (or more) key columns and range-sorting by the interleaved
  * value gives EVERY key column locality, so point/range predicates on
  * any of them prune files — the standard lakehouse layout trick for
  * 100 TB fact tables filtered by, say, (user, time) in either order.
  *
  * The z-value is a pure Catalyst expression tree (shift/and/or per bit —
  * codegen'd, no UDF), so it costs one projection and the layout write is
  * `repartitionByRange` + in-partition sort: exactly one range shuffle,
  * identical to what a single-column sort write would pay.
  */
object ZOrder {

  /** Morton code interleaving the low `bits` bits of each column in
    * `cols` (column j's bit i lands at position i * cols.size + j).
    * Inputs must be non-negative — a negative value fails the row at
    * execution time (arithmetic shifts would otherwise silently collapse
    * every negative to the all-ones z-value and destroy the layout's
    * locality). Values are masked to `bits` bits. Capacity:
    * `bits * cols.size` must fit a long's 63 value bits.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * columns must fit a long: $bits * ${cols.size}")
    val guarded = cols.map(c => when(c.cast("long") < 0, raise_error(
      lit("z_value requires non-negative inputs; shift or hash negative " +
        "keys first"))).otherwise(c.cast("long")))
    val terms = for {
      (c, j) <- guarded.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
      i * cols.size + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Two-column convenience form of [[zValue]]. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    zValue(Seq(x, y), bits)

  /** Write `df` z-ordered on `zCols`: range-partitioned and sorted by the
    * interleaved value so each output file covers a compact hyper-rectangle
    * of the key space and its parquet min/max stats prune on EVERY z
    * column. `partitions` sizes the output files (one range per file
    * task); the z-value itself is dropped from the written schema.
    */
  def writeZOrdered(
      df: DataFrame, path: String, zCols: Seq[String], bits: Int = 16,
      partitions: Int = 0, mode: SaveMode = SaveMode.Overwrite): Unit = {
    // withColumn silently REPLACES an existing column: a user column named
    // __z would be destroyed AND dropped from the written schema
    require(!df.columns.contains("__z"),
      "input already has a column named '__z' (the z-value scratch name); " +
        "rename it first")
    val withZ = df.withColumn("__z", zValue(zCols.map(col), bits))
    val ranged =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
      .write.mode(mode).parquet(path)
  }
}
