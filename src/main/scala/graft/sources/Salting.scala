package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins. A hot join key concentrates its rows in
  * one shuffle partition; salting splits each key's rows across `buckets`
  * sub-partitions and replicates the other (smaller) side once per bucket,
  * so the hot key's work spreads over `buckets` tasks. Complements AQE's
  * skew-join handling (which splits oversized partitions at runtime) when
  * a single KEY — not just a partition — is hot.
  *
  * The salt on the skewed side is derived from a hash of the whole row, so
  * results are deterministic and partitioning-independent.
  */
object Salting {

  private val SaltCol = "__graft_salt"

  /** Equi-join `skewed` with `other` on `keys`, spreading each key over
    * `buckets` salt values. Semantically identical to
    * `skewed.join(other, keys, "inner")`.
    */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = skewed.withColumn(SaltCol,
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)))
    val replicated = other.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** The salt expression alone, for callers building their own plans
    * (e.g. salting a groupBy: aggregate on (keys, salt) first, then
    * re-aggregate on keys — two small shuffles instead of one hot one).
    */
  def saltExpr(allColumns: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(allColumns: _*), lit(buckets.toLong))
}
