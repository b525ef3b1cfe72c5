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
    // withColumn silently REPLACES an existing column — a user column named
    // like the salt would corrupt the join condition (r13's reserved-name
    // discipline, applied to both sides)
    Seq("skewed" -> skewed, "other" -> other).foreach { case (side, d) =>
      require(!d.columns.contains(SaltCol),
        s"$side side already has a column named '$SaltCol' (the salt " +
          "scratch name); rename it first")
    }
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

  /** Key-skew diagnostics for a prospective shuffle key: the one-row
    * report that decides BEFORE a 100 TB groupBy/join whether the key
    * needs [[saltedJoin]]/[[saltExpr]] or AQE alone will cope.
    *
    *  - `n_keys`, `n_rows`, `max_count`: the hot-key ceiling (one task's
    *    worth of rows under hash partitioning).
    *  - `entropy_e6_num / n_rows` = Shannon entropy of the key histogram
    *    in micro-nats: ln(n_keys)*1e6 when uniform, collapsing toward 0 as
    *    one key dominates. Per-key terms quantize to integer micro-nats
    *    before summing (q107's portability discipline), so both released
    *    columns are exact BIGINTs and the ratio is exact.
    *
    * Scale shape: one key-keyed count with map-side combine, then a
    * one-row total reduction joined back by broadcast; nothing but
    * (key, count) ever shuffles.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col("__c"), col("__t"),
        // c * round(ln(T/c) * 1e6): integer micro-nat mass per key
        (col("__c") * round(log(col("__t").cast("double") /
          col("__c").cast("double")) * 1e6, 0).cast("long")).as("__h"))
      .agg(count(lit(1)).as("n_keys"), max(col("__t")).as("n_rows"),
        max(col("__c")).as("max_count"), sum(col("__h")).as("entropy_e6_num"))
      .withColumn("entropy_e6",
        col("entropy_e6_num").cast("double") / col("n_rows").cast("double"))
  }
}
