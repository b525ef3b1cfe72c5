package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two plans:
  *  - brute force: corpus x (broadcast) queries, exact cosine, per-query
  *    top-k — the baseline, linear scans are fine when queries are few;
  *  - LSH-bucketed: hyperplane-signature buckets shrink the candidate set,
  *    the scale path when both sides are large.
  * The dot product is a codegen'd `aggregate(zip_with(...))` — no UDF in
  * the hot loop.
  */
object Similarity {

  /** Exact cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, x) => s + x))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query row: broadcast the (small) query
    * side across the corpus scan, score, keep k per query by window rank.
    * Scales to any corpus size; queries must fit in a broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = Dedup.spread(corpus).select(col(corpusId).as("corpus_id"),
      col(corpusVec).cast("array<double>").as("__cv"))
    val q = queries.select(col(queryId).as("query_id"),
      col(queryVec).cast("array<double>").as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Exact above-threshold cosine pairs by brute force: the quadratic
    * baseline that anchors the LSH dedup's oracle story (ids only — the
    * membership test is far from the threshold on real data, while raw
    * cosine doubles are not engine-portable). At corpus scale use
    * [[Dedup.embeddingCosinePairs]]; this is the small-side/verification
    * plan, kept single-shuffle-free: one broadcast-free cross join that
    * Spark executes as a nested-loop over co-partitioned blocks.
    */
  def bruteForcePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = Dedup.spread(df).select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val a = v.select(col("__id").as("id_a"), col("__v").as("__va"))
    val b = v.select(col("__id").as("id_b"), col("__v").as("__vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(cosine(col("__va"), col("__vb")) >= threshold)
      .select("id_a", "id_b")
  }

  /** LSH-bucketed approximate top-k: corpus and queries are bucketed by
    * hyperplane-signature bands; candidates are corpus rows sharing at least
    * one band with the query; exact cosine re-ranks candidates. Recall
    * improves with more planes/bands. Shuffle is keyed on (band, bucket) —
    * never a cross product.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, planes: Int = 16): DataFrame = {
    val bandCount = planes / 8
    def banded(df: DataFrame, id: String, vec: String, idOut: String, vecOut: String) = {
      val sig = Dedup.hyperplaneSignature(col(vec), planes)
      Dedup.spread(df).select(col(id).as(idOut), col(vec).cast("array<double>").as(vecOut),
        sig.as("__sig"))
        .select(col(idOut), col(vecOut),
          posexplode(array((0 until bandCount).map(j =>
            shiftright(col("__sig"), j * 8).bitwiseAND(lit(0xffL))): _*))
            .as(Seq("__band", "__bk")))
    }
    val cb = banded(corpus, corpusId, corpusVec, "corpus_id", "__cv")
    val qb = banded(queries, queryId, queryVec, "query_id", "__qv")
    // score before the dedup: cosine is deterministic per (query, corpus)
    // pair, so distinct on the scored triple equals distinct on the id pair
    // — and the dedup shuffle then carries 3 scalar columns instead of both
    // full embedding vectors once per shared band
    val scored = cb.join(qb, Seq("__band", "__bk"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("__cv"), col("__qv")).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }
}
