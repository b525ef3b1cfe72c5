package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer assigns every corpus vector to one of `nlist` cells; a query
  * probes its `nprobe` nearest cells and re-ranks candidates by exact
  * cosine. The scale path for ANN when both sides are large: the corpus is
  * scanned once for assignment (then the cell id can be persisted /
  * partitioned on), and each query touches ~nprobe/nlist of the corpus.
  * Centroid training uses a bounded sample; assignment is a broadcast of
  * nlist centroids — no all-pairs anywhere.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def nlist: Int = centroids.length
  }

  /** Train the coarse quantizer on a bounded sample of the corpus —
    * driver-side Lloyd's, deterministic under the seed. A coarse quantizer
    * only needs approximate cells, and the sample cap bounds driver memory
    * (100k x 64 dims x 8B = ~50 MB), so this is the standard IVF recipe
    * even at corpus scale; per-iteration Spark jobs (as with ML KMeans)
    * dominate training time otherwise. Assignment stays distributed.
    */
  def train(
      corpus: DataFrame, vecCol: String, nlist: Int,
      maxSample: Int = 100000, maxIter: Int = 8, seed: Long = 42L): Model = {
    // Deterministic hash-sample, not limit(): limit takes the first rows the
    // scan happens to produce — one file/shard of a 100 TB corpus — biasing
    // centroids to that shard. Sorting on xxhash64 of the vector lowers to
    // TakeOrderedAndProject (per-partition top-k heap + driver merge of k),
    // one bounded pass that picks a uniform pseudo-random subset independent
    // of partition order and file layout.
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .sort(xxhash64(col("v")))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val k = math.min(nlist, sample.length)
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toVector).take(k)
      .map(i => sample(i).clone).toArray
    val dim = sample.head.length
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          while (j < dim) { val t = v(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      iter += 1
    }
    Model(centroids)
  }

  /** Train the coarse quantizer on the FULL corpus — no sample bound: the
    * distributed integer Lloyd's of [[Clustering.kMeansMicro]] (per round,
    * one codegen'd literal-centroid argmin projection + one (cluster, dim)-
    * keyed exchange; the driver holds k·dim longs, never vectors), with
    * centroids mapped back to doubles for [[Model]]. The
    * [[Bpe.trainDistributed]] discipline applied to ANN: [[train]]'s
    * bounded driver sample is the standard fast recipe, this is the path
    * with NO residency assumption when the corpus's cluster structure must
    * be learned from everything. Deterministic and layout-independent
    * (integer arithmetic, smallest-id seeding), so the same corpus yields
    * the same quantizer on any cluster.
    */
  def trainDistributed(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int,
      iters: Int = 8, scale: Long = 1000000L): Model = {
    val (_, centroids) = Clustering.kMeansMicroImpl(
      corpus, idCol, vecCol, nlist, iters, scale,
      materializeAssignment = false)
    Model(centroids.map(_.map(_.toDouble / scale)))
  }

  /** Indices of the `probes` nearest centroids by squared L2, nearest first.
    * Partial selection, not a sort: O(nlist * probes) with probes << nlist,
    * vs O(nlist log nlist) — this runs once per row of a 100 TB corpus, so
    * the per-row constant is the whole cost of assignment.
    */
  private[pipeline] def nearestCells(
      m: Model, v: Array[Double], probes: Int): Array[Int] = {
    val n = m.centroids.length
    val dists = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = m.centroids(c)
      var d = 0.0
      var j = 0
      while (j < v.length) { val t = v(j) - cent(j); d += t * t; j += 1 }
      dists(c) = d
      c += 1
    }
    val take = math.min(probes, n)
    val out = new Array[Int](take)
    val used = new Array[Boolean](n)
    var p = 0
    while (p < take) {
      var best = -1
      // PositiveInfinity, and NaN distances lose every comparison: a
      // degenerate vector (NaN component, squared sum overflowing to Inf)
      // must still select SOME unused cell rather than crash the task
      var bestD = Double.PositiveInfinity
      c = 0
      while (c < n) {
        // NaN reads as +Infinity so finite cells always win over it and
        // an all-NaN row falls back to the first unused cell
        val d = if (java.lang.Double.isNaN(dists(c))) Double.PositiveInfinity
          else dists(c)
        if (!used(c) && (best == -1 || d < bestD)) { bestD = d; best = c }
        c += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    out
  }

  private def cellUdf(m: Model, probes: Int) =
    udf((xs: Seq[Double]) => nearestCells(m, xs.toArray, probes))

  /** Assign each corpus vector to its nearest cell: (corpus_id, __cv,
    * __cell). The assignment depends only on the model, so callers issuing
    * repeated [[topKAssigned]] probes against one corpus should persist this
    * frame (or write it out partitioned by `__cell`) — the corpus is then
    * scanned and assigned ONCE, not once per query batch.
    */
  def assignCells(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      model: Model): DataFrame = {
    val in = Dedup.spread(corpus).select(col(corpusId).as("corpus_id"),
      col(corpusVec).cast("array<double>").as("__cv"))
    val inSchema = in.schema
    val outSchema = StructType(inSchema.fields :+ StructField("__cell", IntegerType))
    // assignment runs inside an object boundary, not as a Column: the join
    // key's inferred isnotnull filter would otherwise push down with the
    // UDF re-inlined, scanning all nlist centroids twice per corpus row
    in.mapPartitions { it =>
      it.flatMap { r =>
        val v = r.getAs[scala.collection.Seq[Double]](1)
        if (v == null) Iterator.empty
        else Iterator.single(
          Row.fromSeq(r.toSeq :+ nearestCells(model, v.toArray, 1)(0)))
      }
    }(Encoders.row(outSchema))
  }

  /** Approximate top-k: probe the query's `nprobe` nearest cells, exact
    * cosine re-rank within them.
    */
  def topK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, model: Model, nprobe: Int = 4): DataFrame =
    topKAssigned(assignCells(corpus, corpusId, corpusVec, model),
      queries, queryId, queryVec, k, model, nprobe)

  /** [[topK]] over a pre-assigned ([[assignCells]]) — possibly persisted —
    * corpus: repeated query batches reuse the assignment instead of
    * re-scanning the corpus.
    */
  def topKAssigned(
      assigned: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, model: Model, nprobe: Int = 4): DataFrame = {
    val assignQ = cellUdf(model, nprobe)
    val q = queries.select(col(queryId).as("query_id"),
      col(queryVec).cast("array<double>").as("__qv"))
      .withColumn("__cell", explode(assignQ(col("__qv"))))
    val scored = assigned.join(q, Seq("__cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", Similarity.cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.select("query_id", "corpus_id", "cosine").distinct()
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
