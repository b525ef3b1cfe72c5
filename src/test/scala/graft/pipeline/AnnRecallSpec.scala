package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Recall contracts for the APPROXIMATE ANN paths. The exact twins (q45
  * brute force, q62 all-cells IVF) are oracle-checked in CORRECTNESS; these
  * pin what the approximate variants (q46 LSH, q59 IVF nprobe<nlist) are
  * allowed to lose: recall@k against the exact top-k must stay above a
  * floor on seeded clustered data AT THE REGISTRY'S OWN PARAMETERS
  * (k=3 with the 64-plane/8-bit-band default for LSH; nlist=8, nprobe=3 for
  * IVF). The floors here are the documented contract referenced from the
  * q46/q59 registry entries.
  */
class AnnRecallSpec extends SparkSpec {

  private val dim = 16
  private val nClusters = 8
  private val perCluster = 40
  private val k = 3
  private val nQueries = 20

  /** Seeded clustered corpus: unit-norm cluster centers, members = center +
    * small noise — the regime ANN is built for (neighbors share a cluster).
    */
  private def corpus() = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      Row(i.toLong, c.map(_ + rnd.nextGaussian() * 0.15).toSeq)
    }
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    makeDf(schema, rows)
  }

  private def topKSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAtK(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, e) =>
      approx.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size
    }
    hits.sum / exact.size
  }

  test("LSH top-k recall@3 >= 0.9 at the q46 registry parameters (64 planes, 8-bit bands)") {
    val df = corpus()
    val queries = df.filter(s"id < $nQueries")
    val exact = topKSet(Similarity.bruteForceTopK(df, "id", "vec", queries, "id", "vec", k))
    val approx = topKSet(Similarity.lshTopK(df, "id", "vec", queries, "id", "vec", k))
    val r = recallAtK(approx, exact)
    info(f"LSH recall@$k = $r%.3f")
    assert(r >= 0.9, f"LSH recall@$k fell to $r%.3f — below the 0.9 floor q46 relies on")
  }

  test("IVF top-k recall@3 >= 0.9 at the q59 registry parameters (nlist=8, nprobe=3)") {
    val df = corpus()
    val queries = df.filter(s"id < $nQueries")
    val model = Ivf.train(df, "vec", nlist = 8, seed = 42L)
    val exact = topKSet(Similarity.bruteForceTopK(df, "id", "vec", queries, "id", "vec", k))
    val approx = topKSet(Ivf.topK(df, "id", "vec", queries, "id", "vec", k, model, nprobe = 3))
    val r = recallAtK(approx, exact)
    info(f"IVF recall@$k = $r%.3f")
    assert(r >= 0.9, f"IVF recall@$k fell to $r%.3f — below the 0.9 floor q59 relies on")
  }

  test("distributed-trained IVF (full-corpus integer Lloyd's, no sample " +
      "bound) holds the same recall floor and is partition-invariant") {
    val df = corpus()
    val queries = df.filter(s"id < $nQueries")
    val model = Ivf.trainDistributed(df, "id", "vec", nlist = 8, iters = 4)
    val exact = topKSet(Similarity.bruteForceTopK(df, "id", "vec", queries, "id", "vec", k))
    val approx = topKSet(Ivf.topK(df, "id", "vec", queries, "id", "vec", k, model, nprobe = 3))
    val r = recallAtK(approx, exact)
    info(f"distributed-IVF recall@$k = $r%.3f")
    assert(r >= 0.9, f"distributed-IVF recall@$k fell to $r%.3f")
    // layout independence: the integer trainer's centroids are exact, so
    // the MODEL (not just the recall) is bit-identical under repartition
    val again = Ivf.trainDistributed(df.repartition(13), "id", "vec",
      nlist = 8, iters = 4)
    assert(model.centroids.map(_.toSeq).toSeq ===
      again.centroids.map(_.toSeq).toSeq)
  }

  test("LSH top-k at 1-bit bands (q46b parameters) equals brute force exactly") {
    // with bandBits=1 the query side's single-bit-flip multi-probe covers
    // BOTH buckets of every band, so candidate coverage is structural —
    // this is the provable-recall configuration the q46b registry entry
    // oracles; it must match brute force row for row, ranks included
    val df = corpus()
    val queries = df.filter(s"id < $nQueries")
    val exact = Similarity.bruteForceTopK(df, "id", "vec", queries, "id", "vec", k)
      .select("query_id", "corpus_id", "rank").collect().toSet
    val exhaustive = Similarity.lshTopK(df, "id", "vec", queries, "id", "vec", k,
      planes = 2, bandBits = 1)
      .select("query_id", "corpus_id", "rank").collect().toSet
    assert(exhaustive === exact)
  }

  test("triangle-blocked exhaustive embedding pairs (q44b parameters) equal brute force") {
    val df = corpus()
    val threshold = 0.8 // within-cluster cosines ~0.95, cross-cluster well below
    val exact = Similarity.bruteForcePairs(df, "id", "vec", threshold)
      .select("id_a", "id_b").collect().toSet
    assert(exact.nonEmpty) // the contract is vacuous on an empty pair set
    val exhaustive = Dedup.embeddingCosinePairsExhaustive(df, "id", "vec", threshold)
      .select("id_a", "id_b").collect().toSet
    assert(exhaustive === exact)
  }

  test("meanPool: positionwise means by hand; ragged, null, and " +
      "quantized paths") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Seq(1.0, 2.0)), Row("a", Seq(3.0, 6.0, 9.0)), // ragged
        Row("a", null), Row(null, Seq(7.0, 7.0)))),
      schema)
    val out = Similarity.meanPool(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Double](2)))).toMap
    // null vector and null group carry nothing; position 2 averages only
    // the one vector long enough to have it
    assert(out === Map("a" -> ((2L, Seq(2.0, 4.0, 9.0)))))
    val quant = Similarity.meanPool(df, "g", "v", quantizeUnit = 1e-6)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
    assert(quant("a") === Seq(2.0, 4.0, 9.0)) // clean values: identical
    intercept[IllegalArgumentException] {
      Similarity.meanPool(df, "g", "v", quantizeUnit = -1.0)
    }
  }

  test("meanPool: null ELEMENTS inside a vector are skipped identically " +
      "in the plain and quantized paths") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", Seq[java.lang.Double](1.0, null, 5.0)),
        Row("a", Seq[java.lang.Double](3.0, 8.0, null)))),
      schema)
    // position 0: (1+3)/2; position 1: 8 alone; position 2: 5 alone —
    // in BOTH modes (the quantized denominator must not count the nulls)
    val plain = Similarity.meanPool(df, "g", "v")
      .collect().map(r => r.getSeq[Double](2)).head
    val quant = Similarity.meanPool(df, "g", "v", quantizeUnit = 1e-6)
      .collect().map(r => r.getSeq[Double](2)).head
    assert(plain === Seq(2.0, 8.0, 5.0))
    assert(quant === Seq(2.0, 8.0, 5.0))
  }

  test("normalizeL2: unit norm, direction preserved, zero/null to null") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Seq(3.0, 4.0)), Row(Seq(0.0, 0.0)), Row(null))), schema)
    val out = df.select(Similarity.normalizeL2(
      org.apache.spark.sql.functions.col("v"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Double](0))
    assert(out(0) === Seq(0.6, 0.8))
    assert(out(1) == null && out(2) == null)
    // normalized mean-pooled vectors have unit cosine with themselves
    val pooled = Similarity.meanPool(
      df.where(org.apache.spark.sql.functions.col("v").isNotNull)
        .withColumn("g", org.apache.spark.sql.functions.lit("g")), "g", "v")
    val nv = pooled.select(Similarity.normalizeL2(
      org.apache.spark.sql.functions.col("embedding")).as("nv"))
    val c = nv.select(Similarity.cosine(
      org.apache.spark.sql.functions.col("nv"),
      org.apache.spark.sql.functions.col("nv"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("meanPool quantized path is addition-order-free across partitionings") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(5)
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", ArrayType(DoubleType))))
    val rows = Seq.fill(300)(Row("g" + rnd.nextInt(3),
      Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    def run(parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), schema)
      .transform(d => Similarity.meanPool(d, "g", "v", quantizeUnit = 1e-6))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
    assert(run(1) === run(17)) // bit-identical, not merely close
  }

  test("exhaustive pairs are invariant to the blocks tuning knob") {
    // blocks only spreads the O(n^2) verify over block-pair tasks;
    // coverage is structural at EVERY block count, including the
    // degenerate single flood bucket
    val df = corpus()
    val threshold = 0.8
    def run(b: Int) = Dedup.embeddingCosinePairsExhaustive(
      df, "id", "vec", threshold, blocks = b)
      .select("id_a", "id_b").collect().toSet
    val base = run(1)
    assert(base.nonEmpty)
    assert(run(4) === base)
    assert(run(64) === base)
    intercept[IllegalArgumentException] {
      Dedup.embeddingCosinePairsExhaustive(df, "id", "vec", threshold, blocks = 0)
    }
  }

  test("exhaustive embedding pairs refuse corpora past the resident bound") {
    val df = corpus()
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingCosinePairsExhaustive(df, "id", "vec", 0.8, maxCorpusRows = 10)
    }
    assert(ex.getMessage.contains("embeddingCosinePairs"))
  }

  test("IVF recall improves monotonically-ish with nprobe, reaching 1.0 at nlist") {
    val df = corpus()
    val queries = df.filter("id < 10")
    val model = Ivf.train(df, "vec", nlist = 8, seed = 42L)
    val exact = topKSet(Similarity.bruteForceTopK(df, "id", "vec", queries, "id", "vec", k))
    val r1 = recallAtK(topKSet(
      Ivf.topK(df, "id", "vec", queries, "id", "vec", k, model, nprobe = 1)), exact)
    val rAll = recallAtK(topKSet(
      Ivf.topK(df, "id", "vec", queries, "id", "vec", k, model, nprobe = 8)), exact)
    assert(rAll === 1.0) // probing every cell IS brute force (q62's contract)
    assert(rAll >= r1)
  }
}
