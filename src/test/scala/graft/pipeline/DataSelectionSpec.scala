package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The three data-selection operators added in round 7: unigram-LM scoring,
  * span-duplication fraction (ExactSubstr-lite), and SemDeDup-style semantic
  * dedup within clusters.
  */
class DataSelectionSpec extends SparkSpec {

  private val docSchema = StructType(Seq(longCol("id"), strCol("text")))

  private def docs(rows: (Long, String)*) =
    makeDf(docSchema, rows.map { case (i, t) => Row(i, t) })

  // ------------------------------------------------------- unigram log-prob

  test("unigramLogProb: hand-computed micro-nat costs on a tiny corpus") {
    // tokens: a:2 b:2 c:1, T=5 -> cost(a)=cost(b)=round(ln(2.5)*1e6),
    // cost(c)=round(ln(5)*1e6)
    val ab = math.round(math.log(2.5) * 1e6)
    val c5 = math.round(math.log(5.0) * 1e6)
    val out = CorpusStats.unigramLogProb(
      docs(1L -> "a a b", 2L -> "b c", 3L -> "   "), "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L)) // the blank doc emits no row
    assert(out(1L) === ((3L, 3 * ab, 3 * ab / 3.0)))
    assert(out(2L) === ((2L, ab + c5, (ab + c5) / 2.0)))
  }

  test("unigramLogProb: case-folds and collapses whitespace like q97") {
    val out = CorpusStats.unigramLogProb(
      docs(1L -> "The  THE", 2L -> "the"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // one token 'the' with c = T = 3: every cost is round(ln(1)*1e6) = 0
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  // -------------------------------------------------------- bigram log-prob

  test("bigramLogProb: hand-computed add-k transition costs on a tiny corpus") {
    // bigrams: (a,b):1 (b,a):2; contexts: c(a)=1 c(b)=2; V={a,b,c}=3, k=0.5
    // cost(a,b) = round(ln((1+1.5)/(1+0.5))e6), cost(b,a) = round(ln(3.5/2.5)e6)
    val cab = math.round(math.log(2.5 / 1.5) * 1e6)
    val cba = math.round(math.log(3.5 / 2.5) * 1e6)
    val out = CorpusStats.bigramLogProb(
      docs(1L -> "a b a", 2L -> "b a", 3L -> "c", 4L -> "  "), "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // the 1-token doc still votes its token into V, but emits no row
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((2L, cab + cba, (cab + cba) / 2.0)))
    assert(out(2L) === ((1L, cba, cba.toDouble)))
  }

  test("bigramLogProb: repetition scores LOW, salad scores high") {
    // one degenerate repeated transition vs unique transitions: the
    // repetition's high c(u,v) makes its mean cost strictly smaller
    val out = CorpusStats.bigramLogProb(
      docs(1L -> "x x x x x x x x", 2L -> "p q r s t u v w"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(2L))
  }

  test("bigramLogProb rejects non-positive smoothing") {
    val e = intercept[IllegalArgumentException] {
      CorpusStats.bigramLogProb(docs(1L -> "a b"), "id", "text", k = 0.0)
    }
    assert(e.getMessage.contains("positive"))
  }

  // -------------------------------------------------- span-duplication frac

  test("spanDuplicationFraction: shared and repeated 3-grams count per start") {
    val out = Dedup.spanDuplicationFraction(
      docs(1L -> "x y z w", 2L -> "x y z q", 3L -> "a b", 4L -> "m m m m"),
      "id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 3 has 2 tokens -> no 3-gram start -> no row
    assert(out.keySet === Set(1L, 2L, 4L))
    // docs 1/2 share "x y z"; their second starts are unique
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    // multiplicity inside ONE doc duplicates too: "m m m" occurs twice
    assert(out(4L) === ((2L, 2L, 1.0)))
  }

  test("spanDuplicationFraction: fully unique corpus scores zero everywhere") {
    val out = Dedup.spanDuplicationFraction(
      docs(1L -> "a b c d", 2L -> "e f g"), "id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out === Map(1L -> 0.0, 2L -> 0.0))
  }

  // ---------------------------------------------------------- semantic dedup

  private val embSchema = StructType(Seq(longCol("vec_id"), longCol("label"),
    StructField("embedding", ArrayType(DoubleType))))

  private def vecs(rows: (Long, Long, Seq[Double])*) =
    makeDf(embSchema, rows.map { case (i, l, v) => Row(i, l, v) })

  test("semanticDedup: drops only later vectors near an earlier one IN-cluster") {
    val df = vecs(
      (1L, 1L, Seq(1.0, 0.0)), (2L, 1L, Seq(1.0, 0.0)), (3L, 1L, Seq(0.0, 1.0)),
      (4L, 2L, Seq(1.0, 0.0))) // same direction as 1 but another cluster
    val out = Similarity.semanticDedup(df, "vec_id", "label", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out === Map(
      1L -> ((0L, true)), 2L -> ((1L, false)),
      3L -> ((0L, true)), 4L -> ((0L, true))))
  }

  test("semanticDedup: counts every earlier duplicate, not just one") {
    val df = vecs(
      (1L, 1L, Seq(1.0, 0.0)), (2L, 1L, Seq(1.0, 0.0)), (3L, 1L, Seq(1.0, 0.0)))
    val out = Similarity.semanticDedup(df, "vec_id", "label", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("results are partition-invariant (1 vs 17 shuffled partitions)") {
    val rnd = new scala.util.Random(9)
    val corpus = (1 to 60).map(i =>
      i.toLong -> Seq.fill(12)("w" + rnd.nextInt(30)).mkString(" "))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 17)) {
      val df = docs(corpus: _*).repartition(parts)
      assert(canon(CorpusStats.unigramLogProb(df, "id", "text")) ===
        canon(CorpusStats.unigramLogProb(docs(corpus: _*), "id", "text")))
      assert(canon(Dedup.spanDuplicationFraction(df, "id", "text", 3)) ===
        canon(Dedup.spanDuplicationFraction(docs(corpus: _*), "id", "text", 3)))
      assert(canon(CorpusStats.bigramLogProb(df, "id", "text")) ===
        canon(CorpusStats.bigramLogProb(docs(corpus: _*), "id", "text")))
    }
  }

  test("semanticDedupAuto: IVF cells route exact twins into one cluster") {
    // 3 well-separated directions in 8 dims; each cell's singletons sit at
    // the direction plus a DISTINCT perpendicular offset (pairwise cosine
    // <= 0.99 by construction), and two exact duplicate pairs are planted.
    // Identical vectors share a nearest centroid, so the twins must drop
    // however kmeans carves the rest; nothing else may reach 0.9999.
    def unit(axis: Int, scale: Double) = Seq.tabulate(8)(k =>
      if (k == axis) scale else 0.0)
    def plus(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x + y }
    val dirs = Seq(unit(0, 10.0), unit(1, 10.0), unit(2, 10.0))
    val singles = (0 until 30).map { i =>
      val off = unit(3 + i % 5, 2.0 + (i / 3))
      (i.toLong, 0L, plus(dirs(i % 3), off))
    }
    val rows = singles ++ Seq(
      (100L, 0L, dirs(0)), (101L, 0L, dirs(0)), // exact twins
      (102L, 0L, dirs(1)), (103L, 0L, dirs(1)))
    import org.apache.spark.sql.functions.col
    val df = vecs(rows: _*).select(col("vec_id"), col("embedding"))
    val out = Similarity.semanticDedupAuto(df, "vec_id", "embedding",
      threshold = 0.9999, nlist = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(100L) && !out(101L), "the later exact twin must drop")
    assert(out(102L) && !out(103L))
    assert(out.size === 34)
    assert(out.count(!_._2) === 2, "ONLY the two later twins drop")
  }

  test("semanticDedup: null vectors and null clusters ride through kept") {
    val schema = StructType(Seq(longCol("vec_id"), longCol("label"),
      StructField("embedding", ArrayType(DoubleType))))
    val df = makeDf(schema, Seq(
      Row(1L, 1L, Seq(1.0, 0.0)), Row(2L, 1L, Seq(1.0, 0.0)),
      Row(3L, 1L, null), // null vector: cannot be compared, stays kept
      Row(4L, null, Seq(1.0, 0.0)))) // null cluster: joins no pairs
    val out = Similarity.semanticDedup(df, "vec_id", "label", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("semanticDedup: cluster-size guard fails fast naming the LSH path") {
    val df = vecs((1L, 1L, Seq(1.0, 0.0)), (2L, 1L, Seq(0.0, 1.0)))
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(df, "vec_id", "label", "embedding", 0.9,
        maxClusterRows = 1L)
    }
    assert(e.getMessage.contains("embeddingCosinePairs"))
    assert(e.getMessage.contains("2 rows"))
  }
}
