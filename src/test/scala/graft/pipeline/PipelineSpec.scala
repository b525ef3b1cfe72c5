package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private val docSchema = StructType(Seq(longCol("id"), strCol("text")))

  private def docs(rows: (Long, String)*) =
    makeDf(docSchema, rows.map { case (i, t) => Row(i, t) })

  test("exact dedup keeps the min-id representative per key") {
    val df = docs(3L -> "aaa", 1L -> "aaa", 2L -> "bbb")
    val out = Dedup.exact(df, Seq("text"), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(out === Set(1L -> "aaa", 2L -> "bbb"))
  }

  test("minhash finds planted near-duplicates, not unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"token$i").mkString(" ") + " other words"
    val unrelated = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val pairs = Dedup.minhashPairs(df, "id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    val clusters = Dedup.minhashClusters(df, "id", "text", threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L && clusters(3L) === 3L)
  }

  test("verified minhash pairs carry the exact jaccard, not the estimate") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"token$i").mkString(" ") + " other words"
    val unrelated = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val rows = Dedup.minhashPairsVerified(df, "id", "text", threshold = 0.3).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    // exact 3-gram jaccard of the planted pair: both docs have 38
    // shingles, 36 shared => 36 / (38 + 38 - 36)
    val j = rows.head.getDouble(2)
    assert(j === 36.0 / 40.0)
  }

  test("connected components converge across chains") {
    val edges = makeDf(StructType(Seq(longCol("a"), longCol("b"))),
      Seq(Row(5L, 4L), Row(4L, 3L), Row(3L, 2L), Row(2L, 1L), // chain 5-1
        Row(10L, 11L))) // separate pair
    val cc = Dedup.connectedComponents(edges, "a", "b", maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L))
    assert(cc(10L) === 10L && cc(11L) === 10L)
  }

  test("distributed propagation handles a 200-deep chain in O(log d) rounds") {
    // inMemoryCutoff = 0 forces the label-propagation path; pointer jumping
    // must close a 200-hop diameter within 10 rounds (2^10 >> 200), where
    // plain neighbor propagation would need 200
    val chain = (1L until 200L).map(i => Row(i, i + 1)) :+ Row(500L, 501L)
    val edges = makeDf(StructType(Seq(longCol("a"), longCol("b"))), chain)
    val cc = Dedup.connectedComponents(edges, "a", "b", maxIters = 10,
      inMemoryCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 200L).forall(cc(_) == 1L))
    assert(cc(500L) === 500L && cc(501L) === 500L)
  }

  test("distributed and union-find paths agree on a random sparse graph") {
    val rnd = new scala.util.Random(11)
    val edges = makeDf(StructType(Seq(longCol("a"), longCol("b"))),
      Seq.fill(120)(Row(rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon(Dedup.connectedComponents(edges, "a", "b",
        maxIters = 16, inMemoryCutoff = 0L)) ===
      canon(Dedup.connectedComponents(edges, "a", "b")))
  }

  test("propagation refuses to release labels it could not converge") {
    val chain = (1L until 64L).map(i => Row(i, i + 1))
    val edges = makeDf(StructType(Seq(longCol("a"), longCol("b"))), chain)
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, "a", "b", maxIters = 2,
        inMemoryCutoff = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("ngram jaccard: identical 1, disjoint 0") {
    val df = docs(1L -> "a b c d e").crossJoin(
      docs(2L -> "a b c d e").select(col("text").as("text2")))
    val j = df.select(Dedup.ngramJaccard(col("text"), col("text2"), 2)).head().getDouble(0)
    assert(j === 1.0)
    val dj = docs(1L -> "a b c").crossJoin(docs(2L -> "x y z").select(col("text").as("t2")))
      .select(Dedup.ngramJaccard(col("text"), col("t2"), 2)).head().getDouble(0)
    assert(dj === 0.0)
  }

  test("ngram jaccard pairs match brute force exactly") {
    // mixed corpus: planted near-dups, a shared-vocabulary cluster, and
    // deterministic pseudo-random documents over a small vocabulary so that
    // borderline jaccards (just above/below 0.5) actually occur
    val rnd = new scala.util.Random(7)
    val planted = Seq(
      1L -> (1 to 30).map(i => s"w$i").mkString(" "),
      2L -> ((1 to 28).map(i => s"w$i").mkString(" ") + " x y"),
      3L -> (1 to 30).map(i => s"w${i + 2}").mkString(" "))
    val random = (10L to 60L).map(i =>
      i -> Seq.fill(12)(s"v${rnd.nextInt(20)}").mkString(" "))
    val df = docs(planted ++ random: _*)
    val got = Dedup.ngramJaccardPairs(df, "id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over the same shingle definition
    val texts = (planted ++ random).toMap
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val ids = texts.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      sa = sh(texts(a)); sb = sh(texts(b))
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter).toDouble
      if j >= 0.5
    } yield (a, b, j)).toSet
    assert(got === want)
    assert(want.exists { case (a, b, _) => a == 1L && b == 2L })
  }

  test("simhash: identical texts collide, near texts are close") {
    val df = docs(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "entirely different content about spark execution engines")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toList
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("simhash oversized buckets re-band without losing recall") {
    // many distinct docs plus planted near-dup pairs; force the multi-level
    // path with a tiny bucket cap and check the pair set matches the exact
    // all-pairs Hamming answer (recall 1.0 AND no spurious pairs)
    val rows = (1L to 120L).map(i => i -> s"doc $i has words w${i} x${i % 7} y${i % 3}") ++
      Seq(201L -> "alpha beta gamma delta epsilon zeta", // identical pair
        202L -> "alpha beta gamma delta epsilon zeta",
        203L -> "alpha beta gamma delta epsilon eta") // near variant
    val df = docs(rows: _*)
    def pairSet(cap: Int) =
      Dedup.simhashPairs(df, "id", "text", maxHamming = 3, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
        .toSet
    // exact answer via all-pairs on the same signatures
    val sigs = df.select(col("id"), Dedup.simhash64(col("text")).as("sh"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
      .toSet
    assert(pairSet(4096) === brute) // single-level path
    assert(pairSet(2) === brute)    // every non-trivial bucket forced to re-band
  }

  test("winnowing fingerprints: shift-robust overlap, exact for identical docs") {
    import graft.pipeline.TextAnalysis.winnowingFingerprints
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted words here " + base // same content, shifted
    val unrelated = (100 to 160).map(i => s"zzz$i").mkString(" ")
    val df = docs(1L -> base, 2L -> base, 3L -> shifted, 4L -> unrelated,
      5L -> "five tokens but few grams", // n=5 >= k=4, grams=2 < w=5
      6L -> "too short", 7L -> "")       // fewer tokens than k: no grams
    val fp = df.select(col("id"),
      winnowingFingerprints(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L) === fp(2L)) // identical docs, identical fingerprint sets
    assert(fp(1L).nonEmpty)
    // a prefix insertion preserves most interior fingerprints (the property
    // a whole-document hash lacks)
    val overlap = fp(1L).intersect(fp(3L)).size.toDouble / fp(1L).size
    assert(overlap > 0.8, s"overlap $overlap")
    assert(fp(1L).intersect(fp(4L)).isEmpty) // disjoint content
    assert(fp(5L).size === 1) // fewer grams than the window: single minimum
    assert(fp(6L).isEmpty)    // fewer tokens than k: nothing to fingerprint
    assert(fp(7L).isEmpty)
  }

  test("embedding cosine dedup finds the planted duplicate vector") {
    val schema = StructType(Seq(longCol("id"),
      StructField("vec", ArrayType(DoubleType))))
    val v1 = (1 to 16).map(_.toDouble)
    val v2 = v1.map(_ * 1.001) // nearly identical direction
    val v3 = (1 to 16).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val df = makeDf(schema, Seq(Row(1L, v1), Row(2L, v2), Row(3L, v3)))
    val pairs = Dedup.embeddingCosinePairs(df, "id", "vec", threshold = 0.99, planes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("ngram jaccard pairs: non-dyadic thresholds stay exact vs brute force") {
    // 0.1 * 10 rounds to 1.0000000000000002 in doubles — without the
    // epsilon guard the ceil would shorten 10-shingle prefixes by one and
    // could silently lose boundary pairs
    val rnd = new scala.util.Random(99)
    val texts = (1L to 40L).map(i =>
      i -> Seq.fill(12)(s"w${rnd.nextInt(15)}").mkString(" "))
    val df = docs(texts: _*)
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    for (t <- Seq(0.1, 0.3, 0.7)) {
      val got = Dedup.ngramJaccardPairs(df, "id", "text", n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        a <- texts.map(_._1); b <- texts.map(_._1) if a < b
        sa = sh(texts.toMap.apply(a)); sb = sh(texts.toMap.apply(b))
        inter = (sa & sb).size
        if inter.toDouble / (sa.size + sb.size - inter).toDouble >= t
      } yield (a, b)).toSet
      assert(got === want, s"threshold $t")
    }
  }

  test("LSH cosine pairs are a subset of the brute-force baseline") {
    val schema = StructType(Seq(longCol("id"),
      StructField("vec", ArrayType(DoubleType))))
    val rnd = new scala.util.Random(11)
    // random unit-ish vectors plus two planted near-dup pairs
    val rows = (1L to 40L).map(i => Row(i, Seq.fill(16)(rnd.nextGaussian()))) ++ Seq(
      Row(100L, (1 to 16).map(_.toDouble)),
      Row(101L, (1 to 16).map(_ * 1.0005)),
      Row(102L, (1 to 16).map(i => math.sin(i.toDouble))),
      Row(103L, (1 to 16).map(i => math.sin(i.toDouble) * 0.999)))
    val df = makeDf(schema, rows)
    val brute = Similarity.bruteForcePairs(df, "id", "vec", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingCosinePairs(df, "id", "vec", threshold = 0.9, planes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((100L, 101L)) && brute.contains((102L, 103L)))
    assert(lsh.subsetOf(brute), "LSH may miss but never invent pairs")
    // near-identical directions collide in every hyperplane band
    assert(lsh.contains((100L, 101L)))
  }

  test("bruteForcePairs rejects non-integral ids instead of casting to null") {
    val schema = StructType(Seq(strCol("id"), StructField("vec", ArrayType(DoubleType))))
    val df = makeDf(schema, Seq(Row("a", Seq(1.0, 0.0)), Row("b", Seq(1.0, 0.0))))
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForcePairs(df, "id", "vec", threshold = 0.9)
    }
    assert(e.getMessage.contains("integral id column"))
    assert(e.getMessage.contains("embeddingCosinePairs"))
  }

  test("bruteForcePairs enforces its driver-resident corpus bound") {
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    val df = makeDf(schema,
      (1L to 10L).map(i => Row(i, Seq(i.toDouble, 1.0))))
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForcePairs(df, "id", "vec", threshold = 0.9,
        maxResidentRows = 5L)
    }
    assert(e.getMessage.contains("collects all 10 vectors"))
    assert(e.getMessage.contains("embeddingCosinePairs"))
  }

  test("IVF centroids are stable under input-partition reordering") {
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map { i =>
      val base = if (i % 3 == 0) 5.0 else if (i % 3 == 1) -5.0 else 0.0
      Row(i.toLong, Seq.fill(8)(base + rnd.nextGaussian() * 0.1))
    }
    val df = makeDf(schema, rows)
    // a biased limit() sample would shift with the physical row order; the
    // hash-ordered sample must not
    val a = Ivf.train(df, "vec", nlist = 3, maxSample = 120, seed = 7L)
    val b = Ivf.train(df.repartition(7).sortWithinPartitions(col("id").desc),
      "vec", nlist = 3, maxSample = 120, seed = 7L)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
  }

  test("brute-force top-k returns exact neighbors in order") {
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    val df = makeDf(schema, Seq(
      Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.9, 0.1)),
      Row(3L, Seq(0.0, 1.0)), Row(4L, Seq(-1.0, 0.0))))
    val out = Similarity.bruteForceTopK(df, "id", "vec",
      df.filter("id = 1"), "id", "vec", k = 2).collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toList === List((2L, 1), (3L, 2)))
  }

  test("IVF top-k recalls the exact neighbor when cells are probed") {
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    // two well-separated clusters; nearest neighbors live in-cluster
    val rows = (0 until 20).map { i =>
      val base = if (i < 10) 10.0 else -10.0
      Row(i.toLong, Seq(base + i * 0.01, base - i * 0.01, base))
    }
    val df = makeDf(schema, rows)
    val model = Ivf.train(df, "vec", nlist = 2, seed = 7L)
    val out = Ivf.topK(df, "id", "vec", df.filter("id = 0"), "id", "vec",
      k = 1, model, nprobe = 1).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) < 10L) // neighbor from the same cluster
  }

  test("IVF nearestCells selection matches a full sort, nearest first") {
    val m = Ivf.Model(Array(
      Array(0.0, 0.0), Array(1.0, 1.0), Array(2.0, 2.0), Array(-1.0, 0.0)))
    val v = Array(0.9, 1.1)
    val bySort = m.centroids.zipWithIndex.map { case (c, i) =>
      ((v(0) - c(0)) * (v(0) - c(0)) + (v(1) - c(1)) * (v(1) - c(1)), i)
    }.sortBy(_._1).map(_._2).toSeq
    assert(Ivf.nearestCells(m, v, 3).toSeq === bySort.take(3))
    assert(Ivf.nearestCells(m, v, 10).toSeq === bySort) // probes clamp to nlist
  }

  test("IVF topK over a persisted cell assignment equals the one-shot plan") {
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    val rows = (0 until 20).map { i =>
      val base = if (i < 10) 10.0 else -10.0
      Row(i.toLong, Seq(base + i * 0.01, base - i * 0.01, base))
    }
    val df = makeDf(schema, rows)
    val model = Ivf.train(df, "vec", nlist = 2, seed = 7L)
    val queries = df.filter("id < 3")
    val assigned = Ivf.assignCells(df, "id", "vec", model).persist()
    try {
      def key(r: Row) = (r.getLong(0), r.getLong(1), r.getInt(3))
      val oneShot = Ivf.topK(df, "id", "vec", queries, "id", "vec",
        k = 2, model, nprobe = 1).collect().map(key).toSet
      val reused = Ivf.topKAssigned(assigned, queries, "id", "vec",
        k = 2, model, nprobe = 1).collect().map(key).toSet
      assert(reused === oneShot)
      assert(reused.nonEmpty)
    } finally assigned.unpersist()
  }

  test("LSH top-k finds a near-identical vector (shared signature buckets)") {
    val schema = StructType(Seq(longCol("id"), StructField("vec", ArrayType(DoubleType))))
    val rows = Row(1L, Seq(1.0, 0.5, -0.25, 2.0)) +:
      Row(2L, Seq(1.0, 0.5, -0.25, 2.001)) +: // near-identical to 1
      (3 to 40).map(i => Row(i.toLong,
        Seq(math.sin(i * 1.7), math.cos(i * 2.3), math.sin(i * 3.1), math.cos(i * 0.9))))
    val df = makeDf(schema, rows)
    val out = Similarity.lshTopK(df, "id", "vec",
      df.filter("id = 1"), "id", "vec", k = 1).collect()
    // a near-identical vector agrees with every hyperplane sign, so it
    // shares all bands and must surface as the top candidate
    assert(out.length === 1)
    assert(out.head.getLong(1) === 2L)
  }

  test("token count and quality gates") {
    val df = docs(1L -> "one two three four five six", 2L -> "", 3L -> "   ",
      4L -> "a b")
    val counts = df.select(col("id"), TextAnalysis.tokenCount(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 6L, 2L -> 0L, 3L -> 0L, 4L -> 2L))
    val ok = df.filter(TextAnalysis.qualityOk(col("text"))).collect().map(_.getLong(0))
    assert(ok.toList === List(1L))
  }

  test("language id recognizes obvious samples") {
    val df = docs(
      1L -> "the cat and the dog are in the house for you",
      2L -> "der Hund und die Katze sind nicht in einem Haus",
      3L -> "el perro y el gato es que en una casa por ahora",
      4L -> "le chien et le chat est dans les maisons pour qui",
      5L -> "你好世界这是中文文本")
    val out = df.select(col("id"), TextAnalysis.languageId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("fingerprint is whitespace/case canonical") {
    val df = docs(1L -> "Hello   World", 2L -> "hello world", 3L -> "different")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("multimodal decode fallback: deterministic, null-safe, right shape") {
    val schema = StructType(Seq(longCol("id"), StructField("payload", BinaryType)))
    val df = makeDf(schema, Seq(
      Row(1L, "some image bytes".getBytes), Row(2L, null),
      Row(3L, "some image bytes".getBytes)))
    val out = Multimodal.decodeImages(df, "payload", featureDim = 8, rebalance = false)
      .select("id", "decoded").collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(out(2L) === null)
    assert(out(1L) === out(3L)) // same bytes -> same decode
    // no JDK codec claims these bytes: the pseudo-decode fallback is tagged
    assert(out(1L).getString(3) === "opaque")
    assert(out(1L).getSeq[Float](4).size === 8)
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeImages(df.filter("id = 1"), "payload", featureDim = 4,
        rebalance = false), "decoded", frames = 3).count()
    assert(frames === 3L)
    val audio = Multimodal.extractAudioFeatures(df, "payload", windows = 2).count()
    assert(audio === 6L)
  }

  test("decontamination flags overlap with the blocklist, case-folded") {
    val train = docs(
      1L -> "one two three four five six seven eight tail",  // shares the 8-gram
      2L -> "ONE TWO THREE FOUR FIVE SIX SEVEN EIGHT prefix case differs",
      3L -> "totally unrelated words that never appear in any benchmark doc x y",
      4L -> "one two three four five SPLIT six seven eight")  // broken 8-gram
    val block = docs(100L -> "header one two three four five six seven eight trailer")
    val flagged = Dedup.contaminatedIds(train, "id", "text", block, "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 2L))
    // short blocklist docs fall back to whole-text grams
    val shortBlock = docs(200L -> "tiny doc")
    val flaggedShort = Dedup.contaminatedIds(
      docs(1L -> "tiny doc", 2L -> "tiny doc plus more"), "id", "text",
      shortBlock, "text", n = 8).collect().map(_.getLong(0)).toSet
    assert(flaggedShort === Set(1L)) // doc 2's whole-text gram differs
  }

  test("top-k tokens: exact counts, deterministic tie-break, blank-safe") {
    val df = docs(
      1L -> "apple apple banana", 2L -> "apple banana cherry",
      3L -> "  ", 4L -> "Banana CHERRY date")
    val out = CorpusStats.topKTokens(df, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // apple 3, banana 3 (case-folded), cherry 2 — ties break on the token
    assert(out.toSeq === Seq(("apple", 3L), ("banana", 3L), ("cherry", 2L)))
  }

  test("pipeline operator misuse fails fast with named arguments") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException] {
      Dedup.contentDefinedChunks(col("text"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.contentDefinedChunks(col("text"), divisor = 0L)
    }
    intercept[IllegalArgumentException] {
      Dedup.contaminationScores(d, "id", "text", d, "text", n = 0)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.oovRate(d, "id", "text", vocabSize = 0)
    }
    // unknown columns surface as analysis errors naming the column
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      CorpusStats.corpusDiff(d, d, "id", "ghost").collect()
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("new corpus operators are invariant to input partitioning") {
    // a cluster re-shards inputs freely: every released value must be a
    // pure function of the data, never of the partition layout
    val base = docs((1L to 80L).map(i =>
      i -> s"alpha bravo tok$i charlie ${if (i % 3 == 0) "shared phrase here" else s"tail$i"}"): _*)
    val shuffled = makeDf(base.schema,
      new scala.util.Random(7).shuffle((1 to 80).toList)
        .map(i => base.collect()(i - 1))).repartition(7)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val pairs = Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      d => d.select(col("id"), TextAnalysis.dedupLines(col("text"))),
      d => d.select(col("id"), posexplode(
        TextAnalysis.slidingWindows(col("text"), 4, 2)).as(Seq("i", "w"))),
      d => d.select(col("id"), posexplode(
        Dedup.contentDefinedChunks(col("text"), k = 2, divisor = 4L))
        .as(Seq("i", "ch"))),
      d => CorpusStats.oovRate(d, "id", "text", vocabSize = 5),
      d => Dedup.contaminationScores(d.filter(col("id") % 10 =!= 0), "id",
        "text", d.filter(col("id") % 10 === 0), "text", n = 3),
      d => CorpusStats.corpusDiff(d.filter(col("id") <= 60),
        d.filter(col("id") >= 20), "id", "text"),
      d => Packing.paddingProfile(d.select(col("id"),
        TextAnalysis.tokenCount(col("text")).as("ntok")), "ntok", Seq(4L, 8L)))
    pairs.zipWithIndex.foreach { case (f, i) =>
      assert(canon(f(base)) === canon(f(shuffled)), s"operator $i varies with layout")
    }
  }

  test("exactAgainst drops batch rows whose canonical text history holds") {
    val history = docs(1L -> "alpha beta", 2L -> "gamma delta")
    val batch = docs(
      10L -> "  ALPHA   beta ",  // canonical dup of history 1 -> dropped
      11L -> "gamma delta v2",   // fresh -> kept
      12L -> "epsilon")          // fresh -> kept
    val out = Dedup.exactAgainst(batch, history, "id", "text")
      .collect().map(_.getLong(0)).sorted
    assert(out === Seq(11L, 12L))
  }

  test("bloom incremental dedup: no false negatives, bounded false drops") {
    val history = docs((1L to 400L).map(i => i -> s"hist doc number $i"): _*)
    val dups = (1L to 50L).map(i => (1000L + i) -> s"hist doc number $i")
    val fresh = (1L to 400L).map(i => (2000L + i) -> s"fresh doc number $i")
    val batch = docs((dups ++ fresh): _*)
    val bloom = Dedup.fingerprintBloom(history, "text",
      expectedItems = 400L, fpp = 1e-3)
    val kept = Dedup.bloomAgainst(batch, bloom, "text")
      .collect().map(_.getLong(0)).toSet
    // every true duplicate is dropped (bloom filters cannot false-negative)
    assert(dups.map(_._1).forall(id => !kept.contains(id)))
    // false positives drop at most a small fraction of the fresh docs
    val dropped = fresh.map(_._1).count(id => !kept.contains(id))
    assert(dropped <= 4, s"$dropped false drops of 400 at fpp 1e-3")
    // and the bloom survivors are a subset of the exact survivors' ids
    val exact = Dedup.exactAgainst(batch, history, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(exact))
  }

  test("corpusDiff classifies added/removed/changed/kept by fingerprint") {
    val old = docs(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon")
    val neu = docs(2L -> "  GAMMA   delta ", // formatting only -> kept
      3L -> "epsilon rewritten",             // content change  -> changed
      4L -> "brand new")                     // new id          -> added
    val out = CorpusStats.corpusDiff(old, neu, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out === Seq(
      (1L, "removed"), (2L, "kept"), (3L, "changed"), (4L, "added")))
  }

  test("oovRate counts occurrences outside the corpus top-k vocabulary") {
    val df = docs(
      1L -> "the the the cat",  // vocab(2) = {the, cat}: the x3, cat x2...
      2L -> "the cat zebra",    // ...ties broken by token string
      3L -> "qux zap zap",
      4L -> "")
    val out = CorpusStats.oovRate(df, "id", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // vocab: the(4), cat(2) — zap(2) loses the tie to cat on the string
    assert(out === Seq(
      (1L, 4L, 0L, 0.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 3L, 3L, 1.0)))  // blank doc 4 emits no row
  }

  test("paddingProfile: bucket mass, waste, and the overflow bucket") {
    val schema = StructType(Seq(longCol("id"), longCol("ntok")))
    val df = makeDf(schema, Seq(
      Row(1L, 3L), Row(2L, 4L), Row(3L, 7L),   // bucket 4? no: edges 4,8
      Row(4L, 8L), Row(5L, 20L), Row(6L, 0L)))
    val out = Packing.paddingProfile(df, "ntok", Seq(4L, 8L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(out === Seq(
      (-1L, 1L, 20L, 20L, 0L, 1.0),         // overflow: no padding cost
      (4L, 2L, 7L, 8L, 1L, 7.0 / 8.0),      // docs 1,2
      (8L, 2L, 15L, 16L, 1L, 15.0 / 16.0))) // docs 3,4; doc 6 emits nothing
    intercept[IllegalArgumentException] {
      Packing.paddingProfile(df, "ntok", Seq(8L, 4L))
    }
    intercept[IllegalArgumentException] {
      Packing.paddingProfile(df, "ntok", Seq.empty)
    }
  }

  test("tokenSpectrum counts distinct tokens per occurrence count") {
    val df = docs(
      1L -> "a a a b b c", 2L -> "b c d", 3L -> "  ")
    // a x3, b x3, c x2, d x1 -> spectrum {3: 2 tokens, 2: 1, 1: 1}
    val out = CorpusStats.tokenSpectrum(df, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 2L)))
    // mass conservation: sum(k * n_tokens(k)) = total token occurrences
    assert(out.map { case (k, n) => k * n }.sum === 9L)
  }

  test("per-group top-k tokens rank within each group independently") {
    val schema = StructType(Seq(longCol("id"), strCol("lang"), strCol("text")))
    val df = makeDf(schema, Seq(
      Row(1L, "en", "cat cat dog"), Row(2L, "en", "cat bird"),
      Row(3L, "fr", "chat chat chat chien"), Row(4L, "fr", "chien loup")))
    val out = CorpusStats.topKTokensByGroup(df, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(out === Set(
      ("en", "cat", 3L, 1), ("en", "bird", 1L, 2), // bird beats dog on the tie
      ("fr", "chat", 3L, 1), ("fr", "chien", 2L, 2)))
  }

  test("ngram doc frequency: per-doc distinct votes, short-doc whole gram") {
    val df = docs(
      1L -> "click here to subscribe now",
      2L -> "click here to unsubscribe today",
      3L -> "click here to win",
      // gram repeated inside ONE doc must count once
      4L -> "click here click here click here",
      5L -> "solo")
    val freqs = CorpusStats.ngramDocFrequency(df, "id", "text", n = 2, minDocs = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // "click here" in docs 1,2,3,4; "here to" only in 1,2,3; "solo" in 1 doc
    assert(freqs === Map("click here" -> 4L))
    val lower = CorpusStats.ngramDocFrequency(df, "id", "text", n = 2, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(lower === Map("click here" -> 4L, "here to" -> 3L))
    // a one-word document contributes its whole text as the single gram
    val short = CorpusStats.ngramDocFrequency(df, "id", "text", n = 2, minDocs = 1)
      .collect().map(_.getString(0)).toSet
    assert(short.contains("solo"))
    // a document ingested twice (same id, two rows) still votes once
    val dup = docs(1L -> "click here", 2L -> "click here")
      .union(docs(1L -> "click here"))
    val votes = CorpusStats.ngramDocFrequency(dup, "id", "text", n = 2, minDocs = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(votes === Map("click here" -> 2L))
  }

  test("strip boilerplate lines: shared lines struck, body and blanks kept") {
    // "SHARED HEADER" (with stray spaces on some rows) appears in 3 docs;
    // each body line is unique; blank lines never count and never go
    val df = docs(
      1L -> "SHARED HEADER\nbody one\n\nend one",
      2L -> "  SHARED HEADER  \nbody two",
      3L -> "SHARED HEADER\nbody three",
      4L -> "unrelated\nbody four")
    val out = CorpusStats.stripBoilerplateLines(df, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === (("body one\n\nend one", 1L)))
    assert(out(2L) === (("body two", 1L))) // trimmed match; raw line dropped
    assert(out(3L) === (("body three", 1L)))
    assert(out(4L) === (("unrelated\nbody four", 0L)))
    // below the threshold nothing is struck
    val keep = CorpusStats.stripBoilerplateLines(df, "id", "text", minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keep.values.forall(_ === 0L))
    // a document ingested twice still votes once per line
    val dup = docs(1L -> "maybe common\nx", 2L -> "maybe common\ny")
      .union(docs(1L -> "maybe common\nx"))
    val votes = CorpusStats.stripBoilerplateLines(dup, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(2)).sum
    assert(votes === 0L) // 2 distinct docs < minDocs=3, despite 3 rows
    intercept[IllegalArgumentException] {
      CorpusStats.stripBoilerplateLines(df, "id", "text", minDocs = 1)
    }
    // the bounded collect rejects an oversized boilerplate set (the id
    // shift makes every line shared by two DISTINCT docs, so more than one
    // line qualifies at minDocs=2)
    intercept[IllegalArgumentException] {
      CorpusStats.stripBoilerplateLines(
        df.union(df.withColumn("id", col("id") + 10L)),
        "id", "text", minDocs = 2, maxBoilerplateLines = 1)
    }
  }

  test("strip boilerplate is invariant to input partitioning") {
    val base = (1L to 30L).map(i =>
      i -> s"COMMON BANNER\nunique body $i\nfooter ${i % 3}")
    val df = docs(base: _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.stripBoilerplateLines(d, "id", "text", minDocs = 10)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val a = run(df)
    assert(a === run(df.repartition(13)))
    assert(a === run(df.coalesce(1)))
    // footers 0/1/2 appear in 10 docs each -> struck along with the banner
    assert(a.forall(_._3 === 2L))
  }

  test("int8 quantization maps extremes to +-127 and roundtrips boundedly") {
    val df = makeDf(
      StructType(Seq(longCol("id"), StructField("v", ArrayType(DoubleType)))),
      Seq(Row(1L, Seq(1.0, -0.5, 0.25, 0.0)),
        Row(2L, Seq(-2.0, 2.0)),
        Row(3L, Seq(0.0, 0.0)),
        Row(4L, null)))
    val out = df.select(col("id"),
        Similarity.quantizeInt8(col("v")).as("q"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    assert(out(1L) === Some(Seq(127L, -63L, 32L, 0L)))
    assert(out(2L) === Some(Seq(-127L, 127L)))
    assert(out(3L) === Some(Seq(0L, 0L))) // zero vector stays zeros
    assert(out(4L) === None)
    // dequantized values land within one quantization step of the source
    val step = 1.0 / 127.0
    val back = df.filter(col("id") === 1L)
      .select(Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("v")), lit(1.0)).as("d"))
      .collect().head.getSeq[Double](0)
    val orig = Seq(1.0, -0.5, 0.25, 0.0)
    back.zip(orig).foreach { case (d, o) =>
      assert(math.abs(d - o) <= step / 2 + 1e-12, s"$d vs $o") }
  }

  test("topTfidfTerms surfaces document-specific terms over shared ones") {
    // "common" appears in all docs (idf 0 -> never characteristic);
    // each doc's unique tokens rank first
    val df = docs(
      1L -> "common alpha alpha beta",
      2L -> "common gamma",
      3L -> "common delta epsilon")
    val out = CorpusStats.topTfidfTerms(df, "id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val byDoc = out.groupBy(_._1)
    // doc 1: alpha (tf 2) outranks beta (tf 1); common never appears
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq === Seq("alpha", "beta"))
    assert(byDoc(2L).map(_._3).toSet === Set("gamma", "common"))
    // ranked common in doc 2: only two tokens exist, score 0 fills rank 2
    assert(byDoc(3L).sortBy(_._2).map(_._3).toSeq === Seq("delta", "epsilon"))
    // tf/df columns are the exact integers
    val alpha = out.find(t => t._3 == "alpha").get
    assert((alpha._4, alpha._5) === (2L, 1L))
    val common = out.find(t => t._3 == "common").get
    assert(common._5 === 3L)
  }

  test("crossCorpusMatches finds planted near-dups across corpora only") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"token$i").mkString(" ") + " other words"
    val unrelated = (100 to 140).map(i => s"zzz$i").mkString(" ")
    // 1 and 2 are near-dups but both in the corpus: no cross match for them
    val corpus = docs(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val ref = docs(10L -> base, 11L -> "completely different text entirely")
    val m = Dedup.crossCorpusMatches(corpus, ref, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m === Set(1L -> 10L, 2L -> 10L))
    val kept = Dedup.dedupAgainst(corpus, ref, "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L))
  }

  test("crossCorpusMatches reports the exact jaccard, not the estimate") {
    val a = "w1 w2 w3 w4 w5 w6"
    val b = "w1 w2 w3 w4 w5 other"
    // 3-shingles: a has 4, b has 4, intersection 3 -> j = 3/5
    val m = Dedup.crossCorpusMatches(docs(1L -> a), docs(2L -> b), "id", "text",
      threshold = 0.5).collect()
    assert(m.length === 1)
    assert(m.head.getDouble(2) === 0.6)
  }

  test("dedupAgainst keeps everything when the reference is empty") {
    val corpus = docs(1L -> "alpha beta gamma delta", 2L -> "epsilon zeta eta")
    val kept = Dedup.dedupAgainst(corpus, docs(), "id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("spread rebalances a coalesced single-slice in-memory frame") {
    val one = docs((1L to 40L).map(i => i -> s"text body $i"): _*).coalesce(1)
    assert(Dedup.spread(one).rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }
}
