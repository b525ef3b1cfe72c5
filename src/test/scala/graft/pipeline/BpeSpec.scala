package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private val docSchema = StructType(Seq(longCol("id"), strCol("text")))

  private def docs(rows: (Long, String)*) =
    makeDf(docSchema, rows.map { case (i, t) => Row(i, t) })

  test("training follows the hand-computed merge order with lexicographic ties") {
    // words: low x2, lower x1. pair counts: (l,o)=3, (o,w)=3, (w,e)=1,
    // (e,r)=1 -> tie (l,o)/(o,w) breaks lexicographically to (l,o); then
    // (lo,w)=3 wins; then (e,r)/(low,e) tie at 1 breaks to (e,r)
    val m = Bpe.train(docs(1L -> "low low", 2L -> "lower"),
      "text", numMerges = 3, minPairCount = 1)
    assert(m.merges === Seq("l" -> "o", "lo" -> "w", "e" -> "r"))
  }

  test("minPairCount stops the loop before singleton merges") {
    val m = Bpe.train(docs(1L -> "low low", 2L -> "lower"),
      "text", numMerges = 10, minPairCount = 2)
    // only the count-3 pairs qualify
    assert(m.merges === Seq("l" -> "o", "lo" -> "w"))
  }

  test("encode reproduces training segmentation; unseen chars stay split") {
    val m = Bpe.train(docs(1L -> "low low", 2L -> "lower"),
      "text", numMerges = 3, minPairCount = 1)
    val out = docs(1L -> "low lower lowest zzz")
      .select(Bpe.encode(col("text"), m).as("toks"))
      .collect().head.getSeq[String](0)
    // low -> [low]; lower -> [low, er]; lowest -> [low, e, s, t] (no (e,s)
    // merge learned); zzz stays characters
    assert(out === Seq("low", "low", "er", "low", "e", "s", "t", "z", "z", "z"))
  }

  test("training is deterministic under any partitioning") {
    val corpus = (1 to 50).map(i =>
      i.toLong -> s"alpha beta gamma delta token$i alpha beta")
    val a = Bpe.train(docs(corpus: _*), "text", numMerges = 8)
    val b = Bpe.train(docs(corpus: _*).repartition(13), "text", numMerges = 8)
    assert(a.merges === b.merges)
    assert(a.merges.nonEmpty)
  }

  test("the word-dictionary residency bound is enforced, naming the fix") {
    val corpus = (1 to 40).map(i => i.toLong -> s"w$i x$i y$i")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs(corpus: _*), "text", numMerges = 2, maxWords = 10)
    }
    assert(e.getMessage.contains("frequency floor"))
  }

  test("distributed training equals the driver trainer bit-for-bit on the " +
      "bounded regime (merge order, ties, minPairCount stop)") {
    // mixed corpus: repeats, lexicographic ties, words that fully merge
    // and retire mid-loop, a word with every character distinct
    val corpus = (1 to 30).map(i =>
      i.toLong -> s"low lower lowest aa aaa bb token$i quartz") ++
      Seq(31L -> "zz zz zz yzyzyz", 32L -> "")
    for (minPair <- Seq(1L, 2L, 5L)) {
      val driver = Bpe.train(docs(corpus: _*), "text",
        numMerges = 12, minPairCount = minPair)
      val dist = Bpe.trainDistributed(docs(corpus: _*).repartition(7), "text",
        numMerges = 12, minPairCount = minPair)
      assert(dist.merges === driver.merges, s"minPairCount=$minPair")
      assert(driver.merges.nonEmpty)
    }
  }

  test("symbols are CODE POINTS: emoji corpora train identically on both " +
      "trainers and encode losslessly (no lone surrogates in rows)") {
    // "😀😀ok" x many: the supplementary char must stay ONE symbol — a
    // UTF-16-unit split would ship lone surrogates to Spark, whose UTF-8
    // row encoding turns them into '?', collapsing distinct symbols
    val corpus = (1 to 12).map(i => i.toLong -> "😀😀ok zz") ++
      // tie-break probe across the surrogate boundary: U+FF01 (BMP, above
      // the surrogate range) vs U+1F600 — UTF-16-unit compare and
      // code-point compare ORDER THESE DIFFERENTLY
      (1 to 6).map(i => (100 + i).toLong -> "！！ 😀😀")
    val driver = Bpe.train(docs(corpus: _*), "text", numMerges = 6,
      minPairCount = 1)
    val dist = Bpe.trainDistributed(docs(corpus: _*).repartition(5), "text",
      numMerges = 6, minPairCount = 1)
    assert(dist.merges === driver.merges)
    assert(driver.merges.exists { case (a, b) =>
      (a + b).codePointCount(0, (a + b).length) < (a + b).length },
      s"expected a supplementary-character merge, got ${driver.merges}")
    // encode is lossless on the trained corpus: concatenating the learned
    // subwords reproduces the exact input words
    val enc = docs(1L -> "😀😀ok")
      .select(Bpe.encode(col("text"), driver).as("t"))
      .collect().head.getSeq[String](0)
    assert(enc.mkString === "😀😀ok")
  }

  test("BATCHED distributed training is bit-identical to sequential: " +
      "mixed corpus, tie-heavy corpus, and a merge-string collision " +
      "corpus all yield the same merge table at every batch size") {
    // 1. the mixed corpus of the equality test above
    val mixed = (1 to 30).map(i =>
      i.toLong -> s"low lower lowest aa aaa bb token$i quartz") ++
      Seq(31L -> "zz zz zz yzyzyz", 32L -> "")
    // 2. tie-heavy: many equal-count pairs — the strict-above rule must
    // refuse to batch across the tie and fall back to sequential steps
    val ties = (1 to 10).map(i => i.toLong -> "ab cd ef gh ij kl")
    // 3. collision bait: merging (a, b) creates the string "ab" while a
    // word already contains symbol-adjacent "a b" inside "xaby"-like
    // contexts AND a literal two-step path where an early merged string
    // re-enters the census — the live-symbol probe must catch it
    val collide = (1 to 8).map(i => i.toLong -> "ab ab a b a b cc cc dd") ++
      (1 to 3).map(i => (50 + i).toLong -> "aab abb")
    for ((name, corpus) <- Seq("mixed" -> mixed, "ties" -> ties,
        "collide" -> collide); minPair <- Seq(1L, 2L)) {
      val seqModel = Bpe.trainDistributed(docs(corpus: _*), "text",
        numMerges = 10, minPairCount = minPair)
      for (batch <- Seq(2, 4, 64)) {
        val batched = Bpe.trainDistributed(
          docs(corpus: _*).repartition(7), "text",
          numMerges = 10, minPairCount = minPair, mergeBatch = batch)
        assert(batched.merges === seqModel.merges,
          s"corpus=$name minPair=$minPair mergeBatch=$batch")
      }
      // and both agree with the driver trainer (transitivity anchor)
      val driver = Bpe.train(docs(corpus: _*), "text",
        numMerges = 10, minPairCount = minPair)
      assert(seqModel.merges === driver.merges, s"corpus=$name")
    }
  }

  test("batched == sequential on RANDOM corpora (property): a 4-letter " +
      "alphabet maximizes count ties and merge-string collisions — the " +
      "regimes the acceptance rule must refuse to batch across") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val alphabet = "abcd"
      val corpus = (1 to 25).map { i =>
        val words = (0 until (1 + rnd.nextInt(4))).map { _ =>
          (0 until (1 + rnd.nextInt(6))).map(_ =>
            alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
        (i.toLong, words)
      }
      val minPair = 1L + rnd.nextInt(2)
      val seqM = Bpe.trainDistributed(docs(corpus: _*), "text",
        numMerges = 8, minPairCount = minPair)
      val batM = Bpe.trainDistributed(docs(corpus: _*), "text",
        numMerges = 8, minPairCount = minPair, mergeBatch = 16)
      assert(batM.merges === seqM.merges,
        s"trial $trial minPair=$minPair corpus=${corpus.map(_._2)}")
      // anchor to the driver trainer too: three implementations, one table
      val drv = Bpe.train(docs(corpus: _*), "text",
        numMerges = 8, minPairCount = minPair)
      assert(seqM.merges === drv.merges, s"trial $trial (driver anchor)")
    }
  }

  test("distributed training stops early when no pair reaches minPairCount") {
    val m = Bpe.trainDistributed(docs(1L -> "low low", 2L -> "lower"),
      "text", numMerges = 10, minPairCount = 2)
    assert(m.merges === Seq("l" -> "o", "lo" -> "w"))
    // a corpus of only single-character words has no pairs at all
    val none = Bpe.trainDistributed(docs(1L -> "a b c a b"), "text",
      numMerges = 5, minPairCount = 1)
    assert(none.merges === Seq.empty)
  }

  test("null text encodes to null; blank to empty") {
    val m = Bpe.Model(Seq("a" -> "b"))
    val df = makeDf(docSchema, Seq(Row(1L, null), Row(2L, "   ")))
      .select(col("id"), Bpe.encode(col("text"), m).as("toks"))
    val rows = df.collect().map(r => r.getLong(0) ->
      Option(r.getSeq[String](1))).toMap
    assert(rows(1L).isEmpty)
    assert(rows(2L).contains(Seq.empty))
  }
}
