package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.pipeline.TextAnalysis._

/** Exact expectations for the scalar text metrics (the composite gates built
  * from them are covered by the oracled q48/q56-q58).
  */
class TextMetricsSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    makeDf(StructType(Seq(strCol("t"))), Seq(Row(text)))
      .select(c).collect().head.get(0)

  test("normalizeText: NFC composes decomposed accents, controls become " +
      "spaces, whitespace collapses, null passes through") {
    import org.apache.spark.sql.functions.col
    // decomposed e + U+0301 becomes the precomposed U+00E9
    assert(one("cafe\u0301", normalizeText(col("t"))) === "caf\u00e9")
    // already-composed text is untouched (NFC idempotence)
    assert(one("caf\u00e9", normalizeText(col("t"))) === "caf\u00e9")
    // C0 (BEL), DEL, and C1 (U+0085) become SPACES (deleting them fused
    // the words around line breaks — "hello\nworld" -> "helloworld");
    // whitespace runs then collapse
    assert(one("a\u0007b\u007fc\u0085d", normalizeText(col("t"))) === "a b c d")
    assert(one("hello\nworld", normalizeText(col("t"))) === "hello world")
    assert(one("  a \t\n b  ", normalizeText(col("t"))) === "a b")
    val nullOut = makeDf(StructType(Seq(strCol("t"))), Seq(Row(null)))
      .select(normalizeText(col("t"))).collect().head
    assert(nullOut.isNullAt(0))
  }

  test("subword token count splits on case, digit, and punctuation edges") {
    import org.apache.spark.sql.functions.col
    // "helloWorld2x" -> hello | World | 2 | x ; "a.b" -> a | .b (lookahead
    // boundary before punctuation only)
    assert(one("helloWorld2x", subwordTokenCount(col("t"))) === 4L)
    assert(one("a.b", subwordTokenCount(col("t"))) === 2L)
    assert(one("plain words here", subwordTokenCount(col("t"))) === 3L)
    assert(one("", subwordTokenCount(col("t"))) === 0L)
    // subword count is always >= whitespace token count
    val df = makeDf(StructType(Seq(strCol("t"))),
      Seq(Row("someCamelCase and punctuation, with digits123 mixed")))
    val r = df.select(subwordTokenCount(col("t")).as("s"),
      tokenCount(col("t")).as("w")).collect().head
    assert(r.getLong(0) >= r.getLong(1))
  }

  test("punctuation ratio counts punct characters over all characters") {
    import org.apache.spark.sql.functions.col
    assert(one("a,b!", punctRatio(col("t"))) === 0.5)
    assert(one("abcd", punctRatio(col("t"))) === 0.0)
    assert(one("", punctRatio(col("t"))) === 0.0)
  }

  test("stopword ratio is stopword tokens over all tokens") {
    import org.apache.spark.sql.functions.col
    assert(one("the cat sat on the mat", stopwordRatio(col("t"))) === 3.0 / 6.0)
    assert(one("zebra quokka axolotl", stopwordRatio(col("t"))) === 0.0)
    assert(one("", stopwordRatio(col("t"))) === 0.0)
  }

  test("minhash signature length and band hashes are stable") {
    import org.apache.spark.sql.functions.{col, split}
    val df = makeDf(StructType(Seq(strCol("t"))),
      Seq(Row("alpha beta gamma delta epsilon zeta eta theta")))
    val sig = df.select(
      Dedup.minhashSignatureText(col("t"), 3, 16).as("s1"),
      Dedup.minhashSignature(Dedup.shingles(col("t"), 3), 16).as("s2"))
      .collect().head
    // the text kernel and the shingle-column path agree exactly
    assert(sig.getSeq[Long](0) === sig.getSeq[Long](1))
    assert(sig.getSeq[Long](0).length === 16)
    val bands = df.select(Dedup.bandHashes(
      Dedup.minhashSignatureText(col("t"), 3, 16), 16, 4)).collect().head.getSeq[Long](0)
    assert(bands.length === 4)
  }

  test("duplicate line fraction counts repeated lines") {
    import org.apache.spark.sql.functions.col
    // 4 lines, "spam" appears 3 times -> 2 of 4 lines are repeats
    assert(one("spam\nham\nspam\nspam",
      duplicateLineFraction(col("t"))) === 0.5)
    assert(one("a\nb\nc", duplicateLineFraction(col("t"))) === 0.0)
    assert(one("single line", duplicateLineFraction(col("t"))) === 0.0)
    assert(one("", duplicateLineFraction(col("t"))) === 0.0)
  }

  test("repeated ngram fraction flags looped text") {
    import org.apache.spark.sql.functions.col
    // "buy now buy now buy now": 2-grams = [buy now, now buy, buy now,
    // now buy, buy now] -> 5 occurrences, 2 distinct -> 3/5 repeats
    assert(one("buy now buy now buy now",
      repeatedNgramFraction(col("t"), 2)) === 0.6)
    assert(one("all words here are fresh",
      repeatedNgramFraction(col("t"), 2)) === 0.0)
    // below n tokens there are no n-grams, so nothing can repeat
    assert(one("one", repeatedNgramFraction(col("t"), 2)) === 0.0)
    assert(one("", repeatedNgramFraction(col("t"), 2)) === 0.0)
    // case-folded: "Spam spam SPAM spam" repeats
    assert(one("Spam spam SPAM spam",
      repeatedNgramFraction(col("t"), 2)).asInstanceOf[Double] > 0.6)
  }

  test("pii masking replaces emails, urls, and ipv4 literals") {
    import org.apache.spark.sql.functions.col
    assert(one("contact bob@example.com via https://x.co/p?q=1 from 10.0.0.1 ok",
      maskPii(col("t")))
      === "contact <EMAIL> via <URL> from <IP> ok")
    // multiple occurrences all masked; non-matching text untouched
    assert(one("a@b.co and c@d.org", maskPii(col("t"))) === "<EMAIL> and <EMAIL>")
    assert(one("no pii here 1.2 or v1.2.3", maskPii(col("t")))
      === "no pii here 1.2 or v1.2.3")
    // the email pass wins over the bare-host passes
    assert(one("http://10.0.0.1/x", maskPii(col("t"))) === "<URL>")
  }

  test("dedupLines keeps each line's first occurrence in order") {
    import org.apache.spark.sql.functions.col
    assert(one("a\nb\na\nc\nb", dedupLines(col("t"))) === "a\nb\nc")
    // single line, no separator: unchanged; blank lines dedup like any line
    assert(one("only", dedupLines(col("t"))) === "only")
    assert(one("a\n\nb\n\na", dedupLines(col("t"))) === "a\n\nb")
    // idempotent: deduping a deduped text changes nothing
    assert(one("x\ny\nx", dedupLines(dedupLines(col("t")))) === "x\ny")
  }

  test("slidingWindows covers every token; tail windows shorten") {
    import org.apache.spark.sql.functions.col
    // 7 tokens, window 4 stride 2: starts 0, 2, 4, 6
    assert(one("t0 t1 t2 t3 t4 t5 t6", slidingWindows(col("t"), 4, 2))
      === Seq("t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6", "t6"))
    // shorter than one window: a single clipped window
    assert(one("a b", slidingWindows(col("t"), 5, 5)) === Seq("a b"))
    // blank text yields no windows
    assert(one("", slidingWindows(col("t"), 4, 2)) === Seq.empty)
    assert(one("   ", slidingWindows(col("t"), 4, 2)) === Seq.empty)
    // stride == window: disjoint exact cover
    assert(one("a b c d", slidingWindows(col("t"), 2, 2))
      === Seq("a b", "c d"))
    // every token appears in at least one window (coverage invariant)
    val wins = one("w1 w2 w3 w4 w5", slidingWindows(col("t"), 3, 2))
      .asInstanceOf[scala.collection.Seq[String]]
    val covered = wins.flatMap(_.split(" ")).toSet
    assert(covered === Set("w1", "w2", "w3", "w4", "w5"))
    intercept[IllegalArgumentException] { slidingWindows(col("t"), 0, 1) }
    intercept[IllegalArgumentException] { slidingWindows(col("t"), 1, 0) }
    // stride past the window would skip tokens — rejected by contract
    intercept[IllegalArgumentException] { slidingWindows(col("t"), 4, 5) }
  }

  test("contaminationScores counts matched distinct shingles per document") {
    import org.apache.spark.sql.functions.col
    val schema = StructType(Seq(longCol("id"), strCol("text")))
    val docs = makeDf(schema, Seq(
      Row(1L, "a b c d"),   // grams (n=2): "a b","b c","c d" -> 2 match
      Row(2L, "x y"),       // gram "x y" -> 0 match
      Row(3L, "a b")))      // gram "a b" -> 1 match
    val block = makeDf(schema, Seq(Row(10L, "a b c"))) // grams "a b","b c"
    val out = Dedup.contaminationScores(docs, "id", "text", block, "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, 3L, 2L, 2.0 / 3.0),
      (2L, 1L, 0L, 0.0),
      (3L, 1L, 1L, 1.0)))
  }

  test("content-defined chunks tile the document and re-synchronize " +
      "after an insertion") {
    import org.apache.spark.sql.functions.col
    val text = (1 to 400).map(i => s"tok$i").mkString(" ")
    def chunks(t: String) =
      one(t, Dedup.contentDefinedChunks(col("t")))
        .asInstanceOf[scala.collection.Seq[Row]]
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    val base = chunks(text)
    // tiling: starts/lens cover 1..400 exactly, in order, no overlap
    assert(base.head._1 === 1)
    assert(base.map(_._2).sum === 400)
    base.sliding(2).foreach { case Seq(a, b) =>
      assert(b._1 === a._1 + a._2); case _ => }
    // with divisor 64 over 400 tokens, content boundaries exist
    assert(base.length > 1)
    // determinism
    assert(chunks(text) === base)
    // insertion tolerance: prepending tokens leaves the trailing chunks'
    // hashes intact (fixed windows would shift every one of them)
    val shifted = chunks("intruder alpha " + text)
    val baseH = base.map(_._3).toSet
    val shiftedH = shifted.map(_._3).toSet
    assert((baseH intersect shiftedH).nonEmpty,
      "chunking must re-synchronize after an insertion")
    assert(base.takeRight(2).map(_._3).forall(shiftedH.contains),
      "trailing chunks must survive a prefix insertion")
    // short documents: fewer tokens than one gram -> one whole-doc chunk
    assert(chunks("a b c").map(t => (t._1, t._2)) === Seq((1, 3)))
    // blank text -> no chunks
    assert(chunks("").isEmpty && chunks("   ").isEmpty)
  }

  test("hyperplane signatures are deterministic and discriminative") {
    import org.apache.spark.sql.functions.col
    // powers of two: no +-1 combination of them sums to zero, so every
    // plane has a strict sign and negation flips every bit
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType))))
    val df = makeDf(schema, Seq(Row(Seq(1.0, 2.0, 4.0, 8.0))))
    val s1 = df.select(Dedup.hyperplaneSignature(col("v"), 16)).collect().head.getLong(0)
    val s2 = df.select(Dedup.hyperplaneSignature(col("v"), 16)).collect().head.getLong(0)
    assert(s1 === s2) // deterministic pseudo-random planes
    assert(s1 >= 0L && s1 < (1L << 16))
    val neg = makeDf(schema, Seq(Row(Seq(-1.0, -2.0, -4.0, -8.0))))
      .select(Dedup.hyperplaneSignature(col("v"), 16)).collect().head.getLong(0)
    assert((s1 ^ neg) === (1L << 16) - 1)
  }

  test("compression ratio separates loops, prose, and noise") {
    import org.apache.spark.sql.functions.col
    val c = TextAnalysis.compressionRatio(col("t"))
    val loop = one("spam ham " * 400, c).asInstanceOf[Double]
    val prose = one(("the quick brown fox jumps over the lazy dog and then " +
      "discusses query planning with a colleague over coffee ") * 8, c)
      .asInstanceOf[Double]
    val rnd = new scala.util.Random(5)
    val noise = one(Seq.fill(3200)(('a' + rnd.nextInt(26)).toChar).mkString, c)
      .asInstanceOf[Double]
    assert(loop < 0.05, s"a pure loop must collapse, got $loop")
    assert(prose > loop && prose < noise,
      s"prose ($prose) must sit between loop ($loop) and noise ($noise)")
    assert(noise > 0.5, s"incompressible noise should stay near raw, got $noise")
    assert(one("", c) == null && one(null, c) == null)
  }
}
