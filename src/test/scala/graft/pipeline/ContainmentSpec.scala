package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Token-level containment dedup: hand cases, the w+k-1 recall contract,
  * brute-force model equality on random corpora, partition invariance.
  */
class ContainmentSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("id"), strCol("text")))

  private def df(docs: Seq[(String, String)]) =
    makeDf(schema, docs.map { case (i, t) => Row(i, t) })

  /** Brute-force all-pairs model with the operator's contract: contained
    * side needs >= minTok tokens; equal sequences orient higher id as
    * contained; containment is space-padded substring over the
    * normalized token join.
    */
  private def model(docs: Seq[(String, String)],
      minTok: Int = 8): Set[(String, String)] = {
    val norm = docs.map { case (i, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      (i, toks.mkString(" "), toks.size)
    }
    (for {
      (ai, an, at) <- norm; (bi, bn, bt) <- norm
      if ai != bi && at >= minTok
      if at < bt || (at == bt && ai > bi)
      if (" " + bn + " ").contains(" " + an + " ")
    } yield (ai, bi)).toSet
  }

  private def run(docs: Seq[(String, String)], parts: Int = 1) =
    Dedup.containedDocs(df(docs).repartition(parts), "id", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("hand case: planted snippet found; similar-but-not-contained and " +
      "short-snippet (out of contract) both absent") {
    val big = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      "big" -> big,
      "snippet" -> (5 to 14).map(i => s"tok$i").mkString(" "), // 10 tokens
      // same vocabulary, different order: not contained
      "shuffled" -> (14 to 5 by -1).map(i => s"tok$i").mkString(" "),
      // genuinely contained but only 4 tokens: below the w+k-1=8 contract
      "short" -> (5 to 8).map(i => s"tok$i").mkString(" "))
    assert(run(docs) === Set("snippet" -> "big"))
  }

  test("normalization: case and whitespace runs collapse before matching") {
    val docs = Seq(
      "a" -> "Alpha  Beta\tGamma delta epsilon zeta eta theta iota kappa",
      "b" -> "alpha beta gamma delta epsilon zeta eta theta")
    assert(run(docs) === Set("b" -> "a"))
  }

  test("equal token sequences orient the higher id as contained") {
    val t = (1 to 12).map(i => s"w$i").mkString(" ")
    assert(run(Seq("doc1" -> t, "doc2" -> t)) === Set("doc2" -> "doc1"))
  }

  test("matches the brute-force model on random corpora with planted " +
      "containments, under any partitioning") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val base = (1 to 25).map { i =>
        s"d$i" -> Seq.fill(10 + rnd.nextInt(25))("t" + rnd.nextInt(40))
          .mkString(" ")
      }
      // plant snippets of random docs (random 8..14-token slices)
      val snippets = (1 to 8).map { j =>
        val (_, t) = base(rnd.nextInt(base.size))
        val toks = t.split(" ")
        val len = 8 + rnd.nextInt(math.max(1, math.min(7, toks.length - 8) + 1))
        val start = rnd.nextInt(math.max(1, toks.length - len + 1))
        s"s$j" -> toks.slice(start, start + len).mkString(" ")
      }
      val docs = base ++ snippets
      val expected = model(docs)
      assert(expected.nonEmpty, s"trial $trial planted nothing")
      assert(run(docs, 1) === expected, s"trial $trial")
      assert(run(docs, 13) === expected, s"trial $trial, 13 partitions")
    }
  }

  test("guards: bad k/w and missing columns") {
    intercept[IllegalArgumentException] {
      Dedup.containedDocs(df(Seq("a" -> "x")), "id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containedDocs(df(Seq("a" -> "x")), "id", "nope")
    }
  }
}
