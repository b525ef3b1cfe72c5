package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** BM25 retrieval: quantized scores against a pure-Scala model, ranking
  * sanity, tokenization discipline, and guards.
  */
class RetrievalSpec extends SparkSpec {

  private val docSchema = StructType(Seq(longCol("id"), strCol("text")))
  private val qSchema = StructType(Seq(longCol("qid"), strCol("q")))

  private def docsDf(docs: Seq[(Long, String)]) =
    makeDf(docSchema, docs.map { case (i, t) => Row(i, t) })

  /** The identical formula, sequentially: quantize each contribution to
    * micro-units, sum exact longs.
    */
  private def model(docs: Seq[(Long, String)], query: String, k1: Double,
      b: Double): Map[Long, Long] = {
    def tok(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val dToks = docs.map { case (i, t) => i -> tok(t) }.toMap
    val n = dToks.size.toDouble
    val total = dToks.values.map(_.size).sum.toDouble
    val dfOf = dToks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    val qts = tok(query).distinct
    dToks.flatMap { case (id, ts) =>
      val dl = ts.size.toDouble
      val cs = qts.flatMap { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) None
        else Some(math.round(
          math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5)) *
            (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * dl * n / total)) * 1e6))
      }
      if (cs.isEmpty) None else Some(id -> cs.sum)
    }
  }

  test("bm25TopK equals the quantized Scala model; more matched terms " +
      "and rarer terms outrank; ties break by doc id") {
    val docs = Seq(
      1L -> "fast hash join fast",
      2L -> "slow table scan scan scan",
      3L -> "hash join table",
      4L -> "window agg stream stream",
      5L -> "fast fast fast fast fast fast")
    val q = makeDf(qSchema, Seq(Row(10L, "fast hash join")))
    val out = Retrieval.bm25TopK(docsDf(docs), "id", "text", q, "qid", "q",
      k = 5, k1 = 1.25, b = 0.75)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = model(docs, "fast hash join", 1.25, 0.75)
    assert(out.map(t => t._1 -> t._2).toMap === expect)
    // ranks follow (score desc, id)
    val byRank = out.sortBy(_._3).map(_._1)
    val want = expect.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(byRank === want)
    // doc 4 shares no term: absent
    assert(!out.exists(_._1 == 4L))
  }

  test("k truncates per query independently; duplicate query terms count " +
      "once; queries with no corpus term release nothing") {
    val docs = Seq(1L -> "a b", 2L -> "a c", 3L -> "a d")
    val q = makeDf(qSchema, Seq(
      Row(1L, "a a a"), Row(2L, "zzz-not-in-corpus")))
    val out = Retrieval.bm25TopK(docsDf(docs), "id", "text", q, "qid", "q",
      k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.count(_._1 == 1L) === 2) // k truncated from 3 matches
    assert(!out.exists(_._1 == 2L))
    // "a a a" scores exactly like "a": term multiplicity is ignored
    val single = Retrieval.bm25TopK(docsDf(docs), "id", "text",
      makeDf(qSchema, Seq(Row(1L, "a"))), "qid", "q", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(out.collect { case (1L, id, _) => id }.forall(single.contains))
  }

  test("guards reject bad parameters and missing columns") {
    val docs = docsDf(Seq(1L -> "a"))
    val q = makeDf(qSchema, Seq(Row(1L, "a")))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "id", "text", q, "qid", "q", k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "id", "text", q, "qid", "q", k = 1, b = 1.5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "id", "nope", q, "qid", "q", k = 1)
    }
  }
}
