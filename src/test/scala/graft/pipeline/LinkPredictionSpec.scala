package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** linkPrediction: common neighbors + neighborhood Jaccard over non-edges. */
class LinkPredictionSpec extends SparkSpec {

  private val eSchema = StructType(Seq(strCol("src"), strCol("dst")))
  private def edges(rows: (String, String)*) =
    makeDf(eSchema, rows.map { case (a, b) => Row(a, b) })

  test("star graph: leaves pair through the hub; existing edges excluded") {
    // hub h -- x, y, z; plus the direct edge x -- y
    val out = Graph.linkPrediction(
      edges(("h", "x"), ("h", "y"), ("h", "z"), ("x", "y")),
      "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // (x, y) is an edge -> anti-joined out; (x, z) and (y, z) share h
    // deg x = 2, deg z = 1: jaccard = 1e6 div (2 + 1 - 1) = 500000
    assert(out === Map(
      ("x", "z") -> ((1L, 2L, 1L, 500000L)),
      ("y", "z") -> ((1L, 2L, 1L, 500000L))))
  }

  test("square graph: diagonal pairs share two neighbors, jaccard 1e6") {
    val out = Graph.linkPrediction(
      edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")),
      "src", "dst", minCommon = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(5))
      .toMap
    // (a,c) and (b,d): cn=2, degrees all 2 -> 2e6 div (2+2-2)
    assert(out === Map(("a", "c") -> 1000000L, ("b", "d") -> 1000000L))
  }

  test("minCommon prunes; duplicate and self edges collapse") {
    val noisy = edges(("h", "x"), ("x", "h"), ("h", "h"), ("h", "y"),
      ("h", "z"))
    val out = Graph.linkPrediction(noisy, "src", "dst", minCommon = 2L)
    assert(out.count() === 0L) // all candidate pairs share only h
  }

  test("hub over maxDegree is refused loudly") {
    val star = (1 to 12).map(i => ("hub", s"n$i"))
    // the refusal rides the degree table's eager checkpoint (raise_error,
    // zero extra validation jobs), so it still fires at CONSTRUCTION time
    // — but surfaces as a task failure, not an IllegalArgumentException
    val e = intercept[Exception] {
      Graph.linkPrediction(edges(star: _*), "src", "dst", maxDegree = 10L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("maxDegree") && m.contains("hub")))
  }

  test("partition-invariant") {
    val e = (0 until 20).map(i => (s"n$i", s"n${(i + 1) % 20}")) ++
      (0 until 20 by 4).map(i => (s"n$i", s"n${(i + 2) % 20}"))
    val df = edges(e: _*)
    val a = Graph.linkPrediction(df, "src", "dst").collect()
      .map(_.toSeq).toSet
    val b = Graph.linkPrediction(df.repartition(7), "src", "dst")
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }
}
