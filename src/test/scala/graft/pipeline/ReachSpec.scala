package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** reachProfile hop-bounded closeness blocks; joinHotKeys skew doctor. */
class ReachSpec extends SparkSpec {

  private val eSchema = StructType(Seq(strCol("src"), strCol("dst")))
  private def edges(rows: (String, String)*) =
    makeDf(eSchema, rows.map { case (a, b) => Row(a, b) })
  private def seedDf(names: String*) =
    makeDf(StructType(Seq(strCol("seed"))), names.map(Row(_)))

  test("reachProfile: exact reach, distance sum, eccentricity per seed") {
    val chain = edges(("a", "b"), ("b", "c"), ("c", "d"))
    val out = Graph.reachProfile(chain, "src", "dst",
      seedDf("a", "c", "d"), "seed", maxHops = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((2L, 3L, 2L))) // b at 1, c at 2 (d is 3 hops)
    assert(out("c") === ((1L, 1L, 1L)))
    assert(out("d") === ((0L, 0L, 0L))) // sink seeds still release a row
  }

  test("reachProfile counts each node once at its minimum distance") {
    val diamond = edges(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"))
    val out = Graph.reachProfile(diamond, "src", "dst",
      seedDf("a"), "seed", maxHops = 5).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ===
      ((3L, 4L, 2L))) // d reached once at hop 2 despite two paths
  }

  test("reachProfile refuses an unbudgeted seed sweep loudly") {
    val e = intercept[IllegalArgumentException] {
      Graph.reachProfile(edges(("a", "b")), "src", "dst",
        seedDf((1 to 5).map(i => s"s$i"): _*), "seed",
        maxHops = 2, maxSeeds = 3)
    }
    assert(e.getMessage.contains("maxSeeds"))
  }

  private val kvSchema = StructType(Seq(strCol("k"), longCol("pay")))
  private def side(ks: String*) =
    makeDf(kvSchema, ks.zipWithIndex.map { case (k, i) => Row(k, i.toLong) })

  test("joinHotKeys: exact per-key contribution and ppm share") {
    val out = Relational.joinHotKeys(
      side("x", "x", "x", "y"), side("x", "x", "y", "y", "y", "z"),
      Seq("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    // x: 3*2=6 of 9 total; y: 1*3=3; z never matches
    assert(out.toSeq === Seq(
      "x" -> ((3L, 2L, 6L, 666666L)),
      "y" -> ((1L, 3L, 3L, 333333L))))
  }

  test("joinHotKeys: topK truncates deterministically, NULL keys drop") {
    val l = makeDf(kvSchema, Seq(Row("a", 1L), Row("b", 1L), Row(null, 1L)))
    val r = makeDf(kvSchema, Seq(Row("a", 1L), Row("b", 1L), Row(null, 1L)))
    val out = Relational.joinHotKeys(l, r, Seq("k"), topK = 1)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "a") // tie 1*1 vs 1*1 -> key order
  }
}
