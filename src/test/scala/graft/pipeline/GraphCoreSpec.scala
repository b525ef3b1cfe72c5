package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** kCore peeling and frontier-limited weighted SSSP: exact hand-graph
  * results, bounded-round semantics, partition invariance, and guards.
  */
class GraphCoreSpec extends SparkSpec {

  private val eSchema = StructType(Seq(strCol("src"), strCol("dst")))
  private def edges(es: Seq[(String, String)]) =
    makeDf(eSchema, es.map { case (a, b) => Row(a, b) })

  private val wSchema =
    StructType(Seq(strCol("src"), strCol("dst"), longCol("w")))
  private def wedges(es: Seq[(String, String, Long)]) =
    makeDf(wSchema, es.map { case (a, b, w) => Row(a, b, w) })

  private val sSchema = StructType(Seq(strCol("seed")))
  private def seeds(ss: Seq[String]) = makeDf(sSchema, ss.map(Row(_)))

  // triangle a-b-c with a tail c-d-e: the 2-core is the triangle, and
  // reaching it needs a CASCADE (e's removal exposes d)
  private val tailed = Seq("a" -> "b", "b" -> "c", "c" -> "a",
    "c" -> "d", "d" -> "e")

  test("kCore peels a tail in cascading rounds down to the triangle") {
    val out = Graph.kCore(edges(tailed), "src", "dst", k = 2, maxRounds = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kCore maxRounds bounds the peel: one round leaves the exposed tail") {
    val out = Graph.kCore(edges(tailed), "src", "dst", k = 2, maxRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 1 removes only e (deg 1); d survives with its now-sub-k degree
    assert(out === Map("a" -> 2L, "b" -> 2L, "c" -> 3L, "d" -> 1L))
  }

  test("kCore symmetrizes, dedups reversed edges, drops self-loops") {
    val out = Graph.kCore(
      edges(Seq("a" -> "b", "b" -> "a", "a" -> "a")), "src", "dst",
      k = 1, maxRounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 1L, "b" -> 1L))
  }

  test("kCore is partition-invariant") {
    val once = Graph.kCore(edges(tailed), "src", "dst", 2, 8)
      .collect().toSet
    val many = Graph.kCore(edges(tailed).repartition(7), "src", "dst", 2, 8)
      .collect().toSet
    assert(once === many)
  }

  test("kCore guards: k and maxRounds ranges, missing columns") {
    intercept[IllegalArgumentException] {
      Graph.kCore(edges(tailed), "src", "dst", k = 0, maxRounds = 4)
    }
    intercept[IllegalArgumentException] {
      Graph.kCore(edges(tailed), "src", "dst", k = 2, maxRounds = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.kCore(edges(tailed), "nope", "dst", k = 2, maxRounds = 4)
    }
  }

  test("ssspWeighted finds the cheaper two-hop path over the direct edge") {
    val e = wedges(Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L)))
    val out = Graph.ssspWeighted(e, "src", "dst", "w", seeds(Seq("a")),
      "seed", maxRounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("ssspWeighted with one round releases the <=1-hop distances") {
    val e = wedges(Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L)))
    val out = Graph.ssspWeighted(e, "src", "dst", "w", seeds(Seq("a")),
      "seed", maxRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 0L, "b" -> 1L, "c" -> 5L))
  }

  test("ssspWeighted: multi-edges take the min; unreachable nodes absent") {
    val e = wedges(Seq(("a", "b", 3L), ("a", "b", 1L), ("x", "y", 1L)))
    val out = Graph.ssspWeighted(e, "src", "dst", "w", seeds(Seq("a")),
      "seed", maxRounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 0L, "b" -> 1L))
  }

  test("ssspWeighted matches a sequential Dijkstra on a random graph") {
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 24).map(i => s"n$i")
    val es = (0 until 120).map { _ =>
      (nodes(rnd.nextInt(24)), nodes(rnd.nextInt(24)),
        (rnd.nextInt(9) + 1).toLong)
    }.filter { case (a, b, _) => a != b }
    // sequential reference: plain Dijkstra (maxRounds=24 >= any hop count)
    val adj = es.groupBy(_._1)
    val dist = scala.collection.mutable.Map("n0" -> 0L)
    val pq = scala.collection.mutable.PriorityQueue(
      (0L, "n0"))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (dcur, u) = pq.dequeue()
      if (dist(u) == dcur)
        for ((_, v, w) <- adj.getOrElse(u, Nil))
          if (dist.get(v).forall(_ > dcur + w)) {
            dist(v) = dcur + w; pq.enqueue((dcur + w, v))
          }
    }
    val out = Graph.ssspWeighted(wedges(es), "src", "dst", "w",
      seeds(Seq("n0")), "seed", maxRounds = 24)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === dist.toMap)
  }

  test("ssspWeighted fails loudly on a non-positive weight") {
    val e = wedges(Seq(("a", "b", 0L)))
    val ex = intercept[Exception] {
      Graph.ssspWeighted(e, "src", "dst", "w", seeds(Seq("a")), "seed", 4)
        .collect()
    }
    assert(ex.getMessage.contains("non-positive weight"))
  }

  // K4 on {a,b,c,d} plus a triangle {c,d,x} hanging off one edge and a
  // pendant p: the 4-truss is exactly K4 (x's edges have support 1 and
  // peel, after which c-d still closes 2 triangles inside K4)
  private val trussy = Seq(
    "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d",
    "c" -> "x", "d" -> "x", "d" -> "p")

  test("kTruss peels to K4; support is measured inside the truss") {
    val out = Graph.kTruss(edges(trussy), "src", "dst", k = 4, maxRounds = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("a", "b") -> 2L, ("a", "c") -> 2L, ("a", "d") -> 2L,
      ("b", "c") -> 2L, ("b", "d") -> 2L, ("c", "d") -> 2L))
  }

  test("kTruss maxRounds bounds the peel; released support is re-measured") {
    // two triangles sharing edge b-c: supports 2 (b-c) and 1 (the rest);
    // k=4 round 1 keeps only b-c, whose support in the REMAINING graph
    // is 0 — one round stops there, a second peels it to empty
    val tri2 = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d", "c" -> "d")
    val one = Graph.kTruss(edges(tri2), "src", "dst", k = 4, maxRounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(one.toSeq === Seq(("b", "c", 0L)))
    val full = Graph.kTruss(edges(tri2), "src", "dst", k = 4, maxRounds = 8)
    assert(full.count() === 0L)
  }

  test("kTruss canonicalizes reversed/duplicate edges and is " +
      "partition-invariant") {
    val messy = edges(trussy ++ trussy.map(_.swap))
    val a = Graph.kTruss(messy, "src", "dst", 4, 8).collect().toSet
    val b = Graph.kTruss(messy.repartition(7), "src", "dst", 4, 8)
      .collect().toSet
    assert(a === b && a.size === 6)
  }

  test("kTruss guards: k range and the loud hub refusal") {
    intercept[IllegalArgumentException] {
      Graph.kTruss(edges(trussy), "src", "dst", k = 2, maxRounds = 4)
    }
    val hub = (1 to 30).map(i => "hub" -> s"n$i")
    val ex = intercept[IllegalArgumentException] {
      Graph.kTruss(edges(hub), "src", "dst", k = 3, maxRounds = 4,
        maxDegree = 10L)
    }
    assert(ex.getMessage.contains("maxDegree"))
  }

  test("ssspWeighted is partition-invariant") {
    val es = Seq(("a", "b", 2L), ("b", "c", 2L), ("a", "c", 3L),
      ("c", "d", 1L), ("b", "d", 9L))
    val once = Graph.ssspWeighted(wedges(es), "src", "dst", "w",
      seeds(Seq("a")), "seed", 8).collect().toSet
    val many = Graph.ssspWeighted(wedges(es).repartition(5), "src", "dst",
      "w", seeds(Seq("a")), "seed", 8).collect().toSet
    assert(once === many)
  }
}
