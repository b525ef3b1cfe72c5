package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Fixed-point PageRank: bit-equality against a pure-Scala integer model,
  * ranking sanity, partition invariance, and guards.
  */
class GraphSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("src"), strCol("dst")))

  private def df(edges: Seq[(String, String)]) =
    makeDf(schema, edges.map { case (a, b) => Row(a, b) })

  /** The identical integer recurrence, sequentially. */
  private def model(edges: Seq[(String, String)], iters: Int,
      num: Long = 85L, den: Long = 100L,
      scale: Long = 1000000000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale / nodes.size
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += r(s) / outdeg(s)
      r = nodes.map(n =>
        n -> (((den - num) * base) / den + (num * in(n)) / den)).toMap
    }
    r
  }

  test("pageRank equals the integer model BIT FOR BIT on a hand graph") {
    // two triangles bridged by one edge, plus a dangling sink
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "a",
      "x" -> "y", "y" -> "z", "z" -> "x",
      "c" -> "x", "z" -> "sink")
    val out = Graph.pageRank(df(edges), "src", "dst", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === model(edges, 5))
  }

  test("hub of a star out-ranks the leaves; ranks are non-negative") {
    val edges = (1 to 8).flatMap(i => Seq(s"leaf$i" -> "hub", "hub" -> s"leaf$i"))
    val out = Graph.pageRank(df(edges), "src", "dst", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("hub") > out("leaf1"))
    assert(out.values.forall(_ >= 0L))
    // leaves are symmetric: identical ranks (exact arithmetic, no noise)
    assert((1 to 8).map(i => out(s"leaf$i")).distinct.size === 1)
  }

  test("pageRank matches the model on random graphs and is " +
      "partition-invariant") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(20)
      val edges = Seq.fill(80 + rnd.nextInt(60))(
        ("v" + rnd.nextInt(n), "v" + rnd.nextInt(n)))
        .filter(e => e._1 != e._2).distinct
      val expected = model(edges, 4)
      def run(parts: Int) = Graph.pageRank(
        df(edges).repartition(parts), "src", "dst", iterations = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(run(1) === expected, s"trial $trial")
      assert(run(13) === expected, s"trial $trial, 13 partitions")
    }
  }

  test("bfsDistances: hand-computed levels on a branching graph; " +
      "unreached nodes absent; early stop on exhausted frontier") {
    // a -> b -> c -> d, a -> c (shortcut), isolated island x -> y
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c", "x" -> "y")
    val seeds = makeDf(StructType(Seq(strCol("n"))), Seq(Row("a")))
    val out = Graph.bfsDistances(df(edges), "src", "dst", seeds, "n", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // c via the shortcut at hop 1, d at hop 2; x/y unreached
    assert(out === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("bfsDistances: maxHops truncates; multi-seed takes the min; " +
      "cycles terminate") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d", "d" -> "e")
    val seeds = makeDf(StructType(Seq(strCol("n"))), Seq(Row("a"), Row("d")))
    val out = Graph.bfsDistances(df(edges), "src", "dst", seeds, "n", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // d is a seed (0), so e = 1; c = 2 from a; nothing past hop 2
    assert(out === Map("a" -> 0L, "d" -> 0L, "b" -> 1L, "e" -> 1L, "c" -> 2L))
  }

  test("bfsDistances matches a sequential BFS model on random graphs, " +
      "partition-invariant") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 25 + rnd.nextInt(15)
      val edges = Seq.fill(70 + rnd.nextInt(60))(
        ("v" + rnd.nextInt(n), "v" + rnd.nextInt(n))).distinct
      val seedIds = Seq("v0", "v1")
      val maxHops = 3
      // sequential BFS
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val dist = scala.collection.mutable.Map(seedIds.map(_ -> 0L): _*)
      var frontier = seedIds.toSet
      for (hop <- 1L to maxHops) {
        frontier = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(dist.contains)
        frontier.foreach(dist(_) = hop)
      }
      val seeds = makeDf(StructType(Seq(strCol("n"))), seedIds.map(Row(_)))
      def run(parts: Int) = Graph.bfsDistances(
        df(edges).repartition(parts), "src", "dst", seeds, "n", maxHops)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(run(1) === dist.toMap, s"trial $trial")
      assert(run(11) === dist.toMap, s"trial $trial, 11 partitions")
    }
  }

  test("personalizedPageRank: teleport lands only on seeds; matches an " +
      "integer model; seeds outside the graph are ignored") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    def seedDf(ids: String*) =
      makeDf(StructType(Seq(strCol("n"))), ids.map(Row(_)))
    // model with per-node base: scale div |seeds| on seeds, else 0
    def model(seedIds: Set[String], iters: Int): Map[String, Long] = {
      val scale = 1000000000000L
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val base = nodes.map(n =>
        n -> (if (seedIds(n)) scale / seedIds.size else 0L)).toMap
      var r = base
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for ((s, d) <- edges) in(d) += r(s) / outdeg(s)
        r = nodes.map(n => n -> ((15L * base(n)) / 100L + (85L * in(n)) / 100L)).toMap
      }
      r
    }
    val out = Graph.personalizedPageRank(
      df(edges), "src", "dst", seedDf("a", "zz-not-in-graph"), "n",
      iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === model(Set("a"), 4)) // the off-graph seed never counted
    // mass concentrates near the seed: a and its successor b outrank d
    assert(out("a") > out("d") && out("b") > out("d"))
  }

  test("bipartiteProject: hand-computed co-occurrence weights, support " +
      "floor, and the hub cap") {
    val schema2 = StructType(Seq(strCol("shared"), strCol("p")))
    val inc = makeDf(schema2, Seq(
      // order o1 has suppliers a,b,c; o2 has a,b; o3 has a,b; hub has all
      Row("o1", "a"), Row("o1", "b"), Row("o1", "c"),
      Row("o2", "a"), Row("o2", "b"),
      Row("o3", "a"), Row("o3", "b"), Row("o3", "b"), // dup collapses
      Row("hub", "a"), Row("hub", "b"), Row("hub", "c"), Row("hub", "d")))
    val out = Graph.bipartiteProject(inc, "shared", "p")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out === Map(("a", "b") -> 4L, ("a", "c") -> 2L, ("b", "c") -> 2L,
      ("a", "d") -> 1L, ("b", "d") -> 1L, ("c", "d") -> 1L))
    val floored = Graph.bipartiteProject(inc, "shared", "p", minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(floored === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // capping shared-degree at 3 drops the hub order entirely
    val capped = Graph.bipartiteProject(inc, "shared", "p",
      maxSharedDegree = Some(3L))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(capped === Map(("a", "b") -> 3L, ("a", "c") -> 1L, ("b", "c") -> 1L))
    intercept[IllegalArgumentException] {
      Graph.bipartiteProject(inc, "shared", "p", minShared = 0L)
    }
  }

  test("triangleCounts: hand graph — K4 gives 3 per node; direction, " +
      "duplicates, and self-loops normalize away") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d",
      // noise: reversed duplicate, exact duplicate, self-loop
      "b" -> "a", "c" -> "d", "a" -> "a")
    val out = Graph.triangleCounts(df(k4), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // a path has no triangles: empty result, not zero rows per node
    assert(Graph.triangleCounts(
      df(Seq("a" -> "b", "b" -> "c")), "src", "dst").count() === 0L)
  }

  test("triangleCounts matches a brute-force model on random graphs " +
      "(including a hub-skewed one), partition-invariant") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 15 + rnd.nextInt(10)
      val base = Seq.fill(60 + rnd.nextInt(40))(
        ("v" + rnd.nextInt(n), "v" + rnd.nextInt(n)))
      // trial 3 adds a hub touching every node — the degree-ordering
      // worst case the orientation is there to tame
      val edges = (if (trial == 3) base ++ (0 until n).map(i => ("hub", s"v$i"))
        else base).filter(e => e._1 != e._2)
      val und = edges.map { case (x, y) =>
        if (x < y) (x, y) else (y, x)
      }.distinct
      val undSet = und.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expected = (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        k <- (j + 1) until nodes.size
        a = nodes(i); b = nodes(j); c = nodes(k)
        if undSet((a, b)) && undSet((a, c)) && undSet((b, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def run(parts: Int) = Graph.triangleCounts(
        df(edges).repartition(parts), "src", "dst")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(run(1) === expected, s"trial $trial")
      assert(run(13) === expected, s"trial $trial, 13 partitions")
    }
  }

  test("bfsDistances: 20-level path graph settles every level exactly " +
      "(deep-hop accumulation, early-exit at the end of the path)") {
    // v0 -> v1 -> ... -> v19: one node per level, the worst case for the
    // per-round settled-set accumulation
    val edges = (0 until 19).map(i => s"v$i" -> s"v${i + 1}")
    val seeds = makeDf(StructType(Seq(strCol("n"))), Seq(Row("v0")))
    val out = Graph.bfsDistances(df(edges), "src", "dst", seeds, "n", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = (0 until 20).map(i => s"v$i" -> i.toLong).toMap
    assert(out === expected)
  }

  test("personalizedPageRank fails loudly when no seed is in the graph " +
      "(never silently all-zero ranks)") {
    val seeds = makeDf(StructType(Seq(strCol("n"))), Seq(Row("zz-absent")))
    val e = intercept[Exception] {
      Graph.personalizedPageRank(
        df(Seq("a" -> "b", "b" -> "a")), "src", "dst", seeds, "n",
        iterations = 1).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("no seed node"))
  }

  private val wSchema =
    StructType(Seq(strCol("src"), strCol("dst"), longCol("w")))

  private def wdf(edges: Seq[(String, String, Long)]) =
    makeDf(wSchema, edges.map { case (a, b, w) => Row(a, b, w) })

  /** The weighted recurrence, sequentially: c(u->v) = (r*w) / sum_w(u). */
  private def wModel(edges: Seq[(String, String, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = scale / nodes.size
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, d, w) <- edges) in(d) += (r(s) * w) / outW(s)
      r = nodes.map(n => n -> ((15L * base) / 100L + (85L * in(n)) / 100L)).toMap
    }
    r
  }

  test("pageRankWeighted equals the weighted integer model bit for bit; " +
      "heavier edges carry more mass") {
    // a splits 9:1 between b and c; both feed back to a
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L))
    val out = Graph.pageRankWeighted(wdf(edges), "src", "dst", "w",
      iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === wModel(edges, 4))
    assert(out("b") > out("c")) // the 9x edge dominates
  }

  test("pageRankWeighted with unit weights is bit-identical to pageRank; " +
      "partition-invariant on random weighted graphs") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 2) {
      val n = 12 + rnd.nextInt(8)
      val edges = Seq.fill(40 + rnd.nextInt(30))(
        ("v" + rnd.nextInt(n), "v" + rnd.nextInt(n))).distinct
      val unit = edges.map { case (s, d) => (s, d, 1L) }
      def byNode(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = byNode(Graph.pageRank(df(edges), "src", "dst", iterations = 3))
      val weighted = byNode(Graph.pageRankWeighted(
        wdf(unit), "src", "dst", "w", iterations = 3))
      assert(plain === weighted, s"trial $trial")
      val rw = edges.map { case (s, d) => (s, d, 1L + rnd.nextInt(7).toLong) }
      val expect = wModel(rw, 3)
      assert(byNode(Graph.pageRankWeighted(
        wdf(rw).repartition(13), "src", "dst", "w", iterations = 3)) === expect,
        s"trial $trial, 13 partitions")
    }
  }

  test("personalizedPageRankWeighted: seeded base + proportional split " +
      "matches a sequential integer model") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 2L), ("c", "a", 2L), ("b", "c", 2L))
    val seedIds = Set("a")
    def model(iters: Int): Map[String, Long] = {
      val scale = 1000000000000L
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val base = nodes.map(n =>
        n -> (if (seedIds(n)) scale / seedIds.size else 0L)).toMap
      var r = base
      for (_ <- 1 to iters) {
        val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for ((s, d, w) <- edges) in(d) += (r(s) * w) / outW(s)
        r = nodes.map(n =>
          n -> ((15L * base(n)) / 100L + (85L * in(n)) / 100L)).toMap
      }
      r
    }
    val seeds = makeDf(StructType(Seq(strCol("n"))), Seq(Row("a")))
    val out = Graph.personalizedPageRankWeighted(
      wdf(edges), "src", "dst", "w", seeds, "n", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === model(3))
    // the 3x-weighted successor out-collects the 1x one
    assert(out("b") > out("c"))
  }

  test("pageRankWeighted: null-weight rows drop; non-positive weights " +
      "fail loudly") {
    val out = Graph.pageRankWeighted(
      wdf(Seq(("a", "b", 1L))).unionByName(
        makeDf(wSchema, Seq(Row("x", "y", null)))),
      "src", "dst", "w", iterations = 1)
      .collect().map(_.getString(0)).toSet
    assert(out === Set("a", "b")) // the null-weight edge contributed nothing
    val e = intercept[Exception] {
      Graph.pageRankWeighted(wdf(Seq(("a", "b", 0L))), "src", "dst", "w",
        iterations = 1).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("non-positive weight"))
  }

  test("null endpoints drop; guards reject bad parameters") {
    val messy = makeDf(schema, Seq(Row("a", "b"), Row(null, "b"), Row("a", null)))
    val out = Graph.pageRank(messy, "src", "dst", iterations = 1)
      .collect().map(_.getString(0)).toSet
    assert(out === Set("a", "b"))
    intercept[IllegalArgumentException] {
      Graph.pageRank(df(Seq("a" -> "b")), "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df(Seq("a" -> "b")), "src", "dst",
        dampingNum = 101L, dampingDen = 100L)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df(Seq("a" -> "b")), "nope", "dst")
    }
  }

  /** Synchronous deterministic LPA model: min label among the most
    * frequent neighbor labels, all nodes updating simultaneously.
    */
  private def lpaModel(
      edges: Seq[(String, String)], iters: Int): Map[String, String] = {
    val und = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lab = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (v, nbs) =>
        val freq = nbs.map(lab).groupBy(identity).map {
          case (l, xs) => l -> xs.size
        }
        v -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation: two cliques joined by a bridge separate into " +
      "two communities; matches the synchronous min-tie model on random " +
      "graphs under any partitioning; ties break to the smallest label") {
    // cliques {a1,a2,a3} and {b1,b2,b3} with one bridge a3-b1
    val cliques = Seq("a1" -> "a2", "a1" -> "a3", "a2" -> "a3",
      "b1" -> "b2", "b1" -> "b3", "b2" -> "b3", "a3" -> "b1")
    val got = Graph.labelPropagation(df(cliques), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === lpaModel(cliques, 3))
    assert(got("a1") === got("a2"), "clique A must agree")
    assert(got("b2") === got("b3"), "clique B must agree")
    // random graphs, several iteration depths and partitionings
    val rng = new scala.util.Random(41)
    val rand = Seq.fill(120)(
      (s"n${rng.nextInt(25)}", s"n${rng.nextInt(25)}"))
      .filter(e => e._1 != e._2)
    for (iters <- Seq(1, 2, 4); parts <- Seq(1, 7)) {
      val g = Graph.labelPropagation(
        df(rand).repartition(parts), "src", "dst", iters)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(g === lpaModel(rand, iters), s"iters=$iters parts=$parts")
    }
    intercept[IllegalArgumentException](
      Graph.labelPropagation(df(cliques), "src", "dst", 0))
  }

  test("assumeCanonical (r14): labelPropagation and kCore release " +
      "IDENTICAL results with and without the symmetrize distinct when " +
      "the input really is distinct one-orientation pairs") {
    // random canonical pair list: distinct, src < dst by construction
    val rng = new scala.util.Random(97)
    val canon = Seq.fill(150)((s"n${rng.nextInt(30)}", s"n${rng.nextInt(30)}"))
      .filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap)
      .distinct
    val lpaDefault = Graph.labelPropagation(df(canon), "src", "dst", 3)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val lpaCanon = Graph.labelPropagation(df(canon), "src", "dst", 3,
      assumeCanonical = true)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(lpaCanon === lpaDefault)
    val kcDefault = Graph.kCore(df(canon), "src", "dst", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val kcCanon = Graph.kCore(df(canon), "src", "dst", k = 3,
      assumeCanonical = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(kcCanon === kcDefault)
  }
}
