package graft.keyset

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class KeySetSpec extends SparkSpec {

  test("fromDict is the cross product of column domains") {
    val ks = KeySet.fromDict(Seq("a" -> Seq("x", "y"), "b" -> Seq(1, 2, 3)))
    assert(ks.columns === Seq("a", "b"))
    assert(ks.size(spark) === 6)
    val rows = ks.dataframe(spark).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("x", 1L), ("x", 2L), ("x", 3L), ("y", 1L), ("y", 2L), ("y", 3L)))
  }

  test("literal cross products below the cutoff fold driver-side") {
    // folding happens at materialize time (after the join/subtract
    // extraction rules have seen the factors): the physical plan must be a
    // single local relation, not a distributed cross join
    val ks = KeySet.fromColumn("a", 1 to 100) * KeySet.fromColumn("b", 1 to 100)
    assert(ks.size(spark) === 10000) // driver-side, no job
    val plan = ks.dataframe(spark).queryExecution.optimizedPlan
    assert(plan.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation] ||
      plan.children.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"expected locally folded literal cross, got:\n$plan")
    assert(ks.dataframe(spark).count() === 10000)
  }

  test("projection pushes through cross joins and prunes factors") {
    val ks = (KeySet.fromColumn("a", Seq(1, 2)) *
      KeySet.fromColumn("b", Seq("u", "v")) *
      KeySet.fromColumn("c", Seq(9, 10))).project(Seq("c", "a"))
    assert(ks.columns === Seq("c", "a"))
    assert(ks.size(spark) === 4)
  }

  test("union requires same columns; subtract removes matches") {
    val a = KeySet.fromColumn("k", Seq("p", "q", "r"))
    val b = KeySet.fromColumn("k", Seq("r", "s"))
    assert(a.union(b).size(spark) === 4)
    val sub = a.subtract(KeySet.fromColumn("k", Seq("q")))
    assert(sub.dataframe(spark).collect().map(_.getString(0)).toSet === Set("p", "r"))
    intercept[IllegalArgumentException] {
      a.union(KeySet.fromColumn("other", Seq("x")))
    }
  }

  test("join is a natural inner join with nulls equal") {
    val l = KeySet.fromTuples(Seq(Seq("x", 1L), Seq(null, 2L)),
      StructType(Seq(StructField("a", StringType), StructField("n", LongType))))
    val r = KeySet.fromTuples(Seq(Seq("x", "L"), Seq(null, "M")),
      StructType(Seq(StructField("a", StringType), StructField("tag", StringType))))
    val joined = l.join(r).dataframe(spark).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getString(2))).toSet
    assert(joined === Set(("x", 1L, "L"), (null, 2L, "M")))
  }

  test("fromTuples validates arity and types eagerly") {
    val schema = StructType(Seq(StructField("a", StringType), StructField("n", LongType)))
    intercept[IllegalArgumentException] { KeySet.fromTuples(Seq(Seq("x")), schema) }
    intercept[IllegalArgumentException] { KeySet.fromTuples(Seq(Seq(1L, 2L)), schema) }
    intercept[IllegalArgumentException] { KeySet.fromColumn("a", Seq(1.5)) }
    // ints normalize to longs
    assert(KeySet.fromTuples(Seq(Seq("x", 1)), schema).size(spark) === 1)
  }

  test("dataframe cache is keyed by session") {
    val ks = KeySet.fromColumn("a", Seq(1, 2, 3))
    val df1 = ks.dataframe(spark)
    assert(ks.dataframe(spark) eq df1) // same session: cached
    val spark2 = spark.newSession()
    val df2 = ks.dataframe(spark2)
    assert(!(df2 eq df1)) // different session: re-materialized
    assert(df2.count() === 3)
  }

  test("empty keyset is the single empty key") {
    assert(KeySet.empty.isEmptyKey)
    assert((KeySet.empty * KeySet.fromColumn("a", Seq(1))).columns === Seq("a"))
  }

  test("isEquivalent: same tree true, different types false, else undecided") {
    val a = KeySet.fromColumn("k", Seq("x", "y"))
    val b = KeySet.fromColumn("k", Seq("x", "y"))
    val c = KeySet.fromColumn("k", Seq(1, 2))
    val d = KeySet.fromColumn("k", Seq("y", "x")) // same set, different order
    assert(a.isEquivalent(b) === Some(true))
    assert(a.isEquivalent(c) === Some(false))
    assert(a.isEquivalent(d) === Some(true)) // literal row order is irrelevant
    // a dataframe-backed keyset with matching schema: undecidable without
    // materializing
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = makeDf(StructType(Seq(strCol("k"))), Seq(Row("x"), Row("y")))
    assert(a.isEquivalent(KeySet.fromDataFrame(df)) === None)
  }

  test("value equality mirrors the reference __eq__ doctest (_keyset.py:535)") {
    val ks1 = KeySet.fromDict(Seq("A" -> Seq(1, 2), "B" -> Seq(3, 4)))
    val ks2 = KeySet.fromDict(Seq("B" -> Seq(3, 4), "A" -> Seq(1, 2)))
    val ks3 = KeySet.fromDict(Seq("B" -> Seq(4, 3), "A" -> Seq(2, 1)))
    val ks4 = KeySet.fromDict(Seq("B" -> Seq(4, 5), "A" -> Seq(1, 2)))
    assert(ks1 === ks2) // column order irrelevant
    assert(ks1 === ks3) // row order irrelevant
    assert(ks1 !== ks4)
    assert(ks1 !== KeySet.fromColumn("A", Seq(1, 2))) // different columns
    // equal keysets hash equal (hash is schema-based, reference __hash__)
    assert(ks1.hashCode === ks2.hashCode)
    assert(ks1.hashCode === ks3.hashCode)
    // undecidable structurally -> falls back to a dataframe compare
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = makeDf(StructType(Seq(strCol("k"))), Seq(Row("x"), Row("y")))
    assert(KeySet.fromDataFrame(df) === KeySet.fromColumn("k", Seq("y", "x")))
    assert(KeySet.fromDataFrame(df) !== KeySet.fromColumn("k", Seq("x", "z")))
  }

  test("rewriter: canonical forms decide equivalence across construction order") {
    val a = KeySet.fromColumn("a", Seq(1, 2))
    val b = KeySet.fromColumn("b", Seq("u", "v"))
    val c = KeySet.fromColumn("c", Seq(7))
    // cross-join order is canonicalized (and literals folded driver-side)
    assert(((a * b) * c).isEquivalent(c * (b * a)) === Some(true))
    assert((a * b).columns === Seq("a", "b")) // user-visible order kept
    assert((b * a).columns === Seq("b", "a"))
    // nested unions are flattened and ordered
    val u1 = a.union(KeySet.fromColumn("a", Seq(3))).union(KeySet.fromColumn("a", Seq(4)))
    val u2 = KeySet.fromColumn("a", Seq(4)).union(KeySet.fromColumn("a", Seq(3)).union(a))
    assert(u1.isEquivalent(u2) === Some(true))
    // chained subtract order is canonicalized
    val ab = a * b
    val s1 = ab.subtract(KeySet.fromColumn("a", Seq(1))).subtract(KeySet.fromColumn("b", Seq("u")))
    val s2 = ab.subtract(KeySet.fromColumn("b", Seq("u"))).subtract(KeySet.fromColumn("a", Seq(1)))
    assert(s1.isEquivalent(s2) === Some(true))
  }

  test("rewriter preserves semantics on randomized op trees") {
    // model-based check: every randomly built tree must materialize to the
    // set a naive interpreter computes, regardless of what the rewriter
    // (factor pull-out, canonical ordering, projection pushdown) did to it
    val rnd = new scala.util.Random(20260812)
    val domains: Map[String, Seq[Any]] = Map(
      "a" -> Seq(0L, 1L, 2L, 3L), "b" -> Seq("x", "y", "z"), "c" -> Seq(0L, 1L))
    type Model = Set[Map[String, Any]]

    def leaf(c: String): (KeySet, Model) = {
      val dom = rnd.shuffle(domains(c)).take(1 + rnd.nextInt(domains(c).size))
      (KeySet.fromColumn(c, dom), dom.map(v => Map(c -> v)).toSet)
    }

    def gen(cols: List[String], depth: Int): (KeySet, Model) = cols match {
      case c :: Nil if depth <= 0 => leaf(c)
      case c :: Nil =>
        rnd.nextInt(3) match {
          case 0 => leaf(c)
          case 1 => // union of two subtrees on the same column
            val (k1, m1) = gen(cols, depth - 1); val (k2, m2) = gen(cols, depth - 1)
            (k1.union(k2), m1 ++ m2)
          case 2 => // subtract
            val (k1, m1) = gen(cols, depth - 1); val (k2, m2) = gen(cols, depth - 1)
            (k1.subtract(k2), m1 -- m2)
        }
      case _ if depth <= 0 =>
        // floor: cross of single-column leaves
        val parts = cols.map(c => leaf(c))
        parts.reduceLeft { (acc, p) =>
          (acc._1 * p._1, for (x <- acc._2; y <- p._2) yield x ++ y)
        }
      case _ =>
        rnd.nextInt(4) match {
          case 0 => // cross of a disjoint split
            val i = 1 + rnd.nextInt(cols.size - 1)
            val (l, r) = cols.splitAt(i)
            val (kl, ml) = gen(l, depth - 1); val (kr, mr) = gen(r, depth - 1)
            (kl * kr, for (x <- ml; y <- mr) yield x ++ y)
          case 1 => // join with overlap: left gets a prefix, right a suffix
            val i = 1 + rnd.nextInt(cols.size - 1)
            val l = cols.take(i + (if (i < cols.size) 1 else 0)).distinct
            val r = cols.drop(math.max(0, i - 1)).distinct
            val (kl, ml) = gen(l, depth - 1); val (kr, mr) = gen(r, depth - 1)
            val shared = l.intersect(r)
            (kl.join(kr),
              for {
                x <- ml; y <- mr
                if shared.forall(s => x(s) == y(s))
              } yield x ++ y)
          case 2 => // union on identical columns
            val (k1, m1) = gen(cols, depth - 1); val (k2, m2) = gen(cols, depth - 1)
            (k1.union(k2), m1 ++ m2)
          case 3 => // project from one extra column
            val extra = domains.keys.toSeq.diff(cols)
            if (extra.isEmpty) gen(cols, depth - 1)
            else {
              val (k, m) = gen(rnd.shuffle(cols :+ extra.head), depth - 1)
              (k.project(cols), m.map(row => row.view.filterKeys(cols.contains).toMap))
            }
        }
    }

    for (trial <- 1 to 15) {
      val cols = rnd.shuffle(domains.keys.toList).take(1 + rnd.nextInt(3))
      val (ks, model) = gen(cols, 2 + rnd.nextInt(2))
      val got: Model = ks.dataframe(spark).collect()
        .map(r => ks.columns.map(c => c -> r.get(r.fieldIndex(c))).toMap).toSet
      assert(got === model, s"trial $trial over $cols: tree ${ks.op}")
    }
  }

  test("rewriter: cross factors are pulled out of joins and subtracts") {
    import graft.keyset.KeySetOp._
    val a = KeySet.fromColumn("a", Seq(1, 2))
    val bc = KeySet.fromTuples(
      Seq(Seq(1L, "p"), Seq(2L, "q")),
      StructType(Seq(StructField("b", LongType), StructField("c", StringType))))
    val b = KeySet.fromColumn("b", Seq(1, 2))
    // Join((A x B), BC): A contributes nothing to the join on b -> the join
    // runs on B x BC only and A is crossed back in afterwards
    val j = (a * b).join(bc)
    def hasJoinUnder(op: KeySetOp): Boolean = op match {
      case Join(l, r)  => true
      case Cross(l, r) => hasJoinUnder(l) || hasJoinUnder(r)
      case _           => false
    }
    def joinNodes(op: KeySetOp): Seq[Join] = op match {
      case jn @ Join(l, r) => jn +: (joinNodes(l) ++ joinNodes(r))
      case Cross(l, r)     => joinNodes(l) ++ joinNodes(r)
      case Project(ch, _)  => joinNodes(ch)
      case _               => Nil
    }
    val inner = joinNodes(j.op)
    assert(inner.nonEmpty)
    // the factor with column 'a' must not appear under any join node
    assert(inner.forall(jn => !jn.columns.contains("a")))
    assert(j.columns.toSet === Set("a", "b", "c"))
    // results are unchanged
    val rows = j.dataframe(spark).collect()
      .map(r => (r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")),
        r.getString(r.fieldIndex("c")))).toSet
    assert(rows === Set((1L, 1L, "p"), (1L, 2L, "q"), (2L, 1L, "p"), (2L, 2L, "q")))

    // Subtract(Cross(A, B), A-part): the B factor is hoisted out
    val s = (a * b).subtract(KeySet.fromColumn("a", Seq(1)))
    val srows = s.dataframe(spark).collect()
      .map(r => (r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")))).toSet
    assert(srows === Set((2L, 1L), (2L, 2L)))
  }
}
