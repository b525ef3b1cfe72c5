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
    val ks = KeySet.fromColumn("a", 1 to 100) * KeySet.fromColumn("b", 1 to 100)
    ks.op match {
      case KeySetOp.FromTuples(rows, _) => assert(rows.size === 10000)
      case other => fail(s"expected folded literal, got $other")
    }
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
    val d = KeySet.fromColumn("k", Seq("y", "x")) // same set, different tree
    assert(a.isEquivalent(b) === Some(true))
    assert(a.isEquivalent(c) === Some(false))
    assert(a.isEquivalent(d) === None)
  }
}
