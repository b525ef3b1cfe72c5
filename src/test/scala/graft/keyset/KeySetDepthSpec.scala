package graft.keyset

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Depth suite mirroring the reference's per-operation keyset tables
  * (test/unit/keysets/test_keyset.py getitem/coercion/size/caching rows,
  * test_cross_join.py chained products, test_equivalence.py schema rows,
  * test_subtract.py / test_union.py / test_project.py semantics rows) —
  * behaviors not already pinned by KeySetSpec / KeySetValidationSpec.
  */
class KeySetDepthSpec extends SparkSpec {

  private def strings(ks: KeySet, col: String): Set[String] =
    ks.dataframe(spark).select(col).collect().map(_.getString(0)).toSet
  private def longs(ks: KeySet, col: String): Set[Long] =
    ks.dataframe(spark).select(col).collect().map(_.getLong(0)).toSet

  // ---- getitem / projection (test_getitem_single/multiple/list) ----------

  test("projecting one factor of a cross recovers exactly its domain") {
    val ks = KeySet.fromDict(Seq("a" -> Seq("x", "y"), "b" -> Seq(1, 2, 3)))
    val a = ks("a")
    assert(a.columns === Seq("a"))
    assert(a.size(spark) === 2)
    assert(strings(a, "a") === Set("x", "y"))
  }

  test("projecting multiple columns keeps their cross structure") {
    val ks = KeySet.fromDict(
      Seq("a" -> Seq("x", "y"), "b" -> Seq(1, 2), "c" -> Seq(10, 20)))
    val ab = ks("a", "b")
    assert(ab.columns.toSet === Set("a", "b"))
    assert(ab.size(spark) === 4)
  }

  test("projecting a non-cartesian keyset deduplicates the remaining tuples") {
    val ks = KeySet.fromTuples(
      Seq(Seq("x", 1L), Seq("x", 2L), Seq("y", 1L)),
      StructType(Seq(strCol("a"), longCol("b"))))
    val a = ks("a")
    assert(a.size(spark) === 2) // ("x" twice in the tuples) -> one key
    assert(strings(a, "a") === Set("x", "y"))
  }

  // ---- type coercion (test_type_coercion_from_dict/tuples/dataframe) -----

  test("integer-family values coerce to long across all constructors") {
    val fromDict = KeySet.fromDict(Seq("n" -> Seq(1, 2.asInstanceOf[Any])))
    assert(fromDict.schema("n").dataType === LongType)
    // fromTuples: VALUES coerce (Int boxes into a LongType schema), but a
    // non-canonical SCHEMA is rejected rather than silently widened
    val fromTuples = KeySet.fromTuples(Seq(Seq(1), Seq(2)),
      StructType(Seq(longCol("n"))))
    assert(fromTuples.schema("n").dataType === LongType)
    intercept[IllegalArgumentException] {
      KeySet.fromTuples(Seq(Seq(1)), StructType(Seq(StructField("n", IntegerType))))
    }
    // fromDataFrame coerces an int column upward like table ingestion
    val df = makeDf(StructType(Seq(StructField("n", IntegerType))),
      Seq(Row(1), Row(2)))
    val fromDf = KeySet.fromDataFrame(df)
    assert(fromDf.schema("n").dataType === LongType)
    // all three agree as VALUES, not just as schemas
    assert(fromDict === fromTuples)
    assert(fromTuples === fromDf)
  }

  // ---- filter (test_filter_str, test_filter_condition, test_filter_to_empty)

  test("filter composes with cross and projection") {
    val ks = KeySet.fromDict(Seq("a" -> Seq("x", "y"), "b" -> Seq(1, 2, 3)))
    val f = ks.filter("b > 1 AND a = 'x'")
    assert(f.columns === ks.columns)
    assert(f.size(spark) === 2)
    assert(longs(f("b"), "b") === Set(2L, 3L))
  }

  test("filter to an empty keyset keeps the schema and yields zero rows") {
    val ks = KeySet.fromColumn("n", Seq(1L, 2L))
    val empty = ks.filter("n > 100")
    assert(empty.columns === Seq("n"))
    assert(empty.size(spark) === 0)
    assert(empty.dataframe(spark).count() === 0)
  }

  // ---- size tables (test_size_from_dict / test_size_from_df) -------------

  test("size table: literal ops fold without a Spark job where possible") {
    assert(KeySet.fromColumn("a", Seq(1, 2, 3)).size(spark) === 3)
    // duplicates collapse before counting
    assert(KeySet.fromColumn("a", Seq(1, 1, 2)).size(spark) === 2)
    assert(KeySet.fromTuples(Seq(Seq("x", 1L), Seq("x", 1L), Seq("y", 2L)),
      StructType(Seq(strCol("a"), longCol("b")))).size(spark) === 2)
    assert((KeySet.fromColumn("a", 1 to 7) *
      KeySet.fromColumn("b", 1 to 11)).size(spark) === 77)
    assert(KeySet.empty.size(spark) === 1) // the single empty key
  }

  test("size table: algebra results count their materialized rows") {
    val a = KeySet.fromColumn("n", Seq(1L, 2L, 3L))
    val b = KeySet.fromColumn("n", Seq(3L, 4L))
    assert(a.union(b).size(spark) === 4)
    assert(a.subtract(b).size(spark) === 2)
    assert(a.join(b).size(spark) === 1)
  }

  // ---- chained cross joins (test_cross_join.py test_chained) --------------

  test("chained cross products multiply sizes and keep column order") {
    val ks = (1 to 4).map(i => KeySet.fromColumn(s"c$i", Seq(0L, 1L, 2L)))
      .reduce(_ * _)
    assert(ks.columns === Seq("c1", "c2", "c3", "c4"))
    assert(ks.size(spark) === 81)
    assert(ks.dataframe(spark).distinct().count() === 81)
  }

  test("cross with the empty keyset is the identity") {
    val a = KeySet.fromColumn("a", Seq(1L, 2L))
    assert((a * KeySet.empty) === a)
    assert((KeySet.empty * a) === a)
  }

  // ---- equivalence across schemas (test_equivalence_different_schemas) ---

  test("equivalence table: different columns or types decide false fast") {
    val a = KeySet.fromColumn("a", Seq(1L, 2L))
    assert(a.isEquivalent(KeySet.fromColumn("b", Seq(1L, 2L))) === Some(false))
    assert(a.isEquivalent(KeySet.fromColumn("a", Seq("1", "2"))) === Some(false))
    // same single column, same values, different constructor: still decided
    assert(a.isEquivalent(KeySet.fromDict(Seq("a" -> Seq(1L, 2L)))) === Some(true))
  }

  test("equivalence survives algebra applied in different orders") {
    val a = KeySet.fromColumn("a", Seq(1L, 2L, 3L))
    val b = KeySet.fromColumn("b", Seq("x", "y"))
    val left = (a * b).filter("a < 3")
    val right = (a.filter("a < 3")) * b
    // both plans materialize to the same keys
    assert(left === right)
  }

  // ---- from_dataframe rows (test_from_dataframe_nonunique / _with_null) --

  test("fromDataFrame deduplicates and keeps null keys") {
    val df = makeDf(StructType(Seq(strCol("k"))),
      Seq(Row("x"), Row("x"), Row(null), Row(null)))
    val ks = KeySet.fromDataFrame(df)
    assert(ks.size(spark) === 2)
    val vals = ks.dataframe(spark).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSet
    assert(vals === Set("x", null))
  }

  test("fromDataFrame drops no extra columns silently: schema is the input's") {
    val df = makeDf(StructType(Seq(strCol("k"), longCol("n"))),
      Seq(Row("x", 1L), Row("y", 2L)))
    val ks = KeySet.fromDataFrame(df)
    assert(ks.columns === Seq("k", "n"))
  }

  // ---- caching (test_caching) ---------------------------------------------

  test("cache pins the materialized dataframe; uncache releases it") {
    val ks = KeySet.fromColumn("a", Seq(1L, 2L)) *
      KeySet.fromColumn("b", Seq("x", "y"))
    ks.cache(spark)
    val df1 = ks.dataframe(spark)
    assert(df1.storageLevel.useMemory, "cached keyset should be persisted")
    assert(ks.dataframe(spark) eq df1) // same instance while cached
    ks.uncache()
    assert(!df1.storageLevel.useMemory)
  }
}
