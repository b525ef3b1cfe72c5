package graft.keyset

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** KeySet construction, typing, and algebra edge cases mirroring the
  * reference's unit suites (test/unit/keysets/test_keyset.py,
  * test_product_keyset.py): friendly construction-time errors, type
  * coercion to the canonical key types, null keys, filter semantics, and
  * size arithmetic — all decided without touching Spark where possible.
  */
class KeySetValidationSpec extends SparkSpec {

  // ------------------------------------------------------ construction errors

  test("empty value collections cannot infer a type (reference error)") {
    val e = intercept[IllegalArgumentException] { KeySet.fromColumn("A", Nil) }
    assert(e.getMessage.contains("empty collection"))
    intercept[IllegalArgumentException] { KeySet.fromDict(Seq("A" -> Nil)) }
  }

  test("floating-point and timestamp key columns are rejected everywhere") {
    intercept[IllegalArgumentException] { KeySet.fromColumn("A", Seq(3.1)) }
    intercept[IllegalArgumentException] { KeySet.fromColumn("A", Seq(1.0f)) }
    intercept[IllegalArgumentException] {
      KeySet.fromColumn("A", Seq(Timestamp.valueOf("2020-01-01 00:00:00")))
    }
    // mixed dict: the bad column is named
    val e = intercept[IllegalArgumentException] {
      KeySet.fromDict(Seq("A" -> Seq(1L), "B" -> Seq(2.5)))
    }
    assert(e.getMessage.contains("B"))
    // explicit schemas are validated the same way
    intercept[IllegalArgumentException] {
      KeySet.fromTuples(Seq(Seq(1.5)), StructType(Seq(StructField("A", DoubleType))))
    }
    intercept[IllegalArgumentException] {
      KeySet.fromTuples(Seq.empty,
        StructType(Seq(StructField("A", TimestampType))))
    }
    // and dataframe ingestion rejects non-keyable columns by name
    val e2 = intercept[IllegalArgumentException] {
      KeySet.fromDataFrame(makeDf(StructType(Seq(dblCol("A"))), Seq(Row(3.1))))
    }
    assert(e2.getMessage.contains("A"))
  }

  test("fromTuples validates arity and value classes against the schema") {
    val schema = StructType(Seq(longCol("A"), strCol("B")))
    intercept[IllegalArgumentException] {
      KeySet.fromTuples(Seq(Seq(1L)), schema) // arity
    }
    intercept[IllegalArgumentException] {
      KeySet.fromTuples(Seq(Seq("not a long", "b")), schema) // class
    }
  }

  // ------------------------------------------------------------ type coercion

  test("integer-family values coerce to LongType; dates stay dates") {
    assert(KeySet.fromColumn("A", Seq(1, 2)).schema.head.dataType === LongType)
    assert(KeySet.fromColumn("A", Seq(1.toShort)).schema.head.dataType === LongType)
    assert(KeySet.fromColumn("A", Seq(Date.valueOf("2020-01-01")))
      .schema.head.dataType === DateType)
    // int dataframe columns upcast to long on ingestion
    val ks = KeySet.fromDataFrame(makeDf(
      StructType(Seq(StructField("A", IntegerType))), Seq(Row(7))))
    assert(ks.schema.head.dataType === LongType)
  }

  test("nulls are legal key values in every constructor") {
    assert(KeySet.fromColumn("A", Seq("x", null)).size(spark) === 2L)
    assert(KeySet.fromTuples(
      Seq(Seq(null, null), Seq(42L, "foo")),
      StructType(Seq(longCol("A"), strCol("B")))).size(spark) === 2L)
    val df = makeDf(StructType(Seq(strCol("A"))), Seq(Row(null), Row("x")))
    assert(KeySet.fromDataFrame(df).size(spark) === 2L)
  }

  test("duplicate tuples and dataframe rows deduplicate on construction") {
    assert(KeySet.fromColumn("A", Seq("x", "x", "y")).size(spark) === 2L)
    val df = makeDf(StructType(Seq(strCol("A"))), Seq(Row("x"), Row("x")))
    assert(KeySet.fromDataFrame(df).size(spark) === 1L)
  }

  // ------------------------------------------------------------------- filter

  test("filter keeps schema, drops rows, and may produce an empty keyset") {
    val ks = KeySet.fromDict(Seq("A" -> Seq("abc", "def", "ghi"), "B" -> Seq(0L, 100L)))
    val f = ks.filter("B > 0")
    assert(f.columns === Seq("A", "B"))
    assert(f.size(spark) === 3L)
    // a no-op filter keeps everything
    assert(ks.filter("A != 'string that is not there'").size(spark) === 6L)
    // filter to empty is legal
    assert(KeySet.fromColumn("A", Seq(-1L, -2L, -3L)).filter("A > 0").size(spark) === 0L)
    // SQL-expression filters work on projected products too
    assert(ks.filter("length(A) > 3").size(spark) === 0L)
  }

  // ---------------------------------------------------------------- projection

  test("join-column type mismatches and duplicate projections fail eagerly " +
      "(reference test_join.py / test_project.py invalid cases)") {
    val longs = KeySet.fromColumn("A", Seq(1L, 2L))
    val strs = KeySet.fromDict(Seq("A" -> Seq("x"), "B" -> Seq("y")))
    val e = intercept[IllegalArgumentException] { longs.join(strs) }
    assert(e.getMessage.contains("A") && e.getMessage.contains("type"))
    val dup = intercept[IllegalArgumentException] { strs.project(Seq("A", "A")) }
    assert(dup.getMessage.toLowerCase.contains("duplicate"))
    // a detect leaf (NullType placeholder) still joins against anything
    KeySet.detect("A").join(longs)
  }

  test("projection selects columns, deduplicates, and validates names") {
    val ks = KeySet.fromDict(Seq("A" -> Seq("x", "y"), "B" -> Seq(0L, 1L)))
    assert(ks("A").columns === Seq("A"))
    assert(ks("A").size(spark) === 2L)
    assert(ks("A", "B").size(spark) === 4L)
    intercept[Exception] { ks("ghost").dataframe(spark) }
  }

  // ------------------------------------------------------------------ algebra

  test("cross-product size multiplies; factors must be disjoint") {
    val a = KeySet.fromColumn("A", Seq("x", "y"))
    val b = KeySet.fromColumn("B", (0L until 5L))
    assert((a * b).size(spark) === 10L)
    intercept[IllegalArgumentException] { a * KeySet.fromColumn("A", Seq("z")) }
    // three-way products stay exact
    val c = KeySet.fromColumn("C", Seq(1L, 2L, 3L))
    assert((a * b * c).size(spark) === 30L)
  }

  test("join on shared columns behaves as a natural inner join") {
    val ab = KeySet.fromTuples(
      Seq(Seq("x", 0L), Seq("x", 1L), Seq("y", 0L)),
      StructType(Seq(strCol("A"), longCol("B"))))
    val bc = KeySet.fromTuples(
      Seq(Seq(0L, "c0"), Seq(1L, "c1")),
      StructType(Seq(longCol("B"), strCol("C"))))
    val j = ab.join(bc)
    assert(j.columns.toSet === Set("A", "B", "C"))
    assert(j.size(spark) === 3L)
    // join with no shared columns is rejected (use * for cross products)
    intercept[IllegalArgumentException] {
      KeySet.fromColumn("A", Seq("x")).join(KeySet.fromColumn("Z", Seq("z")))
    }
  }

  test("union and subtract require identical column sets") {
    val a = KeySet.fromColumn("A", Seq("x", "y"))
    intercept[IllegalArgumentException] { a.union(KeySet.fromColumn("B", Seq("z"))) }
    assert(a.union(KeySet.fromColumn("A", Seq("y", "z"))).size(spark) === 3L)
    assert(a.subtract(KeySet.fromColumn("A", Seq("y"))).size(spark) === 1L)
    // subtracting on a column subset removes every matching combination
    val ab = KeySet.fromDict(Seq("A" -> Seq("x", "y"), "B" -> Seq(0L, 1L)))
    assert(ab.subtract(KeySet.fromColumn("A", Seq("x"))).size(spark) === 2L)
  }

  test("null keys join and subtract null-safely") {
    val withNull = KeySet.fromColumn("A", Seq("x", null))
    // subtracting the null key removes exactly the null row
    assert(withNull.subtract(
      KeySet.fromTuples(Seq(Seq(null)),
        StructType(Seq(strCol("A"))))).size(spark) === 1L)
    // natural join matches null to null
    val other = KeySet.fromTuples(Seq(Seq(null, 1L), Seq("z", 2L)),
      StructType(Seq(strCol("A"), longCol("B"))))
    assert(withNull.join(other).size(spark) === 1L)
  }

  // --------------------------------------------------------------------- size

  test("size folds literal products without materializing a dataframe") {
    val big = KeySet.fromDict(Seq(
      "A" -> (0L until 400L),
      "B" -> (0L until 400L)))
    // 160k keys: size comes from factor arithmetic, not a 160k-row count
    assert(big.size(spark) === 160000L)
  }

  test("equivalence across construction orders; undecided stays None") {
    val a = KeySet.fromColumn("A", Seq("x", "y"))
    val b = KeySet.fromColumn("B", Seq(0L, 1L))
    assert((a * b).isEquivalent(b * a) === Some(true))
    assert(a.isEquivalent(KeySet.fromColumn("A", Seq("x", "z"))) === Some(false))
  }

  test("subtracting the empty keyset refuses at construction with a " +
      "clear message (it matches every row)") {
    val a = KeySet.fromColumn("A", Seq("x", "y"))
    val e = intercept[IllegalArgumentException] { a.subtract(KeySet.empty) }
    assert(e.getMessage.contains("zero-column"))
  }

  test("fromColumn validates every value eagerly — mixed types fail at " +
      "construction, not as an opaque materialize-time encoder error") {
    intercept[IllegalArgumentException] {
      KeySet.fromColumn("c", Seq(1, "a"))
    }
  }
}
