package graft.keyset

import graft.SparkSpec

/** KeySet.decompose factor diagnostics (reference _keyset.py:576-619 and
  * the per-op decompose rules in keyset/_ops/): factors × / join back,
  * minus the subtracted values, to the original key set — checked here
  * both structurally and by materialized equality.
  */
class KeySetDecomposeSpec extends SparkSpec {

  private def a = KeySet.fromColumn("a", Seq(1, 2, 3))
  private def b = KeySet.fromColumn("b", Seq(10, 20))
  private def c = KeySet.fromColumn("c", Seq("x", "y"))

  test("a cross product decomposes into its factors, none subtracted") {
    val ks = a * b * c
    val (fs, svs) = ks.decompose()
    assert(svs.isEmpty)
    assert(fs.map(_.columns.toSet).toSet === Set(Set("a"), Set("b"), Set("c")))
    // reconstruction: crossing the factors reproduces the keyset
    assert(fs.reduce(_ * _) === ks)
  }

  test("fromDict decomposes like the cross product it builds") {
    val ks = KeySet.fromDict(Seq("a" -> Seq(1, 2), "b" -> Seq(3, 4)))
    val (fs, svs) = ks.decompose()
    assert(svs.isEmpty && fs.size === 2)
    assert(fs.reduce(_ * _) === ks)
  }

  test("a join is atomic without split columns, splits when its join " +
      "columns are all split (reference _ops/_join.py:121-134)") {
    val ab = KeySet.fromTuples(
      Seq(Seq(1L, 10L), Seq(2L, 20L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
    val bc = KeySet.fromTuples(
      Seq(Seq(10L, "x"), Seq(20L, "y")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.StringType))))
    val j = ab.join(bc)
    val (atomic, svs0) = j.decompose()
    assert(atomic.size === 1 && svs0.isEmpty)
    assert(atomic.head.columns.toSet === Set("a", "b", "c"))
    val (split, svs1) = j.decompose(splitColumns = Set("b"))
    assert(svs1.isEmpty)
    assert(split.map(_.columns.toSet).toSet === Set(Set("a", "b"), Set("b", "c")))
    // reconstruction under split: join of the factors
    assert(split.reduce(_ join _) === j)
  }

  test("a multi-factor subtraction lands in subtractedValues; a one-" +
      "factor subtraction absorbs (reference _ops/_subtract.py:103-125)") {
    val ab = KeySet.fromTuples(
      Seq(Seq(1L, 10L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
    val ks = (a * b).subtract(ab)
    val (fs, svs) = ks.decompose()
    assert(fs.map(_.columns.toSet).toSet === Set(Set("a"), Set("b")))
    assert(svs.map(_.columns.toSet) === Seq(Set("a", "b")))
    // reconstruction: cross the factors, subtract each subtracted value
    assert(svs.foldLeft(fs.reduce(_ * _))(_ subtract _) === ks)

    // single-column subtraction: the rewriter/absorber keeps it inside a
    // factor, so nothing is left to subtract at the top
    val (fs2, svs2) = (a * b).subtract(KeySet.fromColumn("a", Seq(1)))
      .decompose()
    assert(svs2.isEmpty)
    assert(fs2.map(_.columns.toSet).toSet === Set(Set("a"), Set("b")))
  }

  test("a plan keyset (detect) refuses to decompose") {
    intercept[IllegalStateException] { KeySet.detect("g").decompose() }
  }
}
