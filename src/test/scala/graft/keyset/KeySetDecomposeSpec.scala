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

  // ---- the reference's parametrized cases (test_decomposition.py) ----

  private def tuples(cols: (String, org.apache.spark.sql.types.DataType)*)(
      rows: Seq[Any]*): KeySet =
    KeySet.fromTuples(rows,
      org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t) }))
  private val L = org.apache.spark.sql.types.LongType

  private def sortedByCols(ks: Seq[KeySet]): Seq[KeySet] =
    ks.sortBy(_.columns.sorted.mkString(","))
  private def assertEquivalentSets(
      actual: Seq[KeySet], expected: Seq[KeySet]): Unit = {
    val a = sortedByCols(actual); val e = sortedByCols(expected)
    assert(a.map(_.columns.sorted) === e.map(_.columns.sorted))
    a.zip(e).foreach { case (x, y) => assert(x === y,
      s"factor over ${x.columns} differs from expected") }
  }

  test("reference case 'subtract': multi-factor subtractions land in " +
      "subtractedValues, per-factor ones absorb upstream") {
    val ks = KeySet.fromDict(Seq("A" -> Seq(1, 2, 3), "B" -> Seq(4, 5),
        "C" -> Seq(6)))
      .subtract(tuples("B" -> L, "C" -> L)(Seq(3L, 5L)))
      .subtract(tuples("A" -> L, "B" -> L, "C" -> L)(
        Seq(1L, 4L, 6L), Seq(2L, 5L, 6L)))
    val (fs, svs) = ks.decompose()
    assertEquivalentSets(fs, Seq(
      KeySet.fromColumn("A", Seq(1, 2, 3)),
      KeySet.fromColumn("B", Seq(4, 5)),
      KeySet.fromColumn("C", Seq(6))))
    assertEquivalentSets(svs, Seq(
      tuples("B" -> L, "C" -> L)(Seq(3L, 5L)),
      tuples("A" -> L, "B" -> L, "C" -> L)(Seq(1L, 4L, 6L), Seq(2L, 5L, 6L))))
    assert(svs.foldLeft(fs.reduce(_ * _))(_ subtract _) === ks)
  }

  test("reference case 'subtract_in_join': the subtraction stays inside " +
      "its join factor under a split, never leaks to subtractedValues") {
    val ab = tuples("A" -> L, "B" -> L)(Seq(1L, 1L), Seq(1L, 2L), Seq(2L, 1L))
    val bc = tuples("B" -> L, "C" -> L)(Seq(1L, 3L), Seq(2L, 4L))
      .subtract(tuples("B" -> L, "C" -> L)(Seq(1L, 3L)))
    val j = ab.join(bc)
    // unsplit: atomic
    val (f0, s0) = j.decompose()
    assert(f0.size === 1 && s0.isEmpty)
    // split on the join column: both sides come apart, the subtract
    // ABSORBS into its side's factor
    val (f1, s1) = j.decompose(Set("B"))
    assert(s1.isEmpty)
    assertEquivalentSets(f1, Seq(ab, bc))
    // split on a non-join column: still atomic
    val (f2, s2) = j.decompose(Set("A"))
    assert(f2.size === 1 && s2.isEmpty)
  }

  test("reference case 'crossjoin_subtract_in_join_split': factors from " +
      "both sides, the two-factor subtraction subtracted") {
    val ab = tuples("A" -> L, "B" -> L)(Seq(1L, 1L), Seq(1L, 2L), Seq(2L, 1L))
    val bc = tuples("B" -> L, "C" -> L)(Seq(1L, 3L), Seq(2L, 4L))
    val d = KeySet.fromColumn("D", Seq(5, 6, 7))
    val bd = tuples("B" -> L, "D" -> L)(Seq(1L, 6L))
    val ks = ab.join((bc * d).subtract(bd))
    val (fs, svs) = ks.decompose(Set("B"))
    assertEquivalentSets(fs, Seq(ab, bc, d))
    assertEquivalentSets(svs, Seq(bd))
  }

  test("reference case 'multi_join_split': joins sharing only the split " +
      "column come apart; the off-split join stays one factor") {
    val ab = tuples("A" -> L, "B" -> L)(Seq(1L, 1L), Seq(1L, 2L), Seq(2L, 1L))
    val ac = tuples("A" -> L, "C" -> L)(Seq(1L, 3L), Seq(2L, 3L), Seq(3L, 4L))
    val ad = tuples("A" -> L, "D" -> L)(Seq(1L, 5L), Seq(2L, 6L), Seq(1L, 7L))
    val ae = tuples("A" -> L, "E" -> L)(Seq(1L, 8L), Seq(2L, 8L), Seq(1L, 9L))
    val ef = tuples("E" -> L, "F" -> L)(Seq(8L, 10L), Seq(9L, 10L))
    val ks = ab.join(ac).join(ad).join(ae).join(ef)
    // unsplit: one atomic factor
    val (f0, s0) = ks.decompose()
    assert(f0.size === 1 && s0.isEmpty)
    // split on A: AB/AC/AD come apart; AE joins EF on E (not split), so
    // they stay together as one factor
    val (f1, s1) = ks.decompose(Set("A"))
    assert(s1.isEmpty)
    assertEquivalentSets(f1, Seq(ab, ac, ad, ae.join(ef)))
  }
}
