package graft.constraints

import org.scalatest.funsuite.AnyFunSuite

/** Constraint simplification and propagation rules (reference:
  * constraints/_simplify.py and
  * _query_expr_compiler/_constraint_propagation.py).
  */
class ConstraintsSpec extends AnyFunSuite {

  test("simplify keeps per-kind minima") {
    val out = Constraint.simplify(Seq(
      MaxRowsPerID(5), MaxRowsPerID(3),
      MaxGroupsPerID("g", 4), MaxGroupsPerID("g", 2), MaxGroupsPerID("h", 7),
      MaxRowsPerGroupPerID("g", 9), MaxRowsPerGroupPerID("g", 6)))
    assert(out === Seq(MaxRowsPerID(3), MaxGroupsPerID("g", 2),
      MaxGroupsPerID("h", 7), MaxRowsPerGroupPerID("g", 6)))
  }

  test("simplify: the reference's full parameterized table " +
      "(test_constraints.py test_simplify_constraints)") {
    val cases: Seq[(Seq[Constraint], Seq[Constraint])] = Seq(
      (Nil, Nil),
      (Seq(MaxRowsPerID(1)), Seq(MaxRowsPerID(1))),
      (Seq(MaxRowsPerID(1), MaxRowsPerID(1)), Seq(MaxRowsPerID(1))),
      (Seq(MaxRowsPerID(1), MaxRowsPerID(5)), Seq(MaxRowsPerID(1))),
      (Seq(MaxRowsPerID(3), MaxRowsPerID(2), MaxRowsPerID(6)), Seq(MaxRowsPerID(2))),
      (Seq(MaxGroupsPerID("gc", 1), MaxGroupsPerID("gc", 5)),
        Seq(MaxGroupsPerID("gc", 1))),
      (Seq(MaxGroupsPerID("gc", 1), MaxGroupsPerID("other", 5), MaxGroupsPerID("gc", 3)),
        Seq(MaxGroupsPerID("gc", 1), MaxGroupsPerID("other", 5))),
      (Seq(MaxRowsPerID(1), MaxGroupsPerID("gc", 1)),
        Seq(MaxRowsPerID(1), MaxGroupsPerID("gc", 1))),
      (Seq(MaxRowsPerID(1), MaxGroupsPerID("gc", 1), MaxRowsPerID(5)),
        Seq(MaxRowsPerID(1), MaxGroupsPerID("gc", 1))),
      (Seq(MaxRowsPerID(1), MaxGroupsPerID("gc", 1), MaxGroupsPerID("gc", 5),
        MaxGroupsPerID("other", 1)),
        Seq(MaxRowsPerID(1), MaxGroupsPerID("gc", 1), MaxGroupsPerID("other", 1))),
      (Seq(MaxRowsPerGroupPerID("g", 1)), Seq(MaxRowsPerGroupPerID("g", 1))),
      (Seq(MaxRowsPerGroupPerID("g", 1), MaxRowsPerGroupPerID("g", 1)),
        Seq(MaxRowsPerGroupPerID("g", 1))),
      (Seq(MaxRowsPerGroupPerID("g", 3), MaxRowsPerGroupPerID("g", 6)),
        Seq(MaxRowsPerGroupPerID("g", 3))),
      (Seq(MaxRowsPerGroupPerID("g1", 1), MaxRowsPerGroupPerID("g2", 1),
        MaxRowsPerGroupPerID("g2", 5)),
        Seq(MaxRowsPerGroupPerID("g1", 1), MaxRowsPerGroupPerID("g2", 1))),
      (Seq(MaxRowsPerGroupPerID("g1", 1), MaxGroupsPerID("g1", 1), MaxRowsPerID(1)),
        Seq(MaxRowsPerGroupPerID("g1", 1), MaxGroupsPerID("g1", 1), MaxRowsPerID(1))),
      (Seq(MaxRowsPerID(1), MaxRowsPerID(2), MaxRowsPerGroupPerID("g1", 1),
        MaxRowsPerGroupPerID("g2", 2), MaxGroupsPerID("g1", 1), MaxGroupsPerID("g1", 5)),
        Seq(MaxRowsPerID(1), MaxRowsPerGroupPerID("g1", 1),
          MaxRowsPerGroupPerID("g2", 2), MaxGroupsPerID("g1", 1))))
    for (((in, expect), i) <- cases.zipWithIndex)
      assert(Constraint.simplify(in).toSet === expect.toSet, s"case $i")
  }

  test("rename remaps grouping columns only") {
    val out = Constraint.rename(
      Seq(MaxRowsPerID(2), MaxGroupsPerID("a", 3), MaxRowsPerGroupPerID("b", 4)),
      Map("a" -> "x", "b" -> "y"))
    assert(out === Seq(MaxRowsPerID(2), MaxGroupsPerID("x", 3),
      MaxRowsPerGroupPerID("y", 4)))
  }

  test("select drops constraints on vanished columns") {
    val out = Constraint.select(
      Seq(MaxRowsPerID(2), MaxGroupsPerID("a", 3), MaxRowsPerGroupPerID("b", 4)),
      kept = Seq("a", "c"))
    assert(out === Seq(MaxRowsPerID(2), MaxGroupsPerID("a", 3)))
  }

  test("flat map keeps only MaxGroupsPerID") {
    val out = Constraint.flatMap(
      Seq(MaxRowsPerID(2), MaxGroupsPerID("a", 3), MaxRowsPerGroupPerID("b", 4)))
    assert(out === Seq(MaxGroupsPerID("a", 3)))
  }

  test("join fan-out scales row bounds, keeps group bounds, overflow drops") {
    val out = Constraint.scaleByFanout(
      Seq(MaxRowsPerID(2), MaxGroupsPerID("a", 3), MaxRowsPerGroupPerID("b", 4)),
      fanout = 5)
    assert(out === Seq(MaxRowsPerID(10), MaxGroupsPerID("a", 3),
      MaxRowsPerGroupPerID("b", 20)))
    assert(Constraint.scaleByFanout(Seq(MaxRowsPerID(2)), 0) === Nil)
    val overflow = Constraint.scaleByFanout(
      Seq(MaxRowsPerID(Int.MaxValue)), fanout = 1000)
    assert(overflow === Nil) // unboundable bound vanishes rather than wraps
  }

  test("private-join propagation follows the reference table (sound subset)") {
    // reference test_constraint_propagation.py:166-190; cases whose expected
    // stability derives from a MaxGroupsPerID-on-join-column bound are
    // propagated WITHOUT that credit here (that bound limits distinct key
    // values, not rows per key)
    def join(l: Seq[Constraint], r: Seq[Constraint], overlap: Set[String] = Set.empty) =
      Constraint.propagatePrivateJoin(l, r, overlap).toSet
    assert(join(Seq(MaxRowsPerID(1)), Nil) === Set.empty)
    assert(join(Seq(MaxRowsPerID(2)), Seq(MaxRowsPerID(3))) === Set(MaxRowsPerID(6)))
    assert(join(Seq(MaxGroupsPerID("group", 2)), Nil)
      === Set(MaxGroupsPerID("group", 2)))
    assert(join(Seq(MaxGroupsPerID("group", 2)), Seq(MaxRowsPerID(3)))
      === Set(MaxGroupsPerID("group", 2))) // no row bound: right's vanishes
    assert(join(Seq(MaxRowsPerGroupPerID("group", 2)), Nil) === Set.empty)
    assert(join(Seq(MaxRowsPerGroupPerID("group", 2)), Seq(MaxRowsPerID(3)))
      === Set(MaxRowsPerGroupPerID("group", 6)))
    // disambiguation: constraints on overlapping non-join columns re-point
    // at the suffixed output columns
    assert(join(Seq(MaxGroupsPerID("group", 2)), Seq(MaxRowsPerID(3)),
      overlap = Set("group")) === Set(MaxGroupsPerID("group_left", 2)))
    // right side has no MaxRowsPerID, so the left row bound is unprovable
    // and vanishes; the right per-group bound scales by the left stability
    assert(join(Seq(MaxRowsPerID(2)), Seq(MaxRowsPerGroupPerID("group", 3)),
      overlap = Set("group")) === Set(MaxRowsPerGroupPerID("group_right", 6)))
  }

  test("truncation strategies expose their stability factors") {
    assert(TruncationStrategy.DropExcess(3).stabilityFactor === 2)
    assert(TruncationStrategy.DropExcess(3).maxRows === 3)
    assert(TruncationStrategy.DropNonUnique.stabilityFactor === 1)
    assert(TruncationStrategy.DropNonUnique.maxRows === 1)
    intercept[IllegalArgumentException] { TruncationStrategy.DropExcess(0) }
  }
}
