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

  test("truncation strategies expose their stability factors") {
    assert(TruncationStrategy.DropExcess(3).stabilityFactor === 2)
    assert(TruncationStrategy.DropExcess(3).maxRows === 3)
    assert(TruncationStrategy.DropNonUnique.stabilityFactor === 1)
    assert(TruncationStrategy.DropNonUnique.maxRows === 1)
    intercept[IllegalArgumentException] { TruncationStrategy.DropExcess(0) }
  }
}
