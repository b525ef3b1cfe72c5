package graft.constraints

/** Facts about privacy-ID tables that bound per-ID contribution, enforced by
  * truncation (reference: src/tmlt/analytics/constraints/_truncation.py).
  */
sealed trait Constraint extends Serializable

/** At most `max` rows per privacy ID (reference _truncation.py:84). */
final case class MaxRowsPerID(max: Int) extends Constraint {
  require(max > 0, "max must be positive")
}

/** At most `max` distinct values of `grouping_column` per privacy ID
  * (reference _truncation.py:162).
  */
final case class MaxGroupsPerID(groupingColumn: String, max: Int) extends Constraint {
  require(max > 0, "max must be positive")
}

/** At most `max` rows per (privacy ID, grouping_column value) pair
  * (reference _truncation.py:275).
  */
final case class MaxRowsPerGroupPerID(groupingColumn: String, max: Int)
    extends Constraint {
  require(max > 0, "max must be positive")
}

object Constraint {
  /** Keep the minimum per kind; drop dominated duplicates (reference
    * constraints/_simplify.py:11, simplify_truncation_constraints:50-80).
    */
  def simplify(cs: Seq[Constraint]): Seq[Constraint] = {
    val rows = cs.collect { case MaxRowsPerID(m) => m }
    val groups = cs.collect { case c: MaxGroupsPerID => c }
      .groupBy(_.groupingColumn).map { case (col, xs) =>
        MaxGroupsPerID(col, xs.map(_.max).min) }
    val rpg = cs.collect { case c: MaxRowsPerGroupPerID => c }
      .groupBy(_.groupingColumn).map { case (col, xs) =>
        MaxRowsPerGroupPerID(col, xs.map(_.max).min) }
    (if (rows.nonEmpty) Seq(MaxRowsPerID(rows.min)) else Nil) ++
      groups.toSeq.sortBy(_.groupingColumn) ++ rpg.toSeq.sortBy(_.groupingColumn)
  }

  /** Propagate constraints through a rename (reference
    * _constraint_propagation.py:58-74).
    */
  def rename(cs: Seq[Constraint], mapping: Map[String, String]): Seq[Constraint] =
    cs.map {
      case MaxGroupsPerID(c, m) => MaxGroupsPerID(mapping.getOrElse(c, c), m)
      case MaxRowsPerGroupPerID(c, m) => MaxRowsPerGroupPerID(mapping.getOrElse(c, c), m)
      case other => other
    }

  /** Propagate through a projection: constraints on dropped columns vanish
    * (reference _constraint_propagation.py:77-83).
    */
  def select(cs: Seq[Constraint], kept: Seq[String]): Seq[Constraint] =
    cs.filter {
      case MaxGroupsPerID(c, _)       => kept.contains(c)
      case MaxRowsPerGroupPerID(c, _) => kept.contains(c)
      case _                          => true
    }

  /** Propagate through a flat-map: only MaxGroupsPerID survives (reference
    * _constraint_propagation.py:97-109).
    */
  def flatMap(cs: Seq[Constraint]): Seq[Constraint] =
    cs.collect { case c: MaxGroupsPerID => c }

  /** Propagate both sides' constraints through an IDs private join
    * (reference propagate_join_private, _constraint_propagation.py:147-190).
    * A side's rows are duplicated at most `otherStability` times, where the
    * other side's stability is its MaxRowsPerID bound — the privacy ID is
    * always a join column, so each of its values matches at most that many
    * rows. (The reference additionally derives a stability from
    * MaxGroupsPerID bounds on join columns; that bound limits distinct key
    * values, not rows per key, so it is not adopted here.) Row-count bounds
    * scale by the other side's stability (or vanish when it is unbounded);
    * MaxGroupsPerID survives untouched — a join never adds new grouping
    * values to an ID. Constraints naming an overlapping non-join column are
    * re-pointed at the suffixed output column.
    */
  def propagatePrivateJoin(
      left: Seq[Constraint], right: Seq[Constraint],
      overlap: Set[String]): Seq[Constraint] = {
    def stability(cs: Seq[Constraint]): Option[Long] =
      cs.collect { case MaxRowsPerID(n) => n.toLong } match {
        case Nil => None
        case xs  => Some(xs.min)
      }
    def sideOut(cs: Seq[Constraint], otherStab: Option[Long], suffix: String) = {
      def nm(c: String) = if (overlap.contains(c)) c + suffix else c
      def scaled(m: Int): Option[Int] = otherStab.flatMap { s =>
        val v = m.toLong * s
        if (v <= Int.MaxValue) Some(v.toInt) else None
      }
      cs.flatMap {
        case MaxRowsPerID(m)            => scaled(m).map(MaxRowsPerID(_))
        case MaxGroupsPerID(c, g)       => Some(MaxGroupsPerID(nm(c), g))
        case MaxRowsPerGroupPerID(c, m) => scaled(m).map(MaxRowsPerGroupPerID(nm(c), _))
      }
    }
    simplify(sideOut(left, stability(right), "_left") ++
      sideOut(right, stability(left), "_right"))
  }

  /** Propagate through a join where the other side contributes `fanout` rows
    * per key (reference _constraint_propagation.py:112-217).
    */
  def scaleByFanout(cs: Seq[Constraint], fanout: Long): Seq[Constraint] =
    if (fanout <= 0) Nil
    else cs.flatMap {
      case MaxRowsPerID(m) =>
        val v = m.toLong * fanout
        if (v <= Int.MaxValue) Some(MaxRowsPerID(v.toInt)) else None
      case MaxRowsPerGroupPerID(c, m) =>
        val v = m.toLong * fanout
        if (v <= Int.MaxValue) Some(MaxRowsPerGroupPerID(c, v.toInt)) else None
      case g: MaxGroupsPerID => Some(g)
    }
}

/** Per-side truncation strategy for private joins on non-ID tables
  * (reference: src/tmlt/analytics/truncation_strategy.py:37-119).
  */
sealed trait TruncationStrategy extends Serializable {
  /** Stability factor of the truncation itself (DropExcess=2, DropNonUnique=1). */
  def stabilityFactor: Int
  /** Max rows a single join key can contribute after truncation. */
  def maxRows: Int
}
object TruncationStrategy {
  final case class DropExcess(maxRowsPerKey: Int) extends TruncationStrategy {
    require(maxRowsPerKey > 0)
    def stabilityFactor: Int = 2
    def maxRows: Int = maxRowsPerKey
  }
  case object DropNonUnique extends TruncationStrategy {
    def stabilityFactor: Int = 1
    def maxRows: Int = 1
  }
}
