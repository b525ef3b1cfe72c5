package graft.ir

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.types.{ColumnDescriptor, ColumnType}

/** Bin-edge specification for `bin_column` / `histogram` (reference:
  * src/tmlt/analytics/binning_spec.py:121-336). Bins are the half-open
  * intervals between consecutive sorted edges; by default the right edge is
  * included (`(a, b]`) and the first bin includes its left edge. Values
  * outside the range, nulls, and NaNs map to the null bin (or `nanBin`).
  *
  * Edges may be numbers, strings, dates, or timestamps (reference BinT,
  * binning_spec.py:17) — anything Spark's `lit` understands, ordered by
  * `ord`. Bin names stay strings.
  *
  * Bin assignment compiles to a Catalyst `when` chain (no UDF) so it stays
  * inside whole-stage codegen — at 100 TB this is a pure map-side projection.
  */
final case class BinningSpec[T](
    edges: Seq[T],
    names: Option[Seq[String]] = None,
    right: Boolean = true,
    includeBothEndpoints: Boolean = true,
    nanBin: Option[String] = None)(implicit ord: Ordering[T]) {
  require(edges.size >= 2, "binning spec needs at least two edges")
  require(edges == edges.sorted(ord), "bin edges must be sorted ascending")
  require(edges.distinct == edges, "bin edges must be distinct")
  names.foreach(n => require(n.size == edges.size - 1,
    s"expected ${edges.size - 1} bin names, got ${n.size}"))

  /** Default edge rendering (reference _edges_as_str, binning_spec.py:55-90):
    * integral doubles drop the fraction, dates/timestamps are ISO, strings
    * are quoted.
    */
  private def fmt(v: T): String = v match {
    case d: Double =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case f: Float =>
      if (f == f.floor && !f.isInfinite && math.abs(f) < 1e15) f.toLong.toString
      else f.toString
    case s: String => s"'$s'"
    case other => String.valueOf(other) // Int/Long, java.sql.Date/Timestamp
  }

  /** Default bin names like "(5, 10]" (reference binning_spec.py:93-118). */
  lazy val binNames: Seq[String] = names.getOrElse {
    edges.sliding(2).zipWithIndex.map { case (w, i) =>
      val (a, b) = (w.head, w(1))
      val lo = if (right) "(" else "["
      val hi = if (right) "]" else ")"
      val loB = if (i == 0 && includeBothEndpoints && right) "[" else lo
      val hiB = if (i == edges.size - 2 && includeBothEndpoints && !right) "]" else hi
      s"$loB${fmt(a)}, ${fmt(b)}$hiB"
    }.toSeq
  }

  /** All possible output values, for building the keyset of a histogram. */
  def bins: Seq[String] = binNames ++ nanBin.toSeq

  /** Column types these edges can bin (numeric edges bin either numeric
    * type; temporal and string edges are exact).
    */
  def binnableTypes: Set[ColumnType] = edges.head match {
    case _: Double | _: Float | _: Int | _: Long =>
      Set(ColumnType.Integer, ColumnType.Decimal)
    case _: String             => Set(ColumnType.Varchar)
    case _: java.sql.Timestamp => Set(ColumnType.Timestamp)
    case _: java.sql.Date      => Set(ColumnType.Date, ColumnType.Timestamp)
    case other => throw new IllegalArgumentException(
      s"unsupported bin edge type: ${other.getClass.getName}")
  }

  def outputDescriptor: ColumnDescriptor =
    ColumnDescriptor(ColumnType.Varchar, allowNull = true)

  /** Scalar bin assignment, mirroring [[toColumn]] (the reference spec is
    * callable: `spec(6)` -> `"(5, 10]"`, binning_spec.py:309-336). Nulls,
    * NaNs (absent `nanBin`), and out-of-range values map to None.
    */
  def apply(v: T): Option[String] = {
    if (v == null) return None
    val isNan = v match {
      case d: Double => d.isNaN
      case f: Float  => f.isNaN
      case _         => false
    }
    if (isNan) return nanBin
    (0 until edges.size - 1).collectFirst {
      case i if {
        val (a, b) = (edges(i), edges(i + 1))
        if (right) {
          val base = ord.gt(v, a) && ord.lteq(v, b)
          if (i == 0 && includeBothEndpoints) base || ord.equiv(v, a) else base
        } else {
          val base = ord.gteq(v, a) && ord.lt(v, b)
          if (i == edges.size - 2 && includeBothEndpoints) base || ord.equiv(v, b)
          else base
        }
      } => binNames(i)
    }
  }

  /** Catalyst expression assigning `c` to its bin name. Out-of-range values,
    * nulls and (absent `nanBin`) NaNs fall through the `when` chain to null.
    */
  def toColumn(c: Column): Column = {
    val chain = edges.sliding(2).zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (acc, (w, i)) =>
        val (a, b) = (w.head, w(1))
        val cond =
          if (right) {
            val base = c > lit(a) && c <= lit(b)
            if (i == 0 && includeBothEndpoints) base || c === lit(a) else base
          } else {
            val base = c >= lit(a) && c < lit(b)
            if (i == edges.size - 2 && includeBothEndpoints) base || c === lit(b) else base
          }
        when(cond, lit(binNames(i))).otherwise(acc)
      }
    val numeric = edges.head.isInstanceOf[Double] || edges.head.isInstanceOf[Float]
    nanBin match {
      case Some(nb) if numeric =>
        when(c.isNotNull && isnan(c.cast("double")), lit(nb)).otherwise(chain)
      case _ => chain
    }
  }
}

object BinningSpec {
  /** java.sql temporal types have no implicit Scala Ordering; import these
    * (or `BinningSpec._`) at the call site for date/timestamp edges.
    */
  implicit val dateOrdering: Ordering[java.sql.Date] = Ordering.by(_.getTime)
  implicit val timestampOrdering: Ordering[java.sql.Timestamp] =
    Ordering.by(_.getTime)
}
