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
  * Bin assignment compiles to a Catalyst `when` chain (no UDF) so it stays
  * inside whole-stage codegen — at 100 TB this is a pure map-side projection.
  */
final case class BinningSpec(
    edges: Seq[Double],
    names: Option[Seq[String]] = None,
    right: Boolean = true,
    includeBothEndpoints: Boolean = true,
    nanBin: Option[String] = None) {
  require(edges.size >= 2, "binning spec needs at least two edges")
  require(edges == edges.sorted, "bin edges must be sorted ascending")
  require(edges.distinct == edges, "bin edges must be distinct")
  names.foreach(n => require(n.size == edges.size - 1,
    s"expected ${edges.size - 1} bin names, got ${n.size}"))

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

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

  def outputDescriptor: ColumnDescriptor =
    ColumnDescriptor(ColumnType.Varchar, allowNull = true)

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
    nanBin match {
      case Some(nb) =>
        when(c.isNotNull && isnan(c.cast("double")), lit(nb)).otherwise(chain)
      case None => chain
    }
  }
}
