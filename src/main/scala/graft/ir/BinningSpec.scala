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
  * `ord`. Bin names may be any key-able scalar (strings, ints, floats,
  * dates — reference allows typed names, test_binning_spec.py:124); the
  * output column's type follows the names.
  *
  * Bin assignment compiles to a Catalyst `when` chain (no UDF) so it stays
  * inside whole-stage codegen — at 100 TB this is a pure map-side projection.
  */
final case class BinningSpec[T](
    edges: Seq[T],
    names: Option[Seq[Any]] = None,
    right: Boolean = true,
    includeBothEndpoints: Boolean = true,
    nanBin: Option[Any] = None)(implicit ord: Ordering[T]) {
  require(edges.size >= 2, "binning spec needs at least two edges")
  require(edges == edges.sorted(ord), "bin edges must be sorted ascending")
  require(edges.distinct == edges, "bin edges must be distinct")
  names.foreach { n =>
    require(n.size == edges.size - 1,
      s"expected ${edges.size - 1} bin names, got ${n.size}")
    val classes = n.filter(_ != null).map(nameKind).distinct
    require(classes.size <= 1,
      s"bin names must all have one type, got: ${classes.mkString(", ")}")
    nanBin.filter(_ != null).foreach(nb => require(
      classes.isEmpty || nameKind(nb) == classes.head,
      s"nan_bin '$nb' must have the same type as the bin names"))
  }

  private def nameKind(v: Any): ColumnType = v match {
    case _: String                             => ColumnType.Varchar
    case _: Int | _: Long | _: Short | _: Byte => ColumnType.Integer
    case _: Double | _: Float                  => ColumnType.Decimal
    case _: java.sql.Timestamp                 => ColumnType.Timestamp
    case _: java.sql.Date                      => ColumnType.Date
    case other => throw new IllegalArgumentException(
      s"unsupported bin name type: ${other.getClass.getName}")
  }

  /** Default edge rendering (reference _edges_as_str, binning_spec.py:55-90):
    * ints are plain, strings are quoted, dates are ISO; floats render with
    * the fewest decimals (>= 2) that keep all edges distinct; timestamps
    * render at the coarsest precision (minutes -> seconds -> millis ->
    * micros) that loses nothing.
    */
  private lazy val edgeStrs: Seq[String] = edges.head match {
    case _: Double | _: Float =>
      val ds = edges.map(_.asInstanceOf[Number].doubleValue)
      // the reference searches up to 16 digits and raises rather than emit
      // duplicate default bin names (_edges_as_str, binning_spec.py:55-90)
      val prec = (2 to 16).find(k =>
        ds.map(v => s"%.${k}f".formatLocal(java.util.Locale.ROOT, v))
          .distinct.size == ds.size).getOrElse(
        throw new IllegalArgumentException(
          "Unable to generate distinct default bin names for edges " +
            s"${edges.mkString("[", ", ", "]")} at up to 16 decimal digits; " +
            "pass explicit names"))
      ds.map(v => s"%.${prec}f".formatLocal(java.util.Locale.ROOT, v))
    case _: java.sql.Timestamp =>
      val ts = edges.map(_.asInstanceOf[java.sql.Timestamp])
      val nanos = ts.map(_.getNanos.toLong)
      val seconds = ts.map(_.toLocalDateTime.getSecond)
      val pattern =
        if (nanos.exists(_ % 1000000L != 0)) "yyyy-MM-dd HH:mm:ss.SSSSSS"
        else if (nanos.exists(_ != 0L)) "yyyy-MM-dd HH:mm:ss.SSS"
        else if (seconds.exists(_ != 0)) "yyyy-MM-dd HH:mm:ss"
        else "yyyy-MM-dd HH:mm"
      val f = java.time.format.DateTimeFormatter.ofPattern(pattern)
      ts.map(t => t.toLocalDateTime.format(f))
    case _ => edges.map {
      case s: String => s"'$s'"
      case other     => String.valueOf(other) // Int/Long, java.sql.Date
    }
  }

  /** Default bin names like "(5, 10]" (reference binning_spec.py:93-118). */
  lazy val binNames: Seq[Any] = names.getOrElse {
    edgeStrs.sliding(2).zipWithIndex.map { case (w, i) =>
      val lo = if (right) "(" else "["
      val hi = if (right) "]" else ")"
      val loB = if (i == 0 && includeBothEndpoints && right) "[" else lo
      val hiB = if (i == edges.size - 2 && includeBothEndpoints && !right) "]" else hi
      s"$loB${w.head}, ${w(1)}$hiB"
    }.toSeq
  }

  /** All distinct output values, for building the keyset of a histogram
    * (repeated names and a nan bin matching a name deduplicate — reference
    * binning_spec.py bins()).
    */
  def bins: Seq[Any] = (binNames ++ nanBin.toSeq).distinct

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

  /** The binned column's type follows the names (reference
    * BinningSpec.column_descriptor): always nullable (out-of-range), NaN
    * allowed only when a name is itself NaN.
    */
  def outputDescriptor: ColumnDescriptor = {
    val sample = binNames ++ nanBin.toSeq
    val ct = sample.filter(_ != null).headOption.map(nameKind)
      .getOrElse(ColumnType.Varchar)
    val hasNan = sample.exists {
      case d: Double => d.isNaN
      case f: Float  => f.isNaN
      case _         => false
    }
    ColumnDescriptor(ct, allowNull = true, allowNaN = hasNan)
  }

  /** Scalar bin assignment, mirroring [[toColumn]] (the reference spec is
    * callable: `spec(6)` -> `"(5, 10]"`, binning_spec.py:309-336). Nulls,
    * NaNs (absent `nanBin`), and out-of-range values map to None.
    */
  def apply(v: T): Option[Any] = {
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

  private def sparkTypeName: String = outputDescriptor.ctype match {
    case ColumnType.Varchar   => "string"
    case ColumnType.Integer   => "bigint"
    case ColumnType.Decimal   => "double"
    case ColumnType.Date      => "date"
    case ColumnType.Timestamp => "timestamp"
  }

  private def nameLit(v: Any): Column = v match {
    case null     => lit(null).cast(sparkTypeName)
    case i: Int   => lit(i.toLong)
    case s: Short => lit(s.toLong)
    case b: Byte  => lit(b.toLong)
    case f: Float => lit(f.toDouble)
    case other    => lit(other)
  }

  /** Catalyst expression assigning `c` to its bin name. Out-of-range values,
    * nulls and (absent `nanBin`) NaNs fall through the `when` chain to null.
    */
  def toColumn(c: Column): Column = {
    val chain = edges.sliding(2).zipWithIndex
      .foldLeft(lit(null).cast(sparkTypeName)) { case (acc, (w, i)) =>
        val (a, b) = (w.head, w(1))
        val cond =
          if (right) {
            val base = c > lit(a) && c <= lit(b)
            if (i == 0 && includeBothEndpoints) base || c === lit(a) else base
          } else {
            val base = c >= lit(a) && c < lit(b)
            if (i == edges.size - 2 && includeBothEndpoints) base || c === lit(b) else base
          }
        when(cond, nameLit(binNames(i))).otherwise(acc)
      }
    val numeric = edges.head.isInstanceOf[Double] || edges.head.isInstanceOf[Float]
    nanBin match {
      case Some(nb) if numeric =>
        when(c.isNotNull && isnan(c.cast("double")), nameLit(nb)).otherwise(chain)
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
