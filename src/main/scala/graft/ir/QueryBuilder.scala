package graft.ir

import org.apache.spark.sql.DataFrame
import graft.constraints.{Constraint, TruncationStrategy}
import graft.keyset.KeySet
import graft.types.ColumnDescriptor
import QueryExpr._

/** A complete query: a measurement over a transformation chain, ready for
  * `Session.evaluate` (reference: `Query` in query_builder.py:157-227).
  */
final case class Query(expr: MeasureExpr) {
  /** Drop result rows whose count is below `threshold`; only legal over a
    * count query (reference query_builder.py:157-227).
    */
  def suppress(threshold: Double): Query = expr match {
    case c: GroupByCount => Query(SuppressAggregates(c, threshold))
    case other => throw new IllegalArgumentException(
      s"suppress is only supported on count queries, got $other")
  }
}

/** Fluent builder over the QueryExpr IR (reference:
  * src/tmlt/analytics/query_builder.py:233-2798). Each call returns a new
  * immutable builder; aggregation methods terminate the chain with a `Query`.
  */
final class QueryBuilder private (private[graft] val expr: TransformExpr) {
  import MechanismHint.Default

  private def next(e: TransformExpr): QueryBuilder = new QueryBuilder(e)

  // ----------------------------------------------------------- transformations

  /** Independent copy (reference query_builder.py:292 `clone`). Builders
    * here are immutable — every call returns a new builder — so the clone
    * is the receiver itself; the method exists for API parity and for code
    * written against the reference's mutable-builder habits.
    */
  def cloneBuilder(): QueryBuilder = this

  /** reference query_builder.py:957 */
  def rename(mapping: Map[String, String]): QueryBuilder = next(Rename(expr, mapping))

  /** Spark SQL WHERE string (reference query_builder.py:1016). */
  def filter(condition: String): QueryBuilder = next(Filter(expr, condition))

  /** reference query_builder.py:1085 */
  def select(columns: String*): QueryBuilder = next(Select(expr, columns))

  /** Row->Row lambda (reference query_builder.py:1140). */
  def map(
      f: DataRow.T => DataRow.T,
      newColumnTypes: Seq[(String, ColumnDescriptor)],
      augment: Boolean = false,
      name: String = null): QueryBuilder =
    next(MapRows(expr, named(f, name), newColumnTypes, augment))

  /** Row->rows lambda with a per-row output cap (reference query_builder.py:1241). */
  def flatMap(
      f: DataRow.T => Seq[DataRow.T],
      newColumnTypes: Seq[(String, ColumnDescriptor)],
      maxRows: Int,
      augment: Boolean = false,
      grouping: Boolean = false,
      name: String = null): QueryBuilder =
    next(FlatMapRows(expr, named(f, name), newColumnTypes, augment, maxRows, grouping))

  /** Per-ID rows->rows lambda (reference query_builder.py:1379). */
  def flatMapByID(
      f: Seq[DataRow.T] => Seq[DataRow.T],
      newColumnTypes: Seq[(String, ColumnDescriptor)],
      name: String = null): QueryBuilder =
    next(FlatMapByID(expr, named(f, name), newColumnTypes))

  /** Wrap a lambda with a user-supplied stable identity (see [[NamedFn]]);
    * a null name keeps the bare lambda and its reference equality.
    */
  private def named[A, B](f: A => B, name: String): A => B =
    if (name == null) f else new NamedFn(f, name)

  /** reference query_builder.py:299 */
  def joinPublic(publicId: String): QueryBuilder =
    next(JoinPublic(expr, Left(publicId)))
  def joinPublic(publicId: String, joinColumns: Seq[String], how: String = "inner"): QueryBuilder =
    next(JoinPublic(expr, Left(publicId), Some(joinColumns), how))
  def joinPublic(df: DataFrame): QueryBuilder =
    next(JoinPublic(expr, Right(df)))
  def joinPublic(df: DataFrame, joinColumns: Seq[String]): QueryBuilder =
    next(JoinPublic(expr, Right(df), Some(joinColumns)))
  def joinPublic(df: DataFrame, joinColumns: Seq[String], how: String): QueryBuilder =
    next(JoinPublic(expr, Right(df), Some(joinColumns), how))

  /** reference query_builder.py:462 */
  def joinPrivate(
      right: QueryBuilder,
      truncationLeft: TruncationStrategy,
      truncationRight: TruncationStrategy,
      joinColumns: Option[Seq[String]] = None): QueryBuilder =
    next(JoinPrivate(expr, right.expr, Some(truncationLeft), Some(truncationRight), joinColumns))

  /** IDs-table private join: no truncation needed (reference
    * query_builder.py:462, _query_expr.py:884-906).
    */
  def joinPrivate(right: QueryBuilder): QueryBuilder =
    next(JoinPrivate(expr, right.expr, None, None, None))
  def joinPrivate(right: QueryBuilder, joinColumns: Seq[String]): QueryBuilder =
    next(JoinPrivate(expr, right.expr, None, None, Some(joinColumns)))

  /** reference query_builder.py:595 */
  def replaceNullAndNan(replaceWith: Map[String, Any] = Map.empty): QueryBuilder =
    next(ReplaceNullAndNan(expr, replaceWith))

  /** reference query_builder.py:685 */
  def replaceInfinity(replaceWith: Map[String, (Double, Double)] = Map.empty): QueryBuilder =
    next(ReplaceInfinity(expr, replaceWith))

  /** reference query_builder.py:760 */
  def dropNullAndNan(columns: String*): QueryBuilder =
    next(DropNullAndNan(expr, columns))

  /** reference query_builder.py:867 */
  def dropInfinity(columns: String*): QueryBuilder =
    next(DropInfinity(expr, columns))

  /** reference query_builder.py:1665 */
  def enforce(constraint: Constraint): QueryBuilder =
    next(EnforceConstraint(expr, constraint))

  // -- beyond-reference pipeline transforms (stability-tracked) ------------

  /** Exact dedup: distinct rows over `columns` (stability 1). */
  def distinctRows(columns: String*): QueryBuilder =
    next(DistinctRows(expr, columns))

  /** Append a text feature column (token count, language, quality score...). */
  def textFeature(kind: TextFeatureKind, textColumn: String,
      outputColumn: String): QueryBuilder =
    next(TextFeature(expr, kind, textColumn, outputColumn))

  /** Keep rows passing the heuristic quality gate. */
  def qualityFilter(textColumn: String): QueryBuilder =
    next(QualityFilter(expr, textColumn))

  /** Assign values of `column` to named bins (reference query_builder.py:1490;
    * lowers to a Map-free Catalyst projection, binning_spec.py).
    */
  def binColumn(column: String, spec: BinningSpec[_], name: Option[String] = None): QueryBuilder =
    next(BinColumn(expr, column, spec, name.getOrElse(s"${column}_binned")))

  // ------------------------------------------------------------- measurements

  /** reference query_builder.py:1863 */
  def groupby(keys: KeySet): GroupedQueryBuilder = new GroupedQueryBuilder(expr, keys)

  /** Grouping by bare column names runs DP partition selection to find the
    * keys, as the reference's `groupby(Union[KeySet, List[str], str])`
    * overload does — sugar for `groupby(KeySet.detect(columns))`.
    */
  def groupby(first: String, rest: String*): GroupedQueryBuilder =
    groupby(KeySet.detect(first +: rest: _*))

  /** Histogram sugar: bin + groupby(bins) + count (reference
    * query_builder.py:1590, lowering :1655-1663).
    */
  def histogram(column: String, spec: BinningSpec[_], name: Option[String] = None): Query = {
    val binName = name.getOrElse(s"${column}_binned")
    binColumn(column, spec, Some(binName))
      .groupby(KeySet.fromColumn(binName, spec.bins))
      .count()
  }

  /** DP partition selection (reference query_builder.py:1726). */
  def getGroups(columns: String*): Query = Query(GetGroups(expr, columns))

  /** DP bounds of a column (reference query_builder.py:1788). */
  def getBounds(column: String, lowerName: String = null,
      upperName: String = null): Query =
    Query(GetBounds(expr, KeySet.empty, column,
      Option(lowerName).getOrElse(s"${column}_lower_bound"),
      Option(upperName).getOrElse(s"${column}_upper_bound")))

  // Ungrouped aggregation shorthands = groupby(empty keyset)
  // (reference query_builder.py:2006-2709, e.g. :2280-2305).
  def count(name: String = "count", mechanism: MechanismHint = Default): Query =
    groupby(KeySet.empty).count(name, mechanism)
  def countDistinct(columns: Seq[String] = Nil, name: String = null,
      mechanism: MechanismHint = Default): Query =
    groupby(KeySet.empty).countDistinct(columns, name, mechanism)
  def quantile(column: String, q: Double, low: Double, high: Double,
      name: String = null): Query =
    groupby(KeySet.empty).quantile(column, q, low, high, name)
  def min(column: String, low: Double, high: Double, name: String = null): Query =
    groupby(KeySet.empty).min(column, low, high, name)
  def max(column: String, low: Double, high: Double, name: String = null): Query =
    groupby(KeySet.empty).max(column, low, high, name)
  def median(column: String, low: Double, high: Double, name: String = null): Query =
    groupby(KeySet.empty).median(column, low, high, name)
  def sum(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    groupby(KeySet.empty).sum(column, low, high, name, mechanism)
  def average(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    groupby(KeySet.empty).average(column, low, high, name, mechanism)
  def variance(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    groupby(KeySet.empty).variance(column, low, high, name, mechanism)
  def stdev(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    groupby(KeySet.empty).stdev(column, low, high, name, mechanism)
}

object QueryBuilder {
  def apply(sourceId: String): QueryBuilder =
    new QueryBuilder(PrivateSource(sourceId))
  private[graft] def of(expr: TransformExpr): QueryBuilder = new QueryBuilder(expr)
}

/** Aggregations with a bound keyset (reference GroupedQueryBuilder,
  * query_builder.py:2798-3722). min/max/median lower to quantile with
  * q=0/1/0.5 (query_builder.py:3146,3220,3291).
  */
final class GroupedQueryBuilder private[ir] (
    expr: TransformExpr, keys: KeySet) {
  import MechanismHint.Default

  // Default output names mirror the reference exactly (query_builder.py:
  // 2878-3702): "count", "count_distinct(a, b)" when columns are given,
  // and "<column>_<agg>" for the bounded aggregates.
  def count(name: String = "count", mechanism: MechanismHint = Default): Query =
    Query(GroupByCount(expr, keys, name, mechanism))
  def countDistinct(columns: Seq[String] = Nil, name: String = null,
      mechanism: MechanismHint = Default): Query =
    Query(GroupByCountDistinct(expr, keys, columns, Option(name).getOrElse(
      if (columns.isEmpty) "count_distinct"
      else s"count_distinct(${columns.mkString(", ")})"), mechanism))
  def quantile(column: String, q: Double, low: Double, high: Double,
      name: String = null): Query =
    Query(GroupByQuantile(expr, keys, column, q, low, high,
      Option(name).getOrElse(s"${column}_quantile(${fmtQ(q)})")))
  def min(column: String, low: Double, high: Double, name: String = null): Query =
    Query(GroupByQuantile(expr, keys, column, 0.0, low, high,
      Option(name).getOrElse(s"${column}_min")))
  def max(column: String, low: Double, high: Double, name: String = null): Query =
    Query(GroupByQuantile(expr, keys, column, 1.0, low, high,
      Option(name).getOrElse(s"${column}_max")))
  def median(column: String, low: Double, high: Double, name: String = null): Query =
    Query(GroupByQuantile(expr, keys, column, 0.5, low, high,
      Option(name).getOrElse(s"${column}_median")))
  def sum(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    Query(GroupByBoundedSum(expr, keys, column, low, high,
      Option(name).getOrElse(s"${column}_sum"), mechanism))
  def average(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    Query(GroupByBoundedAverage(expr, keys, column, low, high,
      Option(name).getOrElse(s"${column}_average"), mechanism))
  def variance(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    Query(GroupByBoundedVariance(expr, keys, column, low, high,
      Option(name).getOrElse(s"${column}_variance"), mechanism))
  def stdev(column: String, low: Double, high: Double, name: String = null,
      mechanism: MechanismHint = Default): Query =
    Query(GroupByBoundedStdev(expr, keys, column, low, high,
      Option(name).getOrElse(s"${column}_stdev"), mechanism))

  /** Render the quantile like Python's repr: 0.5 -> "0.5" (reference
    * default name f"{column}_quantile({quantile})").
    */
  private def fmtQ(q: Double): String =
    if (q == q.floor && math.abs(q) < 1e15) s"${q.toLong}.0" else q.toString
  def getBounds(column: String, lowerName: String = null,
      upperName: String = null): Query =
    Query(GetBounds(expr, keys, column,
      Option(lowerName).getOrElse(s"${column}_lower_bound"),
      Option(upperName).getOrElse(s"${column}_upper_bound")))
}
