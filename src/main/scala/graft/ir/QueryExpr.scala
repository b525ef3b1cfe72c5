package graft.ir

import org.apache.spark.sql.DataFrame
import graft.constraints.{Constraint, TruncationStrategy}
import graft.keyset.KeySet
import graft.types.{ColumnDescriptor, ColumnType, TableSchema}

/** A row as seen by user `map`/`flatMap` lambdas (reference: Row is
  * `Dict[str, Any]`, src/tmlt/analytics/_query_expr.py:47-48).
  */
object DataRow { type T = Map[String, Any] }

/** A user lambda with an optional stable name. JVM lambdas have no portable
  * bytecode identity (the reference compares lambda bytecode for query
  * equality, _query_expr.py:545-559), so two separately-written but
  * identical lambdas can never compare equal on their own. Naming one gives
  * it a user-asserted identity: two named lambdas are equal iff their names
  * are equal; unnamed lambdas keep reference equality. Because the wrapper
  * IS the function, map/flatMap IR nodes built from named lambdas compare
  * equal structurally — which is what view caching and `describe` diffing
  * key on.
  */
final class NamedFn[-A, +B](val fn: A => B, val name: String)
    extends (A => B) with Serializable {
  def apply(a: A): B = fn(a)
  override def equals(o: Any): Boolean = o match {
    case other: NamedFn[_, _] => name == other.name
    case _                    => false
  }
  override def hashCode: Int = name.hashCode
  override def toString: String = s"<$name>"
}

/** User-facing noise-mechanism hints (reference: `CountMechanism` /
  * `SumMechanism` enums in _query_expr.py; DEFAULT is resolved to a concrete
  * mechanism by the compiler's rewrite, _rewrite_rules.py:91-199).
  */
sealed trait MechanismHint
object MechanismHint {
  case object Default extends MechanismHint
  case object Laplace extends MechanismHint // geometric when integer-valued
  case object Gaussian extends MechanismHint // discrete gaussian when integer
}

/** Schemas visible to a query: private tables (DP-protected) and public
  * tables (reference: _catalog.py:17-129).
  */
final case class CatalogSchemas(
    privateSchemas: Map[String, TableSchema],
    publicSchemas: Map[String, TableSchema])

/** The query IR: an immutable tree mirroring the reference's 24 `QueryExpr`
  * node types (src/tmlt/analytics/_query_expr.py:208-2063). Every node
  * computes + validates its output schema eagerly — this is the analyzer
  * (reference `QueryExpr.schema(catalog)`, _query_expr.py:184-187).
  */
sealed trait QueryExpr extends Serializable {
  def schema(catalog: CatalogSchemas): TableSchema
}

/** Transformations produce a private table; measurements produce a DP answer. */
sealed trait TransformExpr extends QueryExpr
sealed trait MeasureExpr extends QueryExpr

object QueryExpr {
  import ColumnType._

  private def err(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ----------------------------------------------------------------- sources

  /** Load a private table (reference _query_expr.py:208). */
  final case class PrivateSource(sourceId: String) extends TransformExpr {
    require(sourceId.nonEmpty, "source id must be a non-empty identifier")
    def schema(cat: CatalogSchemas): TableSchema =
      cat.privateSchemas.getOrElse(sourceId,
        err(s"private table '$sourceId' does not exist; available: " +
          cat.privateSchemas.keys.toSeq.sorted.mkString(", ")))
  }

  // ---------------------------------------------------------- row transforms

  /** Rename columns, old name -> new name (reference _query_expr.py:324;
    * metadata remap :360-381).
    */
  final case class Rename(child: TransformExpr, mapping: Map[String, String])
      extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      mapping.foreach { case (from, to) =>
        if (!in.contains(from)) err(s"rename: column '$from' not in schema")
        if (to.isEmpty) err("rename: empty target column name")
        if (in.contains(to) && !mapping.contains(to))
          err(s"rename: target column '$to' already exists")
      }
      val m = (c: String) => mapping.getOrElse(c, c)
      TableSchema(in.columns.map { case (n, d) => m(n) -> d },
        in.groupingColumn.map(m), in.idColumn.map(m), in.idSpace)
    }
  }

  /** Keep rows matching a Spark SQL WHERE string (reference _query_expr.py:389;
    * predicate validated against an empty DataFrame, :404-413 — we validate at
    * compile time via Spark expression parsing).
    */
  final case class Filter(child: TransformExpr, condition: String)
      extends TransformExpr {
    require(condition.nonEmpty, "filter condition must be non-empty")
    def schema(cat: CatalogSchemas): TableSchema = child.schema(cat)
  }

  /** Project a column subset (reference _query_expr.py:427; may not drop the
    * grouping/id column, :440-457).
    */
  final case class Select(child: TransformExpr, columns: Seq[String])
      extends TransformExpr {
    require(columns.distinct == columns, s"select: duplicate columns in $columns")
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      columns.foreach(c => if (!in.contains(c)) err(s"select: column '$c' not in schema"))
      in.groupingColumn.foreach(g => if (!columns.contains(g))
        err(s"select: may not drop grouping column '$g'"))
      in.idColumn.foreach(i => if (!columns.contains(i))
        err(s"select: may not drop id column '$i'"))
      in.copy(columns = columns.map(c => c -> in(c)))
    }
  }

  /** Row -> Row user function (reference _query_expr.py:476). With
    * `augment=true` input columns are kept and new columns appended; new
    * columns are forced nullable (:526-529).
    */
  final case class MapRows(
      child: TransformExpr,
      f: DataRow.T => DataRow.T,
      newColumns: Seq[(String, ColumnDescriptor)],
      augment: Boolean) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      val fresh = newColumns.map { case (n, d) => n -> d.copy(allowNull = true) }
      if (augment) {
        fresh.foreach { case (n, _) =>
          if (in.contains(n)) err(s"map: new column '$n' already exists") }
        in.copy(columns = in.columns ++ fresh)
      } else {
        if (in.groupingColumn.nonEmpty || in.idColumn.nonEmpty)
          err("map with augment=false may not drop the grouping/id column")
        TableSchema(fresh)
      }
    }
  }

  /** Row -> rows user function with an enforced per-row output cap
    * (reference _query_expr.py:563). `groupingColumn` set means the single
    * new column is a grouping column that must later be grouped on
    * (:595-603). Stability factor = maxRows.
    */
  final case class FlatMapRows(
      child: TransformExpr,
      f: DataRow.T => Seq[DataRow.T],
      newColumns: Seq[(String, ColumnDescriptor)],
      augment: Boolean,
      maxRows: Int,
      grouping: Boolean = false) extends TransformExpr {
    require(maxRows > 0, "flat_map max_rows must be positive")
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      if (grouping) {
        if (newColumns.size != 1)
          err("grouping flat_map must produce exactly one new column")
        if (in.groupingColumn.nonEmpty)
          err("table already has a grouping column")
      }
      val fresh = newColumns.map { case (n, d) => n -> d.copy(allowNull = true) }
      val base =
        if (augment) {
          fresh.foreach { case (n, _) =>
            if (in.contains(n)) err(s"flat_map: new column '$n' already exists") }
          in.copy(columns = in.columns ++ fresh)
        } else {
          if (in.idColumn.nonEmpty) err("flat_map on an IDs table must augment")
          TableSchema(fresh)
        }
      if (grouping) base.copy(groupingColumn = Some(newColumns.head._1)) else base
    }
  }

  /** Per-ID rows -> rows user function; IDs tables only (reference
    * _query_expr.py:688; output schema = id column + new columns, :728-742).
    */
  final case class FlatMapByID(
      child: TransformExpr,
      f: Seq[DataRow.T] => Seq[DataRow.T],
      newColumns: Seq[(String, ColumnDescriptor)]) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      val id = in.idColumn.getOrElse(err("flat_map_by_id requires an IDs table"))
      if (newColumns.exists(_._1 == id)) err(s"flat_map_by_id may not emit id column '$id'")
      TableSchema((id -> in(id)) +:
        newColumns.map { case (n, d) => n -> d.copy(allowNull = true) },
        idColumn = Some(id), idSpace = in.idSpace)
    }
  }

  /** Assign values of `column` to named bins as a new column (reference
    * query_builder.py:1490 lowers this to a Map UDF; we keep it as a
    * first-class node so it compiles to a codegen'd `when` chain instead).
    */
  final case class BinColumn(
      child: TransformExpr, column: String, spec: BinningSpec[_], name: String)
      extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      if (!in.contains(column)) err(s"bin_column: column '$column' not in schema")
      // edges may be numeric, string, date, or datetime (reference BinT,
      // binning_spec.py:17); the column's type must be binnable by them
      val t = in(column).ctype
      if (!spec.binnableTypes.contains(t))
        err(s"bin_column: column '$column' of type $t cannot be binned by " +
          s"edges of type ${spec.edges.head.getClass.getSimpleName}")
      if (name != column && in.contains(name))
        err(s"bin_column: output column '$name' already exists")
      if (name == column) in.copy(columns = in.columns.map { case (n, d) =>
        if (n == column) n -> spec.outputDescriptor else n -> d })
      else in.copy(columns = in.columns :+ (name -> spec.outputDescriptor))
    }
  }

  /** Distinct rows over a column subset — exact dedup as a stability-1
    * transformation (adding one input row adds at most one distinct row), so
    * dedup composes with the DP layer (beyond-reference operator; see
    * pipeline/Dedup.scala for the standalone variants).
    */
  final case class DistinctRows(child: TransformExpr, columns: Seq[String])
      extends TransformExpr {
    require(columns.nonEmpty, "distinct requires at least one column")
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      columns.foreach(c => if (!in.contains(c)) err(s"distinct: column '$c' not in schema"))
      in.idColumn.foreach(id => if (!columns.contains(id))
        err(s"distinct on an IDs table must keep the id column '$id'"))
      in.copy(columns = columns.map(c => c -> in(c)))
    }
  }

  /** Text-feature kinds computable as pure codegen'd projections
    * (pipeline/TextAnalysis.scala), exposed to the DP layer as stability-1
    * transformations.
    */
  sealed trait TextFeatureKind { def outType: ColumnType }
  object TextFeatureKind {
    case object TokenCount extends TextFeatureKind { val outType = Integer }
    case object SubwordCount extends TextFeatureKind { val outType = Integer }
    case object Language extends TextFeatureKind { val outType = Varchar }
    case object QualityScore extends TextFeatureKind { val outType = Decimal }
    case object Fingerprint extends TextFeatureKind { val outType = Varchar }
    case object MeanWordLength extends TextFeatureKind { val outType = Decimal }
  }

  /** Append a text feature column derived from `textColumn`. */
  final case class TextFeature(
      child: TransformExpr, kind: TextFeatureKind, textColumn: String,
      outputColumn: String) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      if (!in.contains(textColumn)) err(s"text feature: column '$textColumn' not in schema")
      if (in(textColumn).ctype != Varchar)
        err(s"text feature: column '$textColumn' must be VARCHAR")
      if (in.contains(outputColumn)) err(s"text feature: column '$outputColumn' already exists")
      in.copy(columns = in.columns :+
        (outputColumn -> ColumnDescriptor(kind.outType, allowNull = in(textColumn).allowNull)))
    }
  }

  /** Keep rows passing the heuristic text quality gate (stability 1, pure
    * row filter; pipeline/TextAnalysis.qualityOk).
    */
  final case class QualityFilter(child: TransformExpr, textColumn: String)
      extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      if (!in.contains(textColumn)) err(s"quality filter: column '$textColumn' not in schema")
      if (in(textColumn).ctype != Varchar)
        err(s"quality filter: column '$textColumn' must be VARCHAR")
      in
    }
  }

  // ------------------------------------------------------------------- joins

  /** Output schema/order rule shared by both joins (reference
    * _query_expr.py:909-918): join columns, then left-only, then right-only,
    * then overlapping non-join columns as `x_left`, `x_right`.
    */
  private[graft] def joinSchema(
      left: TableSchema, right: TableSchema, joinCols: Seq[String],
      how: String = "inner"): TableSchema = {
    val overlap = left.columnNames.intersect(right.columnNames).diff(joinCols)
    val leftOnly = left.columnNames.diff(right.columnNames)
    val rightOnly = right.columnNames.diff(left.columnNames)
    def merged(c: String): ColumnDescriptor = {
      val (l, r) = (left(c), right(c))
      if (l.ctype != r.ctype) err(s"join: column '$c' has type ${l.ctype} on left, ${r.ctype} on right")
      // inner join on nulls-equal keys keeps nulls from either side; a left
      // join makes right-side columns nullable
      ColumnDescriptor(l.ctype, l.allowNull || r.allowNull,
        l.allowNaN || r.allowNaN, l.allowInf || r.allowInf)
    }
    val rightNullable = how == "left"
    def rdesc(c: String): ColumnDescriptor = {
      val d = right(c); if (rightNullable) d.copy(allowNull = true,
        allowNaN = d.allowNaN || d.ctype == Decimal, allowInf = d.allowInf) else d
    }
    TableSchema(
      joinCols.map(c => c -> merged(c)) ++
        leftOnly.map(c => c -> left(c)) ++
        rightOnly.map(c => c -> rdesc(c)) ++
        overlap.flatMap(c => Seq(s"${c}_left" -> left(c), s"${c}_right" -> rdesc(c))),
      groupingColumn = left.groupingColumn, idColumn = left.idColumn,
      idSpace = left.idSpace)
  }

  private[graft] def resolveJoinCols(
      left: TableSchema, right: TableSchema, joinColumns: Option[Seq[String]]): Seq[String] = {
    val cols = joinColumns.getOrElse(left.columnNames.intersect(right.columnNames))
    if (cols.isEmpty) err("join: no common columns to join on")
    cols.foreach { c =>
      if (!left.contains(c)) err(s"join: column '$c' not in left schema")
      if (!right.contains(c)) err(s"join: column '$c' not in right schema")
    }
    cols
  }

  /** Inner equi-join of two private tables (reference _query_expr.py:849).
    * Non-ID tables require a per-side TruncationStrategy; IDs tables join on
    * the shared ID column without truncation (:884-906).
    */
  final case class JoinPrivate(
      left: TransformExpr,
      right: TransformExpr,
      truncationLeft: Option[TruncationStrategy],
      truncationRight: Option[TruncationStrategy],
      joinColumns: Option[Seq[String]] = None) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val (l, r) = (left.schema(cat), right.schema(cat))
      (l.idColumn, r.idColumn) match {
        case (Some(li), Some(ri)) =>
          if (li != ri) err(s"private join: id columns differ ($li vs $ri)")
          if (l.idSpace != r.idSpace) err("private join: id spaces differ")
        case (None, None) =>
          if (truncationLeft.isEmpty || truncationRight.isEmpty)
            err("private join of non-ID tables requires truncation strategies")
        case _ => err("private join: cannot mix IDs and non-IDs tables")
      }
      joinSchema(l, r, resolveJoinCols(l, r, joinColumns))
    }
  }

  /** Join a private table with a public table or literal DataFrame
    * (reference _query_expr.py:937; how in {inner, left}, :965-968).
    */
  final case class JoinPublic(
      child: TransformExpr,
      public: Either[String, DataFrame],
      joinColumns: Option[Seq[String]] = None,
      how: String = "inner") extends TransformExpr {
    require(how == "inner" || how == "left", s"join how must be inner|left, got $how")
    def publicSchema(cat: CatalogSchemas): TableSchema = public match {
      case Left(id) => cat.publicSchemas.getOrElse(id,
        err(s"public table '$id' does not exist"))
      case Right(df) => TableSchema.fromSpark(df.schema)
    }
    def schema(cat: CatalogSchemas): TableSchema = {
      val l = child.schema(cat)
      val r = publicSchema(cat)
      joinSchema(l, r, resolveJoinCols(l, r, joinColumns), how)
    }
  }

  // --------------------------------------------------- special-value handling

  /** Replace nulls/NaNs per column; empty map = all columns with type
    * defaults (reference _query_expr.py:1082; defaults :1053-1071).
    */
  final case class ReplaceNullAndNan(
      child: TransformExpr, replaceWith: Map[String, Any]) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      replaceWith.keys.foreach(c =>
        if (!in.contains(c)) err(s"replace_null_and_nan: column '$c' not in schema"))
      // an EXPLICIT request to rewrite the privacy ID column is an error; an
      // empty mapping means "all columns" and silently excludes the ID
      // column, which may therefore still contain nulls (reference raises a
      // RuntimeWarning there, test_id_col_operations.py:85-122)
      in.idColumn.foreach(id => if (replaceWith.contains(id))
        err(s"replace_null_and_nan may not replace the id column '$id'"))
      // a grouping column's values ARE the group identity the stability
      // calculus tracks — rewriting them is an error when explicit and
      // silently skipped by the all-columns default (reference
      // _base_transformation_visitor.py:1085-1091)
      in.groupingColumn.foreach(g => if (replaceWith.contains(g))
        err(s"Cannot replace null values in column $g, because it is " +
          "being used as a grouping column"))
      val target = if (replaceWith.isEmpty)
        in.columnNames.toSet -- in.groupingColumn
      else replaceWith.keySet
      in.copy(columns = in.columns.map { case (n, d) =>
        if (target.contains(n) && !in.idColumn.contains(n))
          n -> d.copy(allowNull = false, allowNaN = false)
        else n -> d
      })
    }
  }

  /** Replace +-Inf in DECIMAL columns with (lo, hi) (reference
    * _query_expr.py:1183; default (0.0, 0.0)).
    */
  final case class ReplaceInfinity(
      child: TransformExpr, replaceWith: Map[String, (Double, Double)])
      extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      in.idColumn.foreach(id => if (replaceWith.contains(id))
        err(s"replace_infinity may not target the id column '$id'"))
      replaceWith.foreach { case (c, _) =>
        if (!in.contains(c)) err(s"replace_infinity: column '$c' not in schema")
        if (in(c).ctype != Decimal)
          err(s"replace_infinity: column '$c' is not DECIMAL")
      }
      val target = if (replaceWith.isEmpty)
        in.columns.collect { case (n, d) if d.ctype == Decimal => n }.toSet
      else replaceWith.keySet
      in.copy(columns = in.columns.map { case (n, d) =>
        if (target.contains(n)) n -> d.copy(allowInf = false) else n -> d })
    }
  }

  /** Drop rows with null/NaN in listed columns; empty = all (reference
    * _query_expr.py:1290; schema flag flip :1339-1366).
    */
  final case class DropNullAndNan(
      child: TransformExpr, columns: Seq[String]) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      columns.foreach(c =>
        if (!in.contains(c)) err(s"drop_null_and_nan: column '$c' not in schema"))
      in.idColumn.foreach(id => if (columns.contains(id))
        err(s"drop_null_and_nan may not target the id column '$id'"))
      // mirror of the replace rule (reference
      // _base_transformation_visitor.py:1380-1392): explicit -> error,
      // all-columns default -> grouping column excluded
      in.groupingColumn.foreach(g => if (columns.contains(g))
        err(s"Cannot drop null values in column $g, because it is " +
          "being used as a grouping column"))
      val target = if (columns.isEmpty) in.columnNames.toSet -- in.groupingColumn
        else columns.toSet
      in.copy(columns = in.columns.map { case (n, d) =>
        if (target.contains(n) && !in.idColumn.contains(n))
          n -> d.copy(allowNull = false, allowNaN = false)
        else n -> d
      })
    }
  }

  /** Drop rows with +-Inf in DECIMAL columns (reference _query_expr.py:1374). */
  final case class DropInfinity(
      child: TransformExpr, columns: Seq[String]) extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      in.idColumn.foreach(id => if (columns.contains(id))
        err(s"drop_infinity may not target the id column '$id'"))
      columns.foreach { c =>
        if (!in.contains(c)) err(s"drop_infinity: column '$c' not in schema")
        if (in(c).ctype != Decimal) err(s"drop_infinity: column '$c' is not DECIMAL")
      }
      val target = if (columns.isEmpty)
        in.columns.collect { case (n, d) if d.ctype == Decimal => n }.toSet
      else columns.toSet
      in.copy(columns = in.columns.map { case (n, d) =>
        if (target.contains(n)) n -> d.copy(allowInf = false) else n -> d })
    }
  }

  /** Apply a truncation constraint to an IDs table (reference
    * _query_expr.py:1455; enforcement §2.4/2.6 of SURVEY).
    */
  final case class EnforceConstraint(child: TransformExpr, constraint: Constraint)
      extends TransformExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      if (in.idColumn.isEmpty) err("enforce requires an IDs table")
      // grouping-column constraints must name an existing non-ID column
      // (reference test_invalid_constraints.py:62-90: the ID column cannot
      // be its own grouping column — one ID is trivially one "group")
      constraint match {
        case graft.constraints.MaxGroupsPerID(c, _) if !in.contains(c) =>
          err(s"enforce: grouping column '$c' not in schema")
        case graft.constraints.MaxRowsPerGroupPerID(c, _) if !in.contains(c) =>
          err(s"enforce: grouping column '$c' not in schema")
        case graft.constraints.MaxGroupsPerID(c, _) if in.idColumn.contains(c) =>
          err(s"enforce: grouping column '$c' cannot be the ID column")
        case graft.constraints.MaxRowsPerGroupPerID(c, _) if in.idColumn.contains(c) =>
          err(s"enforce: grouping column '$c' cannot be the ID column")
        case _ =>
      }
      in
    }
  }

  // ------------------------------------------------------------ measurements

  private[graft] def validateGroupBy(
      in: TableSchema, keys: KeySet, measureColumn: Option[String]): Unit = {
    // keyset column types must match the input schema
    // (reference _validate_groupby, _query_expr.py:1493-1586)
    keys.schema.fields.foreach { f =>
      if (!in.contains(f.name))
        err(s"groupby column '${f.name}' not in schema")
      val expect = in(f.name).ctype.sparkType
      // NullType marks a plan-only Detect keyset: types bind at evaluation
      if (f.dataType != org.apache.spark.sql.types.NullType && f.dataType != expect)
        err(s"groupby column '${f.name}': keyset type ${f.dataType} != table type $expect")
    }
    in.groupingColumn.foreach { g =>
      if (!keys.columns.contains(g))
        err(s"grouping column '$g' must be included in the groupby keys")
    }
    measureColumn.foreach { m =>
      if (!in.contains(m)) err(s"measure column '$m' not in schema")
      if (in.idColumn.contains(m)) err(s"measure column may not be the id column '$m'")
      val t = in(m).ctype
      if (t != Integer && t != Decimal)
        err(s"measure column '$m' must be INTEGER or DECIMAL, got $t")
      if (keys.columns.contains(m))
        err(s"measure column '$m' may not be a groupby column")
    }
  }

  private[graft] def groupBySchema(
      keys: KeySet, in: TableSchema, out: (String, ColumnType)): TableSchema =
    TableSchema(
      keys.columns.map(c => c -> in(c).copy(allowNull = true)) ++
        Seq(out._1 -> ColumnDescriptor(out._2)))

  sealed trait GroupByAgg extends MeasureExpr {
    def child: TransformExpr
    def keys: KeySet
    def outputColumn: String
  }

  /** Noisy per-group row count (reference _query_expr.py:1652). */
  final case class GroupByCount(
      child: TransformExpr, keys: KeySet, outputColumn: String = "count",
      mechanism: MechanismHint = MechanismHint.Default) extends GroupByAgg {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      validateGroupBy(in, keys, None)
      groupBySchema(keys, in, outputColumn -> Integer)
    }
  }

  /** Noisy per-group distinct-row count over `columnsToCount` (empty = whole
    * row) (reference _query_expr.py:1689).
    */
  final case class GroupByCountDistinct(
      child: TransformExpr, keys: KeySet, columnsToCount: Seq[String] = Nil,
      outputColumn: String = "count_distinct",
      mechanism: MechanismHint = MechanismHint.Default) extends GroupByAgg {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      validateGroupBy(in, keys, None)
      columnsToCount.foreach(c =>
        if (!in.contains(c)) err(s"count_distinct: column '$c' not in schema"))
      groupBySchema(keys, in, outputColumn -> Integer)
    }
  }

  /** DP quantile of the clamped column via the exponential mechanism,
    * q in [0,1] (reference _query_expr.py:1731).
    */
  final case class GroupByQuantile(
      child: TransformExpr, keys: KeySet, measureColumn: String, quantile: Double,
      low: Double, high: Double, outputColumn: String = "quantile")
      extends GroupByAgg {
    require(quantile >= 0 && quantile <= 1, s"quantile must be in [0,1]: $quantile")
    require(low < high, s"quantile bounds must satisfy low < high: [$low, $high]")
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      validateGroupBy(in, keys, Some(measureColumn))
      groupBySchema(keys, in, outputColumn -> Decimal)
    }
  }

  sealed trait GroupByBounded extends GroupByAgg {
    def measureColumn: String
    def low: Double
    def high: Double
    require(low <= high, s"bounds must satisfy low <= high: [$low, $high]")
    def mechanism: MechanismHint
    protected def checkedInput(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      validateGroupBy(in, keys, Some(measureColumn))
      in
    }
  }

  /** Noisy sum of the column clamped to [low, high] (reference
    * _query_expr.py:1796). Output type follows the measure column.
    */
  final case class GroupByBoundedSum(
      child: TransformExpr, keys: KeySet, measureColumn: String,
      low: Double, high: Double, outputColumn: String = "sum",
      mechanism: MechanismHint = MechanismHint.Default) extends GroupByBounded {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = checkedInput(cat)
      groupBySchema(keys, in, outputColumn -> in(measureColumn).ctype)
    }
  }

  /** DP mean = noisy sum of deviations / noisy count + midpoint (reference
    * _query_expr.py:1857; lowering _base_measurement_visitor.py:1249-1261).
    */
  final case class GroupByBoundedAverage(
      child: TransformExpr, keys: KeySet, measureColumn: String,
      low: Double, high: Double, outputColumn: String = "average",
      mechanism: MechanismHint = MechanismHint.Default) extends GroupByBounded {
    def schema(cat: CatalogSchemas): TableSchema =
      groupBySchema(keys, checkedInput(cat), outputColumn -> Decimal)
  }

  /** DP variance from noisy sums of deviations/squared deviations/count
    * (reference _query_expr.py:1918).
    */
  final case class GroupByBoundedVariance(
      child: TransformExpr, keys: KeySet, measureColumn: String,
      low: Double, high: Double, outputColumn: String = "variance",
      mechanism: MechanismHint = MechanismHint.Default) extends GroupByBounded {
    def schema(cat: CatalogSchemas): TableSchema =
      groupBySchema(keys, checkedInput(cat), outputColumn -> Decimal)
  }

  /** sqrt of the DP variance (reference _query_expr.py:1979). */
  final case class GroupByBoundedStdev(
      child: TransformExpr, keys: KeySet, measureColumn: String,
      low: Double, high: Double, outputColumn: String = "stdev",
      mechanism: MechanismHint = MechanismHint.Default) extends GroupByBounded {
    def schema(cat: CatalogSchemas): TableSchema =
      groupBySchema(keys, checkedInput(cat), outputColumn -> Decimal)
  }

  /** DP partition selection: privately discover distinct key combinations;
    * ApproxDP only (reference _query_expr.py:246).
    */
  final case class GetGroups(child: TransformExpr, columns: Seq[String])
      extends MeasureExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      val cols = if (columns.nonEmpty) columns else
        in.columnNames.filterNot(c => in.idColumn.contains(c))
      cols.foreach(c => if (!in.contains(c)) err(s"get_groups: column '$c' not in schema"))
      in.idColumn.foreach(id => if (cols.contains(id))
        err(s"get_groups may not include the id column '$id'"))
      TableSchema(cols.map(c => c -> in(c)))
    }
  }

  /** DP approximate (lower, upper) bounds of a numeric column (reference
    * _query_expr.py:290; exponential search over powers of two, threshold
    * 0.95: _base_measurement_visitor.py:1533-1544).
    */
  final case class GetBounds(
      child: TransformExpr, keys: KeySet, measureColumn: String,
      lowerColumn: String = "lower", upperColumn: String = "upper")
      extends MeasureExpr {
    def schema(cat: CatalogSchemas): TableSchema = {
      val in = child.schema(cat)
      validateGroupBy(in, keys, Some(measureColumn))
      val t = in(measureColumn).ctype
      TableSchema(
        keys.columns.map(c => c -> in(c).copy(allowNull = true)) ++
          Seq(lowerColumn -> ColumnDescriptor(t), upperColumn -> ColumnDescriptor(t)))
    }
  }

  /** Post-process: drop result rows whose count is below a threshold; only
    * legal over GroupByCount (reference _query_expr.py:2041, :2056-2063).
    */
  final case class SuppressAggregates(child: GroupByCount, threshold: Double)
      extends MeasureExpr {
    def schema(cat: CatalogSchemas): TableSchema = child.schema(cat)
  }
}
