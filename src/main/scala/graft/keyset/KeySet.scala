package graft.keyset

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lazy, immutable set of distinct group-key rows with its own small relational
  * algebra (reference: src/tmlt/analytics/keyset/_keyset.py:33 and
  * keyset/_ops/). The op tree is rewritten on construction — projection
  * pushdown through cross-joins, cross-join flattening, and driver-side
  * evaluation of small literal cross-products (reference cutoff 2^20 rows:
  * keyset/_ops/_rules.py:23-24) — the moves Catalyst cannot make because they
  * encode *set* semantics. Execution is plain DataFrame ops, so Catalyst still
  * handles pushdown/broadcast at run time.
  */
sealed trait KeySetOp {
  def columns: Seq[String]
  def schema: StructType
}

object KeySetOp {
  /** Literal rows, already deduplicated; values are external Scala/Java types
    * (String / java.lang.Long / java.sql.Date / java.sql.Timestamp / null).
    */
  final case class FromTuples(rows: Vector[Vector[Any]], override val schema: StructType)
      extends KeySetOp {
    def columns: Seq[String] = schema.fieldNames.toSeq
  }
  final case class FromDataFrame(df: DataFrame) extends KeySetOp {
    def columns: Seq[String] = df.schema.fieldNames.toSeq
    def schema: StructType = df.schema
  }
  final case class Cross(left: KeySetOp, right: KeySetOp) extends KeySetOp {
    require(left.columns.intersect(right.columns).isEmpty,
      "cross product factors must have disjoint columns")
    def columns: Seq[String] = left.columns ++ right.columns
    def schema: StructType = StructType(left.schema.fields ++ right.schema.fields)
  }
  final case class Join(left: KeySetOp, right: KeySetOp) extends KeySetOp {
    val common: Seq[String] = left.columns.intersect(right.columns)
    require(common.nonEmpty, "join requires at least one common column")
    // mismatched join-column types fail eagerly with the column named, not
    // as an executor-side analysis error (reference _ops/_join.py: "join
    // column A does not have the same type")
    common.foreach { c =>
      val (lt, rt) = (left.schema(left.schema.fieldIndex(c)).dataType,
        right.schema(right.schema.fieldIndex(c)).dataType)
      require(lt == rt || lt == org.apache.spark.sql.types.NullType ||
        rt == org.apache.spark.sql.types.NullType,
        s"join column '$c' does not have the same type on both sides " +
          s"($lt vs $rt)")
    }
    def columns: Seq[String] =
      left.columns ++ right.columns.filterNot(common.contains)
    def schema: StructType = StructType(
      left.schema.fields ++ right.schema.fields.filterNot(f => common.contains(f.name)))
  }
  final case class Union(left: KeySetOp, right: KeySetOp) extends KeySetOp {
    require(left.columns.sorted == right.columns.sorted,
      s"union requires same columns: ${left.columns} vs ${right.columns}")
    def columns: Seq[String] = left.columns
    def schema: StructType = left.schema
  }
  /** Rows of `left` that do NOT match any row of `right` on right's columns. */
  final case class Subtract(left: KeySetOp, right: KeySetOp) extends KeySetOp {
    require(right.columns.nonEmpty,
      "cannot subtract the empty (zero-column) keyset — it matches every " +
        "row; filter or rebuild the keyset instead")
    require(right.columns.forall(left.columns.contains),
      "subtract columns must be a subset of the left keyset's columns")
    def columns: Seq[String] = left.columns
    def schema: StructType = left.schema
  }
  final case class Project(child: KeySetOp, cols: Seq[String]) extends KeySetOp {
    require(cols.nonEmpty && cols.forall(child.columns.contains),
      s"projection columns $cols not all present in ${child.columns}")
    require(cols.distinct == cols,
      s"duplicate columns in projection: $cols (reference _ops/_project.py)")
    def columns: Seq[String] = cols
    def schema: StructType =
      StructType(cols.map(c => child.schema(child.schema.fieldIndex(c))))
  }
  final case class KFilter(child: KeySetOp, condition: String) extends KeySetOp {
    def columns: Seq[String] = child.columns
    def schema: StructType = child.schema
  }
  /** Plan-only: the key domain is to be discovered privately from the data
    * via DP partition selection at evaluate time (reference
    * keyset/_ops/_detect.py:21, `KeySetPlan`). Column types are unknown
    * until binding, hence NullType placeholders; materializing outside a
    * Session is an error.
    */
  final case class Detect(override val columns: Seq[String]) extends KeySetOp {
    require(columns.nonEmpty, "detect requires at least one column")
    def schema: StructType =
      StructType(columns.map(c => StructField(c, NullType, nullable = true)))
  }
}

final class KeySet private (val op: KeySetOp) extends Serializable {
  import KeySetOp._

  def columns: Seq[String] = op.columns
  def schema: StructType = op.schema
  def isEmptyKey: Boolean = columns.isEmpty

  /** Three-valued structural equivalence that never evaluates the keyset
    * (reference _keyset.py:506-533): Some(true) when the op trees match,
    * Some(false) when the column->type schemas differ (nullability ignored
    * — a nullable column need not contain nulls), None when undecidable
    * without materializing.
    */
  def isEquivalent(other: KeySet): Option[Boolean] = {
    def types(s: StructType): Map[String, DataType] =
      s.fields.map(f => f.name -> f.dataType).toMap
    // literal row order is set-irrelevant; everything else must match
    // structurally (both trees are already in rewrite-canonical form)
    def structEq(a0: KeySetOp, b0: KeySetOp): Boolean = (strip(a0), strip(b0)) match {
      case (FromTuples(ra, sa), FromTuples(rb, sb)) =>
        sa == sb && ra.toSet == rb.toSet
      case (Cross(l1, r1), Cross(l2, r2))       => structEq(l1, l2) && structEq(r1, r2)
      case (Join(l1, r1), Join(l2, r2))         => structEq(l1, l2) && structEq(r1, r2)
      case (Union(l1, r1), Union(l2, r2))       => structEq(l1, l2) && structEq(r1, r2)
      case (Subtract(l1, r1), Subtract(l2, r2)) => structEq(l1, l2) && structEq(r1, r2)
      case (Project(c1, p1), Project(c2, p2))   => p1 == p2 && structEq(c1, c2)
      case (KFilter(c1, f1), KFilter(c2, f2))   => f1 == f2 && structEq(c1, c2)
      case (x, y)                               => x == y
    }
    if (structEq(op, other.op)) Some(true)
    else if (types(schema) != types(other.schema)) Some(false)
    else (strip(op), strip(other.op)) match {
      // two literal sets with one schema are directly comparable — the
      // sets themselves decide (reference decides these via hashing)
      case (FromTuples(ra, sa), FromTuples(rb, sb)) if sa == sb =>
        Some(ra.toSet == rb.toSet)
      case _ => None
    }
  }

  // a permutation-only projection changes presentation, not the key set
  private def strip(o: KeySetOp): KeySetOp = o match {
    case Project(c, cols) if cols.toSet == c.columns.toSet => strip(c)
    case other                                             => other
  }

  /** Cross product (`KeySet.__mul__`, reference _keyset.py:212-244). */
  def *(other: KeySet): KeySet =
    if (isEmptyKey) other
    else if (other.isEmptyKey) this
    else KeySet(Cross(op, other.op))

  /** Natural inner join, nulls equal (reference _keyset.py:321-353). */
  def join(other: KeySet): KeySet = KeySet(Join(op, other.op))

  /** Set union (reference _keyset.py:405-438). */
  def union(other: KeySet): KeySet = KeySet(Union(op, other.op))

  /** Remove keys matching `other` on other's columns (_keyset.py:246-263). */
  def subtract(other: KeySet): KeySet = KeySet(Subtract(op, other.op))

  /** Distinct projection `ks[cols]` (reference _keyset.py:265-313). */
  def project(cols: Seq[String]): KeySet = KeySet(Project(op, cols))
  def apply(cols: String*): KeySet = project(cols)

  /** SQL WHERE filter (reference _keyset.py:355-397). */
  def filter(condition: String): KeySet = KeySet(KFilter(op, condition))

  /** Number of key rows; computed driver-side for literal sets. */
  def size(spark: SparkSession): Long = op match {
    case FromTuples(rows, _) => rows.size.toLong
    case Cross(l, r)         => KeySet(l).size(spark) * KeySet(r).size(spark)
    case _                   => dataframe(spark).count()
  }

  @transient private var cached: DataFrame = _
  @transient private var cachedSession: SparkSession = _
  @transient private var persisted: Boolean = false

  /** Materialize to a distinct DataFrame of key rows. The cache is keyed by
    * session: a call with a different SparkSession re-materializes instead
    * of returning a frame bound to a possibly-stopped session.
    */
  def dataframe(spark: SparkSession): DataFrame = synchronized {
    if (cached == null || (cachedSession ne spark)) {
      // best-effort: the previous session may already be STOPPED, in which
      // case its unpersist RPC throws — swallowing it is exactly right
      // (a stopped session's blocks are gone anyway), and the whole point
      // of this branch is to re-materialize in the NEW session
      if (persisted && cached != null)
        try cached.unpersist()
        catch { case _: Exception => () } // no leaked persists
      cached = KeySet.materialize(op, spark)
      cachedSession = spark
      persisted = false
    }
    cached
  }

  def cache(spark: SparkSession): this.type = synchronized {
    if (!persisted) { dataframe(spark).persist(); persisted = true }
    this
  }
  def uncache(): this.type = synchronized {
    if (persisted && cached != null) { cached.unpersist(); persisted = false }
    this
  }

  override def toString: String = s"KeySet(${columns.mkString(", ")})"

  /** Factorization diagnostics (reference `KeySet._decompose`,
    * _keyset.py:576-619, with the per-op rules of _ops/_cross_join.py:132,
    * _ops/_join.py:121, _ops/_subtract.py:103): express this keyset as
    * `(factors, subtractedValues)` such that crossing/joining the factors
    * and then subtracting each subtracted value reproduces the original
    * key set. Cross products split into their factors; a natural join
    * splits only when ALL of its join columns are in `splitColumns`
    * (the caller's promise that factors may share those columns);
    * a subtraction whose columns are fully contained in one factor is
    * absorbed into that factor, otherwise it lands in the subtracted
    * list. Everything else (literal sets, filters, projections, unions)
    * is atomic. Purely structural — nothing materializes — which makes
    * this the `describe()`-grade introspection for "why is this keyset
    * shaped the way it is". A plan keyset ([[KeySet.detect]]) has no
    * factorization before evaluation and throws.
    */
  def decompose(
      splitColumns: Set[String] = Set.empty): (Seq[KeySet], Seq[KeySet]) = {
    def rec(o: KeySetOp): (Vector[KeySetOp], Vector[KeySetOp]) = o match {
      case Detect(_) =>
        throw new IllegalStateException(
          "a plan KeySet (detect) cannot be decomposed before evaluation")
      case Cross(l, r) =>
        val (lf, ls) = rec(l); val (rf, rs) = rec(r)
        (lf ++ rf, ls ++ rs)
      case j @ Join(l, r) =>
        val joinCols = l.columns.toSet intersect r.columns.toSet
        if (joinCols.subsetOf(splitColumns)) {
          val (lf, ls) = rec(l); val (rf, rs) = rec(r)
          (lf ++ rf, ls ++ rs)
        } else (Vector(j), Vector.empty)
      case Subtract(l, r) =>
        val (lf, ls) = rec(l)
        val rcols = r.columns.toSet
        var absorbed = false
        val nf = lf.map { f =>
          if (rcols.subsetOf(f.columns.toSet)) {
            absorbed = true; Subtract(f, r): KeySetOp
          } else f
        }
        if (absorbed) (nf, ls) else (nf, ls :+ r)
      case other => (Vector(other), Vector.empty)
    }
    val (fs, svs) = rec(op)
    // present each factor's columns in THIS keyset's column order
    // (reference as_keyset, _keyset.py:612-614)
    def wrap(o: KeySetOp): KeySet = {
      val ordered = columns.filter(o.columns.contains) ++
        o.columns.filterNot(columns.contains)
      val ks = KeySet(o)
      if (ks.columns == ordered) ks else ks.project(ordered)
    }
    (fs.map(wrap), svs.map(wrap))
  }

  /** Value equality (reference `KeySet.__eq__`, _keyset.py:535-571): two
    * keysets are equal when they hold the same values for the same columns,
    * in any row/column order. Structural equivalence decides cheaply when it
    * can; otherwise the materialized frames are compared both ways with
    * `exceptAll` (requires an active SparkSession — without one, undecidable
    * trees compare unequal rather than evaluating).
    */
  override def equals(that: Any): Boolean = that match {
    case other: KeySet =>
      (this eq other) || (isEquivalent(other) match {
        case Some(b) => b
        case None =>
          SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
            case Some(spark) =>
              val cols = columns.map(org.apache.spark.sql.functions.col)
              val a = dataframe(spark).select(cols: _*)
              val b = other.dataframe(spark).select(cols: _*)
              a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
            case None => false
          }
      })
    case _ => false
  }

  /** Hash by column->type schema only (reference `__hash__`, _keyset.py:572
    * -574): equal keysets may differ structurally, so the schema is the
    * finest hash that stays consistent with [[equals]].
    */
  override def hashCode: Int =
    columns.sorted.map(c => (c, schema(schema.fieldIndex(c)).dataType)).hashCode
}

object KeySet {
  import KeySetOp._

  /** Driver-side literal cross-product cutoff, matching the reference
    * (keyset/_ops/_rules.py:23-24).
    */
  val InMemoryCrossJoinCutoff: Long = 1L << 20

  def apply(op: KeySetOp): KeySet = {
    val r = rewrite(op)
    // normalization may permute columns (sorted cross factors, reordered
    // join leaves); the user-visible column order must not change, so fix it
    // at the top with a pure reorder (no distinct needed — see materialize)
    new KeySet(if (r.columns == op.columns) r else reorder(r, op.columns))
  }

  /** The empty keyset: a single empty key (ungrouped aggregation). */
  val empty: KeySet = new KeySet(FromTuples(Vector(Vector()), StructType(Nil)))

  /** Plan-only keyset whose keys are discovered by DP partition selection
    * when a query using it is evaluated (costs half the epsilon plus all the
    * delta of that query's budget, reference
    * _base_measurement_visitor.py:343-364).
    */
  def detect(columns: String*): KeySet = new KeySet(Detect(columns))

  /** Cross product of per-column value sets (reference _keyset.py:162-197). */
  def fromDict(domains: Seq[(String, Seq[Any])]): KeySet =
    if (domains.isEmpty) empty
    else domains.map { case (c, vs) => fromColumn(c, vs) }.reduce(_ * _)

  def fromColumn(name: String, values: Seq[Any]): KeySet = {
    val dt = inferType(name, values)
    val rows = values.map(v => Vector(normalize(v))).distinct.toVector
    // route through fromTuples for its eager per-value validation: a
    // mixed-type Seq (e.g. Seq(1, "a")) must fail HERE with a typed
    // message, not at materialize time with an opaque encoder error
    fromTuples(rows, StructType(Seq(StructField(name, dt, nullable = true))))
  }

  /** Literal tuples with an explicit schema; row arity and runtime value
    * classes are validated eagerly so mistakes fail at construction, not as
    * opaque executor errors at materialize time (reference validates the
    * same way: _keyset.py:93-156).
    */
  def fromTuples(rows: Seq[Seq[Any]], schema: StructType): KeySet = {
    schema.fields.foreach(f => require(keyableType(f.dataType),
      s"KeySet column '${f.name}' has type ${f.dataType.simpleString}, " +
        "which cannot be a group-by key (INTEGER, VARCHAR, DATE only)"))
    val normalized = rows.map { r =>
      require(r.size == schema.size,
        s"keyset row has ${r.size} values but schema has ${schema.size} columns: $r")
      r.map(normalize).toVector
    }
    normalized.foreach { r =>
      r.zip(schema.fields).foreach { case (v, f) =>
        val ok = v match {
          case null              => true
          case _: java.lang.Long => f.dataType == LongType
          case _: String         => f.dataType == StringType
          case _: java.sql.Date  => f.dataType == DateType
          case _                 => false
        }
        require(ok, s"keyset value $v (${if (v == null) "null" else v.getClass.getSimpleName}) " +
          s"does not match column '${f.name}' of type ${f.dataType}")
      }
    }
    new KeySet(FromTuples(normalized.distinct.toVector, schema))
  }

  /** Key-able column types (the reference's KeySet restriction,
    * test_keyset.py:313-390: INTEGER, VARCHAR, DATE — never floating-point
    * or timestamps, whose inexact matching makes them privacy footguns).
    */
  private def keyableType(dt: DataType): Boolean = dt match {
    case LongType | StringType | DateType => true
    case _                                => false
  }

  /** Wrap a DataFrame; rows are deduplicated (reference keyset/_ops/_from_dataframe.py). */
  def fromDataFrame(df: DataFrame): KeySet = {
    import graft.types.CoerceSchema
    val coerced = CoerceSchema(df)
    coerced.schema.fields.foreach(f => require(keyableType(f.dataType),
      s"KeySet column '${f.name}' has type ${f.dataType.simpleString}, " +
        "which cannot be a group-by key (INTEGER, VARCHAR, DATE only)"))
    new KeySet(FromDataFrame(coerced.dropDuplicates()))
  }

  private def normalize(v: Any): Any = v match {
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
    case f: Float =>
      throw new IllegalArgumentException("KeySet values may not be floating-point")
    case d: Double =>
      throw new IllegalArgumentException("KeySet values may not be floating-point")
    case other => other
  }

  private def inferType(name: String, values: Seq[Any]): DataType = {
    // mirror the reference's construction errors (_keyset.py /
    // test_keyset.py): an empty domain has no inferable type, and
    // floating-point or timestamp group keys are rejected outright
    // (inexact key matching makes them privacy footguns)
    require(values.nonEmpty,
      s"unable to infer column type for an empty collection of values " +
        s"(column '$name')")
    values.collectFirst {
      case _: Int | _: Long | _: Short | _: Byte => LongType
      case _: String                             => StringType
      case _: java.sql.Date                      => DateType
      case _: Double | _: Float =>
        throw new IllegalArgumentException(
          s"KeySet column '$name' may not contain floating-point values")
      case _: java.sql.Timestamp =>
        throw new IllegalArgumentException(
          s"KeySet column '$name' has type TIMESTAMP, which cannot be a " +
            "group-by key (reference restriction: use dates or binned strings)")
    }.getOrElse(StringType)
  }

  // ---------------------------------------------------------------- rewrites

  /** Structural rewrites applied on construction (reference
    * keyset/_ops/_rules.py:140-458): projection pushdown + collapse, cross
    * flatten/canonical-order/literal-fold, cross-factor extraction out of
    * joins and subtracts, and join/union/subtract tree normalization. These
    * are the moves Catalyst cannot make because they encode *set* semantics;
    * canonical trees also let `isEquivalent` decide structural equality far
    * more often.
    */
  private[keyset] def rewrite(op: KeySetOp): KeySetOp = op match {
    case Project(child, cols) =>
      val c = rewrite(child)
      c match {
        // no-op projection
        case _ if c.columns == cols => c
        // collapse nested projections
        case Project(gchild, _) => rewrite(Project(gchild, cols))
        // push through cross-join: keep only factors contributing columns.
        // Reference-faithful quirk (project_across_crossjoin,
        // _rules.py:114-137 drops non-contributing factors the same way):
        // a ZERO-ROW dropped factor makes the cross empty, but its
        // projection onto the kept factors is then non-empty — both
        // engines deliberately trade this degenerate case for the rewrite
        // that makes AB["A"] * C equivalent to (AB * C)["A", "C"]
        case Cross(_, _) =>
          val fs = factors(c).flatMap { f =>
            val keep = cols.filter(f.columns.contains)
            if (keep.isEmpty) None
            else if (keep == f.columns) Some(f)
            else Some(rewrite(Project(f, keep)))
          }
          if (fs.isEmpty) FromTuples(Vector(Vector()), StructType(Nil))
          else {
            val folded = rebuildCross(fs)
            // preserve requested column order with a final reorder if needed
            if (folded.columns == cols) folded
            else reorder(folded, cols)
          }
        case FromTuples(rows, sch) =>
          val idx = cols.map(sch.fieldIndex)
          FromTuples(rows.map(r => idx.map(r).toVector).distinct,
            StructType(idx.map(sch.fields)))
        case other => Project(other, cols)
      }
    case Cross(l, r) => rebuildCross(factors(Cross(rewrite(l), rewrite(r))))
    case Join(l, r) => rewriteJoin(Join(rewrite(l), rewrite(r)))
    case Union(l, r) => normalizeUnion(Union(rewrite(l), rewrite(r)))
    case Subtract(l, r) => rewriteSubtract(Subtract(rewrite(l), rewrite(r)))
    case KFilter(c, cond) => KFilter(rewrite(c), cond)
    case leaf => leaf
  }

  /** Flattened cross-join factor list. */
  private def factors(op: KeySetOp): Vector[KeySetOp] = op match {
    case Cross(l, r) => factors(l) ++ factors(r)
    case other       => Vector(other)
  }

  /** Deterministic factor/leaf ordering key: sorted column names first, then
    * a structural hash to break ties (reference order_cross_joins /
    * normalize_joins, _rules.py:277-283,396).
    */
  private def orderKey(op: KeySetOp): (String, Int) =
    (op.columns.sorted.mkString("\u0000"), op.hashCode)

  /** Canonical cross of a factor list: drop empty-column (total-aggregation)
    * factors, sort the rest, rebuild left-deep (reference merge_cross_joins
    * + order_cross_joins, _rules.py:239-283). Literal folding is deliberately
    * NOT done here: the reference applies in-memory cross folding as the
    * LAST rule, at dataframe-conversion time (_rules.py:285-346) — folding
    * eagerly would hide cross factors from the join/subtract extraction
    * rules. materialize() folds literal factors driver-side instead.
    */
  private def rebuildCross(fs0: Vector[KeySetOp]): KeySetOp = {
    val fs = fs0.filter(_.columns.nonEmpty)
    if (fs.isEmpty) return fs0.headOption.getOrElse(FromTuples(Vector(Vector()), StructType(Nil)))
    fs.sortBy(orderKey).reduce(Cross(_, _))
  }

  /** Pull cross-join factors that touch none of the join columns out of a
    * join: Join(Cross(A, B), BC) -> Cross(A, Join(B, BC)) (reference
    * extract_crossjoin_from_join, _rules.py:166-210); then normalize the
    * remaining join chain into a sorted right-deep tree (normalize_joins,
    * _rules.py:349-396) when that preserves join-key structure.
    */
  private def rewriteJoin(j: Join): KeySetOp = {
    val joinCols = j.common.toSet
    val (lKeep, lOut) = factors(j.left).partition(_.columns.exists(joinCols))
    val (rKeep, rOut) = factors(j.right).partition(_.columns.exists(joinCols))
    val extracted = lOut ++ rOut
    if (extracted.nonEmpty && lKeep.nonEmpty && rKeep.nonEmpty) {
      val inner = Join(rebuildCross(lKeep), rebuildCross(rKeep))
      rebuildCross(extracted :+ normalizeJoin(inner))
    } else normalizeJoin(j)
  }

  private def normalizeJoin(j: Join): KeySetOp = {
    def leaves(op: KeySetOp): Vector[KeySetOp] = op match {
      case Join(l, r) => leaves(l) ++ leaves(r)
      case other      => Vector(other)
    }
    val ls = leaves(j).sortBy(orderKey)
    // rebuild right-deep: Join(l1, Join(l2, ... Join(ln-1, ln))); only valid
    // if every step still has join columns — otherwise keep the original
    try ls.reduceRight[KeySetOp]((l, r) => Join(l, r))
    catch { case _: IllegalArgumentException => j }
  }

  /** Pull cross-join factors sharing no column with the subtracted set out:
    * Subtract(Cross(AB, CD), A) -> Cross(CD, Subtract(AB, A)) (reference
    * extract_crossjoin_from_subtract, _rules.py:213-236); then order chained
    * subtract right sides canonically (normalize_subtracts, _rules.py:440+).
    */
  private def rewriteSubtract(s: Subtract): KeySetOp = {
    val subCols = s.right.columns.toSet
    val (keep, out) = factors(s.left).partition(_.columns.exists(subCols))
    if (out.nonEmpty && keep.nonEmpty &&
        subCols.subsetOf(keep.flatMap(_.columns).toSet)) {
      rebuildCross(out :+ normalizeSubtract(Subtract(rebuildCross(keep), s.right)))
    } else normalizeSubtract(s)
  }

  private def normalizeSubtract(s: Subtract): KeySetOp = {
    def chain(op: KeySetOp, acc: Vector[KeySetOp]): (KeySetOp, Vector[KeySetOp]) =
      op match {
        case Subtract(l, r) => chain(l, r +: acc)
        case base           => (base, acc)
      }
    val (base, rights) = chain(s, Vector.empty)
    rights.sortBy(orderKey).foldLeft(base)((l, r) => Subtract(l, r))
  }

  /** Flatten nested unions and order the operands canonically (reference
    * normalize_unions, _rules.py:399-437).
    */
  private def normalizeUnion(u: Union): KeySetOp = {
    def leaves(op: KeySetOp): Vector[KeySetOp] = op match {
      case Union(l, r) => leaves(l) ++ leaves(r)
      case other       => Vector(other)
    }
    leaves(u).sortBy(orderKey).reduceRight[KeySetOp]((l, r) => Union(l, r))
  }

  private def reorder(op: KeySetOp, cols: Seq[String]): KeySetOp = op match {
    case FromTuples(rows, sch) =>
      val idx = cols.map(sch.fieldIndex)
      FromTuples(rows.map(r => idx.map(r).toVector), StructType(idx.map(sch.fields)))
    case other => Project(other, cols)
  }

  // ------------------------------------------------------------ materialize

  private[keyset] def materialize(op: KeySetOp, spark: SparkSession): DataFrame =
    op match {
      case FromTuples(rows, sch) =>
        if (sch.isEmpty) spark.range(1).drop("id") // single empty key
        else spark.createDataFrame(
          java.util.Arrays.asList(rows.map(r => Row.fromSeq(r)): _*), sch)
      case FromDataFrame(df) => df
      case c: Cross =>
        // in-memory fold of literal factors, the reference's last rewrite
        // rule (apply_cross_joins_in_memory, _rules.py:285-346): group
        // literal factors greedily while the running product stays under the
        // cutoff, evaluate each group driver-side, cross-join the rest
        // distributed; a final select restores the op's column order
        val fs = factors(c)
        val (lits, rest) = fs.partition(_.isInstanceOf[FromTuples])
        val foldedLits = lits.map(_.asInstanceOf[FromTuples])
          .foldLeft(Vector.empty[FromTuples]) {
            case (acc :+ prev, t)
                if prev.rows.size.toLong * t.rows.size.toLong <= InMemoryCrossJoinCutoff =>
              acc :+ FromTuples(
                for { a <- prev.rows; b <- t.rows } yield a ++ b,
                StructType(prev.schema.fields ++ t.schema.fields))
            case (acc, t) => acc :+ t
          }
        ((foldedLits: Vector[KeySetOp]) ++ rest)
          .map(materialize(_, spark)).reduce(_ crossJoin _)
          .select(c.columns.map(col).toIndexedSeq: _*)
      case j @ Join(l, r) =>
        val (ld, rd) = (materialize(l, spark), materialize(r, spark))
        val rd2 = rd.select(rd.columns.map(c =>
          col(c).as(if (j.common.contains(c)) s"__ks_r_$c" else c)).toIndexedSeq: _*)
        val cond = j.common.map(c => ld(c) <=> rd2(s"__ks_r_$c")).reduce(_ && _)
        ld.join(rd2, cond, "inner")
          .select(j.columns.map(col).toIndexedSeq: _*)
      case Union(l, r) =>
        val (ld, rd) = (materialize(l, spark), materialize(r, spark))
        ld.unionByName(rd).distinct()
      case Subtract(l, r) =>
        val (ld, rd) = (materialize(l, spark), materialize(r, spark))
        val rcols = r.columns
        val rd2 = rd.select(rcols.map(c => col(c).as(s"__ks_r_$c")).toIndexedSeq: _*)
        val cond = rcols.map(c => ld(c) <=> rd2(s"__ks_r_$c")).reduce(_ && _)
        ld.join(rd2, cond, "left_anti")
      case Project(c, cols2) if cols2.toSet == c.columns.toSet =>
        // pure column reorder: rows are already distinct, skip the shuffle
        materialize(c, spark).select(cols2.map(col).toIndexedSeq: _*)
      case Project(c, cols2) =>
        materialize(c, spark).select(cols2.map(col).toIndexedSeq: _*).distinct()
      case KFilter(c, cond) => materialize(c, spark).filter(cond)
      case Detect(cols) => throw new IllegalStateException(
        s"KeySet.detect(${cols.mkString(", ")}) is plan-only: evaluate a query " +
          "that groups by it through a Session (ApproxDP budget required)")
    }
}
