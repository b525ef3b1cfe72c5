package graft.ir

import org.scalatest.funsuite.AnyFunSuite
import graft.constraints.{MaxGroupsPerID, MaxRowsPerID, TruncationStrategy}
import graft.keyset.KeySet
import graft.types.{ColumnDescriptor, ColumnType}
import QueryExpr._

/** Builder-to-IR construction parity, mirroring the reference's
  * test/unit/test_query_builder.py: every fluent method must produce exactly
  * the expected QueryExpr node with the reference's defaults and output
  * names. These are pure IR assertions — no SparkSession.
  */
class QueryBuilderSpec extends AnyFunSuite {
  import ColumnType._

  private def root = QueryBuilder("private")
  private val keys = KeySet.fromColumn("A", Seq("x", "y"))

  // ------------------------------------------------------------ transforms

  test("join_public by id: with and without join columns (test_join_public)") {
    assert(root.joinPublic("pub").expr ===
      JoinPublic(PrivateSource("private"), Left("pub"), None, "inner"))
    assert(root.joinPublic("pub", Seq("B")).expr ===
      JoinPublic(PrivateSource("private"), Left("pub"), Some(Seq("B")), "inner"))
    assert(root.joinPublic("pub", Seq("B"), "left").expr ===
      JoinPublic(PrivateSource("private"), Left("pub"), Some(Seq("B")), "left"))
  }

  test("join_private: truncation strategies and optional join columns " +
      "(test_join_private)") {
    val right = QueryBuilder("private2")
    val j = root.joinPrivate(right,
      TruncationStrategy.DropExcess(1), TruncationStrategy.DropNonUnique,
      Some(Seq("A"))).expr
    assert(j === JoinPrivate(PrivateSource("private"), PrivateSource("private2"),
      Some(TruncationStrategy.DropExcess(1)), Some(TruncationStrategy.DropNonUnique),
      Some(Seq("A"))))
    // IDs-table overload: no truncation
    assert(root.joinPrivate(right).expr ===
      JoinPrivate(PrivateSource("private"), PrivateSource("private2"), None, None, None))
    assert(root.joinPrivate(right, Seq("A")).expr ===
      JoinPrivate(PrivateSource("private"), PrivateSource("private2"), None, None,
        Some(Seq("A"))))
  }

  test("join_private of a bare source id mirrors QueryBuilder(source) " +
      "(test_join_private_str)") {
    // reference: join_private("t") == join_private(QueryBuilder("t"))
    val viaBuilder = root.joinPrivate(QueryBuilder("t"),
      TruncationStrategy.DropExcess(2), TruncationStrategy.DropExcess(2)).expr
    assert(viaBuilder.asInstanceOf[JoinPrivate].right === PrivateSource("t"))
  }

  test("rename produces a Rename node (test_rename)") {
    assert(root.rename(Map("B" -> "C")).expr ===
      Rename(PrivateSource("private"), Map("B" -> "C")))
  }

  test("filter produces a Filter node (test_filter)") {
    assert(root.filter("A == 'yes'").expr ===
      Filter(PrivateSource("private"), "A == 'yes'"))
  }

  test("select keeps column order (test_select)") {
    assert(root.select("A", "B").expr ===
      Select(PrivateSource("private"), Seq("A", "B")))
  }

  test("map: augment flag and new column types pass through " +
      "(test_map_augment_is_false/true)") {
    val f = (r: DataRow.T) => Map[String, Any]("C" -> 1)
    val types = Seq("C" -> ColumnDescriptor(Integer))
    val m0 = root.map(f, types).expr.asInstanceOf[MapRows]
    assert(!m0.augment && m0.newColumns === types && (m0.f eq f))
    val m1 = root.map(f, types, augment = true).expr.asInstanceOf[MapRows]
    assert(m1.augment)
  }

  test("flat_map: max_rows, augment, grouping pass through; " +
      "non-positive max_rows rejected (test_invalid_flat_map)") {
    val f = (r: DataRow.T) => Seq[DataRow.T]()
    val types = Seq("G" -> ColumnDescriptor(Varchar))
    val fm = root.flatMap(f, types, maxRows = 2, augment = true, grouping = true)
      .expr.asInstanceOf[FlatMapRows]
    assert(fm.maxRows === 2 && fm.augment && fm.grouping)
    intercept[IllegalArgumentException] { root.flatMap(f, types, maxRows = 0) }
    intercept[IllegalArgumentException] { root.flatMap(f, types, maxRows = -1) }
  }

  test("flat_map_by_id wraps the per-id lambda (test_flat_map_by_id)") {
    val f = (rows: Seq[DataRow.T]) => rows
    val fm = root.flatMapByID(f, Seq("n" -> ColumnDescriptor(Integer)))
      .expr.asInstanceOf[FlatMapByID]
    assert(fm.f eq f)
    assert(fm.newColumns === Seq("n" -> ColumnDescriptor(Integer)))
  }

  test("bin_column: default and explicit output names (test_bin_column*)") {
    val spec = BinningSpec(Seq(0.0, 10.0, 20.0))
    assert(root.binColumn("A", spec).expr ===
      BinColumn(PrivateSource("private"), "A", spec, "A_binned"))
    assert(root.binColumn("A", spec, Some("bucket")).expr ===
      BinColumn(PrivateSource("private"), "A", spec, "bucket"))
  }

  test("histogram lowers to bin + groupby(bins) + count (test_histogram*)") {
    val spec = BinningSpec(Seq(0.0, 10.0, 20.0))
    val q = root.histogram("A", spec).expr.asInstanceOf[GroupByCount]
    assert(q.child === BinColumn(PrivateSource("private"), "A", spec, "A_binned"))
    assert(q.keys.columns === Seq("A_binned"))
    // explicit name threads through both the bin column and the keyset
    val q2 = root.histogram("A", spec, Some("bkt")).expr.asInstanceOf[GroupByCount]
    assert(q2.child === BinColumn(PrivateSource("private"), "A", spec, "bkt"))
    assert(q2.keys.columns === Seq("bkt"))
  }

  test("replace_null_and_nan / replace_infinity defaults are empty maps " +
      "(test_replace_*)") {
    assert(root.replaceNullAndNan().expr ===
      ReplaceNullAndNan(PrivateSource("private"), Map.empty))
    assert(root.replaceNullAndNan(Map("B" -> 0.0)).expr ===
      ReplaceNullAndNan(PrivateSource("private"), Map("B" -> 0.0)))
    assert(root.replaceInfinity().expr ===
      ReplaceInfinity(PrivateSource("private"), Map.empty))
    assert(root.replaceInfinity(Map("B" -> (-1.0, 1.0))).expr ===
      ReplaceInfinity(PrivateSource("private"), Map("B" -> (-1.0, 1.0))))
  }

  test("drop_null_and_nan / drop_infinity column lists (test_drop_*)") {
    assert(root.dropNullAndNan().expr ===
      DropNullAndNan(PrivateSource("private"), Nil))
    assert(root.dropNullAndNan("B", "C").expr ===
      DropNullAndNan(PrivateSource("private"), Seq("B", "C")))
    assert(root.dropInfinity("B").expr ===
      DropInfinity(PrivateSource("private"), Seq("B")))
  }

  test("enforce wraps the constraint (test_enforce)") {
    assert(root.enforce(MaxRowsPerID(5)).expr ===
      EnforceConstraint(PrivateSource("private"), MaxRowsPerID(5)))
    assert(root.enforce(MaxGroupsPerID("G", 2)).expr ===
      EnforceConstraint(PrivateSource("private"), MaxGroupsPerID("G", 2)))
  }

  test("get_groups: explicit columns or discover-all default (test_get_groups)") {
    assert(root.getGroups("A", "B").expr ===
      GetGroups(PrivateSource("private"), Seq("A", "B")))
    assert(root.getGroups().expr === GetGroups(PrivateSource("private"), Nil))
  }

  test("get_bounds default output names are <col>_lower/upper_bound") {
    val gb = root.getBounds("A").expr.asInstanceOf[GetBounds]
    assert(gb.lowerColumn === "A_lower_bound")
    assert(gb.upperColumn === "A_upper_bound")
    val named = root.getBounds("A", "lo", "hi").expr.asInstanceOf[GetBounds]
    assert(named.lowerColumn === "lo" && named.upperColumn === "hi")
  }

  // ------------------------------------------------- aggregation defaults

  test("count: default name and mechanism, ungrouped = empty keyset " +
      "(TestAggregations.test_count_*)") {
    val q = root.count().expr.asInstanceOf[GroupByCount]
    assert(q.outputColumn === "count")
    assert(q.mechanism === MechanismHint.Default)
    assert(q.keys.isEmptyKey)
    val g = root.groupby(keys).count("n", MechanismHint.Laplace)
      .expr.asInstanceOf[GroupByCount]
    assert(g.outputColumn === "n" && g.mechanism === MechanismHint.Laplace)
    assert(g.keys === keys)
  }

  test("count_distinct: default name lists counted columns " +
      "(test_count_distinct_*)") {
    assert(root.countDistinct().expr.asInstanceOf[GroupByCountDistinct]
      .outputColumn === "count_distinct")
    assert(root.countDistinct(Seq("A", "B")).expr.asInstanceOf[GroupByCountDistinct]
      .outputColumn === "count_distinct(A, B)")
    val g = root.groupby(keys).countDistinct(Seq("B"), "n")
      .expr.asInstanceOf[GroupByCountDistinct]
    assert(g.outputColumn === "n" && g.columnsToCount === Seq("B"))
  }

  test("quantile family: default names embed the quantile " +
      "(test_quantile_*)") {
    val q = root.quantile("A", 0.25, 0, 100).expr.asInstanceOf[GroupByQuantile]
    assert(q.quantile === 0.25)
    assert(q.outputColumn === "A_quantile(0.25)")
    assert(root.median("A", 0, 100).expr.asInstanceOf[GroupByQuantile]
      .outputColumn === "A_median")
    // min/max/median lower to quantile 0 / 1 / 0.5 (query_builder.py:3146,3220,3291)
    assert(root.min("A", 0, 100).expr.asInstanceOf[GroupByQuantile].quantile === 0.0)
    assert(root.max("A", 0, 100).expr.asInstanceOf[GroupByQuantile].quantile === 1.0)
    assert(root.median("A", 0, 100).expr.asInstanceOf[GroupByQuantile].quantile === 0.5)
    assert(root.min("A", 0, 100).expr.asInstanceOf[GroupByQuantile]
      .outputColumn === "A_min")
    assert(root.max("A", 0, 100).expr.asInstanceOf[GroupByQuantile]
      .outputColumn === "A_max")
    // integral quantile renders like Python's repr: "A_quantile(1.0)"
    assert(root.quantile("A", 1.0, 0, 100).expr.asInstanceOf[GroupByQuantile]
      .outputColumn === "A_quantile(1.0)")
  }

  test("bounded aggregates: <column>_<agg> default names (test_sum/average/" +
      "variance/stdev)") {
    assert(root.sum("A", 0, 10).expr.asInstanceOf[GroupByBoundedSum]
      .outputColumn === "A_sum")
    assert(root.average("A", 0, 10).expr.asInstanceOf[GroupByBoundedAverage]
      .outputColumn === "A_average")
    assert(root.variance("A", 0, 10).expr.asInstanceOf[GroupByBoundedVariance]
      .outputColumn === "A_variance")
    assert(root.stdev("A", 0, 10).expr.asInstanceOf[GroupByBoundedStdev]
      .outputColumn === "A_stdev")
    val s = root.groupby(keys).sum("A", -5, 5, "total", MechanismHint.Gaussian)
      .expr.asInstanceOf[GroupByBoundedSum]
    assert(s.low === -5 && s.high === 5 && s.outputColumn === "total" &&
      s.mechanism === MechanismHint.Gaussian)
  }

  test("bounds are validated at construction (test_invalid_*)") {
    intercept[IllegalArgumentException] { root.sum("A", 10, 0) }
    intercept[IllegalArgumentException] { root.quantile("A", -0.1, 0, 1) }
    intercept[IllegalArgumentException] { root.quantile("A", 1.1, 0, 1) }
    intercept[IllegalArgumentException] { root.quantile("A", 0.5, 1, 1) }
  }

  test("suppress: only legal over counts (test_suppress_aggregates)") {
    val sup = root.groupby(keys).count().suppress(3.0).expr
      .asInstanceOf[SuppressAggregates]
    assert(sup.threshold === 3.0)
    assert(sup.child.keys === keys)
    intercept[IllegalArgumentException] { root.sum("A", 0, 1).suppress(3.0) }
    intercept[IllegalArgumentException] { root.countDistinct().suppress(3.0) }
  }

  // ------------------------------------------ immutability & equality

  test("builders are immutable: branching never mutates the receiver " +
      "(test_query_immutability)") {
    val base = root.filter("A > 0")
    val left = base.select("A")
    val right = base.rename(Map("A" -> "B"))
    // base is unchanged and both branches share the same child node
    assert(base.expr === Filter(PrivateSource("private"), "A > 0"))
    assert(left.expr.asInstanceOf[Select].child === base.expr)
    assert(right.expr.asInstanceOf[Rename].child === base.expr)
    assert(base.cloneBuilder().expr === base.expr)
  }

  test("structurally identical queries compare equal " +
      "(test_query_fast_equality_check)") {
    def q1 = root.filter("B > 1").groupby(KeySet.fromColumn("A", Seq("x")))
      .count()
    assert(q1 === q1)
    assert(root.sum("A", 0, 10) === root.sum("A", 0, 10))
    assert(root.sum("A", 0, 10) !== root.sum("A", 0, 11))
    assert(root.sum("A", 0, 10) !== root.sum("B", 0, 10))
    assert(root.count() !== root.countDistinct())
    // different mechanisms are different queries
    assert(root.count(mechanism = MechanismHint.Laplace) !==
      root.count(mechanism = MechanismHint.Gaussian))
  }

  test("named lambdas give map/flatMap queries a stable identity " +
      "(SURVEY 7.4; reference compares lambda bytecode)") {
    val cols = Seq("n" -> ColumnDescriptor(Integer))
    // separately-written but identical lambdas: unnamed, never equal...
    assert(root.map(r => Map("n" -> 1L), cols).expr !==
      root.map(r => Map("n" -> 1L), cols).expr)
    // ...named with the same name, equal
    assert(root.map(r => Map("n" -> 1L), cols, name = "one").expr ===
      root.map(r => Map("n" -> 1L), cols, name = "one").expr)
    assert(root.map(r => Map("n" -> 1L), cols, name = "one").expr.hashCode ===
      root.map(r => Map("n" -> 1L), cols, name = "one").expr.hashCode)
    // different names or different non-lambda arguments: not equal
    assert(root.map(r => Map("n" -> 1L), cols, name = "one").expr !==
      root.map(r => Map("n" -> 1L), cols, name = "two").expr)
    assert(root.map(r => Map("n" -> 1L), cols, augment = true, name = "one").expr !==
      root.map(r => Map("n" -> 1L), cols, name = "one").expr)
    // flatMap and flatMapByID get the same treatment
    assert(root.flatMap(r => Seq(Map("n" -> 1L)), cols, maxRows = 2,
        name = "fan").expr ===
      root.flatMap(r => Seq(Map("n" -> 1L)), cols, maxRows = 2,
        name = "fan").expr)
    assert(root.flatMap(r => Seq(Map("n" -> 1L)), cols, maxRows = 2,
        name = "fan").expr !==
      root.flatMap(r => Seq(Map("n" -> 1L)), cols, maxRows = 3,
        name = "fan").expr)
    assert(root.flatMapByID(rs => rs, cols, name = "per_id").expr ===
      root.flatMapByID(rs => rs, cols, name = "per_id").expr)
    // a named lambda still executes like the bare one
    val named = new NamedFn[DataRow.T, DataRow.T](_ => Map("n" -> 7L), "c7")
    assert(named(Map.empty) === Map("n" -> 7L))
  }
}
