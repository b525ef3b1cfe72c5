package graft.ir

import graft.SparkSpec
import graft.constraints.{MaxRowsPerID, TruncationStrategy}
import graft.keyset.KeySet
import graft.types._
import QueryExpr._

/** IR-level schema computation + validation, mirroring the reference's
  * expected-schema test tables (test/unit/test_query_expression_schema.py).
  */
class QueryExprSchemaSpec extends SparkSpec {
  import ColumnType._

  private val lineitem = TableSchema(Seq(
    "flag" -> ColumnDescriptor(Varchar),
    "qty" -> ColumnDescriptor(Decimal, allowNull = true, allowNaN = true, allowInf = true),
    "key" -> ColumnDescriptor(Integer)))
  private val events = TableSchema(Seq(
    "user_id" -> ColumnDescriptor(Integer),
    "etype" -> ColumnDescriptor(Varchar)),
    idColumn = Some("user_id"), idSpace = Some("ids"))
  private val cat = CatalogSchemas(
    Map("lineitem" -> lineitem, "events" -> events), Map.empty)

  private def src = PrivateSource("lineitem")

  test("private source resolves or fails with available tables") {
    assert(src.schema(cat) === lineitem)
    val e = intercept[IllegalArgumentException] { PrivateSource("nope").schema(cat) }
    assert(e.getMessage.contains("lineitem"))
  }

  test("rename remaps columns and rejects unknown/conflicting names") {
    val r = Rename(src, Map("flag" -> "f2"))
    assert(r.schema(cat).columnNames === Seq("f2", "qty", "key"))
    intercept[IllegalArgumentException] { Rename(src, Map("zz" -> "x")).schema(cat) }
    intercept[IllegalArgumentException] { Rename(src, Map("flag" -> "qty")).schema(cat) }
  }

  test("select keeps order, protects id column") {
    assert(Select(src, Seq("key", "flag")).schema(cat).columnNames === Seq("key", "flag"))
    intercept[IllegalArgumentException] { Select(src, Seq("nope")).schema(cat) }
    intercept[IllegalArgumentException] {
      Select(PrivateSource("events"), Seq("etype")).schema(cat)
    }
  }

  test("map: augment appends nullable columns, non-augment replaces") {
    val m = MapRows(src, identity, Seq("z" -> ColumnDescriptor(Integer)), augment = true)
    val s = m.schema(cat)
    assert(s.columnNames === Seq("flag", "qty", "key", "z"))
    assert(s("z").allowNull)
    val m2 = MapRows(src, identity, Seq("z" -> ColumnDescriptor(Integer)), augment = false)
    assert(m2.schema(cat).columnNames === Seq("z"))
    intercept[IllegalArgumentException] {
      MapRows(src, identity, Seq("flag" -> ColumnDescriptor(Varchar)), augment = true)
        .schema(cat)
    }
  }

  test("grouping flat map must add exactly one column and sets metadata") {
    val fm = FlatMapRows(src, _ => Nil, Seq("g" -> ColumnDescriptor(Varchar)),
      augment = true, maxRows = 2, grouping = true)
    assert(fm.schema(cat).groupingColumn === Some("g"))
    intercept[IllegalArgumentException] {
      FlatMapRows(src, _ => Nil,
        Seq("g" -> ColumnDescriptor(Varchar), "h" -> ColumnDescriptor(Varchar)),
        augment = true, maxRows = 2, grouping = true).schema(cat)
    }
  }

  test("flat_map_by_id requires an IDs table and keeps the id column") {
    val f = FlatMapByID(PrivateSource("events"), identity,
      Seq("n" -> ColumnDescriptor(Integer)))
    assert(f.schema(cat).columnNames === Seq("user_id", "n"))
    intercept[IllegalArgumentException] {
      FlatMapByID(src, identity, Seq("n" -> ColumnDescriptor(Integer))).schema(cat)
    }
  }

  test("join schema: join cols, left-only, right-only, suffixed overlap") {
    val right = TableSchema(Seq(
      "key" -> ColumnDescriptor(Integer),
      "qty" -> ColumnDescriptor(Decimal),
      "extra" -> ColumnDescriptor(Varchar)))
    val cat2 = CatalogSchemas(Map("lineitem" -> lineitem, "pub" -> right.copy()),
      Map("pub" -> right))
    val j = JoinPublic(src, Left("pub"), Some(Seq("key")))
    assert(j.schema(cat2).columnNames ===
      Seq("key", "flag", "extra", "qty_left", "qty_right"))
  }

  test("private join of non-ID tables needs truncation strategies") {
    intercept[IllegalArgumentException] {
      JoinPrivate(src, Select(src, Seq("key")), None, None, Some(Seq("key"))).schema(cat)
    }
    val ok = JoinPrivate(src, Select(src, Seq("key")),
      Some(TruncationStrategy.DropExcess(1)), Some(TruncationStrategy.DropNonUnique),
      Some(Seq("key")))
    assert(ok.schema(cat).columnNames.head === "key")
  }

  test("groupby validation: keyset types, measure column rules") {
    val goodKeys = KeySet.fromColumn("flag", Seq("A"))
    assert(GroupByCount(src, goodKeys).schema(cat).columnNames === Seq("flag", "count"))
    intercept[IllegalArgumentException] {
      GroupByCount(src, KeySet.fromColumn("nope", Seq("A"))).schema(cat)
    }
    // keyset type must match table type (flag is VARCHAR, keyset is INTEGER)
    intercept[IllegalArgumentException] {
      GroupByCount(src, KeySet.fromColumn("flag", Seq(1, 2))).schema(cat)
    }
    intercept[IllegalArgumentException] {
      GroupByBoundedSum(src, goodKeys, "flag", 0, 1).schema(cat)
    }
    // measure may not be the id column
    intercept[IllegalArgumentException] {
      GroupByBoundedSum(PrivateSource("events"), KeySet.fromColumn("etype", Seq("x")),
        "user_id", 0, 1).schema(cat)
    }
    assert(GroupByBoundedSum(src, goodKeys, "qty", 0, 10).schema(cat)("sum").ctype === Decimal)
    assert(GroupByBoundedAverage(src, goodKeys, "qty", 0, 10).schema(cat)("average").ctype === Decimal)
    assert(GroupByBoundedSum(src, goodKeys, "key", 0, 10).schema(cat)("sum").ctype === Integer)
  }

  test("replace/drop special values validate column types") {
    intercept[IllegalArgumentException] {
      ReplaceInfinity(src, Map("flag" -> (0.0, 1.0))).schema(cat)
    }
    val r = ReplaceNullAndNan(src, Map("qty" -> 0.0)).schema(cat)
    assert(!r("qty").allowNull && !r("qty").allowNaN && r("qty").allowInf)
    val d = DropInfinity(src, Seq("qty")).schema(cat)
    assert(!d("qty").allowInf && d("qty").allowNull)
  }

  test("enforce requires an IDs table; suppress only over counts") {
    intercept[IllegalArgumentException] {
      EnforceConstraint(src, MaxRowsPerID(2)).schema(cat)
    }
    assert(EnforceConstraint(PrivateSource("events"), MaxRowsPerID(2))
      .schema(cat).idColumn === Some("user_id"))
    intercept[IllegalArgumentException] {
      Query(GroupByBoundedSum(src, KeySet.empty, "qty", 0, 1)).suppress(5)
    }
    // grouping-column constraints: must exist and must not be the ID column
    // (reference test_invalid_constraints.py:62-90)
    intercept[IllegalArgumentException] {
      EnforceConstraint(PrivateSource("events"),
        graft.constraints.MaxGroupsPerID("ghost", 2)).schema(cat)
    }
    intercept[IllegalArgumentException] {
      EnforceConstraint(PrivateSource("events"),
        graft.constraints.MaxGroupsPerID("user_id", 2)).schema(cat)
    }
    intercept[IllegalArgumentException] {
      EnforceConstraint(PrivateSource("events"),
        graft.constraints.MaxRowsPerGroupPerID("user_id", 2)).schema(cat)
    }
  }

  test("descriptor triple propagation follows the reference's per-op table " +
      "(test_query_expression_schema.py; _query_expr.py:1159-1440)") {
    val d0 = lineitem("qty")
    assert((d0.allowNull, d0.allowNaN, d0.allowInf) === (true, true, true))
    // replace_null_and_nan: named column clears null+nan, keeps inf
    val r1 = ReplaceNullAndNan(src, Map("qty" -> 0.0)).schema(cat)("qty")
    assert((r1.allowNull, r1.allowNaN, r1.allowInf) === (false, false, true))
    // empty mapping = every column
    val r2 = ReplaceNullAndNan(src, Map.empty).schema(cat)
    assert(r2.columns.forall { case (_, d) => !d.allowNull && !d.allowNaN })
    assert(r2("qty").allowInf)
    // replace_infinity: clears inf only
    val r3 = ReplaceInfinity(src, Map("qty" -> (0.0, 0.0))).schema(cat)("qty")
    assert((r3.allowNull, r3.allowNaN, r3.allowInf) === (true, true, false))
    // drop_null_and_nan mirrors replace; drop_infinity mirrors replace_infinity
    val r4 = DropNullAndNan(src, Seq("qty")).schema(cat)("qty")
    assert((r4.allowNull, r4.allowNaN, r4.allowInf) === (false, false, true))
    val r5 = DropInfinity(src, Seq("qty")).schema(cat)("qty")
    assert((r5.allowNull, r5.allowNaN, r5.allowInf) === (true, true, false))
    // untargeted columns ride through untouched
    val r6 = ReplaceNullAndNan(src, Map("qty" -> 0.0)).schema(cat)("flag")
    assert(r6 === lineitem("flag"))
    // filter / rename / select preserve descriptors exactly
    assert(Filter(src, "key > 0").schema(cat)("qty") === d0)
    assert(Rename(src, Map("qty" -> "q2")).schema(cat)("q2") === d0)
    assert(Select(src, Seq("qty")).schema(cat)("qty") === d0)
    // aggregate outputs are non-null (reference _query_expr.py:1630-1638)
    val ks = KeySet.fromColumn("flag", Seq("A"))
    val agg = GroupByCount(src, ks, "n").schema(cat)("n")
    assert((agg.ctype, agg.allowNull) === (ColumnType.Integer, false))
    val s2 = GroupByBoundedSum(src, ks, "qty", 0, 1, "s").schema(cat)("s")
    assert((s2.ctype, s2.allowNull) === (ColumnType.Decimal, false))
  }

  test("special-value ops never touch the privacy ID column") {
    val ev = PrivateSource("events")
    // explicit targeting of the id column is an error...
    intercept[IllegalArgumentException] {
      ReplaceNullAndNan(ev, Map("user_id" -> 0L)).schema(cat)
    }
    intercept[IllegalArgumentException] {
      ReplaceInfinity(ev, Map("user_id" -> (0.0, 0.0))).schema(cat)
    }
    intercept[IllegalArgumentException] {
      DropNullAndNan(ev, Seq("user_id")).schema(cat)
    }
    intercept[IllegalArgumentException] {
      DropInfinity(ev, Seq("user_id")).schema(cat)
    }
    // ...but the all-columns default proceeds, leaving the id column alone
    // (it may still contain nulls; reference warns,
    // test_id_col_operations.py:105-122)
    val s = ReplaceNullAndNan(ev, Map.empty).schema(cat)
    assert(s.idColumn === Some("user_id"))
    assert(DropNullAndNan(ev, Nil).schema(cat).idColumn === Some("user_id"))
  }

  test("bin column replaces or appends with VARCHAR descriptor") {
    val spec = BinningSpec(Seq(0.0, 5.0, 10.0))
    val b = BinColumn(src, "qty", spec, "qty_binned").schema(cat)
    assert(b("qty_binned").ctype === Varchar)
    intercept[IllegalArgumentException] {
      BinColumn(src, "flag", spec, "x").schema(cat)
    }
  }

  test("binning spec names and bins") {
    val spec = BinningSpec(Seq(0.0, 5.0, 10.0))
    assert(spec.binNames === Seq("[0.00, 5.00]", "(5.00, 10.00]"))
    assert(BinningSpec(Seq(0.0, 5.0, 10.0), right = false).binNames
      === Seq("[0.00, 5.00)", "[5.00, 10.00]"))
    intercept[IllegalArgumentException] { BinningSpec(Seq(1.0)) }
    intercept[IllegalArgumentException] { BinningSpec(Seq(2.0, 1.0)) }
  }

  test("binning spec scalar call mirrors the doctest (binning_spec.py:309)") {
    val spec = BinningSpec(Seq(0.0, 5.0, 10.0))
    assert(spec(0.0) === Some("[0.00, 5.00]"))
    assert(spec(5.0) === Some("[0.00, 5.00]"))
    assert(spec(6.0) === Some("(5.00, 10.00]"))
    assert(spec(10.0) === Some("(5.00, 10.00]"))
    assert(spec(11.0) === None)
    assert(spec(Double.NaN) === None)
    val nanSpec = BinningSpec(Seq(0.0, 1.0), nanBin = Some("nan"))
    assert(nanSpec(Double.NaN) === Some("nan"))
    // typed edges: dates
    import BinningSpec._
    val d = (1992 to 1994).map(y => java.sql.Date.valueOf(s"$y-01-01"))
    val ds = BinningSpec(d)
    assert(ds(java.sql.Date.valueOf("1992-06-15")) === Some("[1992-01-01, 1993-01-01]"))
    assert(ds(java.sql.Date.valueOf("1995-01-01")) === None)
  }
}
