package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting._
import graft.budget._
import graft.constraints._
import graft.ir._
import graft.keyset.KeySet

/** Invalid-query error tables: every rejected construction mirrors a case
  * from the reference's validation suites (test_query_expression_schema.py,
  * test_session.py error paths). The contract under test is that bad
  * queries fail at analysis time with a descriptive message — never at
  * execution time with a Spark stack trace, and never by silently
  * producing a wrong release.
  */
class QueryValidationSpec extends SparkSpec {

  private val Inf = PureDPBudget(Rat.Inf)

  private def df = makeDf(
    StructType(Seq(strCol("flag"), longCol("qty"), longCol("uid"))),
    Seq(Row("A", 1L, 1L), Row("B", 2L, 2L)))

  private def rows() = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
  private def ids() = Session.fromDataFrame(spark, Inf, "t", df, AddRowsWithID("uid"))

  private def failing(q: => Query, needle: String, s: Session = rows()): Unit = {
    val e = intercept[IllegalArgumentException] { s.evaluate(q, Inf) }
    assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
      s"message '${e.getMessage}' should mention '$needle'")
  }

  // -- aggregation argument validation ------------------------------------

  test("quantile: q outside [0,1] and inverted bounds are rejected") {
    intercept[IllegalArgumentException] {
      QueryBuilder("t").quantile("qty", 1.5, 0, 10)
    }
    intercept[IllegalArgumentException] {
      QueryBuilder("t").quantile("qty", -0.1, 0, 10)
    }
    intercept[IllegalArgumentException] {
      QueryBuilder("t").quantile("qty", 0.5, 10, 0)
    }
    // equal bounds are also degenerate for a quantile
    intercept[IllegalArgumentException] {
      QueryBuilder("t").quantile("qty", 0.5, 5, 5)
    }
  }

  test("sum/average/variance: inverted clamp bounds are rejected") {
    intercept[IllegalArgumentException] { QueryBuilder("t").sum("qty", 10, 0) }
    intercept[IllegalArgumentException] { QueryBuilder("t").average("qty", 10, 0) }
    intercept[IllegalArgumentException] { QueryBuilder("t").variance("qty", 10, 0) }
  }

  test("sum over a missing or non-numeric column fails at analysis") {
    failing(QueryBuilder("t").sum("nope", 0, 10), "nope")
    failing(QueryBuilder("t").sum("flag", 0, 10), "flag")
  }

  test("count_distinct over unknown columns fails at analysis") {
    failing(QueryBuilder("t").countDistinct(Seq("ghost")), "ghost")
  }

  // -- transform validation ----------------------------------------------

  test("select: duplicate and unknown columns are rejected") {
    intercept[IllegalArgumentException] {
      QueryBuilder("t").select("qty", "qty")
    }
    failing(QueryBuilder("t").select("ghost").count(), "ghost")
  }

  test("rename: unknown source and name collisions are rejected") {
    failing(QueryBuilder("t").rename(Map("ghost" -> "x")).count(), "ghost")
    failing(QueryBuilder("t").rename(Map("flag" -> "qty")).count(), "qty")
  }

  test("filter: empty condition rejected eagerly, bad SQL at analysis") {
    intercept[IllegalArgumentException] { QueryBuilder("t").filter("") }
    intercept[Exception] {
      rows().evaluate(QueryBuilder("t").filter("qty ><>< 3").count(), Inf)
    }
  }

  test("flat_map: non-positive max_rows is rejected") {
    intercept[IllegalArgumentException] {
      QueryBuilder("t").flatMap(_ => Seq.empty, Seq.empty, maxRows = 0)
    }
    intercept[IllegalArgumentException] {
      QueryBuilder("t").flatMap(_ => Seq.empty, Seq.empty, maxRows = -3)
    }
  }

  test("join_public: unsupported how and missing join columns are rejected") {
    intercept[IllegalArgumentException] {
      QueryBuilder("t").joinPublic("pub", Seq("flag"), how = "outer")
    }
    val s = rows()
    s.addPublicDataFrame("pub", df.select("flag"))
    val e = intercept[IllegalArgumentException] {
      s.evaluate(QueryBuilder("t").joinPublic("pub", Seq("ghost")).count(), Inf)
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("join_private of rows tables without truncation strategies is rejected") {
    failing(
      QueryBuilder("t").joinPrivate(QueryBuilder("t"), Seq("flag")).count(),
      "truncation")
  }

  // -- groupby / keyset validation ----------------------------------------

  test("groupby keyset column must exist with a matching type") {
    failing(QueryBuilder("t")
      .groupby(KeySet.fromColumn("ghost", Seq("A"))).count(), "ghost")
    failing(QueryBuilder("t")
      .groupby(KeySet.fromColumn("flag", Seq(1, 2))).count(), "flag")
  }

  test("grouped aggregation measure may not be a group-by key") {
    val e = intercept[IllegalArgumentException] {
      rows().evaluate(QueryBuilder("t")
        .groupby(KeySet.fromColumn("qty", Seq(1L, 2L)))
        .sum("qty", 0, 10), Inf)
    }
    assert(e.getMessage.contains("qty"))
  }

  test("suppress applies only to grouped counts and needs a sane threshold") {
    intercept[IllegalArgumentException] {
      QueryBuilder("t").groupby(KeySet.fromColumn("flag", Seq("A")))
        .sum("qty", 0, 10).suppress(1.0)
    }
  }

  // -- constraints / protected-change validation --------------------------

  test("constraints with non-positive bounds are rejected") {
    intercept[IllegalArgumentException] { MaxRowsPerID(0) }
    intercept[IllegalArgumentException] { MaxGroupsPerID("g", 0) }
    intercept[IllegalArgumentException] { MaxRowsPerGroupPerID("g", -1) }
  }

  test("enforce on a rows table is rejected; IDs aggregation needs a constraint") {
    failing(QueryBuilder("t").enforce(MaxRowsPerID(1)).count(), "ids")
    failing(QueryBuilder("t").count(), "constraint", ids())
  }

  test("MaxGroupsPerID on the id column itself is rejected") {
    val e = intercept[IllegalArgumentException] {
      ids().evaluate(
        QueryBuilder("t").enforce(MaxGroupsPerID("uid", 1))
          .enforce(MaxRowsPerGroupPerID("uid", 1)).count(), Inf)
    }
    assert(e.getMessage.contains("uid"))
  }

  // -- session / budget validation ----------------------------------------

  test("builder requires a budget and unique table names") {
    intercept[IllegalStateException] {
      new Session.Builder()
        .withPrivateDataFrame("a", df, AddOneRow()).build(spark)
    }
    intercept[IllegalArgumentException] {
      new Session.Builder().withPrivacyBudget(Inf)
        .withPrivateDataFrame("a", df, AddOneRow())
        .withPrivateDataFrame("a", df, AddOneRow()).build(spark)
    }
  }

  test("negative epsilon and delta outside [0,1] are rejected") {
    intercept[IllegalArgumentException] { PureDPBudget(Rat(-1, 2)) }
    intercept[IllegalArgumentException] { ApproxDPBudget(Rat(1, 2), Rat(-1, 10)) }
    intercept[IllegalArgumentException] { ApproxDPBudget(Rat(1, 2), Rat(2, 1)) }
    intercept[IllegalArgumentException] { RhoZCDPBudget(Rat(-1, 1)) }
  }

  test("evaluate on an unknown source names the available tables") {
    failing(QueryBuilder("ghost").count(), "t")
  }

  test("evaluate after stop is rejected") {
    val s = rows()
    s.stop()
    intercept[IllegalStateException] { s.evaluate(QueryBuilder("t").count(), Inf) }
  }

  test("protected-change arguments are validated eagerly") {
    intercept[IllegalArgumentException] { AddMaxRows(0) }
    intercept[IllegalArgumentException] { AddMaxRowsInMaxGroups("g", 0, 1) }
    intercept[IllegalArgumentException] { AddRowsWithID("uid", maxIDs = 0) }
  }

  test("AddRowsWithID requires the id column to exist") {
    intercept[IllegalArgumentException] {
      Session.fromDataFrame(spark, Inf, "t", df, AddRowsWithID("ghost"))
    }
  }

  test("view names cannot shadow existing tables; delete targets views only") {
    val s = rows()
    intercept[IllegalArgumentException] {
      s.createView(QueryBuilder("t").filter("qty > 0"), "t")
    }
    intercept[IllegalArgumentException] { s.deleteView("ghost") }
    // a base private table is not a view and cannot be deleted
    intercept[IllegalArgumentException] { s.deleteView("t") }
    // round trip: create, delete, recreate under the same name
    s.createView(QueryBuilder("t").filter("qty > 0"), "v")
    s.deleteView("v")
    s.createView(QueryBuilder("t").filter("qty > 1"), "v")
    assert(s.evaluate(QueryBuilder("v").count(), Inf)
      .collect().head.getLong(0) === 1L)
  }

  test("partition_and_create rejects an unknown split column") {
    val s = rows()
    intercept[IllegalArgumentException] {
      s.partitionAndCreate("t", Inf, "ghost", Seq("k" -> "A"))
    }
  }

  test("table, view, and split names must be identifiers (reference rule)") {
    for (bad <- Seq("", "my table", "1starts_with_digit", "has-dash", "a.b")) {
      intercept[IllegalArgumentException] {
        Session.fromDataFrame(spark, Inf, bad, df, AddOneRow())
      }
      val s = rows()
      intercept[IllegalArgumentException] { s.addPublicDataFrame(bad, df) }
      intercept[IllegalArgumentException] {
        s.createView(QueryBuilder("t").filter("qty > 0"), bad)
      }
      intercept[IllegalArgumentException] {
        s.partitionAndCreate("t", Inf, "flag", Seq(bad -> "A"))
      }
    }
    // underscores and digits after the first character are fine
    Session.fromDataFrame(spark, Inf, "table_2", df, AddOneRow())
      .evaluate(QueryBuilder("table_2").count(), Inf)
  }

  test("a renamed grouping column is still mandatory in the group-by " +
      "(test_invalid_grouping_with_view)") {
    import graft.types.{ColumnDescriptor, ColumnType}
    val s = rows()
    s.createView(
      QueryBuilder("t").flatMap(
        r => Seq(Map("Repeat" -> (if (r("flag") == "A") 1L else 2L))),
        Seq("Repeat" -> ColumnDescriptor(ColumnType.Integer)),
        maxRows = 1, augment = true, grouping = true)
        .rename(Map("Repeat" -> "repeated")),
      "grouping_flatmap_renamed", cache = false)
    // grouping column follows the rename: a groupby on flag alone fails...
    val e = intercept[IllegalArgumentException] {
      s.evaluate(QueryBuilder("grouping_flatmap_renamed")
        .groupby(KeySet.fromColumn("flag", Seq("A", "B")))
        .sum("qty", 0, 3), Inf)
    }
    assert(e.getMessage.contains("repeated"))
    // ...and including the renamed column succeeds
    s.evaluate(QueryBuilder("grouping_flatmap_renamed")
      .groupby(KeySet.fromColumn("repeated", Seq(1L, 2L)))
      .sum("qty", 0, 3), Inf)
  }

  test("stacking two grouping transformations is rejected " +
      "(test_invalid_double_grouping_with_view)") {
    import graft.types.{ColumnDescriptor, ColumnType}
    val s = rows()
    val first = QueryBuilder("t").flatMap(
      _ => Seq(Map("g1" -> 1L)),
      Seq("g1" -> ColumnDescriptor(ColumnType.Integer)),
      maxRows = 1, augment = true, grouping = true)
    s.createView(first, "grouped_once", cache = false)
    val e = intercept[IllegalArgumentException] {
      s.evaluate(QueryBuilder("grouped_once").flatMap(
        _ => Seq(Map("g2" -> 1L)),
        Seq("g2" -> ColumnDescriptor(ColumnType.Integer)),
        maxRows = 1, augment = true, grouping = true)
        .groupby(KeySet.fromColumn("g2", Seq(1L))).count(), Inf)
    }
    assert(e.getMessage.contains("grouping"))
  }

  test("unsupported column types are rejected with the column named") {
    import org.apache.spark.sql.types._
    val arrDf = makeDf(StructType(Seq(
      StructField("a", ArrayType(IntegerType)))), Seq(Row(Seq(1, 2))))
    val e = intercept[IllegalArgumentException] {
      Session.fromDataFrame(spark, Inf, "t", arrDf, AddOneRow())
    }
    assert(e.getMessage.contains("a") && e.getMessage.toLowerCase.contains("unsupported"))
    val boolDf = makeDf(StructType(Seq(StructField("b", BooleanType))), Seq(Row(true)))
    intercept[IllegalArgumentException] {
      Session.fromDataFrame(spark, Inf, "t", boolDf, AddOneRow())
    }
  }
}
