package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.constraints.TruncationStrategy
import graft.ir._
import graft.session.Session
import graft.types.{ColumnDescriptor, ColumnType}

/** Stability (d_in) propagation through every transformation, pinned by the
  * geometric noise scale of a downstream count at eps = 1 (scale =
  * d_in * sensitivity / eps, so the scale IS the stability). Mirrors the
  * reference's transformation-visitor stability assertions
  * (test/unit/query_expr_compiler/transformation_visitor/test_add_rows.py).
  */
class TransformStabilitySpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)
  private val eps1 = PureDPBudget(1.0)

  private def df = makeDf(
    StructType(Seq(strCol("flag"), longCol("qty"))),
    Seq(Row("A", 1L), Row("B", 2L)))

  private def pubDf = makeDf(
    StructType(Seq(strCol("flag"), longCol("x"))),
    Seq(Row("A", 1L), Row("A", 2L), Row("A", 3L), Row("B", 1L)))

  private def sess() = {
    val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
    s.addPublicDataFrame("pub", pubDf)
    s
  }

  private def scale(qb: QueryBuilder): Double =
    sess().noiseInfo(qb.count(), eps1).head.mechanism.scale

  test("row-preserving transforms keep stability 1") {
    assert(scale(QueryBuilder("t")) === 1.0)
    assert(scale(QueryBuilder("t").filter("qty > 0")) === 1.0)
    assert(scale(QueryBuilder("t").select("flag")) === 1.0)
    assert(scale(QueryBuilder("t").rename(Map("qty" -> "q2"))) === 1.0)
    assert(scale(QueryBuilder("t").map(identity,
      Seq("z" -> ColumnDescriptor(ColumnType.Integer)), augment = true)) === 1.0)
    assert(scale(QueryBuilder("t").replaceNullAndNan()) === 1.0)
    assert(scale(QueryBuilder("t").dropNullAndNan()) === 1.0)
    assert(scale(QueryBuilder("t")
      .binColumn("qty", BinningSpec(Seq(0.0, 1.0, 5.0)))) === 1.0)
  }

  test("flat maps multiply stability by max_rows, and compose") {
    def fm(n: Int)(qb: QueryBuilder) = qb.flatMap(r => Seq(r),
      Seq(s"c$n" -> ColumnDescriptor(ColumnType.Integer)),
      maxRows = n, augment = true)
    assert(scale(fm(3)(QueryBuilder("t"))) === 3.0)
    assert(scale(fm(3)(fm(2)(QueryBuilder("t")))) === 6.0)
  }

  test("public joins multiply stability by the measured fan-out") {
    // key 'A' appears 3 times in the public table: fan-out 3
    assert(scale(QueryBuilder("t").joinPublic("pub", Seq("flag"))) === 3.0)
  }

  test("private joins follow stab_l*max_r + stab_r*max_l " +
      "(truncation_strategy.py:17-31)") {
    def j(tl: TruncationStrategy, tr: TruncationStrategy): Double =
      scale(QueryBuilder("t").joinPrivate(
        QueryBuilder("t").rename(Map("qty" -> "q2")), tl, tr, Some(Seq("flag"))))
    // DropExcess(k) has stability factor 2 and row cap k
    assert(j(TruncationStrategy.DropExcess(2), TruncationStrategy.DropExcess(3))
      === 2.0 * 3 + 2.0 * 2) // 10
    assert(j(TruncationStrategy.DropNonUnique, TruncationStrategy.DropNonUnique)
      === 2.0) // 1*1 + 1*1
    assert(j(TruncationStrategy.DropExcess(1), TruncationStrategy.DropNonUnique)
      === 2.0 * 1 + 1.0 * 1) // 3
  }

  test("views carry their accumulated stability into queries") {
    val s = sess()
    s.createView(QueryBuilder("t").flatMap(r => Seq(r),
      Seq("c" -> ColumnDescriptor(ColumnType.Integer)),
      maxRows = 4, augment = true), "quadrupled", cache = false)
    assert(s.noiseInfo(QueryBuilder("quadrupled").count(), eps1)
      .head.mechanism.scale === 4.0)
    // and compose with further transforms on the view
    assert(s.noiseInfo(QueryBuilder("quadrupled").filter("qty > 0").count(), eps1)
      .head.mechanism.scale === 4.0)
  }
}
