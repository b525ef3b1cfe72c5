package graft.session

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddRowsWithID
import graft.budget.{PureDPBudget, Rat}
import graft.constraints._
import graft.ir._
import graft.keyset.KeySet

/** L0 (MaxGroupsPerID) x L-inf (MaxRowsPerGroupPerID) and L1 (MaxRowsPerID)
  * truncation outcomes on the reference's 6-row IDs fixture
  * (test/system/session/ids/test_l0_linf_truncation.py and
  * test_l1_truncation.py). Truncation keeps SOME subset respecting the
  * bounds — which rows survive is an implementation choice (here: xxhash64
  * order), so the assertions enumerate every legal outcome exactly as the
  * reference does.
  */
class TruncationMatrixSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  // id 1: three rows in group A; id 2: one row in A; id 3: one in A, one in B
  private def df = makeDf(
    StructType(Seq(longCol("id"), strCol("group"), strCol("group2"),
      longCol("n"), dblCol("float_n"))),
    Seq(
      Row(1L, "A", "X", 4L, 4.0),
      Row(1L, "A", "Y", 5L, 5.0),
      Row(1L, "A", "X", 6L, 6.0),
      Row(2L, "A", "Y", 7L, 7.0),
      Row(3L, "A", "X", 8L, 8.0),
      Row(3L, "B", "Y", 9L, 9.0)))

  private def sess = Session.fromDataFrame(spark, Inf, "t", df, AddRowsWithID("id"))

  private def survivors(q: QueryBuilder): Set[Long] = {
    // observe the surviving rows through a noiseless grouped count per n
    val keys = KeySet.fromColumn("n", (4L to 9L).map(java.lang.Long.valueOf))
    sess.evaluate(q.groupby(keys).count(), Inf)
      .collect().collect { case r if r.getLong(1) > 0 => r.getLong(0) }.toSet
  }

  // legal survivor sets per (maxGroups, maxRowsPerGroup), straight from the
  // reference's enumeration (test_l0_linf_truncation.py:27-76)
  private val l0LinfExpected: Seq[((Int, Int), Set[Set[Long]])] = Seq(
    (1, 1) -> (for { a <- Set(4L, 5L, 6L); b <- Set(8L, 9L) } yield Set(a, 7L, b)),
    (2, 1) -> Set(4L, 5L, 6L).map(a => Set(a, 7L, 8L, 9L)),
    (1, 2) -> (for {
      ab <- Set(Set(4L, 5L), Set(4L, 6L), Set(5L, 6L)); c <- Set(8L, 9L)
    } yield ab + 7L + c),
    (2, 2) -> Set(Set(4L, 5L), Set(4L, 6L), Set(5L, 6L)).map(_ ++ Set(7L, 8L, 9L)),
    (1, 3) -> Set(8L, 9L).map(c => Set(4L, 5L, 6L, 7L, c)),
    (2, 3) -> Set(Set(4L, 5L, 6L, 7L, 8L, 9L)))

  test("L0 x L-inf truncation keeps a legal subset for every bound combo") {
    l0LinfExpected.foreach { case ((g, r), legal) =>
      val got = survivors(QueryBuilder("t")
        .enforce(MaxGroupsPerID("group", g))
        .enforce(MaxRowsPerGroupPerID("group", r)))
      assert(legal.contains(got), s"(g=$g, r=$r): got $got, legal: $legal")
    }
  }

  test("L0 x L-inf truncation is deterministic across evaluations") {
    val q = () => QueryBuilder("t")
      .enforce(MaxGroupsPerID("group", 1))
      .enforce(MaxRowsPerGroupPerID("group", 2))
    assert(survivors(q()) === survivors(q()))
  }

  test("L1 truncation: MaxRowsPerID(k) keeps min(k, rows) per id") {
    // reference test_l1_truncation.py: counts 3/5/6 at k = 1/2/3
    val expectedCounts = Map(1 -> 3L, 2 -> 5L, 3 -> 6L)
    expectedCounts.foreach { case (k, n) =>
      val c = sess.evaluate(
        QueryBuilder("t").enforce(MaxRowsPerID(k)).count(), Inf)
        .collect().head.getLong(0)
      assert(c === n, s"MaxRowsPerID($k)")
      // id 2 only has one row, so its row always survives
      val got = survivors(QueryBuilder("t").enforce(MaxRowsPerID(k)))
      assert(got.contains(7L))
      assert(got.size === n)
    }
  }

  test("count-distinct optimization: applies exactly where the reference's does") {
    // reference test_count_distinct_optimization.py:26-105. Counting
    // distinct IDs needs no constraint (ungrouped) or a MaxGroupsPerID on
    // the single group-by column (grouped); anything else requires an
    // enforced row bound.
    val groupKeys = KeySet.fromColumn("group", Seq("A", "B"))
    val group2Keys = KeySet.fromColumn("group2", Seq("X", "Y"))
    def eval(q: Query) = sess.evaluate(q, Inf)
    // ungrouped: with or without constraints, 3 distinct ids
    Seq(
      QueryBuilder("t"),
      QueryBuilder("t").enforce(MaxRowsPerID(1)),
      QueryBuilder("t").enforce(MaxGroupsPerID("group", 2))
    ).foreach { b =>
      assert(eval(b.countDistinct(Seq("id"))).collect().head.getLong(0) === 3L)
    }
    // grouped with the matching MaxGroupsPerID
    val grouped = eval(QueryBuilder("t").enforce(MaxGroupsPerID("group", 2))
      .groupby(groupKeys).countDistinct(Seq("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped === Map("A" -> 3L, "B" -> 1L))
    val grouped2 = eval(QueryBuilder("t").enforce(MaxGroupsPerID("group2", 2))
      .groupby(group2Keys).countDistinct(Seq("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped2 === Map("X" -> 2L, "Y" -> 3L))
    // insufficient-constraint cases all fail analysis
    Seq(
      // extra distinct columns beyond the id
      QueryBuilder("t").countDistinct(Seq("id", "group")),
      // grouped without any MaxGroupsPerID
      QueryBuilder("t").groupby(groupKeys).countDistinct(Seq("id")),
      // MaxGroupsPerID on a different column than the group-by key
      QueryBuilder("t").enforce(MaxGroupsPerID("group2", 2))
        .groupby(groupKeys).countDistinct(Seq("id")),
      // multiple group-by columns
      QueryBuilder("t").enforce(MaxGroupsPerID("group", 2))
        .enforce(MaxGroupsPerID("group2", 2))
        .groupby(groupKeys * group2Keys).countDistinct(Seq("id"))
    ).foreach { q =>
      intercept[IllegalArgumentException] { eval(q) }
    }
  }

  test("grouped aggregation after truncation respects the keyset split") {
    // g=2, r=3 keeps everything: group A holds {4,5,6,7,8}, B holds {9}
    val out = sess.evaluate(QueryBuilder("t")
      .enforce(MaxGroupsPerID("group", 2))
      .enforce(MaxRowsPerGroupPerID("group", 3))
      .groupby(KeySet.fromColumn("group", Seq("A", "B")))
      .sum("n", 0, 10), Inf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("A" -> 30L, "B" -> 9L))
  }
}
