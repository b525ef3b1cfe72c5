package graft.budget

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.ir.QueryBuilder
import graft.session.Session

/** Budget-request tolerance matrix (reference
  * test/system/session/test_budgets.py + privacy_budget.py:509-600): a
  * request exceeding the remaining budget by at most one part in 10^9
  * (relative) rounds DOWN and consumes all remaining budget; larger
  * over-requests are rejected; ApproxDP with delta = 1 is fully infinite.
  */
class BudgetAdjustSpec extends SparkSpec {

  private def df = makeDf(StructType(Seq(longCol("v"))), Seq(Row(1L), Row(2L)))
  private def sess(b: PrivacyBudget) =
    Session.fromDataFrame(spark, b, "t", df, AddOneRow())
  private def count = QueryBuilder("t").count()

  test("slight over-requests round down and drain the budget") {
    val cases: Seq[(PrivacyBudget, PrivacyBudget)] = Seq(
      PureDPBudget(2.0) -> PureDPBudget(2.000000001),
      PureDPBudget(1.999999999) -> PureDPBudget(2.0),
      RhoZCDPBudget(2.0) -> RhoZCDPBudget(2.000000001),
      ApproxDPBudget(2.0, 0.1) -> ApproxDPBudget(2.000000001, 0.1),
      ApproxDPBudget(2.0, 0.1) -> PureDPBudget(2.000000001),
      PureDPBudget(Double.MaxValue) -> PureDPBudget(Double.MaxValue))
    cases.foreach { case (session, request) =>
      val s = sess(session)
      s.evaluate(count, request) // must not throw
      ()
    }
    // the slightly-over request consumed everything
    val s = sess(PureDPBudget(2.0))
    s.evaluate(count, PureDPBudget(2.000000001))
    assert(s.remainingPrivacyBudget === PureDPBudget(Rat.zero))
  }

  test("under-requests leave the exact remainder") {
    val s = sess(PureDPBudget(2.000000001))
    s.evaluate(count, PureDPBudget(2.0))
    assert(s.remainingPrivacyBudget === PureDPBudget(Rat(2.000000001) - Rat(2.0)))
  }

  test("over-requests beyond the tolerance are rejected") {
    intercept[IllegalArgumentException] {
      sess(PureDPBudget(2.0)).evaluate(count, PureDPBudget(2.001))
    }
    intercept[IllegalArgumentException] {
      sess(ApproxDPBudget(1.0, 0.1)).evaluate(count, PureDPBudget(1.1))
    }
    // an exhausted budget accepts nothing (tolerance is relative to 0)
    val s = sess(PureDPBudget(1.0))
    s.evaluate(count, PureDPBudget(1.0))
    intercept[IllegalArgumentException] { s.evaluate(count, PureDPBudget(1e-12)) }
  }

  test("the eps/3 x 3 float workflow spends to exactly zero") {
    // the motivating scenario: a user divides a float budget into thirds;
    // 1.0/3 is not exact in binary, so the last request slightly over- or
    // under-shoots — the tolerance must absorb it either way
    val third = 1.0 / 3.0
    val s = sess(PureDPBudget(1.0))
    s.evaluate(count, PureDPBudget(third))
    s.evaluate(count, PureDPBudget(third))
    s.evaluate(count, PureDPBudget(third))
    // whatever is left is at most a few ulps; a full-third request is
    // still absorbed by the relative tolerance only if within 1e-9 of the
    // remainder — which it is not, so the session correctly refuses more
    intercept[IllegalArgumentException] { s.evaluate(count, PureDPBudget(third)) }
  }

  test("zero budgets are rejected up front") {
    Seq[(PrivacyBudget, PrivacyBudget)](
      PureDPBudget(1.0) -> PureDPBudget(Rat.zero),
      ApproxDPBudget(1.0, 0.1) -> ApproxDPBudget(Rat.zero, Rat.zero),
      RhoZCDPBudget(1.0) -> RhoZCDPBudget(Rat.zero)
    ).foreach { case (session, zero) =>
      val ex = intercept[IllegalArgumentException] { sess(session).evaluate(count, zero) }
      assert(ex.getMessage.contains("non-zero"))
    }
  }

  test("ApproxDP with delta = 1 is fully infinite") {
    val s = sess(ApproxDPBudget(Rat(1), Rat.one))
    s.evaluate(count, ApproxDPBudget(Rat.Inf, Rat(1, 10)))
    s.evaluate(count, ApproxDPBudget(Rat(5), Rat.one))
    s.evaluate(count, PureDPBudget(100.0))
  }
}
