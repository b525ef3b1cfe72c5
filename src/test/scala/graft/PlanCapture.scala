package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.QueryExecutionListener

/** Captures the physical plan of every action an operator runs — the only
  * way to pin plan shape for operators that materialize intermediate
  * results (`localCheckpoint` per iteration, `persist` + eager audits):
  * their RETURNED frame is just a checkpoint/cache scan, so asserting on
  * `df.queryExecution` checks nothing (a lesson learned when a LeftSemi
  * assert against frequentPairs' returned frame matched an empty scan
  * string).
  *
  * All counts are STRUCTURAL (node matches recursing through AQE wrappers
  * and materialized query stages) — an executed AQE plan's toString prints
  * both its Final and Initial sections, so substring counts double.
  *
  * Runs on an isolated child session: ExecutionListenerBus routes events
  * by session, so concurrently-running suites (sbt runs them in parallel
  * in one JVM against one shared SparkSession) cannot leak actions into a
  * capture.
  */
trait PlanCapture { self: SparkSpec =>

  final case class CapturedPlan(
      action: String, shuffles: Int, nestedJoins: Int, cartesians: Int,
      text: String)

  lazy val planSession = spark.newSession()

  /** Like makeDf but on the isolated session, so the operator's actions
    * fire where the capture listens. */
  def planDf(schema: StructType, rows: Seq[Row]): DataFrame =
    planSession.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  def structuralShuffles(p: SparkPlan): Int = p.collect {
    case _: ShuffleExchangeLike => 1
    case a: AdaptiveSparkPlanExec => structuralShuffles(a.executedPlan)
    case q: QueryStageExec => structuralShuffles(q.plan)
  }.sum

  def structuralNestedJoins(p: SparkPlan): Int = p.collect {
    case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => 1
    case a: AdaptiveSparkPlanExec => structuralNestedJoins(a.executedPlan)
    case q: QueryStageExec => structuralNestedJoins(q.plan)
  }.sum

  def structuralCartesians(p: SparkPlan): Int = p.collect {
    case _: org.apache.spark.sql.execution.joins.CartesianProductExec => 1
    case a: AdaptiveSparkPlanExec => structuralCartesians(a.executedPlan)
    case q: QueryStageExec => structuralCartesians(q.plan)
  }.sum

  /** Run `body` to completion (forced with a count) and return every
    * captured action's plan, in no particular order — the listener bus is
    * asynchronous, so we poll until it stops growing.
    */
  def capturedPlans(body: => DataFrame): Seq[CapturedPlan] = {
    val plans = new ConcurrentLinkedQueue[(String, SparkPlan)]
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        plans.add((f, qe.executedPlan))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    planSession.listenerManager.register(l)
    try {
      body.count()
      val deadline = System.nanoTime() + 20L * 1000000000L
      var lastSize = -1
      var stableAt = System.nanoTime()
      while (System.nanoTime() < deadline &&
          (plans.size != lastSize ||
            System.nanoTime() - stableAt < 700L * 1000000L)) {
        if (plans.size != lastSize) {
          lastSize = plans.size
          stableAt = System.nanoTime()
        }
        Thread.sleep(50)
      }
    } finally planSession.listenerManager.unregister(l)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq.map { case (f, p) =>
      CapturedPlan(f, structuralShuffles(p), structuralNestedJoins(p),
        structuralCartesians(p), p.toString)
    }
  }

  /** The per-iteration materializations only. */
  def checkpointPlans(body: => DataFrame): Seq[CapturedPlan] =
    capturedPlans(body).filter(c =>
      c.action == "localCheckpoint" || c.action == "checkpoint")
}
