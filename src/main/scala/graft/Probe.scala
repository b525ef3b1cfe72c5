package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Scratch probe main for API/plan experiments (contents churn per round). */
object Probe {
  def shuffles(p: SparkPlan): Int = p.collect {
    case _: ShuffleExchangeLike => 1
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
  }.sum
  def bad(p: SparkPlan): Boolean = {
    val s = p.toString
    s.contains("CartesianProduct") || s.contains("BroadcastNestedLoopJoin")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkPlan)]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add((funcName, qe.executedPlan))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    })
    val rnd = new scala.util.Random(42)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, 1L + rnd.nextInt(5)))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L, 2L, 3L).toDF("node")
    import scala.jdk.CollectionConverters._
    def run(name: String)(body: => DataFrame): Unit = {
      plans.clear()
      body.count()
      Thread.sleep(1500)
      val captured = plans.asScala.toSeq
      val perAction = captured.map { case (f, p) => (f, shuffles(p), bad(p)) }
      val maxSh = if (perAction.isEmpty) -1 else perAction.map(_._2).max
      println(s"$name actions=${captured.size} maxShufflesPerAction=$maxSh anyBad=${perAction.exists(_._3)} detail=${perAction.map(t => t._1 + ":" + t._2).mkString(",")}")
    }
    run("pageRank")(graft.pipeline.Graph.pageRank(edges, "src", "dst", iterations = 3))
    run("pageRankWeighted")(graft.pipeline.Graph.pageRankWeighted(edges, "src", "dst", "w", iterations = 3))
    run("personalizedPageRank")(graft.pipeline.Graph.personalizedPageRank(edges, "src", "dst", seeds, "node", iterations = 3))
    run("personalizedPageRankWeighted")(graft.pipeline.Graph.personalizedPageRankWeighted(edges, "src", "dst", "w", seeds, "node", iterations = 3))
    run("labelPropagation")(graft.pipeline.Graph.labelPropagation(edges, "src", "dst", iterations = 3))
    run("bfsDistances")(graft.pipeline.Graph.bfsDistances(edges, "src", "dst", seeds, "node", maxHops = 3))
    spark.stop()
  }
}
