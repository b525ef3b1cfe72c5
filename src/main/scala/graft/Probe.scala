package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe main for API/plan experiments (contents churn per round). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add((funcName, qe.executedPlan.toString))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    })
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q139_pagerank")(spark, d)
    df.count()
    // listener flush via sleep
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    for ((f, p) <- plans.asScala.toSeq) {
      val ex = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r.findAllIn(p).size
      val smj = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      println(s"action=$f shuffleEx=$ex sortOrHashJoins=$smj broadcastJoins=$bhj cartesian=${p.contains("CartesianProduct")}")
    }
    println(s"total actions captured: ${plans.size}")
    spark.stop()
  }
}
