package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: print the formatted physical plan of named queries —
  * `runMain graft.ExplainQ <sfDir> <q1> <q2> ...`. The plan-audit
  * companion to [[TimeQ]] (timings) used for the per-operator plan notes
  * in PLANS.md.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    for (n <- args.drop(1).toSeq) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
