package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time a handful of named queries (3 warm runs each, with
  * the same plan/exec split Bench records) without paying the full
  * 134-query bench — `runMain graft.TimeQ <sfDir> <q1> <q2> ...`. Used for
  * the per-operator scaling probes recorded in PLANS.md.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.head
    val names = args.drop(1).toSeq
    // warm
    names.foreach { n => try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () } }
    for (r <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, d)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      val c = df.count()
      println(f"$n run$r plan=${(t1-t0)/1e9}%.3f total=${(System.nanoTime()-t0)/1e9}%.3f rows=$c")
    }
    spark.stop()
  }
}
