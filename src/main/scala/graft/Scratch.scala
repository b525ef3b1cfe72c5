package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling entry point (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = sys.env.getOrElse("SCRATCH_MODE", "dump")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      if (mode == "plan") {
        df.count()
        println(s"========== $n ==========")
        println(df.queryExecution.executedPlan.toString.linesIterator
          .map(_.take(140)).mkString("\n"))
      } else {
        df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/scratch_out/$n")
        println(s"dumped $n")
      }
    }
    spark.stop()
  }
}
