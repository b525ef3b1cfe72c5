package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev probe (not part of the library surface). Current use:
  * timing + plan dump for individual registry queries —
  * `runMain graft.Probe <sfDir> <queryName> [reps]`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q108_span_duplication"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(s"run$i: ${(System.nanoTime() - t0) / 1e9}")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
