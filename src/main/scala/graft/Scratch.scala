package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling entry point (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()
    def run() = graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count()
    run()
    println("pairs: " + time("q71 warm")(run()))
    spark.stop()
  }
}
