package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    println("=== q85 packChunks inner (pass-3 frame) plan ===")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        graft.pipeline.TextAnalysis.tokenCount(col("text")).as("ntok"))
    graft.pipeline.Packing.chunkProfile(docs, "doc_id", "ntok", 2048)
      .explain("formatted")
    println("=== q86 crossCorpusMatches plan ===")
    val all = spark.read.parquet(s"$d/documents.parquet")
    graft.pipeline.Dedup.crossCorpusMatches(
      all.filter(col("doc_id") % 7 =!= 0), all.filter(col("doc_id") % 7 === 0),
      "doc_id", "text", threshold = 0.5).explain("formatted")
    spark.stop()
  }
}
