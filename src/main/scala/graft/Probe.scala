package graft
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Scratch probe main for API/plan experiments (contents churn per round). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(StructField("u", StringType), StructField("i", StringType)))
    val pos = spark.createDataFrame(java.util.Arrays.asList(
      Row("ab", "1"), Row("a", "b1"), Row("a", "2"),
      Row("b", "1"), Row("b", "2"), Row("c", "3")), schema)
    try {
      val n = graft.pipeline.Sampling.negativeSamples(pos, "u", "i", 1).collect().length
      println(s"NO EXCEPTION, rows=$n")
    } catch { case e: Exception =>
      println(s"THREW: ${e.getClass.getSimpleName}: ${e.getMessage}")
      Option(e.getCause).foreach(c => println(s"CAUSE: ${c.getMessage}"))
    }
    spark.stop()
  }
}
