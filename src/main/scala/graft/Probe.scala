package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.accounting._
import graft.budget._
import graft.ir._
import graft.session.Session

/** Throwaway API probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Inf = PureDPBudget(Rat.Inf)
    def p(name: String)(f: => Any): Unit =
      try println(s"$name: " + f)
      catch { case e: Throwable => println(s"$name threw: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}") }

    // unsupported column types
    val arrDf = spark.createDataFrame(java.util.Arrays.asList(Row(Seq(1, 2))),
      StructType(Seq(StructField("a", ArrayType(IntegerType)))))
    p("array column")(Session.fromDataFrame(spark, Inf, "t", arrDf, AddOneRow()).describe())
    val boolDf = spark.createDataFrame(java.util.Arrays.asList(Row(true)),
      StructType(Seq(StructField("b", BooleanType))))
    p("boolean column")(Session.fromDataFrame(spark, Inf, "t", boolDf, AddOneRow())
      .evaluate(QueryBuilder("t").count(), Inf).collect().head.getLong(0))
    // weird source ids
    val okDf = spark.createDataFrame(java.util.Arrays.asList(Row(1L)),
      StructType(Seq(StructField("x", LongType))))
    p("source id with space")(Session.fromDataFrame(spark, Inf, "my table", okDf, AddOneRow())
      .evaluate(QueryBuilder("my table").count(), Inf).collect().head.getLong(0))
    p("empty source id")(Session.fromDataFrame(spark, Inf, "", okDf, AddOneRow()))
    // nullable preservation
    val nn = spark.createDataFrame(java.util.Arrays.asList(Row(1L)),
      StructType(Seq(StructField("x", LongType, nullable = false))))
    val s2 = Session.fromDataFrame(spark, Inf, "t", nn, AddOneRow())
    p("nullable status")(s2.getColumnTypes("t").toString)
    spark.stop()
  }
}
