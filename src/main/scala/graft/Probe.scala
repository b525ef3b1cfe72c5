package graft

import org.apache.spark.sql.SparkSession

import graft.keyset.KeySet

/** Throwaway API probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def p(name: String)(f: => Any): Unit =
      try println(s"$name: " + f)
      catch { case e: Throwable => println(s"$name threw: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    p("empty values")(KeySet.fromColumn("A", Nil).size(spark))
    p("double keys")(KeySet.fromColumn("A", Seq(3.1)).size(spark))
    p("timestamp keys")(KeySet.fromColumn("A", Seq(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))).size(spark))
    p("int coercion")(KeySet.fromColumn("A", Seq(1, 2)).schema)
    p("null in dict")(KeySet.fromColumn("A", Seq("x", null)).size(spark))
    p("fromTuples nulls")(KeySet.fromTuples(Seq(Seq(null, null), Seq(42L, "foo")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("A", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("B", org.apache.spark.sql.types.StringType)))).size(spark))
    p("filter to empty")(KeySet.fromColumn("A", Seq(-1L, -2L)).filter("A > 0").size(spark))
    p("subtract mismatched")(KeySet.fromColumn("A", Seq("x"))
      .subtract(KeySet.fromColumn("B", Seq("y"))).size(spark))
    p("cross shared col")(KeySet.fromColumn("A", Seq("x"))
      .*(KeySet.fromColumn("A", Seq("y"))).size(spark))
    spark.stop()
  }
}
