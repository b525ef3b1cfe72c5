package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir.QueryBuilder
import graft.keyset.KeySet
import graft.session.Session

/** SURVEY §2.7: ingestion is any live DataFrame — the file-format layer
  * comes free from Spark. This spec proves it end to end: the same rows
  * arrive via parquet, CSV, and JSONL, flow through ingestion coercion
  * (CSV longs/ints, JSON's looser numerics) into a Session, and every
  * format yields the identical infinite-budget release.
  */
class FormatsIngestSpec extends SparkSpec {

  private val Inf = PureDPBudget(Rat.Inf)

  private def release(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val s = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())
    val keys = KeySet.fromTuples(Seq(Seq("even"), Seq("odd")),
      StructType(Seq(StructField("flag", StringType, nullable = true))))
    s.evaluate(QueryBuilder("t").groupby(keys).count(), Inf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("parquet, CSV, and JSONL ingest produce identical releases") {
    val base = spark.range(100)
      .select(col("id"), (col("id") % 3).cast("int").as("v"),
        when(col("id") % 2 === 0, "even").otherwise("odd").as("flag"))
    val dir = Files.createTempDirectory("formats").toFile.getAbsolutePath
    base.write.mode("overwrite").parquet(s"$dir/p")
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    base.write.mode("overwrite").json(s"$dir/j")

    val fromParquet = release(spark.read.parquet(s"$dir/p"))
    // CSV needs either inference or an explicit schema — both are
    // user-side Spark idioms; use the explicit-schema path (production)
    val csvSchema = StructType(Seq(StructField("id", LongType),
      StructField("v", IntegerType), StructField("flag", StringType)))
    val fromCsv = release(spark.read.schema(csvSchema)
      .option("header", "true").csv(s"$dir/c"))
    val fromJson = release(spark.read.json(s"$dir/j"))

    assert(fromParquet === Map("even" -> 50L, "odd" -> 50L))
    assert(fromCsv === fromParquet)
    assert(fromJson === fromParquet)
  }
}
