package graft.types

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.session.Session

/** Ingestion-time schema coercion and type support, mirroring the
  * reference's test_supported_spark_types / test_keep_nullable_status
  * (test_session.py) and _coerce_spark_schema.py: Int/Float upcast to
  * Long/Double, unsupported types are rejected with the column named, and
  * source nullability is preserved into the analytics schema.
  */
class CoerceSchemaSpec extends SparkSpec {

  test("int and float columns upcast to long and double (TYPE_COERCION_MAP)") {
    val df = makeDf(
      StructType(Seq(
        StructField("i", IntegerType), StructField("f", FloatType),
        StructField("l", LongType), StructField("d", DoubleType),
        StructField("s", StringType))),
      Seq(Row(1, 2.0f, 3L, 4.0, "x")))
    val out = CoerceSchema(df)
    assert(out.schema("i").dataType === LongType)
    assert(out.schema("f").dataType === DoubleType)
    assert(out.schema("l").dataType === LongType)
    assert(out.schema("d").dataType === DoubleType)
    assert(out.schema("s").dataType === StringType)
    // values survive the cast
    val r = out.collect().head
    assert(r.getLong(0) === 1L && r.getDouble(1) === 2.0)
  }

  test("date and timestamp columns pass through; NTZ timestamps cast") {
    val df = makeDf(
      StructType(Seq(StructField("d", DateType), StructField("t", TimestampType),
        StructField("n", TimestampNTZType))),
      Seq(Row(java.sql.Date.valueOf("2022-01-01"),
        java.sql.Timestamp.valueOf("2022-01-01 12:00:00"),
        java.time.LocalDateTime.of(2022, 1, 1, 12, 0))))
    val out = CoerceSchema(df)
    assert(out.schema("d").dataType === DateType)
    assert(out.schema("t").dataType === TimestampType)
    assert(out.schema("n").dataType === TimestampType)
  }

  test("unsupported types are rejected with the column named " +
      "(test_session_raises_error_on_unsupported_spark_column_types)") {
    val bad = makeDf(
      StructType(Seq(longCol("ok"), StructField("arr", ArrayType(LongType)))),
      Seq(Row(1L, Seq(1L))))
    val e = intercept[IllegalArgumentException] { CoerceSchema(bad) }
    assert(e.getMessage.contains("arr"))
    val bool = makeDf(StructType(Seq(StructField("b", BooleanType))), Seq(Row(true)))
    intercept[IllegalArgumentException] { CoerceSchema(bool) }
    // binary is supported only through the pipeline operators, not the DP
    // session surface (reference SUPPORTED_SPARK_TYPES)
    val bin = makeDf(StructType(Seq(StructField("p", BinaryType))),
      Seq(Row(Array[Byte](1, 2))))
    intercept[IllegalArgumentException] { CoerceSchema(bin) }
  }

  test("empty-string column names are rejected (coerce_spark_schema_or_fail)") {
    val df = makeDf(StructType(Seq(StructField("", LongType))), Seq(Row(1L)))
    intercept[IllegalArgumentException] { CoerceSchema(df) }
  }

  test("nullability is preserved into the session schema " +
      "(test_keep_nullable_status)") {
    for (nullable <- Seq(true, false)) {
      val df = makeDf(
        StructType(Seq(StructField("a", LongType, nullable = nullable),
          StructField("s", StringType, nullable = nullable))),
        Seq(Row(1L, "x")))
      val s = Session.fromDataFrame(spark, PureDPBudget(Rat.Inf), "t", df, AddOneRow())
      assert(s.getSchema("t")("a").allowNull === nullable)
      assert(s.getSchema("t")("s").allowNull === nullable)
    }
  }

  test("double columns always admit NaN/Inf regardless of nullability " +
      "(pessimistic decimal flags)") {
    val df = makeDf(
      StructType(Seq(StructField("d", DoubleType, nullable = false))), Seq(Row(1.0)))
    val s = Session.fromDataFrame(spark, PureDPBudget(Rat.Inf), "t", df, AddOneRow())
    val desc = s.getSchema("t")("d")
    assert(!desc.allowNull && desc.allowNaN && desc.allowInf)
  }
}
