package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Conversions between Spark Rows and the `Map[String, Any]` rows seen by
  * user `map`/`flatMap` lambdas (reference: Row = Dict[str, Any],
  * _query_expr.py:47-48). Values returned by user functions are normalized
  * to the storage type (Int -> Long, Float -> Double), mirroring ingestion
  * coercion (_coerce_spark_schema.py:31-35).
  */
object RowCodec {

  def toMap(row: Row, schema: StructType): Map[String, Any] = {
    val b = Map.newBuilder[String, Any]
    var i = 0
    while (i < schema.length) {
      b += schema(i).name -> row.get(i)
      i += 1
    }
    b.result()
  }

  def fromMap(m: Map[String, Any], schema: StructType): Row =
    Row.fromSeq(schema.fields.map(f => normalize(m.getOrElse(f.name, null), f)).toSeq)

  private def normalize(v: Any, f: StructField): Any = v match {
    case null => null
    case i: Int if f.dataType == LongType    => i.toLong
    case s: Short if f.dataType == LongType  => s.toLong
    case b: Byte if f.dataType == LongType   => b.toLong
    case i: Int if f.dataType == DoubleType  => i.toDouble
    case l: Long if f.dataType == DoubleType => l.toDouble
    case fl: Float if f.dataType == DoubleType => fl.toDouble
    case other => other
  }
}
