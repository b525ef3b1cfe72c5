package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The zero-copy Map view handed to user map/flatMap lambdas must behave
  * like a plain Map for every access pattern a lambda may use.
  */
class RowCodecSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType),
    StructField("c", DoubleType)))
  private val codec = new RowCodec.StructCodec(schema)
  private val row = Row(1L, "x", 2.5)
  private def view = codec.view(row)

  test("reads: apply, get, getOrElse, contains, size") {
    assert(view("a") === 1L)
    assert(view.get("b") === Some("x"))
    assert(view.get("missing") === None)
    assert(view.getOrElse("c", 0.0) === 2.5)
    assert(view.getOrElse("missing", "d") === "d")
    assert(view.contains("a") && !view.contains("z"))
    assert(view.size === 3)
  }

  test("iteration and conversion behave like a real map") {
    assert(view.toMap === Map("a" -> 1L, "b" -> "x", "c" -> 2.5))
    assert(view.keys.toSet === Set("a", "b", "c"))
  }

  test("mutating operators fall back to materialized maps") {
    assert((view - "a") === Map("b" -> "x", "c" -> 2.5))
    assert(view.updated("a", 9L)("a") === 9L)
    assert((view ++ Map("d" -> true)).size === 4)
  }

  test("buildRow: out overrides base, missing fields null, values normalized") {
    val out = codec.buildRow(Map("a" -> 7, "c" -> 1), Some(view))
    assert(out === Row(7L, "x", 1.0)) // Int -> Long, Int -> Double coerced
    val bare = codec.buildRow(Map("b" -> "y"), None)
    assert(bare === Row(null, "y", null))
  }

  test("every analytics column type round-trips through view + buildRow") {
    val date = java.sql.Date.valueOf("2021-06-15")
    val ts = java.sql.Timestamp.valueOf("2021-06-15 12:34:56")
    val full = StructType(Seq(
      StructField("i", LongType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("dt", DateType),
      StructField("t", TimestampType)))
    val c = new RowCodec.StructCodec(full)
    val r = Row(42L, 2.75, "str", date, ts)
    val round = c.buildRow(c.view(r).toMap, None)
    assert(round === r)
    // nulls in any slot survive the round trip
    val withNulls = Row(null, null, null, null, null)
    assert(c.buildRow(c.view(withNulls).toMap, None) === withNulls)
    // special doubles are preserved, not normalized away
    val special = Row(1L, Double.NaN, "x", date, ts)
    val back = c.buildRow(c.view(special).toMap, None)
    assert(back.getDouble(1).isNaN)
    val inf = c.buildRow(Map("d" -> Double.PositiveInfinity), None)
    assert(inf.getDouble(1).isPosInfinity)
  }

  test("view of a row with null slots reads None-like nulls") {
    val r = Row(null, "x", null)
    val v = codec.view(r)
    assert(v("a") === null)
    assert(v.get("c") === Some(null))
    assert(v.contains("a"))
    assert(v.toMap === Map("a" -> null, "b" -> "x", "c" -> null))
  }
}
