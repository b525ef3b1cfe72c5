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
}
