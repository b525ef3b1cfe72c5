package graft.exec

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class TreeAggregationSpec extends SparkSpec {

  private val schema = StructType(Seq(longCol("t"), longCol("c")))

  private def series(rows: (Long, Long)*) =
    makeDf(schema, rows.map { case (t, c) => Row(t, c) })

  test("eps=inf releases the exact prefix sums (gaps contribute zero)") {
    val df = series(0L -> 3L, 1L -> 1L, 3L -> 5L, 6L -> 2L, 7L -> 4L)
    val got = TreeAggregation.noisyPrefixSums(df, "t", "c",
      maxT = 8, epsilon = Double.PositiveInfinity)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 4L, 3L -> 9L, 6L -> 11L, 7L -> 15L))
  }

  test("eps=inf matches a window cumsum on a dense series") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 64L).map(t => t -> rnd.nextInt(10).toLong)
    val got = TreeAggregation.noisyPrefixSums(series(rows: _*), "t", "c",
      maxT = 64, epsilon = Double.PositiveInfinity)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.foreach { case (t, c) =>
      acc += c
      assert(got(t) === acc, s"prefix at $t")
    }
  }

  test("duplicate time indexes sum into their index instead of double-counting") {
    val df = series(0L -> 1L, 3L -> 1L, 3L -> 2L)
    val got = TreeAggregation.noisyPrefixSums(df, "t", "c",
      maxT = 8, epsilon = Double.PositiveInfinity)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 3L -> 4L))
  }

  test("non-positive epsilon and sensitivity are rejected") {
    val df = series(0L -> 1L)
    assert(intercept[IllegalArgumentException] {
      TreeAggregation.noisyPrefixSums(df, "t", "c", maxT = 4, epsilon = 0.0)
    }.getMessage.contains("epsilon"))
    assert(intercept[IllegalArgumentException] {
      TreeAggregation.noisyPrefixSums(df, "t", "c", maxT = 4,
        epsilon = 1.0, sensitivity = -1.0)
    }.getMessage.contains("sensitivity"))
  }

  test("indexes outside [0, maxT) are rejected, not dropped") {
    val e = intercept[IllegalArgumentException] {
      TreeAggregation.noisyPrefixSums(series(9L -> 1L), "t", "c",
        maxT = 8, epsilon = Double.PositiveInfinity)
    }
    assert(e.getMessage.contains("[0, 8)"))
  }

  test("finite eps: per-release error stays in the log-tree regime") {
    // T = 256, eps = 2: the tree adds <= height (9) geometric draws of
    // scale height/eps = 4.5 per release. A naive per-release Laplace over
    // 256 sequential releases would need scale 128 per release. Check the
    // observed per-release absolute error against a generous tree bound
    // (15 sigma of the 9-draw sum ~ 290) that the naive scale would blow
    // through routinely (its per-release sigma alone is ~181).
    val rows = (0L until 256L).map(t => t -> 1L)
    val out = TreeAggregation.noisyPrefixSums(series(rows: _*), "t", "c",
      maxT = 256, epsilon = 2.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val height = 9
    val scale = height / 2.0
    val sigmaPer = math.sqrt(2.0 * scale * scale) // geometric variance ~ 2b^2
    val bound = 15 * math.sqrt(height) * sigmaPer
    rows.foreach { case (t, _) =>
      val err = math.abs(out(t) - (t + 1))
      assert(err <= bound, s"release at $t off by $err (bound $bound)")
    }
    // and the noise is actually there: an all-exact run at this eps is
    // astronomically unlikely across 256 releases
    assert(rows.count { case (t, _) => out(t) != t + 1 } > 0)
  }
}
