package graft.exec

import graft.SparkSpec

class SparseVectorSpec extends SparkSpec {
  import spark.implicits._

  private def counts = Seq(
    ("a", 120.0), ("b", 80.0), ("c", 150.0), ("d", 300.0), ("e", 95.0)
  ).toDF("qid", "n")

  test("eps=inf releases the first c above-threshold ids in scan order, then halts") {
    val out = SparseVector.aboveThreshold(counts, "qid", "n",
      threshold = 100.0, maxPositives = 2, epsilon = Double.PositiveInfinity)
      .as[(String, Long)].collect().toSet
    // scan order a,b,c,d,e: a (120) rank 1, c (150) rank 2, HALT — d (300)
    // is above threshold but never reached
    assert(out === Set(("a", 1L), ("c", 2L)))
  }

  test("fewer positives than the cap releases them all") {
    val out = SparseVector.aboveThreshold(counts, "qid", "n",
      threshold = 200.0, maxPositives = 3, epsilon = Double.PositiveInfinity)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("d", 1L)))
  }

  test("no positives releases nothing (empty frame, right schema)") {
    val out = SparseVector.aboveThreshold(counts, "qid", "n",
      threshold = 1e9, maxPositives = 2, epsilon = Double.PositiveInfinity)
    assert(out.columns.toSeq === Seq("qid", "rank"))
    assert(out.count() === 0L)
  }

  test("long-typed value columns work") {
    val lv = Seq(("a", 5L), ("b", 50L)).toDF("qid", "n")
    val out = SparseVector.aboveThreshold(lv, "qid", "n",
      threshold = 10.0, maxPositives = 1, epsilon = Double.PositiveInfinity)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("b", 1L)))
  }

  test("query-list bound is enforced before the collect") {
    val many = spark.range(0, 100).selectExpr("cast(id as string) qid", "cast(id as double) n")
    val e = intercept[IllegalArgumentException] {
      SparseVector.aboveThreshold(many, "qid", "n",
        threshold = 0.0, maxPositives = 1,
        epsilon = Double.PositiveInfinity, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("parameter domain guards") {
    assertThrows[IllegalArgumentException] {
      SparseVector.aboveThreshold(counts, "qid", "n", 0.0, 0, 1.0)
    }
    assertThrows[IllegalArgumentException] {
      SparseVector.aboveThreshold(counts, "qid", "n", 0.0, 1, 0.0)
    }
    assertThrows[IllegalArgumentException] {
      SparseVector.aboveThreshold(counts, "qid", "n", 0.0, 1, 1.0, sensitivity = -1.0)
    }
    assertThrows[IllegalArgumentException] {
      SparseVector.aboveThreshold(counts, "missing", "n", 0.0, 1, 1.0)
    }
  }

  test("finite eps: huge margins make the exact release overwhelmingly likely") {
    // gaps of ~1e6 vs noise scales of 8/eps with eps=1: P(flip) < e^-100000
    val wide = Seq(("a", 0.0), ("b", 2e6), ("c", 0.0), ("d", 2e6)).toDF("qid", "n")
    val out = SparseVector.aboveThreshold(wide, "qid", "n",
      threshold = 1e6, maxPositives = 2, epsilon = 1.0)
      .as[(String, Long)].collect().toSet
    assert(out === Set(("b", 1L), ("d", 2L)))
  }

  test("finite eps: never more than maxPositives rows, ids from the input") {
    val ids = counts.select("qid").as[String].collect().toSet
    for (_ <- 1 to 20) {
      val out = SparseVector.aboveThreshold(counts, "qid", "n",
        threshold = 100.0, maxPositives = 2, epsilon = 0.05)
        .as[(String, Long)].collect()
      assert(out.length <= 2)
      assert(out.forall { case (id, r) => ids(id) && r >= 1 && r <= 2 })
      assert(out.map(_._2).sorted.toSeq === (1 to out.length).map(_.toLong))
    }
  }

  test("null value fails loudly naming the query id, not with a type error") {
    val withNull = Seq(("a", Some(120.0)), ("b", None)).toDF("qid", "n")
    val ex = intercept[IllegalArgumentException] {
      SparseVector.aboveThreshold(withNull, "qid", "n",
        threshold = 100.0, maxPositives = 2, epsilon = Double.PositiveInfinity)
    }
    assert(ex.getMessage.contains("null value"))
    assert(ex.getMessage.contains("'b'"))
    assert(ex.getMessage.contains("coalesce"))
  }

  test("finite eps: tiny eps actually perturbs decisions (noise is live)") {
    // at eps=0.001 the threshold noise scale is 4000 against margins of ~50:
    // 50 trials virtually never reproduce the exact release every time
    val exact = Set(("a", 1L), ("c", 2L))
    val sets = (1 to 50).map { _ =>
      SparseVector.aboveThreshold(counts, "qid", "n",
        threshold = 100.0, maxPositives = 2, epsilon = 0.001)
        .as[(String, Long)].collect().toSet
    }
    assert(sets.exists(_ != exact))
  }
}
