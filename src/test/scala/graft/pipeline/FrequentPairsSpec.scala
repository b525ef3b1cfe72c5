package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Frequent co-occurring pairs: hand cases, basket (not occurrence)
  * support semantics, null drops, the A-priori invariance property vs a
  * brute-force model, and the degenerate-basket guard.
  */
class FrequentPairsSpec extends SparkSpec {

  private val schema = StructType(Seq(longCol("b"), longCol("i")))

  private def df(rows: Seq[(java.lang.Long, java.lang.Long)]) =
    makeDf(schema, rows.map { case (b, i) => Row(b, i) })

  private def model(rows: Seq[(java.lang.Long, java.lang.Long)],
      minSupport: Long): Set[(Long, Long, Long)] = {
    val bi = rows.collect { case (b, i) if b != null && i != null =>
      (b.longValue, i.longValue) }.distinct
    bi.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).sorted
      for (a <- is; c <- is if a < c) yield (a, c)
    }.groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.size.toLong) }
      .filter(_._3 >= minSupport).toSet
  }

  private def run(rows: Seq[(java.lang.Long, java.lang.Long)], s: Long,
      cap: Int = 10000) =
    CorpusStats.frequentPairs(df(rows), "b", "i", s, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("hand case: duplicate (basket, item) counts once; support threshold") {
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 20L), (1L, 10L), // dup occurrence of 10 in basket 1
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L),
      (null, 10L), (4L, null))
    assert(run(rows, 3L) === Set((10L, 20L, 3L)))
    assert(run(rows, 2L) === Set((10L, 20L, 3L)))
    assert(run(rows, 1L) === Set((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("matches brute force on random baskets (A-priori prune is invisible)") {
    val rng = new scala.util.Random(5)
    val rows = (for {
      b <- 1L to 60L
      _ <- 1 to (2 + rng.nextInt(6))
    } yield (java.lang.Long.valueOf(b),
      java.lang.Long.valueOf(1L + rng.nextInt(15)))).toSeq
    for (s <- Seq(1L, 2L, 4L))
      assert(run(rows, s) === model(rows, s), s"minSupport=$s")
  }

  test("degenerate-basket guard refuses loudly; parameter validation") {
    val fat = (1L to 20L).map(i => (java.lang.Long.valueOf(1L),
      java.lang.Long.valueOf(i))) ++
      (1L to 20L).map(i => (java.lang.Long.valueOf(2L),
        java.lang.Long.valueOf(i)))
    val e = intercept[Exception](run(fat, 2L, cap = 10))
    assert(e.getMessage.contains("maxBasketItems"))
    intercept[IllegalArgumentException](
      CorpusStats.frequentPairs(df(Nil), "b", "i", 0L))
    intercept[IllegalArgumentException](
      CorpusStats.frequentPairs(df(Nil), "b", "missing", 1L))
  }
}
