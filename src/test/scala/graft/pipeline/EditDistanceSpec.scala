package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Edit-distance similarity join: hand cases, the recall-1 contract vs a
  * brute-force Levenshtein model on random dictionaries (short strings
  * below the q-gram bound included), duplicate-row collapse, and the
  * short-path bucket guard.
  */
class EditDistanceSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("s")))

  private def df(xs: Seq[String]) = makeDf(schema, xs.map(Row(_)))

  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def model(xs: Seq[String], d: Int): Set[(String, String, Int)] = {
    val dict = xs.filter(s => s != null && s.nonEmpty).distinct
    (for {
      a <- dict; b <- dict if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  private def run(xs: Seq[String], d: Int, q: Int = 2) =
    Dedup.editDistancePairs(df(xs), "s", d, q)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("hand case: substitutions, indels, and beyond-threshold pairs") {
    val xs = Seq("kitten", "sitten", "sittin", "sitting", "mitten", "apple")
    val got = run(xs, 1)
    assert(got === Set(
      ("kitten", "sitten", 1), ("kitten", "mitten", 1),
      ("sitten", "sittin", 1), ("mitten", "sitten", 1),
      ("sittin", "sitting", 1)))
  }

  test("duplicate rows collapse to one dictionary entry, no zero-distance pairs") {
    val got = run(Seq("red rod", "red rod", "old rod", "old rod"), 2)
    assert(got === Set(("old rod", "red rod", 2)))
    assert(got.forall(_._3 >= 1))
  }

  test("short strings below the gram bound are still found (zero shared grams)") {
    // q=2, d=3: longMin = 8; "abc" vs "xyz" share no 2-gram yet ed = 3
    val got = run(Seq("abc", "xyz", "abcdefgh"), 3)
    assert(got.contains(("abc", "xyz", 3)))
  }

  test("nulls and empty strings are dropped from the dictionary") {
    val rows = Seq(Row("ab"), Row(null), Row(""), Row("ac"))
    val got = Dedup.editDistancePairs(
      makeDf(schema, rows), "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(("ab", "ac", 1)))
  }

  test("recall 1 vs brute force on random mixed-length dictionaries") {
    val rng = new scala.util.Random(42)
    val alpha = "abcde"
    for (trial <- 1 to 6) {
      val n = 40 + rng.nextInt(40)
      val xs = Seq.fill(n) {
        val len = 1 + rng.nextInt(12)
        (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      }
      val d = 1 + rng.nextInt(3)
      val q = 1 + rng.nextInt(2)
      assert(run(xs, d, q) === model(xs, d),
        s"trial $trial d=$d q=$q dict=${xs.distinct.size}")
    }
  }

  test("short-path length-bucket guard refuses loudly") {
    // 12 distinct 2-char strings in one short length bucket with cap 10
    val xs = (0 until 12).map(i => s"${('a' + i).toChar}z")
    val e = intercept[Exception] {
      Dedup.editDistancePairs(df(xs), "s", 2, maxLenBucket = 10).collect()
    }
    assert(e.getMessage.contains("maxLenBucket"))
  }

  test("resolveEntities: transitive chains collapse to the min name, " +
      "singletons map to themselves, matches brute-force closure") {
    // chain: aaaa - aaab - aabb reach each other transitively though
    // ed(aaaa, aabb) = 2 > d = 1; "zzzz" is a singleton
    val xs = Seq("aaaa", "aaab", "aabb", "zzzz", "aaaa")
    val got = Dedup.resolveEntities(df(xs), "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map("aaaa" -> "aaaa", "aaab" -> "aaaa",
      "aabb" -> "aaaa", "zzzz" -> "zzzz"))
    // randomized closure check vs a brute-force union-find model
    val rng = new scala.util.Random(11)
    val dictXs = Seq.fill(60) {
      (0 until (1 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    }
    val d = 2
    val dict = dictXs.filter(_.nonEmpty).distinct
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    for (a <- dict; b <- dict if a < b && lev(a, b) <= d) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expect = dict.map { x =>
      // path-compress to the true min: union-by-min keeps root minimal
      (x, find(x))
    }.toMap
    val gotR = Dedup.resolveEntities(df(dictXs), "s", d)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(gotR === expect)
  }

  test("resolveEntities canonical=frequent: the most frequent ROW variant " +
      "wins (ties to the smaller name), singletons unaffected") {
    // cluster {acme, acmee, bcme}: "acmee" appears 3x vs 1x others — the
    // frequent mode must pick it over the lexicographic min "acme"
    val xs = Seq("acme", "acmee", "acmee", "acmee", "bcme",
      "zzzz", // singleton
      "tie1", "tie2") // 1 edit apart, equal counts -> smaller name wins
    val freq = Dedup.resolveEntities(df(xs), "s", 1, canonical = "frequent")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(freq === Map(
      "acme" -> "acmee", "acmee" -> "acmee", "bcme" -> "acmee",
      "zzzz" -> "zzzz", "tie1" -> "tie1", "tie2" -> "tie1"))
    // default stays the lexicographic min
    val min = Dedup.resolveEntities(df(xs), "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(min("acmee") === "acme" && min("bcme") === "acme")
    intercept[IllegalArgumentException](
      Dedup.resolveEntities(df(xs), "s", 1, canonical = "longest"))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df(Seq("a")), "s", 0))
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df(Seq("a")), "s", 1, q = 0))
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df(Seq("a")), "missing", 1))
  }
}
