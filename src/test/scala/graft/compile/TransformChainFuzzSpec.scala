package graft.compile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.accounting.AddOneRow
import graft.budget.{PureDPBudget, Rat}
import graft.ir.QueryBuilder
import graft.keyset.KeySet
import graft.session.Session
import graft.types.{ColumnDescriptor, ColumnType}

/** Randomized end-to-end fuzz of COMPOSED transform chains: a seeded
  * generator assembles 0-5 random transforms (rename / filter / select /
  * null-NaN-infinity handling / public join with fan-out / augmenting map /
  * distinct), evaluates a grouped count and clamped sum at infinite budget,
  * and compares against a pure-Scala model that applies the documented
  * semantics of each step to plain collections. Complements
  * RandomizedAggregationSpec (random aggregations over a FIXED shape) by
  * fuzzing the TransformPlanner's composition space, where bugs hide in
  * the seams between operators (a rename before a drop, a join after a
  * replace), not in any single lowering.
  */
class TransformChainFuzzSpec extends SparkSpec {
  private val Inf = PureDPBudget(Rat.Inf)

  private type MRow = Map[String, Any]

  test("random transform chains at infinite budget match the Scala model") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 30) {
      // ---- base table: g in {a..d}, x with null/NaN/±Inf, y integer ----
      val groups = Seq("a", "b", "c", "d")
      val xPool = Seq[java.lang.Double](
        1.5, null, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, -3.25, 7.0)
      val n = 1 + rnd.nextInt(30)
      val baseRows: Seq[(String, java.lang.Double, Long)] = Seq.fill(n)((
        groups(rnd.nextInt(groups.size)),
        xPool(rnd.nextInt(xPool.size)),
        (rnd.nextInt(17) - 8).toLong))
      val df = makeDf(
        StructType(Seq(strCol("g"), dblCol("x"), longCol("y"))),
        baseRows.map { case (g, x, y) => Row(g, x, y) })

      // mutable chain state: builder, model rows, live columns, y's name
      var qb = QueryBuilder("t")
      var model: Seq[MRow] = baseRows.map { case (g, x, y) =>
        Map("g" -> g, "x" -> x, "y" -> y) }
      var cols = Set("g", "x", "y")
      var yn = "y"
      var joined = false
      val sess = Session.fromDataFrame(spark, Inf, "t", df, AddOneRow())

      def xd(r: MRow): java.lang.Double = r("x").asInstanceOf[java.lang.Double]
      val steps = rnd.nextInt(7)
      val applied = scala.collection.mutable.ListBuffer.empty[String]
      for (_ <- 1 to steps) rnd.nextInt(12) match {
        case 0 => // rename y
          val to = if (yn == "y") "y2" else "y"
          qb = qb.rename(Map(yn -> to))
          model = model.map(r => (r - yn) + (to -> r(yn)))
          cols = cols - yn + to; yn = to; applied += s"rename->$to"
        case 1 => // filter on y
          val k = rnd.nextInt(11) - 5
          qb = qb.filter(s"$yn >= $k")
          model = model.filter(_(yn).asInstanceOf[Long] >= k)
          applied += s"filter($yn>=$k)"
        case 2 => // parity filter
          qb = qb.filter(s"$yn % 2 = 0")
          model = model.filter(_(yn).asInstanceOf[Long] % 2 == 0)
          applied += "filter(even)"
        case 3 if cols("x") => // select away x
          val keep = (cols - "x").toSeq.sorted
          qb = qb.select(keep: _*)
          model = model.map(r => keep.map(c => c -> r(c)).toMap)
          cols -= "x"; applied += "select(-x)"
        case 4 if cols("x") => // replace null/NaN in x
          val v = (rnd.nextInt(9) - 4).toDouble
          qb = qb.replaceNullAndNan(Map("x" -> v))
          model = model.map { r =>
            val x = xd(r)
            if (x == null || x.isNaN) r + ("x" -> (v: java.lang.Double)) else r }
          applied += s"replaceNullNaN($v)"
        case 5 if cols("x") => // drop null/NaN rows
          qb = qb.dropNullAndNan("x")
          model = model.filter(r => xd(r) != null && !xd(r).isNaN)
          applied += "dropNullNaN"
        case 6 if cols("x") => // replace ±Inf
          val lo = -(1 + rnd.nextInt(6)).toDouble
          val hi = (1 + rnd.nextInt(6)).toDouble
          qb = qb.replaceInfinity(Map("x" -> (lo, hi)))
          model = model.map { r =>
            val x = xd(r)
            if (x == null) r
            else if (x == Double.NegativeInfinity) r + ("x" -> (lo: java.lang.Double))
            else if (x == Double.PositiveInfinity) r + ("x" -> (hi: java.lang.Double))
            else r }
          applied += "replaceInf"
        case 7 if cols("x") => // drop ±Inf rows (null x survives)
          qb = qb.dropInfinity("x")
          model = model.filter(r => xd(r) == null || !xd(r).isInfinite)
          applied += "dropInf"
        case 8 if !joined => // public join with fan-out on g
          val mult = groups.map(_ -> rnd.nextInt(3)).toMap // 0 drops the group
          val dimRows = groups.flatMap(g =>
            (1 to mult(g)).map(i => Row(g, (i * 10).toLong)))
          val dim = makeDf(StructType(Seq(strCol("g"), longCol("m"))), dimRows)
          qb = qb.joinPublic(dim, Seq("g"))
          model = model.flatMap(r =>
            (1 to mult(r("g").asInstanceOf[String]))
              .map(i => r + ("m" -> (i * 10).toLong)))
          cols += "m"; joined = true; applied += "joinPublic"
        case 9 => // augmenting map: w = y mod 3 + 1 (same lambda both sides)
          if (!cols("w")) {
            val f = (r: Map[String, Any]) =>
              Map("w" -> (r(yn).asInstanceOf[Long] % 3 + 1))
            qb = qb.map(f, Seq("w" -> ColumnDescriptor(ColumnType.Integer)),
              augment = true)
            model = model.map(r => r + ("w" -> (r(yn).asInstanceOf[Long] % 3 + 1)))
            cols += "w"; applied += "map(w)"
          }
        case 10 => // distinct over (g, y): drops every other column
          qb = qb.distinctRows("g", yn)
          model = model.map(r => Map("g" -> r("g"), yn -> r(yn))).distinct
          cols = Set("g", yn) // m/x/w are gone; joined stays spent
          applied += "distinctRows"
        case 11 if !cols("__bin") => // named binning of y: [-10,0], (0,10]
          qb = qb.binColumn(yn, graft.ir.BinningSpec(Seq(-10L, 0L, 10L),
            names = Some(Seq("neg", "pos"))), Some("__bin"))
          model = model.map(r => r + ("__bin" ->
            (if (r(yn).asInstanceOf[Long] <= 0L) "neg" else "pos")))
          cols += "__bin"; applied += "binColumn"
        case _ => () // inapplicable draw: skip
      }

      // ---- terminal: grouped count + clamped sum over a random keyset ----
      // group on the bin column (when a binColumn step ran and a coin
      // says so) or on g; keysets always include one absent key
      val (gCol, keyVals) =
        if (cols("__bin") && rnd.nextBoolean()) ("__bin", Seq("neg", "pos", "zz"))
        else ("g", rnd.shuffle(groups).take(1 + rnd.nextInt(4)) :+ "zz")
      val keys = KeySet.fromTuples(keyVals.map(Seq[Any](_)),
        StructType(Seq(strCol(gCol))))
      val byKey = model.groupBy(_(gCol).asInstanceOf[String])
        .filter { case (k, _) => keyVals.contains(k) }
      val ctx = s"trial $trial chain=[${applied.mkString(", ")}] by=$gCol"

      val counts = sess.evaluate(qb.groupby(keys).count(), Inf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.keySet === keyVals.toSet, ctx)
      for (k <- keyVals)
        assert(counts(k) === byKey.get(k).map(_.size).getOrElse(0).toLong,
          s"$ctx count($k)")

      val distincts = sess.evaluate(qb.groupby(keys).countDistinct(), Inf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for (k <- keyVals)
        assert(distincts(k) === byKey.get(k).map(_.distinct.size).getOrElse(0).toLong,
          s"$ctx countDistinct($k)")

      val lo = -(1 + rnd.nextInt(5)).toDouble
      val hi = (1 + rnd.nextInt(7)).toDouble
      val sums = sess.evaluate(qb.groupby(keys).sum(yn, lo, hi, "s"), Inf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def clamp(v: Long) = math.min(math.max(v.toDouble, lo), hi).toLong
      for (k <- keyVals)
        assert(sums(k) === byKey.get(k)
          .map(_.map(r => clamp(r(yn).asInstanceOf[Long])).sum).getOrElse(0L),
          s"$ctx sum($k)")
    }
  }
}
