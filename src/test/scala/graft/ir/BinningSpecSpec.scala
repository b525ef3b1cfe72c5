package graft.ir

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** BinningSpec edge-semantics tables (reference binning_spec.py tests):
  * left/right closure, endpoint inclusion, custom names, the NaN bin, every
  * edge type, and scalar/Catalyst agreement on the boundary values — the
  * scalar `apply` and the codegen'd `toColumn` must be the same function.
  */
class BinningSpecSpec extends SparkSpec {

  private def binned[T](spec: BinningSpec[T], vals: Seq[Any], t: DataType): Seq[Option[String]] = {
    val df = makeDf(StructType(Seq(StructField("v", t))), vals.map(Row(_)))
    df.select(spec.toColumn(col("v"))).collect().map(r => Option(r.getString(0))).toSeq
  }

  test("right-closed default: (a,b] with the first left edge included") {
    val s = BinningSpec(Seq(0.0, 5.0, 10.0))
    assert(s(0.0) === Some("[0, 5]"))  // includeBothEndpoints pulls 0 in
    assert(s(5.0) === Some("[0, 5]"))
    assert(s(5.1) === Some("(5, 10]"))
    assert(s(10.0) === Some("(5, 10]"))
    assert(s(10.5) === None)
    assert(s(-0.1) === None)
  }

  test("left-closed: [a,b) with the last right edge included") {
    val s = BinningSpec(Seq(0.0, 5.0, 10.0), right = false)
    assert(s(0.0) === Some("[0, 5)"))
    assert(s(5.0) === Some("[5, 10]"))
    assert(s(10.0) === Some("[5, 10]")) // includeBothEndpoints pulls 10 in
    assert(s(10.1) === None)
  }

  test("endpoint exclusion drops the outermost values") {
    val r = BinningSpec(Seq(0.0, 5.0), includeBothEndpoints = false)
    assert(r(0.0) === None)
    assert(r(5.0) === Some("(0, 5]"))
    val l = BinningSpec(Seq(0.0, 5.0), right = false, includeBothEndpoints = false)
    assert(l(0.0) === Some("[0, 5)"))
    assert(l(5.0) === None)
  }

  test("custom names and the NaN bin") {
    val s = BinningSpec(Seq(0.0, 1.0, 2.0), names = Some(Seq("low", "high")),
      nanBin = Some("weird"))
    assert(s(0.5) === Some("low"))
    assert(s(1.5) === Some("high"))
    assert(s(Double.NaN) === Some("weird"))
    assert(s.bins === Seq("low", "high", "weird"))
    // without nanBin, NaN maps nowhere
    val plain = BinningSpec(Seq(0.0, 1.0))
    assert(plain(Double.NaN) === None)
  }

  test("scalar apply and Catalyst toColumn agree on every boundary value") {
    for (right <- Seq(true, false); incl <- Seq(true, false)) {
      val s = BinningSpec(Seq(0.0, 5.0, 10.0), right = right,
        includeBothEndpoints = incl, nanBin = Some("nan"))
      val probes: Seq[Any] =
        Seq(-0.1, 0.0, 2.5, 5.0, 7.5, 10.0, 10.1, Double.NaN, null)
      val viaColumn = binned(s, probes, DoubleType)
      val viaScalar = probes.map {
        case null          => None
        case d: Double     => s(d)
      }
      assert(viaColumn === viaScalar, s"right=$right includeBoth=$incl")
    }
  }

  test("string, date, and timestamp edges bin exactly") {
    val str = BinningSpec(Seq("a", "m", "z"))
    assert(str("a") === Some("['a', 'm']"))
    assert(str("mm") === Some("('m', 'z']"))
    assert(str("zz") === None)

    import BinningSpec._
    val d1 = Date.valueOf("2020-01-01"); val d2 = Date.valueOf("2020-06-01")
    val d3 = Date.valueOf("2021-01-01")
    val dates = BinningSpec(Seq(d1, d2, d3))
    assert(dates(Date.valueOf("2020-03-01")).get.startsWith("[2020-01-01"))
    assert(dates(Date.valueOf("2020-12-31")).get.startsWith("(2020-06-01"))
    assert(dates(Date.valueOf("2022-01-01")) === None)
    assert(binned(dates, Seq(Date.valueOf("2020-03-01"), null), DateType)
      === Seq(dates(Date.valueOf("2020-03-01")), None))

    val t1 = Timestamp.valueOf("2020-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2020-01-01 12:00:00")
    val ts = BinningSpec(Seq(t1, t2))
    assert(ts(Timestamp.valueOf("2020-01-01 06:00:00")).isDefined)
    assert(ts(Timestamp.valueOf("2020-01-02 00:00:00")) === None)
  }

  test("construction validation: edges sorted, distinct, enough of them; name arity") {
    intercept[IllegalArgumentException] { BinningSpec(Seq(1.0)) }
    intercept[IllegalArgumentException] { BinningSpec(Seq(2.0, 1.0)) }
    intercept[IllegalArgumentException] { BinningSpec(Seq(1.0, 1.0, 2.0)) }
    intercept[IllegalArgumentException] {
      BinningSpec(Seq(0.0, 1.0, 2.0), names = Some(Seq("only-one")))
    }
  }

  test("integral formatting in default names") {
    val s = BinningSpec(Seq(0.0, 2.5, 5.0))
    assert(s.binNames === Seq("[0, 2.5]", "(2.5, 5]"))
    val i = BinningSpec(Seq(0, 10, 20))
    assert(i.binNames === Seq("[0, 10]", "(10, 20]"))
  }
}
