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
    assert(s(0.0) === Some("[0.00, 5.00]"))  // includeBothEndpoints pulls 0 in
    assert(s(5.0) === Some("[0.00, 5.00]"))
    assert(s(5.1) === Some("(5.00, 10.00]"))
    assert(s(10.0) === Some("(5.00, 10.00]"))
    assert(s(10.5) === None)
    assert(s(-0.1) === None)
  }

  test("left-closed: [a,b) with the last right edge included") {
    val s = BinningSpec(Seq(0.0, 5.0, 10.0), right = false)
    assert(s(0.0) === Some("[0.00, 5.00)"))
    assert(s(5.0) === Some("[5.00, 10.00]"))
    assert(s(10.0) === Some("[5.00, 10.00]")) // includeBothEndpoints pulls 10 in
    assert(s(10.1) === None)
  }

  test("endpoint exclusion drops the outermost values") {
    val r = BinningSpec(Seq(0.0, 5.0), includeBothEndpoints = false)
    assert(r(0.0) === None)
    assert(r(5.0) === Some("(0.00, 5.00]"))
    val l = BinningSpec(Seq(0.0, 5.0), right = false, includeBothEndpoints = false)
    assert(l(0.0) === Some("[0.00, 5.00)"))
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
    assert(dates(Date.valueOf("2020-03-01")).get.asInstanceOf[String].startsWith("[2020-01-01"))
    assert(dates(Date.valueOf("2020-12-31")).get.asInstanceOf[String].startsWith("(2020-06-01"))
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

  test("default-name rendering mirrors the reference edge formats") {
    // ints plain, floats at >= 2 decimals
    assert(BinningSpec(Seq(0, 10, 20)).binNames === Seq("[0, 10]", "(10, 20]"))
    assert(BinningSpec(Seq(0.0, 2.5, 5.0)).binNames ===
      Seq("[0.00, 2.50]", "(2.50, 5.00]"))
    // decimals escalate only until edges stay distinct (reference
    // _edges_as_str): 0.999 rounds into 1.00 when that stays unambiguous
    assert(BinningSpec(Seq(0.0, 0.999, 2.0)).binNames ===
      Seq("[0.00, 1.00]", "(1.00, 2.00]"))
    assert(BinningSpec(Seq(0.0, 0.999, 1.0)).binNames ===
      Seq("[0.000, 0.999]", "(0.999, 1.000]"))
    assert(BinningSpec(Seq(0.0, 0.000001, 0.000002)).binNames ===
      Seq("[0.000000, 0.000001]", "(0.000001, 0.000002]"))
    // timestamps render at the coarsest lossless precision
    import BinningSpec._
    val minutes = BinningSpec(Seq(
      Timestamp.valueOf("2022-01-01 00:00:00"), Timestamp.valueOf("2022-02-01 05:00:00")))
    assert(minutes.binNames === Seq("[2022-01-01 00:00, 2022-02-01 05:00]"))
    val millis = BinningSpec(Seq(
      Timestamp.valueOf("2022-01-01 00:00:00"),
      { val t = Timestamp.valueOf("2022-02-01 05:30:15"); t.setNanos(20000000); t }))
    assert(millis.binNames ===
      Seq("[2022-01-01 00:00:00.000, 2022-02-01 05:30:15.020]"))
  }

  test("default names escalate to 16 digits, then fail rather than collide") {
    // distinct only at 14 decimals: the search must pass 12
    val fine = BinningSpec(Seq(0.0, 1e-14, 2e-14))
    assert(fine.binNames.distinct.size === 2)
    // edges that differ only past 16 decimals raise instead of emitting
    // duplicate default bin names (reference _edges_as_str failure mode)
    val e = intercept[IllegalArgumentException] {
      BinningSpec(Seq(0.0, 1e-18, 2e-18)).binNames
    }
    assert(e.getMessage.contains("distinct default bin names"))
  }

  test("repeated names and a matching nan bin deduplicate in bins") {
    val s = BinningSpec(Seq(-15.0, -5.0, 5.0, 15.0),
      names = Some(Seq("high", "low", "high")))
    assert(s.bins === Seq("high", "low"))
    assert(s(-10.0) === Some("high"))
    assert(s(0.0) === Some("low"))
    assert(s(10.0) === Some("high"))
    val nanMatch = BinningSpec(Seq(-1.0, 0.0, 1.0),
      names = Some(Seq("neg", "nonneg")), nanBin = Some("nonneg"))
    assert(nanMatch.bins === Seq("neg", "nonneg"))
    assert(nanMatch(Double.NaN) === Some("nonneg"))
  }

  test("typed bin names drive the output column type") {
    // integer names -> INTEGER binned column (reference test_column_type)
    val intNames = BinningSpec(Seq(0.0, 1.0, 2.0), names = Some(Seq(0L, 1L)))
    assert(intNames.outputDescriptor.ctype === graft.types.ColumnType.Integer)
    assert(intNames(0.5) === Some(0L))
    val df = makeDf(StructType(Seq(dblCol("v"))), Seq(Row(0.5), Row(1.5), Row(9.0)))
    val out = df.select(intNames.toColumn(col("v"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out === Seq(Some(0L), Some(1L), None))
    // date names -> DATE
    val d1 = Date.valueOf("2022-01-01"); val d2 = Date.valueOf("2022-01-02")
    val dateNames = BinningSpec(Seq(0L, 10L, 20L), names = Some(Seq(d1, d2)))
    assert(dateNames.outputDescriptor.ctype === graft.types.ColumnType.Date)
    assert(dateNames(15L) === Some(d2))
    // float names with a NaN name mark the column NaN-able
    val nanName = BinningSpec(Seq(0.0, 1.0, 2.0),
      names = Some(Seq(0.1, Double.NaN)), nanBin = Some(Double.NaN))
    assert(nanName.outputDescriptor.allowNaN)
    // mixed-type names are rejected
    intercept[IllegalArgumentException] {
      BinningSpec(Seq(0.0, 1.0, 2.0), names = Some(Seq("a", 1L)))
    }
  }

  test("infinite edges bin every finite and infinite value") {
    val s = BinningSpec(Seq(Double.NegativeInfinity, 0.0, Double.PositiveInfinity),
      right = false, names = Some(Seq("negative", "nonnegative")))
    assert(s(-1.0) === Some("negative"))
    assert(s(0.0) === Some("nonnegative"))
    assert(s(Double.NegativeInfinity) === Some("negative"))
    assert(s(Double.PositiveInfinity) === Some("nonnegative"))
    assert(s(Double.NaN) === None)
    // and the Catalyst path agrees
    assert(binned(s, Seq(-1.0, 0.0, Double.PositiveInfinity, Double.NaN), DoubleType)
      === Seq(Some("negative"), Some("nonnegative"), Some("nonnegative"), None))
  }
}
