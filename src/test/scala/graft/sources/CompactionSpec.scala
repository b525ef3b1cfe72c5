package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Compaction planning: serpentine balance, exhaustive assignment,
  * determinism under partitioning, and guards.
  */
class CompactionSpec extends SparkSpec {

  private val schema = StructType(Seq(strCol("path"), longCol("bytes")))

  private def listing(sizes: Seq[Long]) = makeDf(schema,
    sizes.zipWithIndex.map { case (b, i) => Row(f"f$i%04d", b) })

  test("every file lands in exactly one group; groups stay balanced") {
    val rnd = new scala.util.Random(13)
    val sizes = Seq.fill(400)((rnd.nextInt(900) + 100).toLong)
    val target = 4096L
    val plan = Compaction.planCompaction(listing(sizes), "path", "bytes", target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plan.length === 400)
    assert(plan.map(_._1).distinct.length === 400, "each file exactly once")
    val ng = math.max(1L, math.ceil(sizes.sum.toDouble / target).toLong)
    assert(plan.map(_._3).distinct.length === ng, "all planned groups used")
    val totals = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).values.toSeq
    // serpentine striping on size-sorted input: spread stays within one
    // largest-file width of the mean (deterministic, not probabilistic)
    assert(totals.max - totals.min <= sizes.max,
      s"imbalance ${totals.max - totals.min} vs max file ${sizes.max}")
  }

  test("summary totals reconcile with the listing; plan is partition-invariant") {
    val sizes = (1 to 100).map(_ * 37L)
    def run(parts: Int) = Compaction.planCompaction(
      listing(sizes).repartition(parts), "path", "bytes", 2000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(run(1) === run(17))
    val summary = Compaction.compactionSummary(
      Compaction.planCompaction(listing(sizes), "path", "bytes", 2000L))
      .agg(sum("n_files"), sum("total_bytes")).head()
    assert(summary.getLong(0) === 100L)
    assert(summary.getLong(1) === sizes.sum)
  }

  test("guards: target must be positive; null/negative rows drop; empty ok") {
    intercept[IllegalArgumentException] {
      Compaction.planCompaction(listing(Seq(1L)), "path", "bytes", 0L)
    }
    val messy = makeDf(schema, Seq(Row("a", 10L), Row(null, 5L), Row("b", null)))
    val plan = Compaction.planCompaction(messy, "path", "bytes", 100L)
    assert(plan.collect().map(_.getString(0)).toSeq === Seq("a"))
    assert(Compaction.planCompaction(
      listing(Nil), "path", "bytes", 100L).count() === 0L)
  }
}
