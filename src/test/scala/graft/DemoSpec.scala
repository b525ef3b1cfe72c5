package graft

/** The demo walkthrough is a tested artifact, not documentation rot: this
  * spec runs `Demo.run` on the smallest test SF and asserts the narrated
  * outputs a new user is told to expect (mirrors the reference's executed
  * intro notebook, demos/intro_demo.ipynb).
  */
class DemoSpec extends SparkSpec {

  test("the demo walkthrough runs end-to-end and prints its key outputs") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Demo.run(spark, "/root/testdata/sf0.001")
    }
    val out = buf.toString("UTF-8")

    // every numbered section ran
    for (i <- 1 to 19) assert(out.contains(s"=== $i. "), s"section $i missing")

    // session inspection and the mechanism preview
    assert(out.contains("Remaining privacy budget"))
    assert(out.contains("mechanism: List(NoiseInfo(count,Geometric"))

    // views appear in the source list while they exist
    assert(out.contains("private sources now: bulky, lineitem"))

    // describe(query) prints the output schema without spending
    assert(out.contains("Column Name") && out.contains("l_quantity_average"))

    // the accountant rejects the over-budget query with its message
    assert(out.contains("rejected as expected"))
    assert(out.contains("insufficient privacy budget"))

    // IDs world: distinct users and the enforced grouped count
    assert(out.contains("n_users"))

    // partitions: both children answered under their own budgets
    assert(out.contains("partition clicks: noisy count"))
    assert(out.contains("partition purchases: noisy count"))

    // pipeline sections produce their tables
    assert(out.contains("n_repetitive"))
    assert(out.contains("contaminated documents:"))

    // corpus prep: scrub removed the planted near-dups, chunks + splits print
    assert(out.contains("after scrub"))
    assert(out.contains("chunk_id"))
    assert(out.contains("train"))

    // clean/mix/export: the injected banner is struck from every doc (500
    // docs at sf0.001), the mix table prints, the export round-trips
    assert(out.contains("lines struck: 500"))
    assert(out.contains("n_after_mix"))
    assert(out.contains("across 4 shards"))

    // passage tooling: CDC chunks counted, window census printed
    assert(out.contains("CDC chunks over the deduped corpus:"))
    assert(out.contains("n_windows"))

    // multimodal: real decode columns and both dedup families printed
    assert(out.contains("image groups by perceptual hash"))
    assert(out.contains("audio groups by spectral fingerprint"))
    assert(out.contains("frames from 50 animated clips"))

    // similarity: all three paths printed their top-k tables
    assert(out.contains("brute force (small query set x any corpus):"))
    assert(out.contains("LSH multi-probe"))
    assert(out.contains("IVF (train once"))

    // temporal/interval joins + SVT release printed their tables
    assert(out.contains("as-of join: each purchase with the user's latest PRIOR click"))
    assert(out.contains("range join: value-in-interval as an equi-join on grid cells"))
    assert(out.contains("SVT AboveThreshold"))

    assert(out.contains("demo complete."))
  }
}
