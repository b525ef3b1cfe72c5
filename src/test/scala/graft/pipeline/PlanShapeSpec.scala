package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Plan-shape regressions for the corpus operators' scale contracts: the
  * properties that make them viable at 100 TB (no cartesian pair space, no
  * needless shuffles) are asserted on the executed plan, so a future edit
  * that silently reintroduces an all-pairs join or a shuffle fails here,
  * not in production.
  */
class PlanShapeSpec extends SparkSpec with graft.PlanCapture {

  private def executed(df: DataFrame): String = {
    df.count() // force AQE to finalize the plan
    val s = df.queryExecution.executedPlan.toString
    // vacuity tripwire: an operator that localCheckpoints its release
    // returns a bare RDD-scan plan — asserting "no cartesian / N
    // exchanges" against THAT checks nothing (the frequentPairs lesson).
    // Such operators must be asserted through PlanCapture instead.
    assert(!(s.contains("ExistingRDD") &&
        !s.contains("Join") && !s.contains("Exchange") &&
        !s.contains("HashAggregate") && !s.contains("Window")),
      s"vacuous plan assert: the released frame is a checkpoint scan — " +
        s"capture the operator's ACTION plans with capturedPlans():\n$s")
    s
  }

  private def docs(n: Int) = makeDf(
    StructType(Seq(longCol("id"), strCol("text"))),
    (1 to n).map(i => Row(i.toLong, s"alpha bravo charlie delta echo doc$i tail$i")))

  // same corpus on the ISOLATED capture session, for operators whose
  // release is a checkpoint scan (their plan asserts go through
  // capturedPlans — the executed() tripwire rejects the bare scan)
  private def pdocs(n: Int) = planDf(
    StructType(Seq(longCol("id"), strCol("text"))),
    (1 to n).map(i => Row(i.toLong, s"alpha bravo charlie delta echo doc$i tail$i")))

  private def assertKeyEqui(name: String, caps: Seq[CapturedPlan],
      maxBnljPerAction: Int = 0): Unit = {
    assert(caps.nonEmpty, s"$name: no action plans captured")
    caps.foreach { c =>
      assert(c.cartesians === 0, s"$name went cartesian:\n${c.text}")
      assert(c.nestedJoins <= maxBnljPerAction,
        s"$name: nested-loop join (${c.nestedJoins}):\n${c.text}")
    }
  }

  test("prefix-filtered jaccard join never goes cartesian") {
    assertKeyEqui("ngramJaccardPairs",
      capturedPlans(Dedup.ngramJaccardPairs(pdocs(60), "id", "text")))
  }

  test("minhash and simhash pair generation never goes cartesian") {
    assertKeyEqui("minhashPairsVerified",
      capturedPlans(Dedup.minhashPairsVerified(pdocs(60), "id", "text")))
    assertKeyEqui("simhashPairs",
      capturedPlans(Dedup.simhashPairs(pdocs(60), "id", "text", maxHamming = 3)))
  }

  test("hash split and repetition signals are shuffle-free projections") {
    val split = Sampling.hashSplit(docs(50), "id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(!executed(split).contains("Exchange"),
      "split assignment must be a pure projection")
    val sig = docs(50).select(
      TextAnalysis.duplicateLineFraction(col("text")),
      TextAnalysis.repeatedNgramFraction(col("text"), 2))
    assert(!executed(sig).contains("Exchange"))
  }

  test("repetition census aggregates with exactly one exchange") {
    val agg = docs(50).agg(
      sum(when(TextAnalysis.repeatedNgramFraction(col("text"), 2) > 0.15, 1L)
        .otherwise(0L)).as("n"))
    val plan = executed(agg)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected a single partial->final agg:\n$plan")
  }

  test("exact dedup plans as a single window, no cartesian, one shuffle") {
    val plan = executed(Dedup.exact(docs(50), Seq("text"), "id"))
    assert(!plan.contains("CartesianProduct"))
    val exchanges = "Exchange(?!Coordinator)".r.findAllIn(plan).size
    assert(exchanges <= 1, s"one partition-by-key shuffle expected:\n$plan")
  }

  test("decontamination broadcasts the blocklist; corpus text never shuffles") {
    val train = docs(200)
    val block = docs(5)
    val df = Dedup.contaminatedIds(train, "id", "text", block, "text", n = 4)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"blocklist must broadcast:\n$plan")
    // the only non-broadcast exchange is the distinct over matched ids —
    // a shuffle whose rows carry the id column alone, never document text
    val shuffles = plan.split('\n').filter(l =>
      l.contains("Exchange hashpartitioning"))
    assert(shuffles.nonEmpty && shuffles.forall(!_.contains("text")),
      s"only id-typed shuffles expected:\n$plan")
  }

  test("boilerplate strip: census shuffles hashes only; rewrite is map-side") {
    val df = docs(60).withColumn("text",
      concat(lit("BANNER\n"), col("text")))
    val out = CorpusStats.stripBoilerplateLines(df, "id", "text", minDocs = 30)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    // the rewrite pass itself carries no exchange at all — the census runs
    // as separate bounded jobs inside the operator, and the output plan is
    // scan -> project (broadcast set lives in the UDF closure)
    assert(!plan.contains("Exchange"),
      s"rewrite must be a pure map-side projection:\n$plan")
  }

  test("mixture upsample is a shuffle-free projection") {
    val df = makeDf(StructType(Seq(strCol("grp"), longCol("id"))),
      (1 to 50).map(i => Row(if (i % 2 == 0) "a" else "b", i.toLong)))
    val out = Sampling.mixtureUpsample(df, "grp", "id", Seq("a" -> 2.5))
    val plan = executed(out)
    assert(!plan.contains("Exchange"),
      s"upsampling must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"no window needed:\n$plan")
  }

  test("line dedup and sliding windows are shuffle-free projections") {
    val dl = docs(50).select(col("id"),
      TextAnalysis.dedupLines(col("text")).as("text"))
    assert(!executed(dl).contains("Exchange"),
      "intra-doc line dedup must be a pure projection")
    val sw = docs(50).select(col("id"), posexplode(
      TextAnalysis.slidingWindows(col("text"), 4, 2)).as(Seq("i", "w")))
    val plan = executed(sw)
    assert(!plan.contains("Exchange"),
      s"windowing + explode must stay map-side:\n$plan")
  }

  test("content-defined chunking is a shuffle-free kernel + explode") {
    val cdc = docs(50).select(col("id"), posexplode(
      Dedup.contentDefinedChunks(col("text"))).as(Seq("i", "ch")))
    val plan = executed(cdc)
    assert(!plan.contains("Exchange"),
      s"CDC must stay map-side:\n$plan")
  }

  test("contamination scoring broadcasts the blocklist; one id-keyed agg") {
    val df = Dedup.contaminationScores(docs(200), "id", "text",
      docs(5), "text", n = 4)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"blocklist must broadcast:\n$plan")
    // the only hash shuffle is the per-document count agg keyed on the id —
    // partial map-side combine upstream, and no text column ever shuffles
    val shuffles = plan.split('\n').filter(_.contains("Exchange hashpartitioning"))
    assert(shuffles.forall(l => l.contains("id") && !l.contains("text")),
      s"only the id-keyed agg may shuffle:\n$plan")
  }

  test("spread rebalances under-split file scans and nothing else") {
    // file scans at test SF arrive as one split: spread must fan them out
    // to every core so per-row kernels parallelize
    val files = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val spreadPlan = Dedup.spread(files).queryExecution.optimizedPlan.toString
    assert(spreadPlan.contains("Repartition"),
      s"small file scan should rebalance:\n$spreadPlan")
    // in-memory relations are already parallelized: the exact same
    // DataFrame instance must come back, no Exchange added
    val local = docs(30)
    assert(Dedup.spread(local) eq local)
  }

  test("packing never plans a global single-partition window") {
    val df = makeDf(StructType(Seq(longCol("id"), longCol("ntok"))),
      (1 to 200).map(i => Row(i.toLong, (i % 7 + 1).toLong)))
    val packed = Packing.packChunks(df, "id", "ntok", 50)
    packed.count()
    val plan = packed.queryExecution.executedPlan.toString
    // the prefix sum must ride a value-keyed exchange + mapPartitions, not
    // a Window over an empty partitionBy (which funnels every row into one
    // task at 100 TB) and not a physical-boundary-dependent range exchange
    // (rdd.id-seeded boundary sampling differs between jobs)
    assert(!plan.contains("Window"), s"no global window allowed:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"bucket-keyed hash exchange expected, not sampled ranges:\n$plan")
    assert(plan.contains("hashpartitioning"), s"bucket exchange expected:\n$plan")
    assert(plan.contains("MapPartitions"), s"offset scan expected:\n$plan")
  }

  test("cross-corpus scrub: corpus band hashes never hash-shuffle; " +
      "reference side broadcasts") {
    val corpus = docs(200)
    val ref = makeDf(StructType(Seq(longCol("id"), strCol("text"))),
      (1 to 8).map(i => Row((1000 + i).toLong, s"uniq$i ref$i zz$i yy$i xx$i")))
    val m = Dedup.crossCorpusMatches(corpus, ref, "id", "text")
    m.count()
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"),
      s"small reference must broadcast into the candidate join:\n$plan")
    // shuffles may carry band hashes and ids, never document text
    val shuffles = plan.split('\n').filter(_.contains("Exchange hashpartitioning"))
    assert(shuffles.forall(!_.contains("text")),
      s"no text through any exchange:\n$plan")
    // the signature kernel must evaluate ONCE per row per side: inlining
    // the UDF into bandHashes' 64 slices once duplicated the whole
    // shingle+sketch kernel per band (64x per-row work). Each Project line
    // may carry at most a couple of UDF calls.
    plan.split('\n').filter(_.trim.startsWith("Project")).foreach { l =>
      val udfs = "UDF".r.findAllIn(l).size
      assert(udfs <= 2, s"signature kernel duplicated across band slices:\n$l")
    }
  }

  test("tfidf ranks with a partial WindowGroupLimit before the exchange") {
    val plan = executed(CorpusStats.topTfidfTerms(docs(80), "id", "text", k = 3))
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc limit must push a partial group limit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // the corpus-size scalar joins as a broadcast, not a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"one-row N frame must broadcast:\n$plan")
  }

  test("brute-force pairs streams against a resident matrix, zero shuffle") {
    // q73 is quadratic in ARITHMETIC by construction, but its plan must
    // stay a single distributed pass: normalized vectors broadcast once,
    // each partition merge-scanned against them — no pair-space join, no
    // exchange of the n^2 pair stream
    val df = Similarity.bruteForcePairs(docs(30).withColumn("v",
      array(lit(1.0), lit(2.0))), "id", "v", threshold = -1.0)
    assert(df.count() === 30L * 29 / 2) // every unordered pair, exactly once
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"),
      s"pair space must never materialize as a join:\n$plan")
    assert(!plan.contains("Exchange"), s"single-pass, shuffle-free:\n$plan")
    assert(plan.contains("MapPartitions"), s"kernel scan expected:\n$plan")
  }

  test("span duplication shuffles hashes only; text never leaves the scan") {
    val df = Dedup.spanDuplicationFraction(docs(60), "id", "text", k = 3)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram-count join must stay key-equi:\n$plan")
    val shuffles = plan.split('\n').filter(_.contains("Exchange hashpartitioning"))
    assert(shuffles.nonEmpty && shuffles.forall(!_.contains("text")),
      s"only (hash, id) rows may shuffle:\n$plan")
  }

  test("unigram LM: vocabulary joins by key, the total broadcasts as one row") {
    val df = CorpusStats.unigramLogProb(docs(60), "id", "text")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"no pair space anywhere:\n$plan")
    // the single-row corpus total must arrive via broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"one-row total frame must broadcast:\n$plan")
  }

  test("semantic dedup joins cluster-keyed, never cartesian") {
    val df = makeDf(
      StructType(Seq(longCol("vec_id"), longCol("label"),
        StructField("embedding", ArrayType(DoubleType)))),
      (1 to 40).map(i => Row(i.toLong, (i % 4).toLong,
        Seq(math.sin(i.toDouble), math.cos(i.toDouble)))))
    val out = Similarity.semanticDedup(df, "vec_id", "label", "embedding", 0.99)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair scoring must stay within cluster-keyed equi joins:\n$plan")
  }

  test("numeric profile is one partial->final aggregate, one exchange") {
    val df = makeDf(StructType(Seq(strCol("g"), dblCol("v"))),
      (1 to 100).map(i => Row("g" + i % 3, (i % 11).toDouble)))
    val plan = executed(CorpusStats.numericProfile(df, Seq("g"), "v"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"one keyed shuffle expected:\n$plan")
    assert(plan.contains("partial_"), s"map-side partial agg expected:\n$plan")
  }

  test("rollup mix report is a single Expand + one keyed aggregation") {
    val df = makeDf(StructType(Seq(strCol("lang"), strCol("src"), strCol("text"))),
      (1 to 60).map(i => Row("l" + i % 3, "s" + i % 2, "a b c")))
    val plan = executed(CorpusStats.corpusMix(df, Seq("lang", "src"), "text"))
    assert("Expand".r.findAllIn(plan).size === 1,
      s"levels must fan out in ONE Expand, not one scan per level:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"all levels share one keyed shuffle:\n$plan")
  }

  test("KMV sketches partially aggregate map-side; only sketches shuffle") {
    val df = makeDf(StructType(Seq(strCol("g"), longCol("v"))),
      (1 to 500).map(i => Row("g" + i % 2, i.toLong)))
    val sk = df.groupBy("g").agg(graft.exec.Kmv.sketch(col("v"), 64).as("sk"))
    val plan = executed(sk)
    assert(plan.contains("partial_kmv_sketch"),
      s"sketch must combine map-side before the exchange:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }

  test("weighted quota pre-filters its window map-side (WindowGroupLimit)") {
    val df = makeDf(StructType(Seq(strCol("g"), longCol("id"), dblCol("w"))),
      (1 to 300).map(i => Row("g" + i % 2, i.toLong, (i % 5 + 1).toDouble)))
    val plan = executed(Sampling.weightedQuota(df, "g", "id", "w", 5))
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push into a per-partition group limit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("funnel stages push their step filter to the scan; joins stay keyed") {
    val events = makeDf(
      StructType(Seq(longCol("u"), strCol("t"), longCol("ts"))),
      (1 to 200).map(i => Row((i % 40).toLong, Seq("a", "b", "c")(i % 3), i.toLong)))
    val out = Relational.funnel(events, "u", "t", "ts", Seq("a", "b"))
    out.collect()
    // the released counts are tiny; the contract lives in the per-stage
    // plans, which are checkpointed — assert on a rebuilt stage instead
    val stage = events.filter(col("t") === "a")
      .groupBy(col("u")).agg(min(col("ts")))
    val plan = executed(stage)
    assert(plan.contains("partial_min"), s"stage agg must combine map-side:\n$plan")
    assert(!executed(out).contains("CartesianProduct"))
  }

  test("cohort retention: one data-sized distinct, joins keyed on entity") {
    val events = makeDf(StructType(Seq(longCol("u"), longCol("p"))),
      (1 to 300).map(i => Row((i % 50).toLong, (i % 7).toLong)))
    val plan = executed(Relational.cohortRetention(events, "u", "p"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_"), s"aggregates must combine map-side:\n$plan")
  }

  test("meanPool: one keyed aggregation; reassembly state is dim structs") {
    val df = makeDf(
      StructType(Seq(strCol("g"),
        StructField("v", ArrayType(DoubleType)))),
      (1 to 100).map(i => Row("g" + i % 3, Seq(1.0, 2.0, 3.0))))
    val plan = executed(Similarity.meanPool(df, "g", "v", quantizeUnit = 1e-6))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"position sums must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("bigram LM: per-document join side carries hashes, not gram strings") {
    val df = makeDf(StructType(Seq(longCol("id"), strCol("text"))),
      (1 to 80).map(i => Row(i.toLong, s"alpha bravo charlie delta tail$i")))
    val out = CorpusStats.bigramLogProb(df, "id", "text")
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    // every hash-partitioned shuffle must be keyed on longs (__g/__hu/id);
    // no exchange may carry the __u/__v gram strings
    val shuffles = plan.split('\n').filter(_.contains("Exchange hashpartitioning"))
    assert(shuffles.forall(l => !l.contains("__u#") && !l.contains("__v#")),
      s"gram strings must not cross an exchange:\n$plan")
  }

  test("KLL sketches partially aggregate map-side; equi-depth tagging is " +
      "a shuffle-free projection over the scan") {
    val df = makeDf(StructType(Seq(strCol("g"), dblCol("v"))),
      (1 to 400).map(i => Row("g" + i % 2, (i % 37).toDouble)))
    val plan = executed(
      df.groupBy("g").agg(graft.exec.Kll.quantiles(col("v"), 64,
        Seq(0.5)).as("q")))
    assert(plan.contains("partial_kll_quantiles"),
      s"map-side partial sketch expected:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"only sketches may shuffle, once:\n$plan")
    // tagging: after the one edge-computing aggregate, the bin column is
    // a codegen'd when-chain on the scan — no join, no shuffle
    val binned = CorpusStats.equiDepthBins(df, "v", 4, k = 512)
    val bp = executed(binned)
    assert(!bp.contains("Exchange") && !bp.contains("Join"),
      s"equi-depth tagging must be a pure projection:\n$bp")
  }

  test("bm25 joins stay token/id-keyed — no cartesian, no nested loop; " +
      "corpus stats broadcast as one row") {
    val q = makeDf(StructType(Seq(longCol("qid"), strCol("q"))),
      Seq(Row(1L, "alpha bravo"), Row(2L, "echo doc7")))
    val plan = executed(Retrieval.bm25TopK(
      docs(60), "id", "text", q, "qid", "q", k = 3))
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must stay equi-joined:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"the one-row (N, total) side must broadcast:\n$plan")
  }

  test("quality quarantine: row-local rules add no shuffle beyond the " +
      "dup-key and FK joins; never cartesian") {
    val df = makeDf(StructType(Seq(longCol("id"), strCol("s"))),
      (1 to 200).map(i => Row((i % 150).toLong, if (i % 7 == 0) null else "x")))
    val dim = makeDf(StructType(Seq(longCol("pk"))),
      (1 to 100).map(i => Row(i.toLong)))
    import Quality.Expect._
    val plan = executed(Quality.quarantine(df, Seq(
      NotNull("s"), Unique(Seq("id")),
      ForeignKey(Seq("id"), dim, Seq("pk"), "dim"))))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quarantine joins must stay key-equi:\n$plan")
  }

  test("robust z-scores / winsorize: exactly the necessary sketch " +
      "aggregates (two for MAD — the deviation pass needs the median — " +
      "one for clips); stats joins stay key-equi, never nested-loop") {
    val df = makeDf(StructType(Seq(strCol("g"), dblCol("v"))),
      (1 to 500).map(i => Row(s"g${i % 4}", i.toDouble)))
    val zp = executed(Quality.robustZScores(df, Seq("g"), "v", k = 64))
    assert(!zp.contains("CartesianProduct") &&
      !zp.contains("BroadcastNestedLoopJoin"), s"z-scores:\n$zp")
    // sketch aggregates appear as (partial, final) ObjectHashAggregate
    // pairs; 2 sketch passes -> at most 4 occurrences (a mis-estimated
    // stats side may fall back to sort-merge joins — still key-equi)
    assert("kll_quantiles".r.findAllIn(zp).size <= 8,
      s"z-scores must run exactly two sketch passes:\n$zp")
    val wp = executed(Quality.winsorize(df, Seq("g"), "v", k = 64))
    assert(!wp.contains("CartesianProduct") &&
      !wp.contains("BroadcastNestedLoopJoin"), s"winsorize:\n$wp")
    assert("Exchange hashpartitioning".r.findAllIn(wp).size <= 2,
      s"winsorize is one sketch exchange plus at most the clip join:\n$wp")
  }

  test("edit-distance join: prefix and length-band joins stay gram/length-" +
      "keyed — no cartesian, no nested loop") {
    val names = planDf(StructType(Seq(strCol("s"))),
      (1 to 80).map(i => Row(s"name_variant_$i" + ("x" * (i % 5)))))
    assertKeyEqui("editDistancePairs",
      capturedPlans(Dedup.editDistancePairs(names, "s", 2)))
  }

  test("interval overlap join is a (key, cell) hash join, never the " +
      "per-key cartesian of the naive theta form") {
    val iv = makeDf(StructType(Seq(longCol("k"), longCol("id"),
        longCol("lo"), longCol("hi"))),
      (1 to 100).map(i => Row((i % 5).toLong, i.toLong,
        (i * 3).toLong, (i * 3 + 10).toLong)))
    val a = iv.select(col("k"), col("id").as("id_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = iv.select(col("k"), col("id").as("id_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    val plan = executed(Relational.intervalOverlapJoin(
      a, b, Seq("k"), "lo_a", "hi_a", "lo_b", "hi_b", cellWidth = 8L))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join must stay (key, cell)-equi:\n$plan")
  }

  test("frequent pairs: incidence self-join stays basket-keyed with " +
      "map-side partial counts; scd2/session/attribution windows share " +
      "one entity exchange") {
    // frequentPairs localCheckpoints its release, so the RETURNED frame is
    // a checkpoint scan — assert on the CAPTURED action plans instead
    val bi = planDf(StructType(Seq(longCol("b"), longCol("i"))),
      (1 to 300).map(n => Row((n % 40).toLong, (n % 12).toLong)))
    val caps = capturedPlans(CorpusStats.frequentPairs(bi, "b", "i", 2L))
    assert(caps.nonEmpty)
    caps.foreach { c =>
      assert(c.cartesians === 0 && c.nestedJoins === 0,
        s"pair join must stay basket-keyed:\n${c.text}")
    }
    // the A-priori prune is load-bearing at scale: the quadratic wedge
    // stage must only ever see FREQUENT items, which shows up as a
    // LeftSemi join against the support-filtered item table somewhere in
    // the materialization (inside the cached `kept` relation's plan)
    assert(caps.exists(_.text.contains("LeftSemi")),
      "frequent-item semi-join prune missing before the self-join:\n" +
        caps.map(_.text).mkString("\n----\n"))
    val ev = makeDf(StructType(Seq(longCol("u"), longCol("t"), strCol("y"))),
      (1 to 200).map(n => Row((n % 20).toLong, n.toLong,
        if (n % 5 == 0) "buy" else "click")))
    for ((name, df) <- Seq(
        "scd2" -> Relational.scd2History(ev, Seq("u"), "t", Seq("y")),
        "sessionTable" -> Relational.sessionTable(ev, "u", "t", 10L),
        "attribution" -> Relational.attribution(
          ev, "u", "t", "y", "buy", Seq("click"), 50L),
        "multiTouch:linear" -> Relational.multiTouchAttribution(
          ev, "u", "t", "y", "buy", Seq("click"), 50L),
        "multiTouch:position" -> Relational.multiTouchAttribution(
          ev, "u", "t", "y", "buy", Seq("click"), 50L, "position"),
        "multiTouch:time_decay" -> Relational.multiTouchAttribution(
          ev, "u", "t", "y", "buy", Seq("click"), 50L, "time_decay", 5L))) {
      val plan = executed(df)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"$name must reuse ONE entity-keyed exchange, got $exchanges:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Join"),
        s"$name must not self-join the touch stream:\n$plan")
    }
  }

  test("changelog apply: ONE key exchange over the union, no join; " +
      "transition matrix joins nothing") {
    val b = makeDf(StructType(Seq(longCol("k"), strCol("p"))),
      (1 to 50).map(n => Row(n.toLong, s"base$n")))
    val c = makeDf(
      StructType(Seq(longCol("k"), strCol("p"), longCol("v"), strCol("op"))),
      (1 to 80).map(n => Row((n % 60).toLong, s"chg$n", n.toLong,
        if (n % 9 == 0) "D" else "U")))
    val merged = executed(Relational.applyChangelog(b, c, Seq("k"), "v", "op"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(merged).size
    assert(exchanges == 1,
      s"merge must be one key-keyed window over the union:\n$merged")
    assert(!merged.contains("Join"),
      s"base must ride the union, not a join:\n$merged")
    val ev = makeDf(StructType(Seq(longCol("u"), longCol("t"), strCol("y"))),
      (1 to 200).map(n => Row((n % 20).toLong, n.toLong, s"t${n % 4}")))
    val tm = executed(Relational.transitionMatrix(ev, "u", "t", "y", 10L))
    assert(!tm.contains("Join"),
      s"transitions are windows + aggregates, never a join:\n$tm")
    assert(!tm.contains("CartesianProduct"))
  }

  test("survivorship: assignment joins by id, winner window stays keyed") {
    val d = makeDf(StructType(Seq(longCol("id"), longCol("s"))),
      (1 to 100).map(n => Row(n.toLong, (n % 7).toLong)))
    val a = makeDf(StructType(Seq(longCol("id"), longCol("cluster_id"))),
      (1 to 100).map(n => Row(n.toLong, (n % 25).toLong)))
    val plan = executed(Dedup.survivorship(d, "id", "s", a))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"survivorship must stay key-equi:\n$plan")
  }

  test("kCore and ssspWeighted rounds stay key-equi, never cartesian") {
    val e = planDf(StructType(Seq(strCol("src"), strCol("dst"))),
      (1 to 120).map(n => Row(s"n${n % 30}", s"n${(n * 7) % 30}")))
    assertKeyEqui("kCore",
      capturedPlans(Graph.kCore(e, "src", "dst", k = 3, maxRounds = 3)))
    val w = planDf(StructType(Seq(strCol("src"), strCol("dst"), longCol("w"))),
      (1 to 120).map(n => Row(s"n${n % 30}", s"n${(n * 7) % 30}",
        (n % 5 + 1).toLong)))
    val seeds = planDf(StructType(Seq(strCol("seed"))), Seq(Row("n1")))
    assertKeyEqui("ssspWeighted",
      capturedPlans(Graph.ssspWeighted(w, "src", "dst", "w", seeds,
        "seed", maxRounds = 3)))
  }

  test("mergeIntervals runs on ONE key-keyed exchange, no join") {
    val iv = makeDf(
      StructType(Seq(strCol("k"), longCol("lo"), longCol("hi"))),
      (1 to 80).map(i => Row(s"k${i % 9}", (i * 3).toLong, (i * 3 + 5).toLong)))
    val plan = executed(Relational.mergeIntervals(iv, Seq("k"), "lo", "hi"))
    assert(!plan.contains("Join"), s"islands never self-join:\n$plan")
    val exchanges = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"window + island agg must reuse one key exchange:\n$plan")
  }

  test("periodDeltas: count exchange + series lag exchange, nothing more") {
    val ev = makeDf(StructType(Seq(strCol("g"), longCol("p"))),
      (1 to 90).map(i => Row(s"g${i % 4}", (i % 7).toLong)))
    val plan = executed(Relational.periodDeltas(ev, Seq("g"), "p"))
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
    val exchanges = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"(key,period) agg + key window only:\n$plan")
  }

  test("rfmSegments never global-sorts into a single task") {
    val ev = makeDf(StructType(Seq(strCol("e"), longCol("t"), longCol("a"))),
      (1 to 60).map(i => Row(s"e${i % 20}", (i % 11).toLong, (i % 5 + 1).toLong)))
    val plan = executed(Relational.rfmSegments(ev, "e", "t", "a", tiles = 4))
    assert(!plan.contains("CartesianProduct"))
    // the tile ranks are two-phase (range exchange + per-partition
    // window); a single-partition window would be the 100-TB killer
    assert(!plan.contains("Window [") ||
      !plan.contains("Exchange SinglePartition"),
      s"tile ranks must not funnel into one task:\n$plan")
  }

  test("benfordAudit shuffles at most 9 digit groups") {
    val v = makeDf(StructType(Seq(longCol("v"))),
      (1 to 200).map(i => Row((i * 37 % 997).toLong)))
    val plan = executed(Quality.benfordAudit(v, "v"))
    assert(!plan.contains("CartesianProduct"), s"benford:\n$plan")
    // every hash exchange is post-aggregation: rows are (digit, n) pairs
    val shuffles = plan.split('\n').filter(_.contains("Exchange hashpartitioning"))
    assert(shuffles.forall(l => !l.contains(", v#")),
      s"raw values must never shuffle:\n$plan")
  }

  test("categoricalProfile melts C columns into one scan; the only join " +
      "is the broadcast row-per-requested-column zero-fill") {
    val df = makeDf(StructType(Seq(strCol("x"), strCol("y"), strCol("z"))),
      (1 to 70).map(i => Row(s"a${i % 5}", s"b${i % 3}", s"c${i % 7}")))
    val plan = executed(Quality.categoricalProfile(df, Seq("x", "y", "z")))
    // data never joins data: the r13 empty-frame zero-fill joins the
    // |cols|-row LITERAL table by broadcast — never a shuffle join
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"profile must not join data-sized sides:\n$plan")
    assert(!plan.contains("Union"), s"one melted scan, not per-column:\n$plan")
  }

  test("pairAffinity stays key-equi; only the 1-row stats row broadcasts") {
    val bi = planDf(StructType(Seq(strCol("b"), strCol("i"))),
      (1 to 120).map(n => Row(s"b${n % 30}", s"i${n % 8}")))
    assertKeyEqui("pairAffinity",
      capturedPlans(CorpusStats.pairAffinity(bi, "b", "i", minSupport = 2L)),
      maxBnljPerAction = 1) // the single-row n_baskets broadcast
  }

  test("linkPrediction joins stay apex/pair-keyed, never cartesian") {
    val e = makeDf(StructType(Seq(strCol("src"), strCol("dst"))),
      (0 until 30).map(i => Row(s"n$i", s"n${(i + 1) % 30}")))
    val plan = executed(Graph.linkPrediction(e, "src", "dst"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"linkPrediction:\n$plan")
  }

  test("paretoFrontier is one key-keyed window, no join") {
    val df = makeDf(StructType(Seq(strCol("g"), longCol("a"), longCol("b"))),
      (1 to 80).map(i => Row(s"g${i % 5}", (i % 13).toLong, (i % 11).toLong)))
    val plan = executed(Relational.paretoFrontier(df, Seq("g"), "a", "b"))
    assert(!plan.contains("Join"), s"sweep line never self-joins:\n$plan")
    val exchanges = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"one key exchange expected:\n$plan")
  }

  test("imputeMode scans the data once; the mode table joins by key") {
    val df = makeDf(StructType(Seq(strCol("g"), strCol("v"))),
      (1 to 90).map(i => Row(s"g${i % 6}", if (i % 9 == 0) null else s"v${i % 4}")))
    val plan = executed(Quality.imputeMode(df, Seq("g"), "v"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"imputeMode:\n$plan")
  }

  test("reachProfile frontier joins stay node-keyed; joinHotKeys sizes " +
      "the join from COUNT tables and top-Ks without a global sort") {
    val e = makeDf(StructType(Seq(strCol("src"), strCol("dst"))),
      (0 until 25).map(i => Row(s"n$i", s"n${(i + 1) % 25}")))
    val seeds = makeDf(StructType(Seq(strCol("seed"))),
      Seq(Row("n0"), Row("n5")))
    val rp = executed(Graph.reachProfile(e, "src", "dst", seeds, "seed", 3))
    assert(!rp.contains("CartesianProduct"), s"reachProfile:\n$rp")
    val l = makeDf(StructType(Seq(strCol("k"))),
      (1 to 100).map(i => Row(s"k${i % 9}")))
    val hk = Relational.joinHotKeys(l, l, Seq("k"), topK = 3)
    hk.count()
    val plan = hk.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must be per-partition heads, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"joinHotKeys:\n$plan")
  }

  test("scdAudit shares ONE key exchange; sortedNeighborPairs joins on " +
      "rank buckets, never all-pairs") {
    val scd = makeDf(StructType(Seq(strCol("k"), longCol("f"), longCol("t"))),
      (1 to 60).map(i => Row(s"k${i % 7}", (i * 10).toLong, (i * 10 + 8).toLong)))
    val ap = executed(Relational.scdAudit(scd, Seq("k"), "f", "t"))
    assert(!ap.contains("Join"), s"audit never joins:\n$ap")
    assert(ap.split('\n').count(_.contains("Exchange hashpartitioning")) <= 1,
      s"window + rollup share one key exchange:\n$ap")
    val nm = makeDf(StructType(Seq(strCol("id"), strCol("k"))),
      (1 to 50).map(i => Row(s"id$i", f"k${(i * 13) % 50}%03d")))
    val sn = executed(Dedup.sortedNeighborPairs(nm, "id", "k", 4))
    assert(!sn.contains("CartesianProduct") &&
      !sn.contains("BroadcastNestedLoopJoin"),
      s"rank pairing must stay bucket-equi:\n$sn")
  }

  test("negativeSamples: bounded k-explode, index-keyed universe join, " +
      "never cartesian") {
    val pos = makeDf(StructType(Seq(strCol("u"), strCol("i"))),
      (1 to 80).map(x => Row(s"u${x % 8}", s"i${(x * 7) % 15}")))
    val plan = executed(Sampling.negativeSamples(pos, "u", "i", 2))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"negativeSamples:\n$plan")
  }

  test("negativeSamplesExact keeps the same shape: equi-joins only, " +
      "never cartesian, rank limited per positive") {
    // sparse fixture (each user holds 5 of 15 items — the documented
    // headroom regime); the dense variant rightly raises its shortfall
    val pos = makeDf(StructType(Seq(strCol("u"), strCol("i"))),
      (1 to 40).map(x => Row(s"u${x % 8}", s"i${(x * 7) % 15}")))
    val out = Sampling.negativeSamplesExact(pos, "u", "i", 2)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"negativeSamplesExact:\n$plan")
  }

  test("validation probes are consolidated: at most ONE eager job per " +
      "operator at construction (zero where the guard rides the main pass)") {
    // counts Dataset ACTIONS fired while constructing the operator's
    // release frame (QueryExecutionListener fires once per action — AQE
    // may split one action into several scheduler jobs, which is fine;
    // the 100-TB cost unit is the extra SCAN an extra action pays). The
    // r13 audit found applyChangelog paying 3 probe actions and
    // scd2History/snapshotDiff 2 each on clean inputs.
    def jobsDuring(name: String)(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = counter.incrementAndGet()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = counter.incrementAndGet()
      }
      spark.listenerManager.register(l)
      try {
        body
        // the listener bus is asynchronous — poll until the count settles
        var last = -1
        var spins = 0
        while (counter.get != last && spins < 100) {
          last = counter.get; Thread.sleep(50); spins += 1
        }
        counter.get
      } finally spark.listenerManager.unregister(l)
    }
    val base = makeDf(StructType(Seq(longCol("k"), strCol("p"))),
      (1 to 50).map(i => Row(i.toLong, s"p$i")))
    val changes = makeDf(
      StructType(Seq(longCol("k"), strCol("p"), longCol("v"), strCol("op"))),
      (1 to 20).map(i => Row(i.toLong, s"q$i", i.toLong, "U")))
    assert(jobsDuring("changelog") {
      Relational.applyChangelog(base, changes, Seq("k"), "v", "op")
    } === 1, "applyChangelog: all three guards must share one job")
    val scd = makeDf(StructType(Seq(longCol("k"), longCol("v"), strCol("a"))),
      (1 to 50).map(i => Row(i.toLong % 5, i.toLong, s"a${i % 3}")))
    assert(jobsDuring("scd2") {
      Relational.scd2History(scd, Seq("k"), "v", Seq("a"))
    } === 1, "scd2History: both guards must share one job")
    assert(jobsDuring("snapdiff") {
      Relational.snapshotDiff(base, base, Seq("k"))
    } === 1, "snapshotDiff: both sides must share one validation job")
    val iv = makeDf(StructType(Seq(longCol("k"), longCol("lo"), longCol("hi"))),
      (1 to 30).map(i => Row(i.toLong % 3, i.toLong, i.toLong + 5)))
    assert(jobsDuring("overlap") {
      Relational.intervalOverlapJoin(iv,
        iv.select(col("k"), col("lo").as("lo2"), col("hi").as("hi2")),
        Seq("k"), "lo", "hi", "lo2", "hi2", cellWidth = 4L)
    } === 0, "intervalOverlapJoin (explicit cellWidth): inline guard, " +
      "zero validation jobs")
    val e = makeDf(StructType(Seq(strCol("src"), strCol("dst"))),
      (1 to 30).map(i => Row(s"n${i % 10}", s"n${(i * 3) % 10}")))
    assert(jobsDuring("linkpred") {
      Graph.linkPrediction(e, "src", "dst")
    } === 2, "linkPrediction: two checkpoint jobs (und, deg) and NO " +
      "separate hub-probe job — the refusal rides deg's checkpoint")
  }

  test("tableDigest is one codegen'd projection + one bucket aggregate") {
    val df = makeDf(StructType(Seq(longCol("id"), strCol("p"))),
      (1 to 100).map(i => Row(i.toLong, s"p$i")))
    val plan = executed(Quality.tableDigest(df, Seq("id"), Seq("p"), 16))
    assert(!plan.contains("Join"), s"digest never joins:\n$plan")
    val exchanges = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"one bucket exchange expected:\n$plan")
  }
}
