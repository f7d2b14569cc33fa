package graft

import graft.relational.{PipelineQueries, QueryCatalog}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query subset on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Queries run through the same catalog the
  * correctness gate uses — no bench-only fast paths. */
object Bench {

  /** CALIBRATION CANARY: a fixed pure-CPU computation (no IO, no Spark)
    * timed at the start of every sweep, reported verbatim in the JSON
    * line. The host-stall noise this bench is exposed to (see CLAUDE.md
    * gotchas) is strictly one-sided and can span an entire run at a mild
    * level — which uniform-shifts every per-query min and masquerades as
    * an across-the-board regression (round 8's apparent 20-90% deltas
    * were exactly this). A reader comparing BENCH_rN to BENCH_rM divides
    * by the canary ratio first: the workload is constant across rounds,
    * so any canary delta IS ambient contention, not code. ~2.5e8 xorshift
    * steps ≈ 0.5 s calm. */
  private def cpuCanary(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < 250000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (acc == 42L) System.err.println("") // defeat dead-code elimination
    sec
  }

  /** SCHEDULER CANARY: one trivial many-task Spark job (no data read) —
    * times the task-dispatch RPC round-trips that the documented
    * hypervisor wakeup-latency stalls inflate first. Pure-CPU stays calm
    * while this degrades ⇒ the window is a scheduler-RPC stall; both
    * elevated ⇒ general CPU contention. */
  private def schedCanary(spark: SparkSession, slots: Int): Double = {
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(0 until slots * 4, slots * 4).count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // leave 2 vCPUs of headroom for the JVM's service threads (GC,
    // compiler, RPC dispatchers): measured equal-or-faster than using
    // every core even on an idle host, and it sharply reduces exposure to
    // host-level wakeup-latency stalls (see CLAUDE.md gotchas) when the
    // hypervisor is contended — a fully subscribed local[n] serializes
    // Spark's scheduler RPC ping-pong behind 10-100 ms thread wakeups
    val slots = math.max(1, cpus.toInt - 2)
    val spark = SparkSession.builder()
      .master(s"local[$slots]")
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val benched = QueryCatalog.headlines
    // JIT + codegen (janino) warmup: run every headline plan once at the
    // smallest scale factor so timings measure steady state, not one-time
    // bytecode compilation (untimed; falls back to the bench SF dir)
    val warmDir = {
      val small = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    benched.foreach { q =>
      try q.build(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }

    // MIN of >=3 timed runs per query. The noise here is one-sided — a run
    // is either clean or inflated by an external stall (host wakeup
    // latency, GC pause, page-cache miss), never spuriously fast — so the
    // minimum is the unbiased estimate of the plan's true cost (same
    // reasoning as python timeit). Observed stalls on this host reach
    // 10-600 s on queries whose clean runs take 0.3 s. The repetitions are
    // ROUND-ROBINED across the whole suite (run everything once, then
    // again, then again) rather than run back-to-back per query: the
    // host's stall windows last minutes, so three consecutive runs of one
    // query can ALL land inside one window (round 7 manufactured two
    // phantom 3-4x regressions exactly that way), while interleaved
    // rounds put suite-lengths of wall clock between a query's samples.
    // After the three sweeps, any query whose two fastest readings still
    // disagree by >1.5x (minimum uncorroborated) gets up to three more
    // interleaved sweeps over just the suspect set.
    //
    // Every sample (and every canary run) records its WALL-CLOCK OFFSET
    // from bench start next to its duration, and the cheap scheduler
    // canary runs BETWEEN queries, not only at sweep starts: a mid-sweep
    // host stall is then attributable post-hoc — the inflated sample's
    // [offset, offset+dur] window overlaps elevated sched-canary readings
    // and/or other queries' inflated samples at nearby offsets — instead
    // of forging a per-query "regression" a human has to hand-re-time
    // (round 9's qp08 phantom: +73% with calm sweep-start canaries).
    val benchT0 = System.nanoTime()
    def offsetSec(): Double = (System.nanoTime() - benchT0) / 1e9
    val cpuLog = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val schedLog = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    // canary_sched (the cross-round compat field) keeps r9's SAMPLING —
    // sweep starts only; mixing in the ~70 inter-query readings would
    // bias its min/median lower and silently shift the canary-ratio
    // normalization a reader applies across rounds
    val sweepSched = scala.collection.mutable.ArrayBuffer.empty[Double]
    def logSched(): Double = {
      val off = offsetSec()
      val sc = schedCanary(spark, slots)
      schedLog += ((off, sc))
      sc
    }
    def timed(q: graft.relational.CatalogQuery): Option[(Double, Double)] = {
      val off = offsetSec()
      val t0 = System.nanoTime()
      // a failed query must NOT contribute a (fast, bogus) sample — the
      // time-to-exception entering the per-query min would report breakage
      // as a dramatic speedup (same discipline as the serve-only loop).
      // fatal JVM errors (OOM, stack overflow) propagate: the JVM is in an
      // undefined state and later sweeps would time garbage
      val ok =
        try { q.build(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // queries may cache intermediates
      logSched() // inter-query scheduler reading — the stall tracer
      if (ok) Some((off, sec)) else None
    }
    val samples = scala.collection.mutable.LinkedHashMap(
      benched.map(q => q.name ->
        scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]): _*)
    def sweepCanary(): Unit = {
      val off = offsetSec()
      val c = cpuCanary()
      cpuLog += ((off, c))
      val sc = logSched()
      sweepSched += sc
      System.err.println(f"[bench] canary cpu=$c%.3f s sched=$sc%.3f s")
    }
    (1 to 3).foreach { round =>
      sweepCanary()
      benched.foreach { q =>
        timed(q).foreach { s =>
          samples(q.name) += s
          System.err.println(f"[bench] round $round ${q.name}%-24s ${s._2}%8.3f s @${s._1}%.1f")
        }
      }
    }
    def uncorroborated(name: String): Boolean = {
      val s = samples(name).map(_._2).sorted
      // zero successes after the full sweeps = BROKEN, not noisy — it
      // emits the -1 sentinel; extra sweeps target only noisy-but-
      // working rows, never a known-failing path (r14 advice)
      s.nonEmpty && (s.length < 2 || s(1) > s(0) * 1.5)
    }
    var extra = 0
    while (extra < 3 && benched.exists(q => uncorroborated(q.name))) {
      extra += 1
      sweepCanary()
      benched.filter(q => uncorroborated(q.name)).foreach { q =>
        timed(q).foreach { s =>
          samples(q.name) += s
          System.err.println(f"[bench] extra $extra ${q.name}%-24s ${s._2}%8.3f s @${s._1}%.1f")
        }
      }
    }

    // SERVE-ONLY timings for the persistent-store paths: the gate rows
    // qd17/qs14/qt23 time BUILD+serve from scratch (and stay — they gate
    // the whole pipeline), but the build dominates them, so a regression
    // in the serve kernel — what a production deploy cares about — would
    // hide inside build noise. Build each store ONCE (untimed), then
    // min-of-3 the serve alone.
    val servePaths: Seq[(String, () => org.apache.spark.sql.DataFrame)] = {
      val bandIdx = PipelineQueries.Serve.buildBandIndex(spark, sfDir)
      val ivfIdx = PipelineQueries.Serve.buildIvfIndex(spark, sfDir)
      val textIdx = PipelineQueries.Serve.buildTextIndex(spark, sfDir)
      val graphIdx = PipelineQueries.Serve.buildGraphIndex(spark, sfDir)
      val pqIdx = PipelineQueries.Serve.buildPqIndex(spark, sfDir)
      val graphScopedIdx = PipelineQueries.Serve.buildGraphIndexScoped(spark, sfDir)
      val pqScopedIdx = PipelineQueries.Serve.buildPqIndexScoped(spark, sfDir)
      val maxsimIdx = PipelineQueries.Serve.buildMaxSimIndex(spark, sfDir)
      val maxsimScopedIdx = PipelineQueries.Serve.buildMaxSimIndexScoped(spark, sfDir)
      val textScopedIdx = PipelineQueries.Serve.buildTextIndexScoped(spark, sfDir)
      spark.catalog.clearCache()
      Seq(
        "qd17_probe_only" -> (() => PipelineQueries.Serve.probeBandIndex(spark, sfDir, bandIdx)),
        "qs14_query_only" -> (() => PipelineQueries.Serve.queryIvfIndex(spark, sfDir, ivfIdx)),
        "qt23_bm25_only" -> (() => PipelineQueries.Serve.queryTextIndex(spark, textIdx)),
        "qs28_graph_only" -> (() => PipelineQueries.Serve.queryGraphIndex(spark, sfDir, graphIdx)),
        "qs31_pq_only" -> (() => PipelineQueries.Serve.queryPqIndex(spark, sfDir, pqIdx)),
        // the multi-vector plane (r14): qs40's driver serve + the
        // distributed corpus-batch twin, from the same pre-built store
        "qs40_maxsim_only" -> (() => PipelineQueries.Serve.queryMaxSimIndex(spark, sfDir, maxsimIdx)),
        "qs40_batch_only" -> (() => PipelineQueries.Serve.queryMaxSimBatch(spark, sfDir, maxsimIdx)),
        // the DISTRIBUTED corpus-batch serves (the 100×-scale paths): same
        // pre-built stores, whole corpus as the query batch — a keyed-join
        // regression shows here without a build dominating it
        "qs24_batch_only" -> (() => PipelineQueries.Serve.queryIvfBatch(spark, sfDir, ivfIdx)),
        "qs32_batch_only" -> (() => PipelineQueries.Serve.queryPqBatch(spark, sfDir, pqIdx)),
        "qs33_batch_only" -> (() => PipelineQueries.Serve.queryGraphBatch(spark, sfDir, graphIdx)),
        // the POSITIONAL plane's serve baseline (r13): qt33's phrase eval
        // set from the pre-built text store — phrase serving was the one
        // store plane serve_only didn't time (r12 verdict #4)
        "qt33_batch_only" -> (() => PipelineQueries.Serve.queryTextPhraseBatch(spark, textIdx)),
        // the proximity/NEAR fold's serve baseline (r13 verdict #4): qt35's
        // eval set over the same pre-built text store — the greedy-chain
        // fold is the one positional kernel qt33_batch_only doesn't reach
        "qt35_batch_only" -> (() => PipelineQueries.Serve.queryTextProximityBatch(spark, textIdx)),
        "qt37_batch_only" -> (() => PipelineQueries.Serve.queryTextNearBatch(spark, textIdx)),
        // the FILTERED distributed corpus-batch serves (qs35/qs36 kernels
        // at their pinned margins) — metadata-scoped stores built once
        // untimed like the rest; r12 establishes their baselines
        "qs35_batch_only" -> (() => PipelineQueries.Serve.queryGraphFilteredBatch(spark, sfDir, graphScopedIdx)),
        "qs36_batch_only" -> (() => PipelineQueries.Serve.queryPqFilteredBatch(spark, sfDir, pqScopedIdx)),
        // the FILTERED multi-vector corpus batch (r14): qs41's kernel at
        // corpus scale over the metadata-scoped MaxSim store
        "qs41_batch_only" -> (() => PipelineQueries.Serve.queryMaxSimFilteredBatch(spark, sfDir, maxsimScopedIdx)),
        // the TENANT-SCOPED text serve (r15): qt38's eval set over the
        // pre-built lang-scoped store — the per-label BM25 kernel
        // (labelstats fold + (bucket, meta)-pruned slice + per-(token,
        // label) df) gets its own baseline like every other store plane
        "qt38_batch_only" -> (() => PipelineQueries.Serve.queryTextFilteredBatch(spark, sfDir, textScopedIdx)))
    }
    val serveSamples = scala.collection.mutable.LinkedHashMap(
      servePaths.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[(Double, Double)] }: _*)
    def timedServe(name: String, f: () => org.apache.spark.sql.DataFrame,
        tag: String): Unit = {
      val off = offsetSec()
      val t0 = System.nanoTime()
      // a failed serve must NOT contribute a (fast, bogus) sample —
      // time-to-exception entering the min would report breakage as a
      // dramatic improvement; the row goes absent/sentinel instead.
      // NonFatal only: an OOMed JVM must abort the bench, not keep timing
      val ok =
        try { f().count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      logSched()
      if (ok) {
        serveSamples(name) += ((off, sec))
        System.err.println(f"[bench] $tag $name%-24s $sec%8.3f s @$off%.1f")
      }
    }
    (1 to 3).foreach { round =>
      servePaths.foreach { case (name, f) => timedServe(name, f, s"serve $round") }
    }
    // the serve rows get the SAME disagreement-triggered extra sweeps the
    // headline queries do (r13: the driver capture shipped qs32/qs33
    // readings 2× their same-window truth because three long single
    // samples can all land inside one multi-minute stall window and the
    // loop took the contaminated min at face value; a worktree control
    // was needed to adjudicate it). A min whose nearest corroborating
    // sample is >1.5× away is uncorroborated — re-sweep just those rows,
    // interleaved, up to three more times.
    def serveUncorroborated(name: String): Boolean = {
      val s = serveSamples(name).map(_._2).sorted
      // zero successes after the full sweeps = BROKEN, not noisy (the
      // headline loop's rule): it emits the -1 sentinel instead of
      // soaking all 3 extra sweeps re-running a failing path
      s.nonEmpty && (s.length < 2 || s(1) > s(0) * 1.5)
    }
    var serveExtra = 0
    while (serveExtra < 3 && servePaths.exists(p => serveUncorroborated(p._1))) {
      serveExtra += 1
      sweepCanary()
      servePaths.filter(p => serveUncorroborated(p._1)).foreach {
        case (name, f) => timedServe(name, f, s"serve-extra $serveExtra") }
    }
    val serveResults = servePaths.map { case (name, _) =>
      val times = serveSamples(name).map(_._2)
      val sec = if (times.isEmpty) -1.0 else times.min // -1 = every run failed
      System.err.println(f"[bench] ${name}%-24s $sec%8.3f s (serve-only; runs: ${
        times.map(t => f"$t%.3f").mkString(" ")})")
      name -> sec
    }
    val results = benched.map { q =>
      val times = samples(q.name).map(_._2)
      val sec = if (times.isEmpty) -1.0 else times.min // -1 = every run failed
      System.err.println(f"[bench] ${q.name}%-24s $sec%8.3f s (runs: ${
        times.map(t => f"$t%.3f").mkString(" ")})")
      q.name -> sec
    }
    def pairsJson(ps: Seq[(Double, Double)]): String =
      ps.map { case (o, d) => f"[$o%.1f,$d%.3f]" }.mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val serveJson = serveResults.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // canary_cpu/canary_sched stay duration-only SWEEP-START arrays
    // (cross-round comparable with r9 — same sampling); *_log fields
    // carry [wall-offset, duration] pairs for every sample and canary
    // run, inter-query sched readings included — the stall-attribution data
    val canaryJson = cpuLog.map(c => f"${c._2}%.3f").mkString("[", ",", "]")
    val schedJson = sweepSched.map(c => f"$c%.3f").mkString("[", ",", "]")
    val cpuLogJson = pairsJson(cpuLog.toSeq)
    val schedLogJson = pairsJson(schedLog.toSeq)
    val samplesJson = samples.map { case (k, v) => "\"" + k + "\":" + pairsJson(v.toSeq) }
      .mkString("{", ",", "}")
    val serveSamplesJson = serveSamples.map { case (k, v) => "\"" + k + "\":" + pairsJson(v.toSeq) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // FIELD ORDER MATTERS: the driver keeps only a fixed-size TAIL of this
    // line, and r10's emission led with the headline fields and ended with
    // the bulky samples/canary logs — which pushed every per-query min out
    // of BENCH_r10.json (the judge had to re-run Bench by hand). The bulky
    // stall-attribution arrays therefore come FIRST and the headline
    // fields (queries/serve_only/canaries/total) come LAST, so a
    // truncated capture always retains the numbers the gate grades on.
    println(f"""{"metric":"total","samples":$samplesJson,"serve_samples":$serveSamplesJson,"canary_cpu_log":$cpuLogJson,"canary_sched_log":$schedLogJson,"canary_cpu":$canaryJson,"canary_sched":$schedJson,"queries":$qs,"serve_only":$serveJson,"value":$total%.3f,"unit":"sec","sf":"$sfDir"}""")
    // a SECOND, headline-only line (< 2000 bytes): a capturer that keeps
    // the LAST stdout line gets a fully parseable JSON object, and a
    // fixed-size tail window over the whole stream still lands on it —
    // the stall-attribution arrays live only in the full line above
    val compactLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"serve_only":$serveJson,"canary_cpu":$canaryJson,"canary_sched":$schedJson,"sf":"$sfDir"}"""
    println(compactLine)
    // ADDITIONS (r17) — no prior round's BENCH capture ever parsed
    // ("parsed": null in r14-r16): sbt appends "[success] Total time…"
    // as the true last stdout line, defeating last-line parsers, and
    // Spark's stop() chatter buries mid-stream lines. Two extra
    // emission channels, additions-only (both prior lines stay):
    //  - the compact line lands in bench_result.json next to the cwd
    //    (a well-known file a parser can read without scraping stdout);
    //  - a JVM shutdown hook re-prints it AFTER main returns — the
    //    forked JVM's final stdout write, below all Spark shutdown
    //    output, so only sbt's own epilogue can follow it.
    try {
      val w = new java.io.PrintWriter("bench_result.json", "UTF-8")
      try w.println(compactLine) finally w.close()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] bench_result.json write failed: ${e.getMessage}") }
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      System.out.println(compactLine)
      System.out.flush()
    }))
    spark.stop()
  }
}
