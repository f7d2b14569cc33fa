package graft

import graft.relational.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query subset on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Queries run through the same catalog the
  * correctness gate uses — no bench-only fast paths. */
object Bench {
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
      catch { case _: Throwable => () }
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
    def timed(q: graft.relational.CatalogQuery): Double = {
      val t0 = System.nanoTime()
      try { q.build(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // queries may cache intermediates
      sec
    }
    val samples = scala.collection.mutable.LinkedHashMap(
      benched.map(q => q.name -> scala.collection.mutable.ArrayBuffer.empty[Double]): _*)
    (1 to 3).foreach { round =>
      benched.foreach { q =>
        val sec = timed(q)
        samples(q.name) += sec
        System.err.println(f"[bench] round $round ${q.name}%-24s $sec%8.3f s")
      }
    }
    def uncorroborated(name: String): Boolean = {
      val s = samples(name).sorted
      s(1) > s(0) * 1.5
    }
    var extra = 0
    while (extra < 3 && benched.exists(q => uncorroborated(q.name))) {
      extra += 1
      benched.filter(q => uncorroborated(q.name)).foreach { q =>
        val sec = timed(q)
        samples(q.name) += sec
        System.err.println(f"[bench] extra $extra ${q.name}%-24s $sec%8.3f s")
      }
    }
    val results = benched.map { q =>
      val times = samples(q.name)
      val sec = times.min
      System.err.println(f"[bench] ${q.name}%-24s $sec%8.3f s (runs: ${
        times.map(t => f"$t%.3f").mkString(" ")})")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
