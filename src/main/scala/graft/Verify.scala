package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened against the round-4 failure mode (host-level stall → driver
  * timeout kills the JVM mid-run → an empty CORRECTNESS file):
  *   - oracle_sql.json is written BEFORE any query runs, so a partial run
  *     still grades every query whose parquet landed;
  *   - each query runs in its own job group with a watchdog that cancels
  *     it after VERIFY_QUERY_TIMEOUT_S (default 900 s — ~100× a clean
  *     sf0.01 reading) and moves on, so one wedged query cannot eat the
  *     whole budget;
  *   - per-query wall time goes to stderr so the driver's captured tail
  *     shows exactly where time went.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name subset (local fast
    // iteration; the driver always calls with exactly two args)
    val (sfDir, outDir, only) = args match {
      case Array(a, b) => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    // leave 2 vCPUs of headroom for JVM service threads (GC, codegen,
    // RPC dispatchers) — same stall-exposure rationale as Bench
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(1, Runtime.getRuntime.availableProcessors() - 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // Written FIRST: if this JVM is killed mid-run, already-landed query
    // parquets still grade (missing ones fail loudly as absent — correct).
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (only.isDefined) {
      // a dir holding a full 78-query run would otherwise silently become
      // a subset gate that later reads as fully green
      System.err.println("[verify] *** SUBSET RUN — oracle_sql.json in " +
        s"$outDir covers ONLY ${only.get.size} queries, NOT the full gate ***")
      Files.writeString(Paths.get(s"$outDir/_SUBSET_RUN"),
        only.get.toSeq.sorted.mkString("\n"))
    } else Files.deleteIfExists(Paths.get(s"$outDir/_SUBSET_RUN"))

    val timeoutS = sys.env.getOrElse("VERIFY_QUERY_TIMEOUT_S", "900").toLong
    val watchdog = new java.util.Timer("verify-watchdog", true)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        val kill = new java.util.TimerTask {
          def run(): Unit = {
            System.err.println(s"[verify] $name exceeded ${timeoutS}s — cancelling")
            spark.sparkContext.cancelJobGroup(name)
          }
        }
        watchdog.schedule(kill, timeoutS * 1000)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        finally {
          kill.cancel()
          spark.sparkContext.clearJobGroup()
          spark.catalog.clearCache() // queries may cache intermediates
          System.err.println(
            f"[verify] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        }
      }
    spark.stop()
  }
}
