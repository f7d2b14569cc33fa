package graft.sinks

import graft.pipeline.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard exporter — the step after curation: materialize a corpus
  * as `n` deterministic parquet shards a trainer can consume (webdataset /
  * arrow-shard style layout: `shard=K/part-*.parquet`).
  *
  * Shard membership is a pure function of the stable row key (60-bit
  * md5-prefix hash mod n — the qp01 split convention), NOT of layout:
  * re-running the export, appending to the corpus, or changing cluster
  * size never moves a row between shards, so downstream resume/caching
  * keyed by shard stays valid.
  *
  * Scale shape: one `repartition(n, shard)` shuffle co-locates each
  * shard's rows, `sortWithinPartitions` makes file content byte-stable
  * without a global sort (shards are the unit of parallelism, like
  * production shard writers), `partitionBy(shard)` writes the directory
  * layout, and `maxRecordsPerFile` bounds individual files so a trainer's
  * sample loader never faces a monolith. Nothing touches the driver.
  */
object ShardSink {

  /** Deterministic shard id for every row: `hash60(key) mod n`. */
  def assignShards(df: DataFrame, key: Column, n: Int): DataFrame = {
    require(n > 0, s"shard count must be positive, got $n")
    df.withColumn("shard", pmod(TextOps.hash60(key.cast("string")), lit(n.toLong)))
  }

  /** Write `df` as `n` shards under `path` (`shard=K/` directories),
    * rows ordered by `sortKey` within each shard. */
  def write(df: DataFrame, key: Column, n: Int, path: String,
      sortKey: Column, maxRecordsPerFile: Long = 1000000L): Unit = {
    assignShards(df, key, n)
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), sortKey)
      .write
      .partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Same layout/membership, but gzipped JSONL files — the interchange
    * format released text corpora actually ship (one JSON object per
    * line). Identical scale shape: the only difference is the writer.
    * Round-trip contract (spec-pinned for long/string columns, the
    * document-corpus shape): JSON text is lossy in general — schema
    * inference widens integers to long, and doubles/timestamps/binary
    * re-parse inexactly — so readers needing exact wider types must pass
    * the original schema via `spark.read.schema(...).json`. */
  def writeJsonl(df: DataFrame, key: Column, n: Int, path: String,
      sortKey: Column, maxRecordsPerFile: Long = 1000000L): Unit = {
    assignShards(df, key, n)
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), sortKey)
      .write
      .partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "gzip")
      .mode("overwrite")
      .json(path)
  }
}
