package graft.sinks

import java.nio.file.{Files, Paths}

import graft.pipeline.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted TEXT index — the sparse-retrieval twin of
  * [[IvfIndexStore]]: build the posting lists once, serve keyword (BM25)
  * queries many times without ever re-tokenizing or re-scanning the
  * corpus text.
  *
  * Layout under `path`:
  * {{{
  *   manifest.json                    {"buckets":B,"n":N,"sumdl":S}
  *   postings/bucket=K/<parts>.parquet  (token, doc_id, tf, dl) per bucket
  * }}}
  *
  * Postings are partitioned by `bucket = hash60(token) mod B`, and
  * [[queryBm25]] filters on the query terms' bucket set, so the parquet
  * reader opens only ≤ |terms| of the B bucket directories — PARTITION
  * PRUNING on the token axis, the same serve-time property IvfIndexStore
  * pins on the cell axis (spec-asserted via the scan's PartitionFilters).
  * Document frequencies need no side table: a term's df is the row count
  * of its own (pruned) posting list, so serving derives df from exactly
  * the slice it already reads. Corpus-level stats (N, Σdl) are fixed at
  * build time in the manifest — they are properties of the indexed
  * corpus, not of any query.
  *
  * Scoring follows qt12's conventions exactly (Okapi BM25, Lucene's +1
  * idf, constants pre-folded, per-term scores 6-decimal-quantized so the
  * per-doc sum is exact decimal arithmetic): the served ranking is
  * gate-checked against qt12's DuckDB oracle verbatim.
  */
object TextIndexStore {

  /** Build the index: one tokenize pass → per-(doc, token) tf rows with
    * the doc length riding along, bucket-partitioned by token hash.
    * `docs` must have (doc_id: bigint, text: string). */
  def build(docs: DataFrame, buckets: Int, path: String): Unit = {
    require(buckets > 0)
    writePostings(docs, buckets, path, "overwrite")
    writeDoclens(docs, buckets, path, "overwrite", batchId = -1L)
    Files.writeString(Paths.get(path, "manifest.json"),
      s"""{"buckets":$buckets}""")
    Files.createDirectories(Paths.get(path, "stats"))
    writeStats(docs, Paths.get(path, "stats", "base.json"))
  }

  /** Append one batch of new documents to an EXISTING index: postings
    * append into the same bucket layout (bucket geometry is fixed at
    * build time), and the batch's corpus-stat increments land in a
    * batch-keyed stats file. Under `foreachBatch` retries a batch may
    * run twice (at-least-once): the stats file is OVERWRITTEN by batch
    * id (idempotent — the increment can never double-count), and
    * [[queryBm25]] absorbs replayed posting rows by deduplicating the
    * probed slice on (token, doc_id) — replays are byte-identical, so
    * serving stays exactly-once (spec-pinned). */
  def appendBatch(batch: DataFrame, path: String, batchId: Long): Unit = {
    val (buckets, _, _) = readMeta(path)
    writePostings(batch, buckets, path, "append")
    writeDoclens(batch, buckets, path, "append", batchId)
    writeStats(batch, Paths.get(path, "stats", s"batch-$batchId.json"))
  }

  /** Delete documents from the index by TOMBSTONE — O(|ids|) whatever the
    * index size ([[IvfIndexStore.delete]]'s contract on the token axis):
    * tombstones append; [[queryBm25]] folds them in by anti-joining the
    * probed posting slice (df shrinks with it, since df derives from the
    * pruned slice) and subtracting the deleted docs' (count, Σdl) from
    * the corpus stats via the doc-length map, pruned to the tombstoned
    * ids' hash buckets — serving cost scales with the takedown list, not
    * the corpus. Doc-length rows are keyed by batch id, so a replayed
    * append (same batch id, idempotent in stats) subtracts once while a
    * genuine re-append (new batch id, stats counted again) subtracts per
    * contribution — the adjustment always mirrors what the stats files
    * actually accumulated. Repeated deletes are absorbed; a re-appended
    * tombstoned doc stays deleted. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("doc_id").coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** Fold tombstones and replayed appends into the store
    * ([[IvfIndexStore.compact]]'s contract on the token axis): rewrite
    * postings without the deleted docs (duplicate (token, doc_id) rows
    * collapsed), rewrite the doc-length map without them (batch-id rows
    * kept distinct — a doc appended twice still counts twice, matching
    * the stats), collapse the stats directory to a single adjusted base
    * file, and drop the tombstone set. Serving is identical before and
    * after (spec-pinned). Directory rewrites stage into `.compact` and
    * swap after the write commits; the stats file swaps last via an
    * atomic same-directory move. */
  def compact(spark: SparkSession, path: String): Unit = {
    if (!Files.exists(Paths.get(path, "tombstones"))) return
    val (_, n0, sumdl0) = readMeta(path)
    val tomb = spark.read.parquet(s"$path/tombstones")
      .select(col("doc_id")).distinct()
    val liveLens = spark.read.parquet(s"$path/doclens")
      .select(col("doc_id"), col("dl"), col("batch_id"), col("dbucket"))
      .distinct() // absorbs replayed appends (stats counted those once)
    val deadRow = liveLens.join(broadcast(tomb), Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("c"), sum(col("dl")).as("s")).head()
    val deadC = deadRow.getLong(0)
    val deadS = if (deadRow.isNullAt(1)) 0L else deadRow.getLong(1)
    spark.read.parquet(s"$path/postings")
      .dropDuplicates("token", "doc_id")
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/postings.compact")
    liveLens.join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .write.partitionBy("dbucket").mode("overwrite")
      .parquet(s"$path/doclens.compact")
    def swap(name: String): Unit = {
      val dst = Paths.get(path, name)
      val old = Paths.get(path, s"$name.old")
      Files.move(dst, old)
      Files.move(Paths.get(path, s"$name.compact"), dst)
      rmTree(old)
    }
    swap("postings")
    swap("doclens")
    val tmp = Paths.get(path, "stats", "base.json.new")
    Files.writeString(tmp, s"""{"n":${n0 - deadC},"sumdl":${sumdl0 - deadS}}""")
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(path, "stats")).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json"))
      .foreach(Files.delete)
    Files.move(tmp, Paths.get(path, "stats", "base.json"))
    rmTree(Paths.get(path, "tombstones"))
  }

  private def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Continuous index maintenance: stream arriving documents into the
    * postings via [[appendBatch]] per micro-batch. */
  def appendStream(stream: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => appendBatch(b, path, id))
      .start()

  private def writePostings(docs: DataFrame, buckets: Int, path: String,
      mode: String): Unit = {
    val toksAll = TextOps.tokens(col("text"))
    docs.select(col("doc_id"), size(toksAll).cast("long").as("dl"),
        explode(toksAll).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(TextOps.hash60(col("token")), lit(buckets.toLong)))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"), col("bucket"))
      .write.partitionBy("bucket").mode(mode)
      .parquet(s"$path/postings")
  }

  /** Per-doc length map (the takedown side table): one (doc_id, dl,
    * batch_id) row per stats contribution, partitioned by the doc-id
    * hash so a tombstone fold opens only the deleted ids' buckets. */
  private def writeDoclens(docs: DataFrame, buckets: Int, path: String,
      mode: String, batchId: Long): Unit =
    docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("dl"),
        lit(batchId).as("batch_id"),
        pmod(TextOps.hash60(col("doc_id").cast("string")), lit(buckets.toLong))
          .as("dbucket"))
      .write.partitionBy("dbucket").mode(mode)
      .parquet(s"$path/doclens")

  private def writeStats(docs: DataFrame, dst: java.nio.file.Path): Unit = {
    val toksAll = TextOps.tokens(col("text"))
    val st = docs.agg(count(lit(1)).as("n"), sum(size(toksAll)).as("sumdl")).head()
    val sumdl = if (st.isNullAt(1)) 0L else st.getLong(1) // empty batch
    Files.writeString(dst, s"""{"n":${st.getLong(0)},"sumdl":$sumdl}""")
  }

  /** Corpus stats = base + every appended batch's increment, summed over
    * the (small, driver-local) stats directory. */
  private def readMeta(path: String): (Int, Long, Long) = {
    def field(txt: String, k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(sys.error(s"manifest missing $k")).group(1).toLong
    val buckets =
      field(Files.readString(Paths.get(path, "manifest.json")), "buckets").toInt
    import scala.jdk.CollectionConverters._
    val stats = Files.list(Paths.get(path, "stats")).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(Files.readString(_))
    (buckets, stats.map(field(_, "n")).sum, stats.map(field(_, "sumdl")).sum)
  }

  /** Serve a BM25 query from the prebuilt index: top-`topK` docs by
    * summed per-term score, opening only the query terms' bucket
    * partitions. Output is (doc_id, n_terms_hit, score) in qt12's exact
    * (score DESC, doc_id) order. */
  def queryBm25(spark: SparkSession, path: String, terms: Seq[String],
      topK: Int): DataFrame = {
    val (buckets, n0, sumdl0) = readMeta(path)
    // tombstone fold: subtract the deleted docs' stats contributions
    // (pruned to their id-hash buckets; one row per batch contribution,
    // distinct-by-(doc, batch) so append replays subtract once) and
    // remember the id set for the posting anti-join below
    val tomb: Option[DataFrame] =
      if (!Files.exists(Paths.get(path, "tombstones"))) None
      else Some(spark.read.parquet(s"$path/tombstones")
        .select(col("doc_id")).distinct())
    val (n, sumdl) = tomb match {
      case None => (n0, sumdl0)
      case Some(t) =>
        val tombBuckets = t
          .select(pmod(TextOps.hash60(col("doc_id").cast("string")),
            lit(buckets.toLong)).as("dbucket"))
          .distinct().collect().map(_.getLong(0)).sorted
        val doclenSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dl",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dbucket",
            org.apache.spark.sql.types.LongType)))
        val dead = spark.read.schema(doclenSchema).parquet(s"$path/doclens")
          .filter(col("dbucket").isInCollection(tombBuckets))
          .join(broadcast(t), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("dl"), col("batch_id")).distinct()
          .agg(count(lit(1)).as("c"), sum(col("dl")).as("s")).head()
        val c = dead.getLong(0)
        val s = if (dead.isNullAt(1)) 0L else dead.getLong(1)
        (n0 - c, sumdl0 - s)
    }
    // JVM-side mirror of the build's bucket arithmetic (hash60 is
    // nonnegative, so pmod == %); pinned equal by CmsSpec's parity test
    val termBuckets = terms
      .map(t => graft.functions.CountMin.hash60(t) % buckets)
      .distinct.sorted
    // the posting schema is fixed by the layout, so serving declares it
    // instead of inferring: no footer reads outside the probed slice (on
    // a million-file index, schema inference alone would touch unprobed
    // buckets — TextIndexSpec pins that corrupting them cannot matter)
    val postingSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dl",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType)))
    // dedup AFTER pruning absorbs at-least-once appends (replayed
    // posting rows are byte-identical) over the probed slice only —
    // IvfIndexStore's serve-time discipline on the token axis
    val live = spark.read.schema(postingSchema).parquet(s"$path/postings")
      .filter(col("bucket").isInCollection(termBuckets))
      .filter(col("token").isin(terms: _*))
      .dropDuplicates("token", "doc_id")
    // tombstoned docs never serve and never count toward df (df derives
    // from the pruned slice, so the anti-join shrinks both at once); it
    // runs AFTER partition pruning — only the probed slice pays for it
    val pruned = tomb match {
      case Some(t) => live.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => live
    }
    val df = pruned.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val avgdl = lit(sumdl).cast("double") / lit(n)
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") +
      lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / avgdl)
    pruned.join(broadcast(df), Seq("token"))
      .select(col("doc_id"),
        round(((idf * col("tf")) * lit(2.2)) / norm, 6)
          .cast(org.apache.spark.sql.types.DecimalType(20, 6)).as("sc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("sc")).cast("double").as("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(topK)
  }
}
