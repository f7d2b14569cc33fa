package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming over the relational plane: the events table played
  * as a stream must produce the same hourly aggregation the batch engine
  * (and the DuckDB oracle, via q11) computes. Exercises watermarking +
  * event-time windows + the memory sink. */
class EventsStreamingSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed hourly aggregation equals the batch result") {
    val batchEvents = QueryHelpers.events(spark, dir)
    val expected = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    // replay the same parquet as a file stream (file sources watch a
    // directory; maxFilesPerTrigger is the knob a real feed would use)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = QueryHelpers.normalizeTs(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("hourly_agg")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_agg")
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("streamed exact dedup drops cross-micro-batch duplicates (qd01 online)") {
    // qd01 computes exact dedup offline (hash-groupBy); the online form is
    // dropDuplicates over the content hash with dedup STATE carried across
    // micro-batches. The corpus is replayed twice in separate micro-batches
    // (maxFilesPerTrigger=1), so every second-pass row is a duplicate that
    // only cross-batch state can drop; the survivors must be exactly the
    // batch-distinct hash set. (Production note: bound the state with
    // dropDuplicatesWithinWatermark when arrival skew is bounded.)
    val src = s"$dir/documents.parquet"
    val batchHashes = spark.read.parquet(src)
      .select(md5(col("text")).as("h")).distinct()
      .collect().map(_.getString(0)).toSet
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src), streamDir.resolve("a.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(src), streamDir.resolve("b.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .dropDuplicates("h")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("dedup_stream")
    assert(kept.count() == batchHashes.size,
      s"replaying the corpus twice must keep each hash once")
    assert(kept.select("h").collect().map(_.getString(0)).toSet == batchHashes)
  }

  test("dropDuplicatesWithinWatermark bounds dedup state while staying exact in-window") {
    // The production form of qd01-online: plain dropDuplicates keeps every
    // seen key FOREVER (unbounded state — the 100 TB failure); the
    // within-watermark variant evicts keys once the watermark passes
    // their event time, trading "exactly-once ever" for "exactly-once
    // within the lateness bound" — exact as long as a key's duplicates
    // arrive within the watermark delay, which is precisely the guarantee
    // a replay/retry pipeline gives. Fixture: the corpus replayed twice
    // in separate micro-batches at ONE event time (well inside the 1 h
    // delay) must emit each content hash exactly once — parity with
    // batch distinct.
    val src = s"$dir/documents.parquet"
    val batchDistinct = spark.read.parquet(src)
      .select(md5(col("text")).as("h")).distinct().count()
    val streamDir = java.nio.file.Files.createTempDirectory("graft-wmdedup-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src), streamDir.resolve("a.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(src), streamDir.resolve("b.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(md5(col("text")).as("h"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("ts"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("wm_dedup").count() == batchDistinct,
      "in-window duplicates must collapse exactly to the batch-distinct set")
  }

  test("flatMapGroupsWithState running stats carry state across micro-batches") {
    // custom keyed state: the events table replayed in three micro-batches
    // must leave each user's accumulator equal to the batch groupBy —
    // regardless of how the micro-batch boundaries split a user's events
    import graft.streaming.StatefulOps
    import spark.implicits._
    val batchEvents = QueryHelpers.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("value"))
    val expected = batchEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("t_us")).as("last_us"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    // split the corpus into 3 files -> 3 micro-batches at one file/trigger
    val streamDir = java.nio.file.Files.createTempDirectory("graft-state-stream")
    batchEvents.repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .as[(Long, Long, Double)]
    val q = StatefulOps.runningUserStats(stream).toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("running_stats").start()
    try q.processAllAvailable() finally q.stop()

    // the LAST emission per user is the final accumulator state
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
    val got = spark.table("running_stats")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (n, lastUs)) =>
      assert((n, lastUs) == expected(u), s"user $u diverged")
    }
  }

  test("stream-stream interval join matches the batch join (click-to-purchase attribution)") {
    // Two live streams joined on key + event-time range — the attribution
    // /enrichment shape (every purchase joined to the clicks that preceded
    // it within 12 h). Both sides carry watermarks so Spark can BOUND the
    // join state: a buffered click is dropped once the purchase-side
    // watermark passes click_ts + 12 h — without the time-range condition
    // the state grows forever, which is the 100 TB failure mode this spec
    // pins against. Contract: the streamed append-mode output equals the
    // batch join of the same data, however micro-batches split each side
    // (the two file sources trigger independently, so match pairs span
    // arbitrary batch alignments).
    val ev = QueryHelpers.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    def clicksOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    def purchasesOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val cond = col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("interval 12 hours")
    val expected = clicksOf(ev).join(purchasesOf(ev), cond)
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce attribution pairs")

    // Replay in event-time order (repartitionByRange on ts: file k =
    // k-th time slice, replayed in that order). A RANDOM split would make
    // each source's watermark race past the other side's still-unread
    // rows, which append-mode inner join then rightly drops as late — the
    // parity contract below only holds for feeds whose disorder stays
    // within the 24 h watermark, exactly the guarantee a real ingestion
    // pipeline provides. FileStreamSource orders by MODIFICATION TIME,
    // and one write commit gives all three part files near-identical
    // mtimes (the replay order was then nondeterministic — observed
    // flaky), so stamp strictly increasing mtimes matching the
    // range-partition (= event-time) order explicitly.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssjoin-stream")
    ev.repartitionByRange(3, col("ts")).write.mode("overwrite").parquet(streamDir.toString)
    val parts = new java.io.File(streamDir.toString).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName) // part-0000k holds the k-th ascending ts range
    parts.zipWithIndex.foreach { case (f, k) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + k * 60000L))
    }
    def src() = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val joined = clicksOf(src()).withWatermark("click_ts", "24 hours")
      .join(purchasesOf(src()).withWatermark("purchase_ts", "24 hours"), cond)
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_join").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attrib_join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"stream/batch divergence: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
  }

  test("streamed MinHash-LSH near-dup pairs match the batch qd02 output (online dedup)") {
    // qd02 finds verified near-dup pairs offline (band self-join + exact
    // Jaccard). The online form posts each arriving doc to its band
    // buckets and verifies against per-bucket keyed state. Contract: the
    // DISTINCT emitted pair set equals the batch output, however the
    // micro-batch boundaries split the corpus (here: 3 files, 1/trigger),
    // with bit-identical jaccard values (same integer arithmetic).
    import graft.functions.expressions.ShingleExpressions._
    import graft.pipeline.TextOps
    import graft.streaming.{BandedDoc, StatefulOps}
    import spark.implicits._
    // constants mirror qd02: 4-char shingles, 8 perms, 2 bands of 4, t=0.80
    val (shingleN, numPerms, rowsPerBand, threshold) = (4, 8, 4, 0.80)

    val batch = graft.relational.QueryCatalog.byName("qd02_minhash_lsh")
      .build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache() // qd02 persists its shingle table
    assert(batch.nonEmpty, "fixture must contain near-dup pairs")

    val src = s"$dir/documents.parquet"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-lsh-stream")
    spark.read.parquet(src).select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    val banded = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .filter(length(col("text")) >= shingleN)
      .select(col("doc_id"), shingleHash60(col("text"), shingleN).as("hs"))
      .select(col("doc_id"), col("hs"),
        explode(TextOps.bandKeys(minhashSig(col("hs"), numPerms),
          numPerms, rowsPerBand)).as("bucket"))
      .select(col("bucket"), col("doc_id"), col("hs").as("shingles"))
      .as[BandedDoc]
    val q = StatefulOps.onlineNearDupPairs(banded, threshold).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_stream").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("lsh_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == batch,
      s"online/offline near-dup divergence: +${(got -- batch).take(3)} -${(batch -- got).take(3)}")
  }

  test("streamed span dedup matches the batch qd08 per-doc dup counts (online ExactSubstr)") {
    // qd08 finds duplicated 8-token spans offline (span-hash aggregation +
    // join back). The online form posts each arriving doc's distinct span
    // hashes to per-hash keyed state; a hash crossing 1→2 distinct docs
    // retroactively emits the first doc's postings too. Contract: summing
    // the emissions per doc reproduces batch qd08's (n_dup_spans,
    // n_dup_grams) EXACTLY, however the micro-batch boundaries split the
    // corpus (3 files, 1/trigger).
    import graft.pipeline.TextOps
    import graft.streaming.{SpanPost, StatefulOps}
    import spark.implicits._
    val W = 8 // mirrors qd08's DupSpanW

    val batch = graft.relational.QueryCatalog.byName("qd08_dup_spans")
      .build(spark, dir).collect()
      .filter(_.getLong(2) > 0)
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(batch.nonEmpty, "fixture must contain duplicated spans")

    val streamDir = java.nio.file.Files.createTempDirectory("graft-span-stream")
    spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    // per-doc distinct span hashes with occurrence counts, built row-local
    // (array expressions only — no streaming pre-aggregation needed);
    // the O(spans²) filter-per-distinct-hash is test plumbing, a real feed
    // would post pre-aggregated (h, doc, cnt) rows
    val hs = when(size(TextOps.tokens(col("text"))) >= W,
      transform(sequence(lit(1), size(TextOps.tokens(col("text"))) - (W - 1)),
        i => TextOps.hash60(concat_ws(" ", slice(TextOps.tokens(col("text")), i, lit(W))))))
      .otherwise(array().cast("array<bigint>"))
    val posts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), explode(
        transform(array_distinct(col("hs")),
          h => struct(h.as("h"), size(filter(col("hs"), x => x === h)).cast("long").as("cnt")))).as("p"))
      .select(col("p.h"), col("doc_id"), col("p.cnt"))
      .as[SpanPost]
    val q = StatefulOps.onlineDupSpans(posts).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("span_stream").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("span_stream")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_dup_spans"), count(lit(1)).as("n_dup_grams"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == batch,
      s"online/offline span-dedup divergence: +${(got.toSet -- batch.toSet).take(3)} -${(batch.toSet -- got.toSet).take(3)}")
  }

  test("streamed Bloom decontamination emits exactly the batch contaminated postings (qd10 online)") {
    // qd10 decontaminates offline (eval span hashes → Bloom → probe the
    // train scan → exact verify join). The online form runs the same
    // probe + stream-static semi-join as train docs ARRIVE. Contracts:
    // the emitted (h, doc_id) set equals the batch exact-contamination
    // join, and — stateless op, distinct per-doc feed — every posting is
    // emitted exactly once (list size == set size), however the
    // micro-batch boundaries split the corpus (3 files, 1/trigger).
    import graft.functions.Bloom
    import graft.pipeline.TextOps
    import graft.streaming.{SpanPost, StatefulOps}
    import spark.implicits._
    val W = 8 // qd08/qd10's span unit
    val (mBits, k) = (1 << 21, 4) // qd10's filter parameters

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // qp01's deterministic split convention (mirrors qd10): md5 bucket of
    // the stable doc identity; >= 90 is the eval split
    val bucket = pmod(TextOps.hash60(col("doc_id").cast("string")), lit(100))
    val hs = when(size(TextOps.tokens(col("text"))) >= W,
      transform(sequence(lit(1), size(TextOps.tokens(col("text"))) - (W - 1)),
        i => TextOps.hash60(concat_ws(" ", slice(TextOps.tokens(col("text")), i, lit(W))))))
      .otherwise(array().cast("array<bigint>"))
    val spans = docs.select(col("doc_id"), bucket.as("bucket"),
      array_distinct(hs).as("hs"))
    val evalSpans = spans.filter(col("bucket") >= 90)
      .select(explode(col("hs")).as("h")).distinct().as[Long]
    val bits = evalSpans.toDF("h").agg(Bloom.bloomBuild(mBits, k)(col("h")))
      .head().getSeq[Long](0).toArray

    val batch = spans.filter(col("bucket") < 90)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(evalSpans.toDF("h"), Seq("h"), "left_semi")
      .select(col("h"), col("doc_id")) // using-join moves h to the front; pin order
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must contain cross-split contamination")

    val streamDir = java.nio.file.Files.createTempDirectory("graft-contam-stream")
    docs.filter(bucket < 90).select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    val posts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(col("doc_id"), explode(array_distinct(hs)).as("h"))
      .select(col("h"), col("doc_id"), lit(1L).as("cnt"))
      .as[SpanPost]
    val q = StatefulOps.onlineContamPostings(posts, bits, k, evalSpans).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_stream").start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table("contam_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size, "stateless op must emit exactly once per posting")
    assert(rows.toSet == batch,
      s"online/offline decontam divergence: +${(rows.toSet -- batch).take(3)} -${(batch -- rows.toSet).take(3)}")
  }

  test("streamed Count-Min grid equals the batch sketch bit-identically (qt11 online)") {
    // online corpus-frequency monitoring: token occurrences stream in and
    // fold into a Count-Min grid via the SAME mergeable aggregator batch
    // qt11 uses. CMS addition is a commutative monoid (reduce = cell
    // increments, merge = elementwise add), so the final streamed state
    // must equal the batch grid BIT-IDENTICALLY — independent of arrival
    // order and micro-batch boundaries. That exactness is the property
    // that makes the sketch safe to maintain at ingest and reconcile with
    // offline audits.
    import graft.functions.CountMin
    import graft.pipeline.TextOps
    import spark.implicits._
    val (d, w) = (4, 1 << 12)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batchGrid = docs
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .select(TextOps.hash60(col("token")).as("h"))
      .agg(CountMin.cmsBuild(d, w)(col("h")))
      .head().getSeq[Long](0).toArray

    val streamDir = java.nio.file.Files.createTempDirectory("graft-cms-stream")
    docs.select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .select(TextOps.hash60(col("token")).as("h"))
      .agg(CountMin.cmsBuild(d, w)(col("h")).as("grid"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("cms_stream").head().getSeq[Long](0).toArray
    assert(streamed.length == batchGrid.length)
    assert(streamed.sameElements(batchGrid),
      "streamed CMS grid diverged from the batch sketch")
  }

  test("streamed IVF top-k maintains the exact batch qs02 ANN result as vectors arrive") {
    // continuous index maintenance: vectors stream in, each is assigned
    // its IVF cell and posted (with its exact cosine) to the queries
    // whose probe lists cover that cell; per-query keyed state holds a
    // bounded top-k. After the stream drains, the LAST emission per query
    // must equal batch qs02's (query_id, rank, vec_id) rows exactly —
    // same centroids (vec_id < 16), NProbe=4, k=10, and the same IEEE
    // double cosine (sequential dot, sqrt, divide), so parity is exact.
    import graft.streaming.StatefulOps
    import spark.implicits._
    val (kCents, nProbe, topK) = (16, 4, 10)
    val batch = graft.relational.QueryCatalog.byName("qs02_ann_ivf")
      .build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    spark.catalog.clearCache()

    val src = s"$dir/embeddings.parquet"
    val all = spark.read.parquet(src)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .as[(Long, Seq[Double])]
    val cents = all.filter(_._1 < kCents).collect().sortBy(_._1)
      .map(_._2.toArray) // the index's codebook exists before the stream
    val queries = all.filter(_._1 < 5).collect().sortBy(_._1)
    val probeOf = queries.map { case (qid, qv) =>
      qid -> graft.pipeline.KMeans.nearestK(cents, qv, nProbe).toSet
    }
    val bc = spark.sparkContext.broadcast((cents, queries, probeOf))

    val streamDir = java.nio.file.Files.createTempDirectory("graft-ann-stream")
    all.toDF("vec_id", "v").repartition(3).write.mode("overwrite")
      .parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    val scored = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .as[(Long, Seq[Double])]
      .flatMap { case (id, v) =>
        val (cs, qs, probes) = bc.value
        val cell = graft.pipeline.KMeans.nearest(cs, v)
        qs.iterator.filter { case (qid, _) =>
          qid != id && probes.find(_._1 == qid).get._2.contains(cell)
        }.map { case (qid, qv) =>
          var dot = 0.0; var qq = 0.0; var vv = 0.0
          var i = 0
          while (i < v.length) {
            dot += qv(i) * v(i); qq += qv(i) * qv(i); vv += v(i) * v(i); i += 1
          }
          (qid, dot / (math.sqrt(qq) * math.sqrt(vv)), id)
        }
      }
    val q = StatefulOps.runningTopK(scored, topK).toDF("query_id", "hits")
      .writeStream.outputMode("update")
      .format("memory").queryName("ann_stream").start()
    try q.processAllAvailable() finally q.stop()

    // last emission per query = most hits... emissions grow monotonically
    // in batch order; take each query's final row via the largest hit set
    // won't do — replay order matters, so rank emissions by arrival:
    // memory sink preserves append order within a query's updates
    val emissions = spark.table("ann_stream").collect()
      .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(h => (h.getDouble(0), h.getLong(1)))))
    val finalPerQuery = emissions.zipWithIndex.groupBy(_._1._1)
      .map { case (qid, es) => qid -> es.maxBy(_._2)._1._2 }
    val got = finalPerQuery.toSeq.flatMap { case (qid, hits) =>
      hits.zipWithIndex.map { case ((_, vid), i) => (qid, i + 1, vid) }
    }.toSet
    assert(got == batch,
      s"online/offline ANN divergence: +${(got -- batch).take(3)} -${(batch -- got).take(3)}")
  }

  test("streamed frame-hash postings reproduce batch qm06 (onlineDupSpans on the video plane)") {
    // onlineDupSpans is keyed by an opaque 64-bit hash — the same
    // operator that maintains qd08's text-span dedup online maintains
    // shot-level video dedup, fed (frame-hash, doc) postings instead:
    // summed emissions per doc must equal batch qm06's n_shared_frames
    // exactly, however the micro-batch boundaries fall (3 files,
    // 1/trigger). Frame hashes combine (hi, lo) into one long
    // ((hi << 32) | lo — both halves are 32-bit, so the packing is
    // bijective); per-(h, doc) distinctness comes from the kernel's
    // per-doc hashes.distinct, as the contract requires.
    import graft.streaming.{SpanPost, StatefulOps}
    import spark.implicits._
    val batch = graft.relational.QueryCatalog.byName("qm06_video_shared_frames")
      .build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    assert(batch.nonEmpty, "fixture must contain shared frames")

    val streamDir = java.nio.file.Files.createTempDirectory("graft-frame-stream")
    spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    val posts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val cp = text.codePointCount(0, text.length)
          val nf = math.min(4, math.max(1, (cp + 63) / 64))
          val px = new Array[Byte](nf * 64)
          java.util.Arrays.fill(px, ' '.toByte)
          var i = 0; var off = 0
          while (i < nf * 64 && off < text.length) {
            val c = text.codePointAt(off)
            px(i) = math.min(c, 255).toByte
            off += Character.charCount(c)
            i += 1
          }
          val stream = (0 until nf).flatMap { f =>
            graft.pipeline.MediaCodecs.encodeNetpbm(
              graft.pipeline.MediaCodecs.RawImage(8, 8, 1,
                java.util.Arrays.copyOfRange(px, f * 64, (f + 1) * 64)))
          }.toArray
          graft.pipeline.MediaCodecs.decodeNetpbmStream(stream).map { img =>
            var tot = 0L; var j = 0
            while (j < 64) { tot += img.lumAt(j); j += 1 }
            var lo = 0L; var hi = 0L
            j = 0
            while (j < 64) {
              if (img.lumAt(j) * 64L > tot) {
                if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
              }
              j += 1
            }
            (hi << 32) | lo
          }.distinct.map(h => SpanPost(h, id, 1L))
        }
      }
    val q = StatefulOps.onlineDupSpans(posts).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("frame_stream").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("frame_stream")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == batch,
      s"online/offline frame-dedup divergence: +${(got.toSet -- batch.toSet).take(3)} -${(batch.toSet -- got.toSet).take(3)}")
  }

  test("streamed audio fingerprints reproduce batch qm07's partnered-doc set (onlineDupSpans on the audio plane)") {
    // the third plane for the same keyed-state operator (text spans qd08,
    // video frames qm06, audio fingerprints qm07): each arriving doc
    // posts its single 31-bit energy-contour fingerprint through the
    // REAL WAV round trip; onlineDupSpans emits exactly-once per
    // (fingerprint, doc) once the class holds ≥ 2 docs, so the emitted
    // doc set must equal batch qm07's n_partners>0 docs exactly,
    // however the micro-batch boundaries fall (3 files, 1/trigger).
    import graft.streaming.{SpanPost, StatefulOps}
    import spark.implicits._
    val batch = graft.relational.QueryCatalog.byName("qm07_audio_dup")
      .build(spark, dir).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    assert(batch.nonEmpty, "fixture must contain shared audio fingerprints")

    val streamDir = java.nio.file.Files.createTempDirectory("graft-audio-stream")
    spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      .repartition(3).write.mode("overwrite").parquet(streamDir.toString)
    val schema = spark.read.parquet(streamDir.toString).schema
    val posts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = new Array[Short](64)
          var i = 0; var off = 0
          while (i < 64 && off < text.length) {
            val cp = text.codePointAt(off)
            samples(i) = ((math.min(cp, 255) - 128) * 256).toShort
            off += Character.charCount(cp)
            i += 1
          }
          while (i < 64) { samples(i) = ((' ' - 128) * 256).toShort; i += 1 }
          val audio = graft.pipeline.MediaCodecs.decodeWav(
            graft.pipeline.MediaCodecs.encodeWav(
              graft.pipeline.MediaCodecs.RawAudio(8000, 1, samples)))
          val ss = audio.samples
          val e = new Array[Long](32)
          var f = 0
          while (f < 32) {
            val a = ss(2 * f).toLong; val b = ss(2 * f + 1).toLong
            e(f) = a * a + b * b
            f += 1
          }
          var fp = 0L
          f = 1
          while (f < 32) {
            if (e(f) > e(f - 1)) fp |= 1L << (f - 1)
            f += 1
          }
          SpanPost(fp, id, 1L)
        }
      }
    val q = StatefulOps.onlineDupSpans(posts).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("audio_stream").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("audio_stream")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == batch,
      s"online/offline audio-dup divergence: +${(got -- batch).take(3)} -${(batch -- got).take(3)}")
  }

  test("streamed session_window matches the batch gaps-and-islands sessionization") {
    // q18 computes sessions offline (lag + windowed sum, 30 min gap);
    // Structured Streaming's session_window is the online formulation —
    // the two must agree on (user, session_start, n_events)
    import org.apache.spark.sql.expressions.Window
    val e = QueryHelpers.events(spark, dir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = e
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("graft-session-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = QueryHelpers.normalizeTs(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("session_agg")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("session_agg")
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    assert(got == batch,
      s"online/offline session divergence: ${(got -- batch).take(3)} vs ${(batch -- got).take(3)}")
  }
}
