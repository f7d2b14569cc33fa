package graft

import graft.core._
import graft.streaming._
import org.apache.spark.sql.SparkSession

/** Executable usage sample: the canonical 2-rank in-situ workflow from the
  * reference docs, driven through the public API. Run with
  * `sbt "Test/runMain graft.DemoWorkflowMain"`. */
object DemoWorkflowMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // global array [[t, 2t]] from two ranks; sliding window of 2
    val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()
    val ex = new WindowedExecutor(spark, Seq(meta))
    val asm = new LocalAssembler(ex, Seq(meta))
    ex.registerCallback(Seq(ArrayWindow("array", 2))) { argsMap =>
      val w = argsMap("array")
      val newest = w.last
      val extra = if (w.size == 2)
        s" crossTdiffSum=${(w(1) - w(0)).sumScalar().compute()}" else ""
      println(s"[cb] t=${newest.t} window=${w.map(_.t).mkString(",")} " +
        s"mean=${newest.meanScalar().compute()} sum=${newest.sumScalar().compute()}$extra")
    }
    // two simulation ranks, each with its Bridge handle (reference A-plane)
    val bridges = (0 to 1).map(r => new GraftBridge(asm, ex.feedback, r,
      Seq(meta), Map("array" -> Seq(0, r))))
    for (t <- 0L to 3L; b <- bridges)
      b.send("array", Array((t * (b.rank + 1)).toDouble), t)
    bridges.foreach(_.close(4))
    println(s"[done] terminated=${ex.isTerminated} closingT=${ex.closingTimestep} " +
      s"liveWindows=${ex.liveWindowArrays.size}")
    ex.shutdown()
    println(s"[memory] persistentRDDs after shutdown: ${spark.sparkContext.getPersistentRDDs.size}")

    // probe: ordering violation must fail hard (reference D3 semantics)
    val ex2 = new WindowedExecutor(spark, Seq(meta))
    val asm2 = new LocalAssembler(ex2, Seq(meta))
    ex2.registerCallback(Seq(ArrayWindow("array"))) { _ => () }
    for (r <- 0 to 1) asm2.push(ChunkRow("array", 2, Seq(0, r), Seq(1, 1), Array(1.0), "f"))
    try {
      for (r <- 0 to 1) asm2.push(ChunkRow("array", 1, Seq(0, r), Seq(1, 1), Array(1.0), "f"))
      println("[probe-ordering] NO ERROR — BAD")
    } catch {
      case e: RuntimeException => println(s"[probe-ordering] raised as required: ${e.getMessage}")
    }

    // probe: undeclared array -> ContractError
    try {
      asm2.push(ChunkRow("ghost", 3, Seq(0, 0), Seq(1, 1), Array(1.0), "f"))
      println("[probe-contract] NO ERROR — BAD")
    } catch {
      case e: IllegalArgumentException => println(s"[probe-contract] ${e.getMessage}")
    }

    // probe: feedback strictly-increasing guard, eviction, miss protocol
    val fb = new FeedbackService(2)
    fb.set("foo", "one", 1); fb.set("foo", "two", 2)
    println(s"[probe-feedback] get(t=1)=${fb.get("foo", 1)} get(t=3)=${fb.get("foo", 3)} all=${fb.getAll("foo")}")
    try { fb.set("foo", "dup", 2); println("[probe-feedback] dup NO ERROR — BAD") }
    catch { case e: IllegalArgumentException => println(s"[probe-feedback] dup rejected: ${e.getMessage}") }
    fb.set("foo", "three", 3)
    println(s"[probe-feedback] after eviction(size=2): get(t=1)=${fb.get("foo", 1)} (expect None)")

    // probe: r2 surface — named dims, astype value semantics, file ingest
    val m2 = ArrayMeta("named", Seq(2, 2), Seq(1, 1)).validate()
    val named = DeisaArray.fromChunks(spark,
      (for (i <- 0 to 1; j <- 0 to 1)
        yield ChunkRow("named", 0, Seq(i, j), Seq(1, 1),
          Array(2.5 * (2 * i + j)), "float64")), m2, 0)
      .withDims(Seq("y", "x"))
    println(s"[probe-dims] T.dims=${named.T.dims.mkString(",")} " +
      s"meanAxis(y).dims=${named.reduceAxis(named.axisOf("y"), "mean").dims.mkString(",")} " +
      s"astype(int32).sum=${named.astype("int32").sumScalar().compute()}") // trunc(0,2.5,5,7.5)->0+2+5+7
    val spool = java.nio.file.Files.createTempDirectory("graft-demo-spool")
    val fileBridges = (0 to 1).map(r => new graft.sources.FileBridge(
      spool, r, Seq(meta), Map("array" -> Seq(0, r))))
    val ex3 = new WindowedExecutor(spark, Seq(meta))
    val asm3 = new StreamingAssembler(ex3, Seq(meta))
    var fired = 0
    ex3.registerCallback(Seq(ArrayWindow("array"))) { a =>
      fired += 1
      println(s"[probe-ingest] t=${a("array").last.t} mean=${a("array").last.meanScalar().compute()}")
    }
    val q = asm3.attach(graft.sources.FileChunkSource.stream(spark, spool.toString),
      "demo-file-ingest")
    try {
      for (t <- 0L to 1L; b <- fileBridges)
        b.send("array", Array((t * (b.rank + 1)).toDouble), t)
      fileBridges.foreach(_.close(2))
      q.processAllAvailable()
    } finally q.stop()
    println(s"[probe-ingest] fired=$fired terminated=${ex3.isTerminated} (expect 2, true)")
    ex3.shutdown(); asm3.shutdown()

    // cross-process feedback: analytics publishes, any sim rank reads back
    val pub = new graft.sources.FileFeedbackPublisher(spool)
    pub.set("steer", 0.25, 0L)
    pub.set("steer", 0.75, 1L)
    println(s"[probe-feedback-file] rank0 get(t=1)=${fileBridges.head.get("steer", 1L)} " +
      s"rank1 all=${fileBridges.last.getAll("steer")} missing=${fileBridges.head.get("steer", 9L)} " +
      "(expect Some(0.75), List((0,0.25), (1,0.75)), None)")

    // packed-token training shards: write fixed-length sequences as
    // little-endian binary + manifest, read one shard back byte-exact
    locally {
      import spark.implicits._
      val binDir = java.nio.file.Files.createTempDirectory("graft-demo-tokbin").toString
      val seqs = (0L until 8L).map(i =>
        (i, (0 until 16).map(j => (i * 16 + j).toInt).toArray)).toDF("seq_id", "toks")
      graft.sinks.TokenShardSink.write(seqs, "seq_id", "toks", 16, 2, binDir)
      val shard0 = graft.sinks.TokenShardSink.readShard(spark, binDir, 0)
      val ok = shard0.length == 4 && shard0.head.sameElements(0 until 16)
      println(s"[probe-tokbin] shard0 seqs=${shard0.length} firstSeqExact=$ok (expect 4, true)")
    }

    locally {
      // WebDataset tar export: one shard, three samples, two fields each;
      // read back through the sink's own ustar parser
      import org.apache.spark.sql.functions.{col, format_string}
      import spark.implicits._
      val wdsDir = java.nio.file.Files.createTempDirectory("demo-wds").toString
      val docs = Seq((0L, "a"), (1L, "bb"), (2L, "ccc")).toDF("doc_id", "text")
      graft.sinks.WebDatasetSink.write(docs, format_string("%09d", col("doc_id")),
        Seq("txt" -> col("text"), "len" -> org.apache.spark.sql.functions.length(col("text"))),
        1, wdsDir)
      val members = graft.sinks.WebDatasetSink.readShard(spark, wdsDir, 0L)
      println(s"[probe-wds] members=${members.map(_._1).mkString(",")} " +
        s"payload2=${new String(members(5)._2, "UTF-8")} (expect 6 names, 3)")
    }

    locally {
      // persistent IVF index: build from the test embeddings, serve one
      // query batch with partition-pruned postings reads
      import org.apache.spark.sql.functions.{col, transform}
      val ivfDir = java.nio.file.Files.createTempDirectory("demo-ivf").toString
      val emb = graft.relational.QueryHelpers.table(spark, "/root/testdata/sf0.001", "embeddings")
      graft.sinks.IvfIndexStore.build(emb, 16, ivfDir)
      val q = emb.select(col("vec_id").as("query_id"),
          transform(col("embedding"), (x: org.apache.spark.sql.Column) => x.cast("double")).as("qv"))
        .filter(col("query_id") < 2)
      val hits = graft.sinks.IvfIndexStore.query(spark, ivfDir, q, 4, 10).collect()
      println(s"[probe-ivf] queries=2 hits=${hits.length} " +
        s"firstRank=${hits.head.getInt(1)} (expect 20, 1)")
      // tombstone a served neighbor: it must vanish from the ranks
      val firstVec = hits.head.getLong(2)
      graft.sinks.IvfIndexStore.delete(spark, ivfDir, Seq(firstVec))
      val after = graft.sinks.IvfIndexStore.query(spark, ivfDir, q, 4, 10).collect()
      val gone = !after.exists(_.getLong(2) == firstVec)
      println(s"[probe-ivf-del] deleted=$firstVec goneFromRanks=$gone (expect true)")
      // radius sweep from the same artifact: stateless filter finish,
      // respects the tombstone like top-k serving does
      val swept = graft.sinks.IvfIndexStore.rangeQuery(spark, ivfDir, q, 4, 0.25)
        .collect()
      val sweptClean = !swept.exists(_.getLong(1) == firstVec)
      println(s"[probe-ivf-range] rows=${swept.length} tombstoneExcluded=$sweptClean (expect >0, true)")
      // distributed large-batch serving from the same artifact: never
      // collects the batch (map-side cell assignment + keyed join) and
      // must agree with the driver-side path on the same queries
      val batched = graft.sinks.IvfIndexStore.queryBatch(spark, ivfDir, q, 4, 10).collect()
      spark.catalog.clearCache() // queryBatch persists its posted queries
      val agree = batched.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
        after.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      println(s"[probe-ivf-batch] rows=${batched.length} agreesWithDriverPath=$agree (expect 20, true)")
      // distributed range sweep: stateless finish, same rows as the
      // driver-side radius path on the same batch
      val batchSwept = graft.sinks.IvfIndexStore.rangeQueryBatch(spark, ivfDir, q, 4, 0.25)
        .collect()
      spark.catalog.clearCache()
      val sweepAgree = batchSwept.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        swept.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      println(s"[probe-ivf-batch-range] rows=${batchSwept.length} agreesWithDriverPath=$sweepAgree (expect true)")
    }

    locally {
      // metadata-scoped IVF store: the distributed filtered batch path
      // (predicate in the join key) agrees with driver-side serving
      import org.apache.spark.sql.functions.{col, transform}
      val ivfDir = java.nio.file.Files.createTempDirectory("demo-ivf-meta").toString
      val emb = graft.relational.QueryHelpers.table(spark, "/root/testdata/sf0.001", "embeddings")
      graft.sinks.IvfIndexStore.build(emb, 16, ivfDir, metaCol = Some("label"))
      val q = emb.select(col("vec_id").as("query_id"),
          transform(col("embedding"), (x: org.apache.spark.sql.Column) => x.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
        .filter(col("query_id") < 4)
      val driver = graft.sinks.IvfIndexStore.queryFiltered(spark, ivfDir, q, 4, 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      val batch = graft.sinks.IvfIndexStore.queryFilteredBatch(spark, ivfDir, q, 4, 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      println(s"[probe-ivf-filtered-batch] rows=${batch.length} agreesWithDriverPath=${batch == driver} (expect true)")
    }

    locally {
      // multi-query BM25 from the persistent text index: one pruned pass
      // for the whole eval set, per-query rows identical to queryBm25
      import spark.implicits._
      val tidxDir = java.nio.file.Files.createTempDirectory("demo-tidx-batch").toString
      val docs = graft.relational.QueryHelpers.table(spark, "/root/testdata/sf0.001", "documents")
      graft.sinks.TextIndexStore.build(docs, 64, tidxDir)
      val evalSet = Seq((0L, Seq("spark", "join", "window")), (1L, Seq("merge", "column")))
        .toDF("query_id", "terms")
      val got = graft.sinks.TextIndexStore.queryBm25Batch(spark, tidxDir, evalSet, 5).collect()
      val q0 = got.filter(_.getLong(0) == 0L).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      val single = graft.sinks.TextIndexStore.queryBm25(spark, tidxDir,
          Seq("spark", "join", "window"), 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      println(s"[probe-tidx-batch] rows=${got.length} q0AgreesWithSingle=${q0 == single} (expect 10, true)")
    }

    locally {
      // tenant-scoped BM25: a lang-scoped store scores each query inside
      // its OWN label corpus (per-label df/N/avgdl from the labelstats
      // plane) — served docs are label-exact by construction
      import spark.implicits._
      val tidxDir = java.nio.file.Files.createTempDirectory("demo-tidx-scoped").toString
      val docs = graft.relational.QueryHelpers.table(spark, "/root/testdata/sf0.001", "documents")
      graft.sinks.TextIndexStore.build(docs, 64, tidxDir, metaCol = Some("lang"))
      val got = graft.sinks.TextIndexStore.queryBm25FilteredBatch(spark, tidxDir,
          Seq((0L, Seq("spark", "join", "window"), "en"),
            (1L, Seq("merge", "column"), "fr")).toDF("query_id", "terms", "meta"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      val langOf = docs.select("doc_id", "lang")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val exact = got.forall { case (qid, did) =>
        langOf(did) == (if (qid == 0L) "en" else "fr") }
      println(s"[probe-tidx-filtered] rows=${got.length} labelExact=$exact (expect 10, true)")
    }

    locally {
      // persistent inverted text index: build, serve a BM25 query from
      // the bucket-pruned postings
      val tidxDir = java.nio.file.Files.createTempDirectory("demo-tidx").toString
      val docs = graft.relational.QueryHelpers.table(spark, "/root/testdata/sf0.001", "documents")
      graft.sinks.TextIndexStore.build(docs, 64, tidxDir)
      val top = graft.sinks.TextIndexStore.queryBm25(spark, tidxDir,
        Seq("spark", "join", "window"), 5).collect()
      println(s"[probe-tidx] top=${top.length} bestDoc=${top.head.getLong(0)} " +
        s"hits=${top.head.getLong(1)} (expect 5 rows)")
      // takedown: tombstone the best doc — it must leave the ranking
      // (and df / corpus stats) without rewriting the store
      val best = top.head.getLong(0)
      graft.sinks.TextIndexStore.delete(spark, tidxDir, Seq(best))
      val after = graft.sinks.TextIndexStore.queryBm25(spark, tidxDir,
        Seq("spark", "join", "window"), 5).collect()
      val gone = !after.exists(_.getLong(0) == best)
      println(s"[probe-tidx-del] deleted=$best goneFromRanks=$gone (expect true)")
      // quoted-query phrase serving from the positional postings: hits
      // intersect stored position lists, no document text is read
      val ph = graft.sinks.TextIndexStore.queryPhrase(spark, tidxDir,
        Seq("fast", "table")).collect()
      println(s"[probe-tidx-phrase] docs=${ph.length} " +
        s"firstPosPositive=${ph.forall(_.getLong(2) >= 1L)} (expect >0, true)")
      // eval-set batch: one pruned pass, per-query rows == queryPhrase
      import spark.implicits._
      val phb = graft.sinks.TextIndexStore.queryPhraseBatch(spark, tidxDir,
          Seq((7L, Seq("fast", "table"))).toDF("query_id", "phrase"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val phs = ph.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      println(s"[probe-tidx-phrase-batch] rows=${phb.length} " +
        s"agreesWithSingle=${phb == phs} (expect true)")
      // within-window proximity: window = L-1 degenerates to the phrase
      val prox = graft.sinks.TextIndexStore.queryProximity(spark, tidxDir,
          Seq("fast", "table"), window = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      println(s"[probe-tidx-proximity] w=1EqualsPhrase=${prox == phs} (expect true)")
      // proximity eval-set batch (r13): greedy-chain fold, rows ==
      // standalone queryProximity per query
      val proxb = graft.sinks.TextIndexStore.queryProximityBatch(spark, tidxDir,
          Seq((9L, Seq("fast", "table"), 1)).toDF("query_id", "terms", "window"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      println(s"[probe-tidx-proximity-batch] agreesWithSingle=${proxb == prox} (expect true)")
      // unordered NEAR (r13): doc set contains the ordered chain's
      val nearDocs = graft.sinks.TextIndexStore.queryNear(spark, tidxDir,
          Seq("fast", "table"), 4).collect().map(_.getLong(0)).toSet
      val ordDocs = graft.sinks.TextIndexStore.queryProximity(spark, tidxDir,
          Seq("fast", "table"), 4).collect().map(_.getLong(0)).toSet
      println(s"[probe-tidx-near] containsOrdered=${ordDocs.subsetOf(nearDocs)} (expect true)")
      val nearB = graft.sinks.TextIndexStore.queryNearBatch(spark, tidxDir,
          Seq((11L, Seq("fast", "table"), 4)).toDF("query_id", "terms", "window"))
        .collect().map(_.getLong(1)).toSet
      println(s"[probe-tidx-near-batch] agreesWithSingle=${nearB == nearDocs} (expect true)")
      // operational health: the delete above left a tombstone pending
      val hm = graft.sinks.TextIndexStore.health(spark, tidxDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[probe-tidx-health] clean=${hm("clean")} tombstones=${hm("tombstones")} " +
        s"postingsFiles=${hm("postings_files")} (expect 0, 1, >0)")
    }

    locally {
      // persistent LSH band index: build from one half of a tiny corpus,
      // probe the other half for near-duplicates
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val bidxDir = java.nio.file.Files.createTempDirectory("demo-bidx").toString
      val existing = Seq((0L, "the quick brown fox jumps over the lazy dog"),
        (1L, "an entirely different sentence about spark pipelines"))
        .toDF("doc_id", "text")
      val arriving = Seq((10L, "the quick brown fox jumps over the lazy dog"),
        (11L, "nothing like anything indexed before at all"))
        .toDF("doc_id", "text")
      graft.sinks.BandIndexStore.build(existing, bidxDir, 4, 8, 4)
      val hitRows = graft.sinks.BandIndexStore.probe(spark, bidxDir, arriving, 0.8)
        .collect()
      println(s"[probe-bidx] dupDocs=${hitRows.map(_.getLong(0)).mkString(",")} " +
        s"maxJ=${hitRows.headOption.map(_.getDouble(2)).getOrElse(-1.0)} (expect 10, 1.0)")
      // takedown: tombstone the indexed duplicate — the probe must stop
      // flagging against it, without rewriting the store
      graft.sinks.BandIndexStore.delete(spark, bidxDir, Seq(0L))
      val afterDel = graft.sinks.BandIndexStore.probe(spark, bidxDir, arriving, 0.8)
        .collect()
      println(s"[probe-bidx-del] hitsAfterDelete=${afterDel.length} (expect 0)")
    }

    locally {
      // persistent graph-ANN index: build, beam-search serve, NSW-insert
      // a held-out vector, find it again by its own values, tombstone it
      import org.apache.spark.sql.functions.{col, transform}
      val gidxDir = java.nio.file.Files.createTempDirectory("demo-gidx").toString
      val e = graft.relational.QueryHelpers
        .table(spark, "/root/testdata/sf0.001", "embeddings")
      graft.sinks.GraphIndexStore.build(e.filter(col("vec_id") >= 5), gidxDir,
        degree = 8, assign = 2, nEntries = 4, buckets = 16)
      val q0 = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val ranks = graft.sinks.GraphIndexStore.query(spark, gidxDir, q0,
        beam = 16, hops = 3, topK = 5).collect()
      println(s"[probe-gidx] rows=${ranks.length} queries=" +
        s"${ranks.map(_.getLong(0)).distinct.length} (expect 15, 3)")
      graft.sinks.GraphIndexStore.append(e.filter(col("vec_id") === 0L), gidxDir,
        beam = 16, hops = 3)
      val self = e.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 100L).as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val found = graft.sinks.GraphIndexStore.query(spark, gidxDir, self,
        beam = 16, hops = 4, topK = 3).collect()
      println(s"[probe-gidx-ins] rank1=${found.head.getLong(2)} (expect 0)")
      graft.sinks.GraphIndexStore.delete(spark, gidxDir, Seq(found.head.getLong(2)))
      val afterDel = graft.sinks.GraphIndexStore.query(spark, gidxDir, self,
        beam = 16, hops = 4, topK = 3).collect()
      val gone = !afterDel.exists(_.getLong(2) == 0L)
      println(s"[probe-gidx-del] goneFromRanks=$gone (expect true)")
      // metadata-scoped variant: label-filtered serving is label-exact
      val gfDir = java.nio.file.Files.createTempDirectory("demo-gidx-f").toString
      graft.sinks.GraphIndexStore.build(e, gfDir, degree = 8, assign = 2,
        nEntries = 4, buckets = 16, metaCol = Some("label"))
      val fq = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      val fGot = graft.sinks.GraphIndexStore.queryFiltered(spark, gfDir, fq,
        beam = 32, hops = 4, topK = 5).collect()
      val lbl = e.select(col("vec_id"), col("label").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val exact = fGot.forall(r => lbl(r.getLong(2)) == lbl(r.getLong(0)))
      println(s"[probe-gidx-filtered] rows=${fGot.length} labelExact=$exact " +
        "(expect 15, true)")
      // distributed filtered batch path returns the driver fold's rows
      val fBatch = graft.sinks.GraphIndexStore.queryFilteredBatch(spark, gfDir,
        fq, beam = 32, hops = 4, topK = 5).collect()
      val fAgree = fBatch.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
        fGot.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      println(s"[probe-gidx-filtered-batch] rows=${fBatch.length} " +
        s"agreesWithDriverPath=$fAgree (expect true)")
      spark.catalog.clearCache()
    }

    locally {
      // persistent IVF-PQ index (compressed serving): build, ADC+rerank
      // serve, distributed-batch identity, append-then-find, tombstone
      import org.apache.spark.sql.functions.{col, transform}
      val pqDir = java.nio.file.Files.createTempDirectory("demo-pqidx").toString
      val e = graft.relational.QueryHelpers
        .table(spark, "/root/testdata/sf0.001", "embeddings")
      graft.sinks.IvfPqIndexStore.build(e.filter(col("vec_id") >= 3),
        k = 16, nSub = 8, subK = 256, pqDir)
      val q0 = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val served = graft.sinks.IvfPqIndexStore.query(spark, pqDir, q0,
        nProbe = 10, topK = 5, candK = 120).collect()
      println(s"[probe-pqidx] rows=${served.length} queries=" +
        s"${served.map(_.getLong(0)).distinct.length} (expect 15, 3)")
      val batched = graft.sinks.IvfPqIndexStore.queryBatch(spark, pqDir, q0,
        nProbe = 10, topK = 5, candK = 120).collect()
      val agree = batched.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
        served.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      println(s"[probe-pqidx-batch] rows=${batched.length} agreesWithDriverPath=$agree (expect true)")
      graft.sinks.IvfPqIndexStore.appendBatch(e.filter(col("vec_id") === 0L), pqDir)
      val self = e.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 100L).as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val found = graft.sinks.IvfPqIndexStore.query(spark, pqDir, self,
        nProbe = 10, topK = 3, candK = 120).collect()
      println(s"[probe-pqidx-ins] rank1=${found.head.getLong(2)} (expect 0)")
      graft.sinks.IvfPqIndexStore.delete(spark, pqDir, Seq(0L))
      val afterDel = graft.sinks.IvfPqIndexStore.query(spark, pqDir, self,
        nProbe = 10, topK = 3, candK = 120).collect()
      val gone = !afterDel.exists(_.getLong(2) == 0L)
      println(s"[probe-pqidx-del] goneFromRanks=$gone (expect true)")
      // tuning surfaces: full-probe scan covers every hot-plane code row
      val sizes = graft.sinks.IvfPqIndexStore.cellSizes(spark, pqDir)
        .agg(org.apache.spark.sql.functions.sum(col("n_codes"))).collect()(0).getLong(0)
      val ranked = graft.sinks.IvfPqIndexStore.probeRanking(spark, pqDir, q0)
        .groupBy(col("query_id")).count().collect()
      println(s"[probe-pqidx-tune] totalCodes=$sizes ranksPerQuery=" +
        s"${ranked.map(_.getLong(1)).distinct.mkString(",")} (expect >0, 16)")
      // metadata-scoped variant: filtered serving is label-exact, batch
      // path identical
      val pfDir = java.nio.file.Files.createTempDirectory("demo-pqidx-f").toString
      graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256,
        pfDir, metaCol = Some("label"))
      val fq = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      val fGot = graft.sinks.IvfPqIndexStore.queryFiltered(spark, pfDir, fq,
        nProbe = 16, topK = 5, candK = 240).collect()
      val lbl = e.select(col("vec_id"), col("label").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val fExact = fGot.forall(r => lbl(r.getLong(2)) == lbl(r.getLong(0)))
      val fBatch = graft.sinks.IvfPqIndexStore.queryFilteredBatch(spark, pfDir,
        fq, nProbe = 16, topK = 5, candK = 240).collect()
      val fAgree = fBatch.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
        fGot.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      println(s"[probe-pqidx-filtered] rows=${fGot.length} labelExact=$fExact " +
        s"batchAgrees=$fAgree (expect 15, true, true)")
      spark.catalog.clearCache()
    }

    locally {
      // persistent multi-vector MaxSim index (r14): build, exact serve at
      // nProbe=K, distributed-batch identity, append-then-find, tombstone
      import org.apache.spark.sql.functions.{col, transform}
      val msDir = java.nio.file.Files.createTempDirectory("demo-msidx").toString
      val e = graft.relational.QueryHelpers
        .table(spark, "/root/testdata/sf0.001", "embeddings")
      graft.sinks.MaxSimIndexStore.build(e.filter(col("vec_id") >= 3),
        k = 16, subs = 4, subDim = 16, msDir,
        centroids = Some(e.filter(col("vec_id") < 16)
          .select(transform(col("embedding"), _.cast("double")).as("v"))
          .collect().map { r =>
            val v = r.getSeq[Double](0)
            (0 until 16).map(t => (0 until 4).map(i => v(i * 16 + t)).sum / 4).toArray
          }))
      val q0 = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val served = graft.sinks.MaxSimIndexStore.query(spark, msDir, q0,
        nProbe = 16, topK = 5).collect()
      println(s"[probe-msidx] rows=${served.length} queries=" +
        s"${served.map(_.getLong(0)).distinct.length} (expect 15, 3)")
      val batched = graft.sinks.MaxSimIndexStore.queryBatch(spark, msDir, q0,
        nProbe = 16, topK = 5).collect()
      val agree = batched.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
        served.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      println(s"[probe-msidx-batch] rows=${batched.length} agreesWithDriverPath=$agree (expect true)")
      graft.sinks.MaxSimIndexStore.appendBatch(e.filter(col("vec_id") === 0L), msDir)
      val self = e.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 100L).as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val found = graft.sinks.MaxSimIndexStore.query(spark, msDir, self,
        nProbe = 16, topK = 3).collect()
      println(s"[probe-msidx-ins] rank1=${found.head.getLong(2)} (expect 0)")
      graft.sinks.MaxSimIndexStore.delete(spark, msDir, Seq(0L))
      val afterDel = graft.sinks.MaxSimIndexStore.query(spark, msDir, self,
        nProbe = 16, topK = 3).collect()
      val gone = !afterDel.exists(_.getLong(2) == 0L)
      println(s"[probe-msidx-del] goneFromRanks=$gone (expect true)")
      // metadata-scoped variant: filtered serving is label-exact, batch
      // path identical
      val mfDir = java.nio.file.Files.createTempDirectory("demo-msidx-f").toString
      graft.sinks.MaxSimIndexStore.build(e, k = 16, subs = 4, subDim = 16,
        mfDir, metaCol = Some("label"))
      val mq = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      val mGot = graft.sinks.MaxSimIndexStore.queryFiltered(spark, mfDir, mq,
        nProbe = 16, topK = 5).collect()
      val mLbl = e.select(col("vec_id"), col("label").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val mExact = mGot.forall(r => mLbl(r.getLong(2)) == mLbl(r.getLong(0)))
      val mBatch = graft.sinks.MaxSimIndexStore.queryFilteredBatch(spark, mfDir,
        mq, nProbe = 16, topK = 5).collect()
      val mAgree = mBatch.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
        mGot.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      println(s"[probe-msidx-filtered] rows=${mGot.length} labelExact=$mExact " +
        s"batchAgrees=$mAgree (expect 15, true, true)")
      spark.catalog.clearCache()
    }

    spark.stop()
  }
}
