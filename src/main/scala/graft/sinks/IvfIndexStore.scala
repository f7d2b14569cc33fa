package graft.sinks

import java.nio.file.{Files, Paths}

import graft.pipeline.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF index artifact — build the inverted-list structure once,
  * serve many query batches from it without ever re-scanning or
  * re-assigning the corpus (the production split the in-query IVF paths
  * qs02/qs03 fuse into one plan).
  *
  * Layout under `path`:
  * {{{
  *   manifest.json                  {"k":K,"dim":D}
  *   centroids/                     parquet (cid, cv array<double>)
  *   postings/cell=C/<parts>.parquet  (vec_id, v array<double>) per cell
  * }}}
  *
  * The scale property is PARTITION PRUNING at serve time: postings are
  * `partitionBy(cell)`, and [[query]] filters on the probe-cell set
  * computed from the (tiny) query batch, so the parquet reader opens only
  * the ≤ queries × nprobe cell directories — nprobe/K of the index,
  * enforced by the scan's PartitionFilters (spec-pinned), not by trust.
  * Centroids default to the deterministic lowest-k vec_ids (the
  * qs02/qd05 oracle-mirrorable convention); a [[KMeans.fit]] result slots
  * in unchanged via `centroids`.
  */
object IvfIndexStore {

  /** Build the index: assign every vector to its nearest centroid's
    * inverted list and persist centroids + cell-partitioned postings.
    * `e` must have (vec_id: bigint, embedding: array<float|double>). */
  def build(e: DataFrame, k: Int, path: String,
      centroids: Option[Array[Array[Double]]] = None): Unit = {
    require(k > 0)
    val spark = e.sparkSession
    import spark.implicits._
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
    val cents: Array[Array[Double]] = centroids.getOrElse {
      val init = v.filter(_._1 < k).collect().sortBy(_._1).map(_._2.toArray)
      require(init.length == k, s"need vec_ids 0..${k - 1} for deterministic centroids")
      init
    }
    val dim = cents(0).length
    val bc = spark.sparkContext.broadcast(cents)
    v.map { case (id, vec) => (id, vec, KMeans.nearest(bc.value, vec).toLong) }
      .toDF("vec_id", "v", "cell")
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$path/postings")
    cents.zipWithIndex.map { case (cv, cid) => (cid.toLong, cv.toSeq) }
      .toSeq.toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    Files.writeString(Paths.get(path, "manifest.json"), s"""{"k":$k,"dim":$dim}""")
  }

  /** Append one batch of new vectors to an EXISTING index: assignment
    * uses the stored centroids (an index's geometry is fixed at build
    * time — re-clustering is a rebuild, not an append), and postings
    * append into the same cell-partitioned layout. Under `foreachBatch`
    * retries a batch may append twice (at-least-once); [[query]] absorbs
    * replays by deduplicating the probed postings on (cell, vec_id) —
    * replayed rows are byte-identical, so dedup restores exactly-once
    * serving (spec-pinned: double-append changes nothing). */
  def appendBatch(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cents: Array[Array[Double]] = spark.read.parquet(s"$path/centroids")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    val bc = spark.sparkContext.broadcast(cents)
    batch.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
      .map { case (id, vec) => (id, vec, KMeans.nearest(bc.value, vec).toLong) }
      .toDF("vec_id", "v", "cell")
      .write.partitionBy("cell").mode("append")
      .parquet(s"$path/postings")
  }

  /** Continuous index maintenance: stream arriving vectors into the
    * postings via [[appendBatch]] per micro-batch. */
  def appendStream(stream: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, _: Long) => appendBatch(b, path))
      .start()

  /** Serve a query batch from the prebuilt index: cosine top-`topK` per
    * query over the `nProbe` nearest cells' postings only. `queries` must
    * have (query_id: bigint, qv: array<double>); output is
    * (query_id, rank, vec_id) in qs02's exact rank order. The query batch
    * is collected (bounded — serving batches are small by construction)
    * to drive both the partition-pruning filter and the broadcast probe
    * map. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    val cents: Array[Array[Double]] = spark.read.parquet(s"$path/centroids")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    val qs: Array[(Long, Seq[Double])] =
      queries.select(col("query_id"), col("qv")).as[(Long, Seq[Double])].collect()
    val probes: Seq[(Long, Seq[Double], Long)] = qs.toSeq.flatMap { case (id, qv) =>
      KMeans.nearestK(cents, qv, nProbe).map(c => (id, qv, c.toLong))
    }
    val probeCells = probes.map(_._3).distinct.sorted
    // partition pruning: the isInCollection filter on the partition column
    // keeps every non-probed cell directory unopened (spec asserts the
    // scan's PartitionFilters carry it)
    // dropDuplicates absorbs at-least-once streaming appends (replayed
    // postings are identical rows); it runs AFTER the partition filter,
    // so the dedup shuffle touches only the probed nprobe/K slice
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("cell").isInCollection(probeCells))
      .dropDuplicates("cell", "vec_id")
    val probeDf = probes.toDF("query_id", "qv", "cell")
    val scored = postings.join(broadcast(probeDf), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
          (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
            sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _))))
          .as("cosine"))
    val topk = graft.functions.TopKAggregator.topK(topK)
    scored.groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.vec_id").as("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }
}
