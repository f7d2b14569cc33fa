package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the r12-verdict #2 decision measurement (now the scoped-store
  * TRADEOFF monitor). Pre-r13 it compared the rank-filter design against
  * hand-built per-label subgraph stores and the subgraphs won decisively
  * (recall 1.000/1.000 at beam 16 with ~6× fewer visited candidates vs
  * 0.91/0.80 at beam 64) — that design is NOW the scoped store itself,
  * so section A measures today's `queryFiltered` (note its
  * visitedCandidates cost is an OVERcount: the unfiltered
  * visited surface seeds from every label's entries, while the filtered
  * path seeds one label) and section B the hand-built per-label stores
  * (the historical control; should track A's recall).
  *
  * Section C is the live measurement: GLOBAL (unfiltered) recall on a
  * scoped store — beam attention split across L disjoint subgraphs —
  * vs an unscoped store at the same beam, against the global
  * brute-force truth. r13 readings at sf0.1: scoped 0.730/0.500 at
  * beam 32 and 0.890/0.700 at beam 64 vs unscoped 0.990/0.900 at both —
  * the class-doc tradeoff is real and measured: scoped stores are for
  * scoped queries; global-first workloads build an unscoped store. */
object GraphScopedProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[30]")
      .config("spark.sql.shuffle.partitions", "30")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val TopK = 10; val Hops = 4; val NQ = 10
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = QueryHelpers.table(spark, d, "embeddings")
      val queries = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
        .persist()
      // exact same-label truth (GraphFilteredProbeMain's formulation)
      val ev = e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"),
        col("label").cast("string").as("vmeta"))
      val scored = ev.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id") && col("vmeta") === col("meta"))
        .select(col("query_id"), col("vec_id"),
          (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
            (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
             sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))).as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(TopK)
      val truthPairs: Set[(Long, Long)] = scored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val perQueryTruth = truthPairs.groupBy(_._1).view.mapValues(_.size).toMap
      def recallOf(got: Seq[(Long, Long)]): (Double, Double) = {
        val byQ = got.groupBy(_._1)
        val rs = perQueryTruth.map { case (q, n) =>
          byQ.getOrElse(q, Seq.empty).count(truthPairs.contains).toDouble / n }
        (rs.sum / rs.size, rs.min)
      }
      // ---- A: current rank-filter over the unscoped walk ----
      val scopedIdx = java.nio.file.Files
        .createTempDirectory("graft-gsp-a").toString
      graft.sinks.GraphIndexStore.build(e, scopedIdx, degree = 12, assign = 2,
        nEntries = 4, metaCol = Some("label"))
      spark.catalog.clearCache()
      for (beam <- Seq(32, 64)) {
        val t0 = System.nanoTime()
        val got = graft.sinks.GraphIndexStore.queryFiltered(spark, scopedIdx,
            queries, beam, Hops, TopK)
          .select(col("query_id"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val sec = (System.nanoTime() - t0) / 1e9
        val visited = graft.sinks.GraphIndexStore.visitedCandidates(spark,
          scopedIdx, queries.select(col("query_id"), col("qv")), beam, Hops)
          .count()
        val (avg, mn) = recallOf(got)
        println(f"$sf A rank-filter beam=$beam avg=$avg%.3f min=$mn%.3f " +
          f"visited/q=${visited / NQ} serve=$sec%.2f s")
        spark.catalog.clearCache()
      }
      // ---- B: per-label subgraph stores ----
      val labels = e.select(col("label").cast("string")).distinct()
        .collect().map(_.getString(0)).sorted
      val buildT0 = System.nanoTime()
      val stores: Map[String, (String, Array[Long])] = labels.map { l =>
        val ids = e.filter(col("label").cast("string") === l)
          .select(col("vec_id")).collect().map(_.getLong(0)).sorted
        val mapDf = ids.zipWithIndex.toSeq.toDF("vec_id", "local")
        val subLocal = e.join(broadcast(mapDf), Seq("vec_id"))
          .select(col("local").cast("long").as("vec_id"), col("embedding"))
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-gsp-b$l").toString
        graft.sinks.GraphIndexStore.build(subLocal, dir, degree = 12,
          assign = 2, nEntries = 4)
        spark.catalog.clearCache()
        l -> (dir, ids)
      }.toMap
      val buildSec = (System.nanoTime() - buildT0) / 1e9
      val qByLabel = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getString(2)))
        .groupBy(_._3)
      for (beam <- Seq(16, 32)) {
        var visited = 0L
        val t0 = System.nanoTime()
        val got = qByLabel.toSeq.flatMap { case (l, qs) =>
          val (dir, ids) = stores(l)
          val toLocal = ids.zipWithIndex.map { case (g, i) => g -> i.toLong }.toMap
          val qDf = qs.toSeq.map(q => (toLocal(q._1), q._2))
            .toDF("query_id", "qv")
          val rows = graft.sinks.GraphIndexStore.query(spark, dir, qDf,
              beam, Hops, TopK)
            .select(col("query_id"), col("vec_id"))
            .collect().map(r => (ids(r.getLong(0).toInt), ids(r.getLong(1).toInt)))
          visited += graft.sinks.GraphIndexStore.visitedCandidates(spark, dir,
            qDf, beam, Hops).count()
          spark.catalog.clearCache()
          rows.toSeq
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val (avg, mn) = recallOf(got)
        println(f"$sf B scoped-subgraph beam=$beam avg=$avg%.3f min=$mn%.3f " +
          f"visited/q=${visited / NQ} serve=$sec%.2f s (builds=$buildSec%.1f s for ${labels.length})")
      }
      // ---- C: the documented tradeoff — GLOBAL (unfiltered) search on
      // the scoped store (seeds from every label's entries, beam shared
      // across L disjoint subgraphs) vs an unscoped store at the same
      // beam, recall vs the GLOBAL brute-force truth ----
      val globalTruth: Set[(Long, Long)] = ev.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
            (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
             sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))).as("cosine"))
        .groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val gTruthN = globalTruth.groupBy(_._1).view.mapValues(_.size).toMap
      def gRecall(got: Seq[(Long, Long)]): (Double, Double) = {
        val byQ = got.groupBy(_._1)
        val rs = gTruthN.map { case (q, n) =>
          byQ.getOrElse(q, Seq.empty).count(globalTruth.contains).toDouble / n }
        (rs.sum / rs.size, rs.min)
      }
      val plainIdx = java.nio.file.Files
        .createTempDirectory("graft-gsp-c").toString
      graft.sinks.GraphIndexStore.build(e, plainIdx, degree = 12, assign = 2,
        nEntries = 4)
      spark.catalog.clearCache()
      for (beam <- Seq(32, 64); (name, dir2) <- Seq(
          ("scoped-store", scopedIdx), ("unscoped-store", plainIdx))) {
        val got = graft.sinks.GraphIndexStore.query(spark, dir2,
            queries.select(col("query_id"), col("qv")), beam, Hops, TopK)
          .select(col("query_id"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val (avg, mn) = gRecall(got)
        println(f"$sf C global-on-$name beam=$beam avg=$avg%.3f min=$mn%.3f")
        spark.catalog.clearCache()
      }
      queries.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
