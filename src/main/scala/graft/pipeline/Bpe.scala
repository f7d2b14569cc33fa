package graft.pipeline

import org.apache.spark.sql.Dataset

/** Distributed BPE (byte-pair-encoding) vocabulary induction — tokenizer
  * training as a first-class pipeline operator.
  *
  * The classic trainer (Sennrich et al. 2016 — the shape HuggingFace's
  * trainer keeps) works from the DISTINCT-WORD frequency table, not the
  * raw corpus: at web scale the corpus has ~10^11 tokens but only ~10^7
  * distinct words, so the corpus is aggregated once and every merge
  * iteration runs over the (much smaller, still distributed) word table.
  *
  * Scale shape per merge step:
  *  - adjacent-pair counting: one `flatMap` over word segmentations into
  *    (left, right, freq) rows, reduced by hash aggregation with map-side
  *    partials — the shuffle carries ≤ distinct-pairs × partitions rows;
  *  - argmax: TakeOrdered of ONE row under the deterministic total order
  *    (count DESC, left ASC, right ASC) — never a global sort collect;
  *  - merge application: the winning pair ships in the closure (two
  *    strings), one narrow map over segmentations — the word table never
  *    shuffles. Each iteration persists the new table and releases the
  *    previous one (the qd06/KMeans cache-discipline pattern).
  */
object Bpe {
  final case class Merge(step: Int, left: String, right: String, count: Long)

  /** Greedy left-to-right non-overlapping application of one merge —
    * standard BPE semantics ("aaa" under (a,a) → ["aa", "a"]). */
  def applyMerge(seg: IndexedSeq[String], left: String, right: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == left && seg(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += seg(i)
        i += 1
      }
    }
    out.toIndexedSeq
  }

  /** Character segmentation of a word (the BPE base alphabet). */
  def charSeg(word: String): IndexedSeq[String] = word.map(_.toString)

  /** Encode one word with a trained merge table (pair → rank): repeatedly
    * apply the LOWEST-RANK merge whose pair is present until no learned
    * pair remains — the standard BPE inference loop (HuggingFace
    * tokenizers' shape). The fixpoint guarantees canonicality: the output
    * contains no adjacent pair that is itself a learned merge, and
    * concatenating the output always reproduces the word (each merge
    * preserves content). O(len × merges) worst case; words are short and
    * the merge table ships once per task as a broadcast. */
  def encode(word: String, ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var seg = charSeg(word)
    var done = false
    while (!done && seg.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < seg.length - 1) {
        ranks.get((seg(i), seg(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = i }
        }
        i += 1
      }
      if (best < 0) done = true
      else seg = applyMerge(seg, seg(best), seg(best + 1))
    }
    seg
  }

  /** Release a `localCheckpoint`ed table's RDD-level blocks (checkpoint
    * persistence bypasses the CacheManager, so `clearCache()` never frees
    * it — the [[graft.core.WalkScope]] rationale, inlined here because the
    * trainer's release points interleave with the step loop). */
  private def releaseCp(ds: Dataset[_]): Unit =
    org.apache.spark.sql.GraftSqlShim.checkpointedRdd(ds)
      .foreach(_.unpersist(blocking = false))

  /** Train `nMerges` merges from a (word, freq) table. Requires enough
    * adjacent pairs to supply every step (hard-fails otherwise rather
    * than silently returning a short vocabulary).
    *
    * Cache discipline: ONE job per merge step. The step-k argmax job
    * reads (and thereby materializes) the step-k word table's blocks
    * while the step-(k−1) table is still cached one level below it, so
    * no lineage ever recomputes; the (k−1) table is released only after
    * that job returns. A separate materialize-then-unpersist count()
    * per step would double the job count of an inherently sequential
    * trainer — pure scheduler overhead at any scale.
    *
    * Lineage discipline (the KnnGraph.search rule, measured here too): each
    * step's table is a LAZY `localCheckpoint`, not a `persist` — a persist
    * keeps the full map-chain in every step's logical plan, so per-action
    * Catalyst re-analysis grows with the step count and the trainer spends
    * more driver time planning than its jobs spend running (measured ~5.4 s
    * of a 7.8 s qp08 outside all jobs at sf0.1). The lazy checkpoint
    * rebases each step on an O(1) LogicalRDD while the step's argmax job
    * still materializes the blocks — one job per step, plans that stop
    * growing. */
  def train(words: Dataset[(String, Long)], nMerges: Int): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    var ds: Dataset[(IndexedSeq[String], Long)] =
      words.map { case (w, f) => (charSeg(w), f) }.localCheckpoint(false)
    var prev: Dataset[(IndexedSeq[String], Long)] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (step <- 1 to nMerges) {
        val best = ds
          .flatMap { case (seg, f) =>
            (0 until seg.length - 1).iterator.map(i => (seg(i), seg(i + 1), f))
          }
          .groupByKey { case (l, r, _) => (l, r) }
          .mapValues(_._3).reduceGroups(_ + _)
          .map { case ((l, r), c) => (l, r, c) }
          // TakeOrdered(1) under the deterministic total order; implicit
          // Ordering[(String, String, Long)] can't express count DESC, so
          // order explicitly
          .orderBy(org.apache.spark.sql.functions.col("_3").desc,
            org.apache.spark.sql.functions.col("_1"),
            org.apache.spark.sql.functions.col("_2"))
          .head(1)
        // the argmax job just materialized ds's blocks — the level below
        // is now safe to release
        if (prev != null) { releaseCp(prev); prev = null }
        require(best.nonEmpty, s"BPE ran out of pairs at step $step/$nMerges")
        val (l, r, c) = best(0)
        merges += Merge(step, l, r, c)
        if (step < nMerges) {
          val next = ds.map { case (seg, f) => (applyMerge(seg, l, r), f) }
            .localCheckpoint(false)
          prev = ds
          ds = next
        }
      }
    } finally {
      if (prev != null) releaseCp(prev)
      releaseCp(ds)
    }
    merges.toSeq
  }
}
