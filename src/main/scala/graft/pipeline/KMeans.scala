package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed Lloyd's k-means over an embedding corpus — the trained
  * replacement for the deterministic `vec_id < K` centroids the IVF queries
  * (qs02 / qd05) pin for their oracles.
  *
  * Scale shape (the only one that survives 100 TB):
  *  - centroids broadcast to executors (K × dim doubles — KBs);
  *  - assignment + per-cluster partial sums run INSIDE each partition
  *    (`mapPartitions`, one pass, no per-row shuffle);
  *  - the shuffle carries at most numPartitions × K partial rows;
  *  - the driver reduces K rows and rebroadcasts — per iteration the
  *    corpus never moves.
  *
  * Determinism: init = the K lowest vec_ids (sorted), assignment ties
  * break toward the lowest cluster index; results are partition-order
  * independent up to float-sum reassociation (asserted ~1e-9 by spec).
  */
object KMeans {

  /** Train `k` centroids with `iters` Lloyd iterations.
    * `e` rows are (vec_id, vector); vectors must share one dimension. */
  def fit(e: Dataset[(Long, Seq[Double])], k: Int, iters: Int): Array[Array[Double]] = {
    require(k > 0 && iters >= 0)
    val spark: SparkSession = e.sparkSession
    var cents: Array[Array[Double]] = e.filter(_._1 < k).collect()
      .sortBy(_._1).map(_._2.toArray)
    require(cents.length == k, s"need vec_ids 0..${k - 1} for deterministic init")
    // the iteration runs on the RDD view: every Lloyd step used to build a
    // fresh Dataset plan (typed mapPartitions → groupByKey → reduceGroups),
    // paying Catalyst analysis + encoder codegen per iteration for math
    // that takes milliseconds — a pure-RDD reduceByKey keeps the identical
    // per-partition accumulation with map-side combine and zero per-step
    // planning. (Float-sum association changes with merge arrival order,
    // exactly as reduceGroups' did — the documented ~1e-9 reassociation
    // tolerance; centroids feed recall contracts, never oracle hashes.)
    val rdd = e.rdd
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // one pass per partition: assign + accumulate partial sums locally;
      // the shuffle then carries at most numPartitions × K tiny rows
      val reduced = rdd.mapPartitions { it =>
        val c = bc.value
        val dim = c(0).length
        val sums = Array.fill(c.length)(new Array[Double](dim))
        val counts = new Array[Long](c.length)
        it.foreach { case (_, v) =>
          var best = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < c.length) {
            var acc = 0.0
            var i = 0
            while (i < dim) { val d = v(i) - c(j)(i); acc += d * d; i += 1 }
            if (acc < bestD) { bestD = acc; best = j } // strict: lowest j wins ties
            j += 1
          }
          val s = sums(best)
          var i = 0
          while (i < dim) { s(i) += v(i); i += 1 }
          counts(best) += 1
        }
        (0 until c.length).iterator
          .filter(counts(_) > 0)
          .map(j => (j, (sums(j), counts(j))))
      }.reduceByKey { (a, b) =>
        val s = new Array[Double](a._1.length)
        var i = 0
        while (i < s.length) { s(i) = a._1(i) + b._1(i); i += 1 }
        (s, a._2 + b._2)
      }.collect()
      val next = cents.map(_.clone())
      reduced.foreach { case (j, (s, n)) =>
        next(j) = s.map(_ / n) // empty clusters keep their centroid
      }
      cents = next
      bc.unpersist()
    }
    cents
  }

  /** Train `nSub` per-subspace codebooks (product quantization's training
    * step) in ONE set of corpus passes: each Lloyd iteration is a single
    * scan whatever `nSub` is, accumulating all nSub × k partial sums per
    * partition — nSub sequential [[fit]] calls run nSub× the jobs for
    * identical math, since each subspace's update depends only on its own
    * slice. Subspace s covers dims [s·subDim, (s+1)·subDim); same
    * deterministic init (k lowest vec_ids) and tie rules as [[fit]], so
    * per-subspace results match independent fits up to float-sum
    * reassociation in the partial reduce (asserted ~1e-9 by spec).
    *
    * `initVecs` overrides the default init with explicit full-dim seed
    * vectors (k rows) — the persistent-store path, whose training corpus
    * need not contain ids 0..k-1 (a sub-corpus build); the default stays
    * the oracle-mirrorable `vec_id < k` convention. */
  def fitSubspaces(e: Dataset[(Long, Seq[Double])], nSub: Int, k: Int,
      iters: Int,
      initVecs: Option[Array[Array[Double]]] = None): Array[Array[Array[Double]]] = {
    require(nSub > 0 && k > 0 && iters >= 0)
    val spark: SparkSession = e.sparkSession
    val init = initVecs.getOrElse(
      e.filter(_._1 < k).collect().sortBy(_._1).map(_._2.toArray))
    require(init.length == k,
      s"need ${if (initVecs.isEmpty) s"vec_ids 0..${k - 1}" else s"$k init vectors"} " +
        "for deterministic init")
    val dim = init(0).length
    require(dim % nSub == 0, s"dim $dim must split evenly into $nSub subspaces")
    val subDim = dim / nSub
    var cbs: Array[Array[Array[Double]]] = Array.tabulate(nSub, k) { (s0, j) =>
      java.util.Arrays.copyOfRange(init(j), s0 * subDim, (s0 + 1) * subDim)
    }
    // RDD-level iteration, [[fit]]'s rationale: zero per-step Catalyst work
    val rdd = e.rdd
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cbs)
      val (ns, kk, sd) = (nSub, k, subDim)
      val reduced = rdd.mapPartitions { it =>
        val c = bc.value
        val sums = Array.fill(ns, kk)(new Array[Double](sd))
        val counts = Array.fill(ns)(new Array[Long](kk))
        it.foreach { case (_, v) =>
          var s0 = 0
          while (s0 < ns) {
            val cb = c(s0)
            var best = 0
            var bestD = Double.MaxValue
            var j = 0
            while (j < kk) {
              var acc = 0.0
              var i = 0
              while (i < sd) { val d = v(s0 * sd + i) - cb(j)(i); acc += d * d; i += 1 }
              if (acc < bestD) { bestD = acc; best = j } // strict: lowest j wins ties
              j += 1
            }
            val sm = sums(s0)(best)
            var i = 0
            while (i < sd) { sm(i) += v(s0 * sd + i); i += 1 }
            counts(s0)(best) += 1
            s0 += 1
          }
        }
        for {
          s0 <- (0 until ns).iterator
          j <- (0 until kk).iterator
          if counts(s0)(j) > 0
        } yield (s0 * kk + j, (sums(s0)(j), counts(s0)(j)))
      }.reduceByKey { (a, b) =>
        val s = new Array[Double](a._1.length)
        var i = 0
        while (i < s.length) { s(i) = a._1(i) + b._1(i); i += 1 }
        (s, a._2 + b._2)
      }.collect()
      val next = cbs.map(_.map(_.clone()))
      reduced.foreach { case (key, (s, n)) =>
        next(key / k)(key % k) = s.map(_ / n) // empty clusters keep their centroid
      }
      cbs = next
      bc.unpersist()
    }
    cbs
  }

  /** Indices of the `n` nearest centroids, ascending by (distance, index) —
    * the probe-list primitive for IVF queries (`nearestK(c, v, 1).head` ==
    * [[nearest]]; ties resolve identically because the sort is stable on
    * (distance, index)). */
  def nearestK(cents: Array[Array[Double]], v: Seq[Double], n: Int): Seq[Int] = {
    val scored = cents.indices.map { j =>
      var acc = 0.0
      var i = 0
      while (i < cents(j).length) { val d = v(i) - cents(j)(i); acc += d * d; i += 1 }
      (acc, j)
    }
    scored.sorted.take(n).map(_._2)
  }

  /** Index of the nearest centroid (ties toward the lowest index) — the
    * cell-assignment primitive shared by training and IVF probing. */
  def nearest(cents: Array[Array[Double]], v: Seq[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      var acc = 0.0
      var i = 0
      while (i < cents(j).length) { val d = v(i) - cents(j)(i); acc += d * d; i += 1 }
      if (acc < bestD) { bestD = acc; best = j }
      j += 1
    }
    best
  }
}
