package graft.pipeline

import org.apache.spark.sql.Dataset

/** Distributed binary logistic regression (full-batch gradient descent) —
  * the discriminative member of the in-engine training family (KMeans =
  * clustering, Bpe = tokenizer, qt09 = generative LM). The quality-
  * classifier shape every curation pipeline runs (fasttext-style: hashed
  * bag-of-words features, linear model).
  *
  * Scale shape per iteration (identical to [[KMeans.fit]]):
  *  - weights broadcast to executors (dim + 1 doubles);
  *  - per-partition gradient partials accumulate INSIDE `mapPartitions`
  *    (one pass, no per-row shuffle);
  *  - the shuffle carries ≤ numPartitions partial rows of dim + 2 doubles;
  *  - the driver reduces those partials and rebroadcasts — the corpus
  *    never moves.
  *
  * Determinism: zero init, fixed learning rate and iteration count;
  * per-partition accumulation order is the partition's row order, and the
  * driver reduces partials in sorted partition order, so a given layout
  * reproduces exactly. Across DIFFERENT partition layouts results drift
  * only by float-sum reassociation (~1e-12), which the accuracy-contract
  * consumers absorb with threshold margin (the qs03 recall pattern).
  */
object LogReg {
  /** Hashed bag-of-words featurizer (the fasttext hashing trick), JVM-side
    * for per-row speed — a 256-way nested higher-order Column expression
    * evaluates interpreted and is orders of magnitude slower. Only the
    * LABEL side of the classifier gate needs cross-engine mirroring;
    * features just need determinism, which `String.hashCode` (spec-fixed
    * arithmetic since Java 1.2) provides. Counts are normalized by the
    * token count so document length cancels. */
  def featurize(text: String, dim: Int): Array[Double] = {
    val toks = text.trim.split("\\s+")
    val x = new Array[Double](dim)
    toks.foreach { t => x((t.hashCode & 0x7fffffff) % dim) += 1.0 }
    var i = 0
    while (i < dim) { x(i) /= toks.length; i += 1 }
    x
  }

  /** Per-feature (mean, std) over the corpus in one `mapPartitions` pass —
    * standardized features keep plain gradient descent well-conditioned at
    * few iterations (every iteration is a Spark job; fewer, better-
    * conditioned steps beat many cheap ones on a real cluster too). */
  def standardize(ds: Dataset[(Seq[Double], Double)], dim: Int): (Array[Double], Array[Double]) = {
    val partials = ds.mapPartitions { it =>
      val s = new Array[Double](dim)
      val q = new Array[Double](dim)
      var n = 0L
      it.foreach { case (x, _) =>
        var i = 0
        while (i < dim) { s(i) += x(i); q(i) += x(i) * x(i); i += 1 }
        n += 1
      }
      Iterator.single((s.toSeq, q.toSeq, n))
    }(org.apache.spark.sql.Encoders.product[(Seq[Double], Seq[Double], Long)])
      .collect()
    val sums = new Array[Double](dim)
    val sqs = new Array[Double](dim)
    var n = 0L
    partials.foreach { case (s, q, m) =>
      var i = 0
      while (i < dim) { sums(i) += s(i); sqs(i) += q(i); i += 1 }
      n += m
    }
    require(n > 0, "empty corpus")
    val mu = sums.map(_ / n)
    val sd = sqs.indices.map { i =>
      val v = sqs(i) / n - mu(i) * mu(i)
      if (v > 1e-12) math.sqrt(v) else 1.0
    }.toArray
    (mu, sd)
  }

  /** Train on (features, label∈{0,1}) rows; returns (weights, bias). */
  def fit(ds: Dataset[(Seq[Double], Double)], dim: Int, iters: Int, lr: Double): (Array[Double], Double) = {
    val spark = ds.sparkSession
    import spark.implicits._
    var w = new Array[Double](dim)
    var b = 0.0
    val n = ds.count().toDouble
    require(n > 0, "empty training set")
    for (_ <- 0 until iters) {
      val bcW = spark.sparkContext.broadcast((w, b))
      val partials = ds.mapPartitions { it =>
        val (cw, cb) = bcW.value
        val gw = new Array[Double](dim)
        var gb = 0.0
        var cnt = 0L
        it.foreach { case (x, y) =>
          var z = cb
          var i = 0
          while (i < dim) { z += cw(i) * x(i); i += 1 }
          val err = 1.0 / (1.0 + math.exp(-z)) - y
          i = 0
          while (i < dim) { gw(i) += err * x(i); i += 1 }
          gb += err
          cnt += 1
        }
        if (cnt == 0) Iterator.empty
        else Iterator.single((org.apache.spark.TaskContext.getPartitionId(), gw.toSeq, gb))
      }.collect().sortBy(_._1) // deterministic driver-side reduce order
      val gw = new Array[Double](dim)
      var gb = 0.0
      partials.foreach { case (_, pg, pb) =>
        var i = 0
        while (i < dim) { gw(i) += pg(i); i += 1 }
        gb += pb
      }
      var i = 0
      while (i < dim) { w(i) -= lr * gw(i) / n; i += 1 }
      b -= lr * gb / n
      bcW.unpersist()
    }
    (w, b)
  }
}
