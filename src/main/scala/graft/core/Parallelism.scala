package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input widening for CPU-heavy per-row stages.
  *
  * Parquet scan parallelism is BYTES-based (`maxPartitionBytes` splits,
  * one task minimum per row group), which is the wrong heuristic when the
  * per-row work is CPU-bound and the rows are small: a corpus that fits in
  * one row group runs its whole shingle/MD5/tokenize/decode stage on ONE
  * task while the rest of the cluster idles. [[widen]] repartitions such
  * an input up to the cluster's default parallelism — and is an identity
  * whenever the scan already carries at least that many partitions, so at
  * production scale (thousands of splits) it never adds a shuffle; at
  * small scale the shuffle moves only the under-split input's bytes.
  * The width is derived from the session's core count, never a constant,
  * so the same code measures correctly at any `local[n]` or cluster size.
  *
  * Row-level semantics are untouched: every consumer in this engine is
  * partitioning-independent by the oracle-determinism contract (decimal
  * sums, exact integer aggregation, deterministic folds), so widening an
  * input can change only WHERE rows are processed, not any result.
  */
object Parallelism {

  /** `df` repartitioned to the session's default parallelism when its
    * current plan yields fewer partitions; `df` unchanged otherwise. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
