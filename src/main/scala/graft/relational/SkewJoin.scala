package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when a handful of hot keys would
  * funnel into a few shuffle partitions, the left (large, skewed) side
  * splits each key into `saltBuckets` sub-keys and the right side is
  * replicated across the buckets — the hot key's rows then spread over
  * `saltBuckets` tasks instead of one. AQE's skew-join handles many such
  * cases at runtime; explicit salting remains the tool when the skew is
  * known up front or the join is not a sort-merge join.
  *
  * Deterministic salt (hash of the whole left row modulo buckets) keeps
  * results reproducible run to run.
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1)
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val replicated = right
      .withColumn("__salt", explode(lit((0 until saltBuckets).toArray)))
    val out = salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"),
      joinType)
    out.drop("__salt")
  }
}
