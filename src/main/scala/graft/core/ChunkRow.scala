package graft.core

import org.apache.spark.sql.types._

/** One chunk of one array at one timestep — the engine's row-level unit.
  *
  * Mirrors the reference's ingest payload (one ndarray block per bridge rank
  * per timestep, `bridge.py:343-401`): `pos` is the chunk-grid coordinate,
  * `shape` the block shape, `data` the block values flattened row-major
  * (C order, numpy's default). Values are standardized on Double; `dtype`
  * records the declared element type for fidelity checks (per-timestep dtype
  * is legal in the reference, `types.py:654-673`).
  */
final case class ChunkRow(
    name: String,
    t: Long,
    pos: Seq[Int],
    shape: Seq[Int],
    data: Array[Double],
    dtype: String
)

object ChunkRow {
  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("pos", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("data", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("dtype", StringType, nullable = false)
  ))

  /** End-of-stream sentinel chunk (`bridge.py:443-455`). */
  def sentinel(t: Long): ChunkRow =
    ChunkRow(ArrayMeta.LastIterationArray, t, Seq(0, 0), Seq(1, 1),
      Array(0.0), "float64")
}
