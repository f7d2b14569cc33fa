package graft.core

/** Metadata for one named, timestep-versioned, regularly-chunked dense N-D
  * array — the engine's fundamental data object.
  *
  * Validation rules mirror the reference's contract
  * (deisa-ray `src/deisa/ray/validate.py:72-167`):
  *   - globalShape: rank >= 1, all dims positive
  *   - chunkShape: same rank as globalShape, all dims positive
  *   - globalShape(i) % chunkShape(i) == 0  (only regular decompositions)
  *   - chunk positions must lie within the derived chunk grid
  *
  * Dtype is recorded per-timestep at ingest (the reference allows an array's
  * dtype to change across timesteps, `types.py:654-673`); the engine
  * standardizes the compute representation on Double and keeps the declared
  * dtype string for fidelity checks.
  */
final case class ArrayMeta(
    name: String,
    globalShape: Seq[Int],
    chunkShape: Seq[Int]
) {
  /** Number of chunks along each dimension (`scheduling_actor.py:153`). */
  def chunkGrid: Seq[Int] =
    globalShape.lazyZip(chunkShape).map(_ / _)

  /** Total number of chunks one timestep of this array comprises. */
  def numChunks: Long = chunkGrid.map(_.toLong).product

  def rank: Int = globalShape.length

  def validate(): ArrayMeta = {
    require(name.nonEmpty, "array name must be non-empty")
    require(globalShape.nonEmpty, s"$name: global shape must have rank >= 1")
    require(globalShape.forall(_ > 0),
      s"$name: global shape dims must be positive, got $globalShape")
    require(chunkShape.length == globalShape.length,
      s"$name: chunk shape rank ${chunkShape.length} != global rank ${globalShape.length}")
    require(chunkShape.forall(_ > 0),
      s"$name: chunk shape dims must be positive, got $chunkShape")
    globalShape.lazyZip(chunkShape).zipWithIndex.foreach { case ((g, c), i) =>
      require(g % c == 0,
        s"$name: global dim $i ($g) not divisible by chunk dim ($c) — only regular decompositions are supported")
    }
    this
  }

  /** Bounds check for a chunk position (`validate.py:96-105`). */
  def validatePosition(pos: Seq[Int]): Unit = {
    require(pos.length == rank,
      s"$name: chunk position rank ${pos.length} != array rank $rank")
    pos.lazyZip(chunkGrid).zipWithIndex.foreach { case ((p, g), i) =>
      require(p >= 0 && p < g,
        s"$name: chunk position $pos out of bounds in grid $chunkGrid (dim $i)")
    }
  }
}

object ArrayMeta {
  /** Reserved sentinel array auto-registered by the ingest layer; a chunk
    * arriving for it marks end-of-stream (`bridge.py:269-274, 443-455`). */
  val LastIterationArray = "__graft_last_iteration_array"

  val SentinelMeta: ArrayMeta =
    ArrayMeta(LastIterationArray, Seq(1, 1), Seq(1, 1))
}
