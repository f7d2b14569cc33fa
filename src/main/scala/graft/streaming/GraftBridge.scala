package graft.streaming

import graft.core.{ArrayMeta, ChunkRow}

/** Simulation-side handle — the reference's `Bridge` surface (SURVEY §2.A
  * rows A1-A4, deisa-ray `bridge.py`):
  *
  *  - A1 construction validates the declared array metadata and registers
  *    the rank (here: against the shared assembler; Spark needs no
  *    actor-placement handshake — source buffering replaces it).
  *  - A2 `send` pushes one chunk and returns when the engine has absorbed
  *    it (our push is synchronous, which subsumes the reference's
  *    block-until-node-complete contract; backpressure at scale comes from
  *    the streaming source's trigger pacing rather than an object-store
  *    polling loop — reference row A5 maps to engine configuration).
  *  - A3 `close` is collective: rank 0 emits the end-of-stream sentinel.
  *  - A4 `get` reads the feedback channel; the reference broadcasts the
  *    value over MPI, which is the caller's collective, not the engine's.
  */
final class GraftBridge(
    assembler: LocalAssembler,
    feedback: FeedbackService,
    val rank: Int,
    arraysMetadata: Seq[ArrayMeta],
    chunkPositions: Map[String, Seq[Int]]
) {
  // A1: validate metadata + declared positions up front
  arraysMetadata.foreach(_.validate())
  chunkPositions.foreach { case (name, pos) =>
    val meta = arraysMetadata.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"position declared for unknown array '$name'"))
    meta.validatePosition(pos)
  }

  /** A2: push one chunk for this rank's declared position. */
  def send(arrayName: String, data: Array[Double], timestep: Long,
      dtype: String = "float64"): Unit = {
    val meta = arraysMetadata.find(_.name == arrayName).getOrElse(
      throw new IllegalArgumentException(s"ContractError: array '$arrayName' was not declared"))
    val pos = chunkPositions.getOrElse(arrayName,
      throw new IllegalArgumentException(s"no chunk position declared for '$arrayName'"))
    require(data.length == meta.chunkShape.product,
      s"chunk payload ${data.length} != declared chunk size ${meta.chunkShape.product}")
    assembler.push(ChunkRow(arrayName, timestep, pos, meta.chunkShape, data, dtype))
  }

  /** A3: collective close — rank 0 sends the sentinel. */
  def close(timestep: Long): Unit =
    if (rank == 0) assembler.close(timestep)

  /** A4: feedback read — (found, value) protocol via Option. */
  def get(key: Any, timestep: Long): Option[Any] = feedback.get(key, timestep)

  /** A4 (no-timestep form): the whole retained queue. */
  def getAll(key: Any): Seq[(Long, Any)] = feedback.getAll(key)
}
