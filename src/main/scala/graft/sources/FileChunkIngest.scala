package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import graft.core.{ArrayMeta, ChunkRow}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-spool ingest: the cross-PROCESS bridge path (reference
  * `bridge.py:343-407` — there an object store carries chunks between the
  * simulation's MPI ranks and the analytics engine; here a spool directory
  * does, which is the zero-infrastructure equivalent. Kafka or a real
  * object store slot into [[FileChunkSource.stream]] unchanged — the
  * assembler only sees a streaming DataFrame of ChunkRows).
  *
  * Writer protocol (what makes the directory a safe IPC boundary):
  *  - one JSON-lines file per send, written to a dot-prefixed temp name
  *    (Spark's file source ignores `.`/`_` prefixes) and ATOMIC_MOVE'd into
  *    place, so a reader never observes a partial chunk;
  *  - file names carry (rank, seq) so concurrent ranks never collide;
  *  - `close` is collective: rank 0 spools the end-of-stream sentinel.
  *
  * JSON is the demonstration codec (human-inspectable, schema-checked by
  * the reader); a production 100 TB deployment would spool parquet or feed
  * Kafka — the reader side and everything downstream are format-agnostic.
  */
final class FileBridge(
    spoolDir: Path,
    val rank: Int,
    arraysMetadata: Seq[ArrayMeta],
    chunkPositions: Map[String, Seq[Int]]
) {
  // A1: validate metadata + declared positions up front (same contract as
  // the in-process GraftBridge)
  arraysMetadata.foreach(_.validate())
  chunkPositions.foreach { case (name, pos) =>
    val meta = arraysMetadata.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"position declared for unknown array '$name'"))
    meta.validatePosition(pos)
  }
  Files.createDirectories(spoolDir)

  private val seq = new AtomicLong(0)

  /** A2: spool one chunk for this rank's declared position. Synchronous:
    * when this returns, the chunk is durably visible to the reader. */
  def send(arrayName: String, data: Array[Double], timestep: Long,
      dtype: String = "float64"): Unit = {
    val meta = arraysMetadata.find(_.name == arrayName).getOrElse(
      throw new IllegalArgumentException(s"ContractError: array '$arrayName' was not declared"))
    val pos = chunkPositions.getOrElse(arrayName,
      throw new IllegalArgumentException(s"no chunk position declared for '$arrayName'"))
    require(data.length == meta.chunkShape.product,
      s"chunk payload ${data.length} != declared chunk size ${meta.chunkShape.product}")
    spool(ChunkRow(arrayName, timestep, pos, meta.chunkShape, data, dtype))
  }

  /** A3: collective close — rank 0 spools the sentinel. */
  def close(timestep: Long): Unit =
    if (rank == 0) spool(ChunkRow.sentinel(timestep))

  private def spool(c: ChunkRow): Unit = {
    val n = seq.getAndIncrement()
    val tmp = spoolDir.resolve(s".inprogress-r$rank-$n.json")
    val fin = spoolDir.resolve(s"chunk-r$rank-$n.json")
    Files.write(tmp, FileBridge.toJsonLine(c).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
  }
}

object FileBridge {
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One ChunkRow as a JSON line matching [[graft.core.ChunkRow.schema]].
    * Doubles use Double.toString (shortest round-tripping form — the reader
    * parses back to the identical bits). */
  private[sources] def toJsonLine(c: ChunkRow): String = {
    val sb = new StringBuilder(64 + 24 * c.data.length)
    sb.append("{\"name\":").append(jstr(c.name))
      .append(",\"t\":").append(c.t)
      .append(",\"pos\":").append(c.pos.mkString("[", ",", "]"))
      .append(",\"shape\":").append(c.shape.mkString("[", ",", "]"))
      .append(",\"data\":[")
    var i = 0
    while (i < c.data.length) {
      if (i > 0) sb.append(',')
      sb.append(c.data(i))
      i += 1
    }
    sb.append("],\"dtype\":").append(jstr(c.dtype)).append("}\n")
    sb.toString
  }
}

/** Reader side: a Structured Streaming file source over the spool directory,
  * schema-pinned to ChunkRow — hand the result to
  * [[graft.streaming.StreamingAssembler.attach]]. `maxFilesPerTrigger`
  * bounds micro-batch size (the backpressure knob — reference row A5's
  * object-store pacing maps here). */
object FileChunkSource {
  def stream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1024): DataFrame = {
    Files.createDirectories(Path.of(dir))
    spark.readStream
      .schema(ChunkRow.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      // a malformed spool file must fail the run loudly, not drop chunks
      // (a dropped chunk would stall completeness forever)
      .option("mode", "FAILFAST")
      .json(dir)
  }
}
