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

  /** A4: feedback read-back across the process boundary (reference
    * `bridge.py:525-584`): the value analytics published for (key, t), or
    * None when nothing was published — None is the "found=false" arm of the
    * reference's (found, value) protocol, so callers supply their own
    * default. Non-blocking, exactly like the reference's `get`: feedback
    * timing is asynchronous by design (analytics runs one timestep behind),
    * so simulation code reacts when a signal becomes visible rather than
    * waiting on it. In the reference, rank 0 reads the head actor and
    * `comm.bcast`s the result; here the shared feedback directory plays
    * both roles — every rank reads the same atomically-published files, so
    * all ranks observe identical values with no communicator needed. */
  def get(key: String, t: Long): Option[Any] =
    FileBridge.readFeedback(spoolDir)
      .collectFirst { case (`key`, `t`, v) => v }

  /** A4: the whole retained feedback queue for a key, oldest→newest —
    * the reference's `get(key, timestep=None)` form. */
  def getAll(key: String): Seq[(Long, Any)] =
    FileBridge.readFeedback(spoolDir).collect { case (`key`, t, v) => (t, v) }

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
  /** Feedback files live under `<spool>/_feedback` — the underscore prefix
    * keeps Spark's chunk file source from ever treating them as data. */
  val FeedbackDirName = "_feedback"

  /** One published feedback value as a JSON line. Values are JSON scalars:
    * null, booleans, integers (read back as Long), floats (read back as
    * Double, `Double.toString` round-trips the bits), and strings — the
    * cross-process subset of the in-process FeedbackService's `Any`. */
  private[sources] def feedbackJson(key: String, value: Any, t: Long): String = {
    val v = value match {
      case null | None => "null"
      case b: Boolean => b.toString
      case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
      case f: Float => f.toDouble.toString
      case d: Double => d.toString
      case s: String => jstr(s)
      case other => throw new IllegalArgumentException(
        s"cross-process feedback values must be JSON scalars, got ${other.getClass.getName}")
    }
    s"""{"key":${jstr(key)},"t":$t,"value":$v}\n"""
  }

  private val FeedbackLine =
    """\{"key":(".*?(?<!\\)"),"t":(-?\d+),"value":(.*)\}\s*""".r

  private def unescape(quoted: String): String = {
    val s = quoted.substring(1, quoted.length - 1)
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' =>
          s.charAt(i + 1) match {
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c => sb.append(c); i += 2
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def parseScalar(v: String): Any = v match {
    case "null" => null
    case "true" => true
    case "false" => false
    case q if q.startsWith("\"") => unescape(q)
    case n if n.exists(c => c == '.' || c == 'e' || c == 'E') => n.toDouble
    case n => n.toLong
  }

  /** All published feedback, publication order (file sequence number):
    * (key, timestep, value) triples. A partially-written file can never be
    * observed (same dot-temp + ATOMIC_MOVE protocol as the chunk spool). */
  private[sources] def readFeedback(spoolDir: Path): Seq[(String, Long, Any)] = {
    val dir = spoolDir.resolve(FeedbackDirName)
    if (!Files.isDirectory(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.matches("fb-\\d+\\.json"))
      .toSeq
      .sortBy(p => p.getFileName.toString.stripPrefix("fb-").stripSuffix(".json").toLong)
      .map { p =>
        Files.readString(p) match {
          case FeedbackLine(k, t, v) => (unescape(k), t.toLong, parseScalar(v))
          case bad => throw new IllegalStateException(
            s"malformed feedback file $p: $bad") // loud, like FAILFAST chunks
        }
      }
  }

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

/** Analytics→simulation side of the cross-process feedback channel: the
  * file-spool twin of [[graft.streaming.FeedbackService]], closing the loop
  * the reference steers simulations with (`bridge.py:525-584` read side,
  * `head_node.py:213-303` write side). Analytics callbacks `set` values
  * here; simulation ranks read them back with [[FileBridge.get]].
  *
  * Same contract as the in-process service: timesteps strictly increase per
  * key (duplicates/regressions rejected), retention is bounded (oldest
  * spooled entry deleted beyond `queueSize`, so a slow simulation reads a
  * bounded directory, not an unbounded log). Same durability protocol as
  * the chunk spool: dot-temp write + ATOMIC_MOVE, so readers never observe
  * a partial value. One publisher owns the channel (the reference likewise
  * funnels feedback through the single head actor). */
final class FileFeedbackPublisher(spoolDir: Path, queueSize: Int = 1024) {
  require(queueSize > 0, "feedback queue size must be positive")
  private val dir = spoolDir.resolve(FileBridge.FeedbackDirName)
  Files.createDirectories(dir)
  private val seq = new AtomicLong(0)
  private val lastT = scala.collection.mutable.Map.empty[String, Long]
  private val spooled =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayDeque[Path]]

  /** D7 across the process boundary: publish `value` for (key, t). */
  def set(key: String, value: Any, t: Long): Unit = synchronized {
    lastT.get(key).foreach { lt =>
      if (t <= lt) throw new IllegalArgumentException(
        s"feedback timestep $t for key $key must be strictly greater than $lt")
    }
    val line = FileBridge.feedbackJson(key, value, t) // validate BEFORE spooling
    val n = seq.getAndIncrement()
    val tmp = dir.resolve(s".inprogress-fb-$n.json")
    val fin = dir.resolve(s"fb-$n.json")
    Files.write(tmp, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    lastT(key) = t
    val q = spooled.getOrElseUpdate(key, scala.collection.mutable.ArrayDeque.empty)
    q.append(fin)
    while (q.size > queueSize) Files.deleteIfExists(q.removeHead())
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
