package graft.streaming

import scala.collection.mutable

/** Analytics→simulation feedback channel (SURVEY §2.D rows D7/D8; reference
  * `head_node.py:213-303`): per-key bounded queues of (timestep, value) with
  * a strictly-increasing-timestep guard, and a (found, value) read protocol
  * so that `null`/None is a legal stored value.
  *
  * This is a control channel, not a data plane — a plain synchronized map on
  * the orchestrator is the right tool (the reference likewise holds it in a
  * single head actor).
  */
final class FeedbackService(queueSize: Int = 1024) {
  require(queueSize > 0, "feedback queue size must be positive")

  private val queues = mutable.Map.empty[Any, mutable.ArrayDeque[(Long, Any)]]

  /** Store a feedback value. Timesteps must be strictly increasing per key
    * (duplicates and regressions rejected, `head_node.py:242-261`). */
  def set(key: Any, value: Any, t: Long): Unit = synchronized {
    val q = queues.getOrElseUpdate(key, mutable.ArrayDeque.empty)
    q.lastOption.foreach { case (lastT, _) =>
      if (t <= lastT) throw new IllegalArgumentException(
        s"feedback timestep $t for key $key must be strictly greater than $lastT")
    }
    q.append((t, value))
    while (q.size > queueSize) q.removeHead()
  }

  /** Read the value for (key, t): None if the key is unknown, the timestep
    * was evicted, or it was never set. */
  def get(key: Any, t: Long): Option[Any] = synchronized {
    queues.get(key).flatMap(_.collectFirst { case (`t`, v) => v })
  }

  /** Whole retained queue for a key, oldest→newest. */
  def getAll(key: Any): Seq[(Long, Any)] = synchronized {
    queues.get(key).map(_.toSeq).getOrElse(Seq.empty)
  }
}
