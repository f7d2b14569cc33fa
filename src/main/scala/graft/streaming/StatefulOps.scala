package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-user statistics, updated incrementally per event. */
final case class UserStats(
    user_id: Long,
    n_events: Long,
    total_value: Double,
    last_event_us: Long)

/** Custom keyed streaming state via `flatMapGroupsWithState` — the Spark
  * primitive for stateful semantics that windowed aggregation can't
  * express (here: an incrementally-updated per-key accumulator emitted on
  * every update, the online form of a running `groupBy`).
  *
  * Scale shape: state lives in the executors' state store keyed by
  * user_id (one small UserStats per key, hash-partitioned with the
  * shuffle), each micro-batch touches only the keys it contains, and
  * checkpointing handles recovery — nothing accumulates on the driver.
  * With event-time bounds, a production variant would use
  * `GroupStateTimeout.EventTimeTimeout` plus a watermark to expire idle
  * keys; the accumulator here is deliberately total (parity with the
  * batch groupBy is exact and micro-batch-split independent).
  */
object StatefulOps {

  /** Rows are (user_id, event_time_us, value); emits the updated per-user
    * stats for every group touched by a micro-batch (OutputMode.Update —
    * the latest emission per key equals the batch aggregate over
    * everything seen so far). */
  def runningUserStats(events: Dataset[(Long, Long, Double)]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[UserStats]) =>
          var s = state.getOption.getOrElse(UserStats(user, 0L, 0.0, Long.MinValue))
          rows.foreach { case (_, tUs, v) =>
            s = UserStats(user, s.n_events + 1, s.total_value + v,
              math.max(s.last_event_us, tUs))
          }
          state.update(s)
          Iterator.single(s)
      }
  }
}
