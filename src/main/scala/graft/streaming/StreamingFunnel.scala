package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A funnel-level advance, emitted exactly once when a user first reaches
  * `level` (1-based) at event time `ts`.
  */
case class FunnelReach(user_id: Long, level: Long, ts: Timestamp)

/** Per-user carried state: how far this user has progressed (1-based
  * level), the anchor time (first step's first occurrence, µs), and the
  * previous step's reach time (µs). Microseconds, not milliseconds: the
  * event feed is µs-precision (TIMESTAMP_NTZ micros), and the batch
  * [[graft.operators.Windows.funnel]] compares full-precision timestamps —
  * a ms-truncated comparison would disagree on events in the same
  * millisecond but different microseconds.
  */
case class FunnelState(level: Int, t1: Long, tPrev: Long)

/** Streaming twin of [[graft.operators.Windows.funnel]] (the b19
  * ClickHouse-`windowFunnel` analog) — the live conversion dashboard: each
  * user's progress through the ordered step sequence is ONE tiny state
  * record (level, anchor, previous-step time), advanced by a per-user
  * state machine instead of the batch form's k staged aggregations. A
  * user whose step-2 event arrives three micro-batches after their step-1
  * event still advances — the cross-batch stitch — and each level reach
  * is emitted exactly once (append mode), so the downstream per-level
  * count is an ordinary streaming aggregation over the reach events.
  *
  * Semantics match the batch operator exactly under the feed's ordering
  * contract (per-key event-time order across batches — the
  * [[StreamingTransitions]] contract, audited batch-side by b18): the
  * anchor is the first step's FIRST occurrence, every later step must be
  * strictly after the previous step's reach time and within `windowSec`
  * of the anchor, and within a micro-batch rows sort by (event time,
  * event_id) so the earliest qualifying event advances the level — the
  * same event the batch form's `min(ts)` aggregation picks.
  *
  * At scale: state is O(1) per user with no event buffering, the shuffle
  * is the single hash exchange on user_id, and emission is append-only —
  * a funnel level, once reached, is never retracted, which is what makes
  * the O(1) state sufficient where sessionization needs a timeout.
  */
object StreamingFunnel {

  def reaches(events: DataFrame, steps: Seq[String],
      windowSec: Long): Dataset[FunnelReach] = {
    require(steps.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    val windowMicros = windowSec * 1000000L
    // full µs precision: Timestamp.getTime truncates to milliseconds, so
    // two events in the same ms but different µs would compare equal and
    // diverge from the batch funnel's full-precision `ts > t_prev` /
    // window-bound checks (the fixture feed is µs-NTZ — sub-ms spacing is
    // in-domain). Epoch micros = whole seconds from getTime + the
    // sub-second nanos field.
    def micros(ts: Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type"), col("event_id").cast("long"))
      .as[(Long, Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, String, Long)],
            state: GroupState[FunnelState]) =>
          val sorted = rows.toArray.sortBy(r => (micros(r._2), r._4))
          var st = state.getOption.orNull
          val out = Array.newBuilder[FunnelReach]
          sorted.foreach { case (_, ts, typ, _) =>
            val us = micros(ts)
            if (st == null) {
              // steps(level) compared directly (not an index map): a
              // funnel with a REPEATED step type (A→B→A) must match the
              // occurrence at the current level, exactly as the batch
              // form's per-stage type filter does
              if (typ == steps.head) {
                st = FunnelState(1, us, us)
                out += FunnelReach(user, 1L, ts)
              }
            } else if (st.level < steps.length && typ == steps(st.level) &&
                us > st.tPrev && us <= st.t1 + windowMicros) {
              st = FunnelState(st.level + 1, st.t1, us)
              out += FunnelReach(user, st.level.toLong, ts)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
