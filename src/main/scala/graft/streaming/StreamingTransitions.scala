package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One transition edge, emitted exactly once. */
case class Transition(user_id: Long, from_type: String, to_type: String)

/** Per-user carried state: the last event seen (event-time ms, id
  * tie-break, type).
  */
case class TransState(lastTs: Long, lastId: Long, lastType: String)

/** Streaming twin of [[graft.operators.Windows.transitionMatrix]]'s pair
  * stage (the b23 batch query): per-user next-event transitions computed
  * incrementally with `flatMapGroupsWithState`, the last event carried as
  * one tiny state record per user so a transition spanning a micro-batch
  * boundary is still emitted — the same cross-batch stitching problem the
  * transaction assembler solves for binlog gaps, at its minimal state size.
  *
  * Ordering contract: within a micro-batch each user's rows sort by
  * (event time, event_id); ACROSS batches the feed must deliver each key's
  * events in event-time order (a Kafka key-partitioned binlog feed — the
  * reference's own ordering guarantee, audited batch-side by b18). The
  * downstream matrix aggregation is an ordinary streaming count over the
  * emitted pairs.
  *
  * At scale: state is ONE record per user (not a window, not a buffer), the
  * shuffle is the single hash exchange on user_id, and emission is append —
  * each transition exactly once. StreamingTransitionsSpec pins streaming ≡
  * batch over any feed split.
  */
object StreamingTransitions {

  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type"), col("event_id").cast("long"))
      .as[(Long, Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, String, Long)],
            state: GroupState[TransState]) =>
          val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._4))
          var last = state.getOption
          val out = Array.newBuilder[Transition]
          sorted.foreach { r =>
            last.foreach(s => out += Transition(user, s.lastType, r._3))
            last = Some(TransState(r._2.getTime, r._4, r._3))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
