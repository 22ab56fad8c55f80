package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Windows.sessions]] (the b12 batch
  * query): the SAME `session_window` aggregation, run incrementally with a
  * watermark bounding state. Spark merges a key's open sessions across
  * micro-batches in the state store and, in Append mode, emits a session
  * exactly once — when the watermark passes its end (start + gap after the
  * last event), i.e. when no late event can extend it any more. That is
  * the streaming rendering of the reference's "closed-window flush"
  * contract (W2): results materialize once final, never retracted.
  *
  * At scale: state is one record per OPEN session per key (bounded by the
  * watermark delay), the shuffle is the same single hash exchange on
  * (key, session) the batch form pays, and late events beyond `delay` are
  * dropped by the watermark instead of growing state without bound.
  * StreamingSessionsSpec pins streaming ≡ batch over any feed split.
  */
object StreamingSessions {
  def sessions(events: DataFrame, keyCol: String, tsCol: String = "ts",
      gapSec: Int = 1800, delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), s"$gapSec seconds").as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
}
