package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful operator: assemble binlog events into *transaction
  * summaries* keyed by gtid, emitting each transaction once no further
  * events arrive within `gapSec` of its last event (event time).
  *
  * This is the streaming generalization of the reference's per-window
  * `GROUP BY gtid` (`compute_transaction_info.py:63`): the reference can
  * only see a transaction whole if it fits one 5-minute window — a
  * transaction straddling the boundary is split into two partial rows.
  * Gap-closure via `flatMapGroupsWithState` + event-time timeout fixes that
  * semantic hole, the kind of custom per-key state Spark exposes through
  * `KeyValueGroupedDataset` (SURVEY.md §2.8 notes these are absent from the
  * reference; the engine supplies them).
  *
  * Scale: state is one fixed-size record per *open* transaction (bounded by
  * write concurrency, not history); closed transactions leave the store via
  * the timeout. One shuffle on gtid; the state store is partition-local.
  */
object TransactionAssembler {

  /** Floor epoch-millis to whole seconds (event times are never pre-1970
    * here, so integral division suffices).
    */
  private def floorSec(ms: Long): Long = ms / 1000

  final case class TxnEvent(
      gtid: String,
      execute_time: Timestamp,
      pos: Long,
      size_bytes: Long,
      affected_rows: Long
  )

  /** Open-transaction accumulator: the running form of A4–A7. */
  final case class TxnState(
      startMs: Long,
      endMs: Long,
      minPos: Long,
      maxPos: Long,
      lastSize: Long,   // size at max pos → the argMax/max_by component
      rows: Long,
      nEvents: Long
  )

  final case class TxnSummary(
      gtid: String,
      start_time: Timestamp,
      end_time: Timestamp,
      transaction_spend_time: Long,
      transaction_size: Long,
      transaction_affected_rows: Long,
      n_events: Long
  )

  /** Append-mode stream of closed transactions. `delay` is the watermark
    * (late events beyond it are dropped — reference W2 semantics).
    */
  def assemble(events: Dataset[TxnEvent], gapSec: Int = 30,
      delay: String = "10 seconds"): Dataset[TxnSummary] = {
    implicit val stateEnc = Encoders.product[TxnState]
    implicit val outEnc = Encoders.product[TxnSummary]
    events
      .withWatermark("execute_time", delay)
      .groupByKey(_.gtid)(Encoders.STRING)
      .flatMapGroupsWithState[TxnState, TxnSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (gtid, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(TxnSummary(
              gtid,
              new Timestamp(s.startMs),
              new Timestamp(s.endMs),
              // floor each endpoint to seconds before subtracting — the
              // batch path truncates per-timestamp (CH DateTime semantics),
              // and (end-start)/1000 disagrees with it on sub-second times
              // (0.9s→1.1s is 1 there, 0 here)
              floorSec(s.endMs) - floorSec(s.startMs),
              (s.maxPos - s.minPos) + s.lastSize,
              s.rows,
              s.nEvents))
          } else {
            val merged = it.foldLeft(state.getOption.getOrElse(
              TxnState(Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue, 0L, 0L, 0L))) {
              (acc, e) =>
                val t = e.execute_time.getTime
                TxnState(
                  math.min(acc.startMs, t),
                  math.max(acc.endMs, t),
                  math.min(acc.minPos, e.pos),
                  math.max(acc.maxPos, e.pos),
                  if (e.pos >= acc.maxPos) e.size_bytes else acc.lastSize,
                  acc.rows + e.affected_rows,
                  acc.nEvents + 1)
            }
            state.update(merged)
            // close the transaction gapSec after its last event
            state.setTimeoutTimestamp(merged.endMs + gapSec * 1000L)
            Iterator.empty
          }
      }
  }
}
