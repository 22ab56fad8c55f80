package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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

  /** Epoch microseconds of a Timestamp — the SAME resolution the batch path
    * and the oracle compare at (`unix_micros` / `epoch_us`). Millisecond
    * math here would make streaming merge two events the batch form splits
    * whenever the gap crosses the threshold by < 1 ms.
    */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTimestamp(us: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Floor epoch-micros to whole seconds (event times are never pre-1970
    * here, so integral division suffices).
    */
  private def floorSec(us: Long): Long = us / 1000000L

  final case class TxnEvent(
      gtid: String,
      execute_time: Timestamp,
      pos: Long,
      size_bytes: Long,
      affected_rows: Long
  )

  /** Open-transaction accumulator: the running form of A4–A7. Times are
    * epoch microseconds (full TimestampType resolution).
    */
  final case class TxnState(
      startUs: Long,
      endUs: Long,
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

  private def summarize(gtid: String, s: TxnState): TxnSummary =
    TxnSummary(
      gtid,
      toTimestamp(s.startUs),
      toTimestamp(s.endUs),
      // floor each endpoint to seconds before subtracting — the batch path
      // truncates per-timestamp (CH DateTime semantics), and
      // (end-start)/1e6 disagrees with it on sub-second times
      // (0.9s→1.1s is 1 there, 0 here)
      floorSec(s.endUs) - floorSec(s.startUs),
      (s.maxPos - s.minPos) + s.lastSize,
      s.rows,
      s.nEvents)

  private def merge(acc: TxnState, e: TxnEvent): TxnState = {
    val t = micros(e.execute_time)
    TxnState(
      math.min(acc.startUs, t),
      math.max(acc.endUs, t),
      math.min(acc.minPos, e.pos),
      math.max(acc.maxPos, e.pos),
      if (e.pos >= acc.maxPos) e.size_bytes else acc.lastSize,
      acc.rows + e.affected_rows,
      acc.nEvents + 1)
  }

  private val emptyState =
    TxnState(Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue, 0L, 0L, 0L)

  /** Append-mode stream of closed transactions. `delay` is the watermark
    * (late events beyond it are dropped — reference W2 semantics).
    *
    * A transaction closes two ways, and both are needed for the streaming
    * result to equal the batch sessionization ([[assembleBatch]]):
    * *eagerly*, when a same-key event arrives whose event time is more than
    * `gapSec` past the open transaction's end (split inside the merge fold —
    * without this, two sessions landing in one micro-batch would wrongly
    * coalesce); and *by timeout*, when the watermark passes end + gap with
    * no further events. The residual delta vs batch is cross-batch
    * disorder: an old-session straggler arriving after a newer session
    * opened merges forward — bounded by the watermark, which drops anything
    * later than `delay`.
    */
  def assemble(events: Dataset[TxnEvent], gapSec: Int = 30,
      delay: String = "10 seconds"): Dataset[TxnSummary] = {
    implicit val stateEnc = Encoders.product[TxnState]
    implicit val outEnc = Encoders.product[TxnSummary]
    val gapUs = gapSec * 1000000L
    events
      .withWatermark("execute_time", delay)
      .groupByKey(_.gtid)(Encoders.STRING)
      .flatMapGroupsWithState[TxnState, TxnSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (gtid, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(summarize(gtid, s))
          } else {
            // process in event-time order so gap splits are deterministic
            val ordered = it.toSeq.sortBy(e => (micros(e.execute_time), e.pos))
            val closed = Seq.newBuilder[TxnSummary]
            var open: Option[TxnState] = state.getOption
            ordered.foreach { e =>
              open match {
                case Some(s) if micros(e.execute_time) - s.endUs > gapUs =>
                  closed += summarize(gtid, s)
                  open = Some(merge(emptyState, e))
                case Some(s) => open = Some(merge(s, e))
                case None => open = Some(merge(emptyState, e))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the transaction gapSec after its last event
              // (timeout API is millisecond-grained; round UP so the
              // timeout never fires early relative to the µs gap)
              state.setTimeoutTimestamp(Math.floorDiv(s.endUs + gapUs + 999L, 1000L))
            }
            closed.result().iterator
          }
      }
  }

  /** Deterministic batch reformulation of [[assemble]] — the backfill twin
    * (reference W6 pattern): gap-sessionize each gtid's event sequence with
    * lag + cumulative-sum session ids, then aggregate each session exactly
    * like the streaming close-out. This is what makes the
    * flatMapGroupsWithState path *attestable*: the batch form is plain SQL,
    * so the DuckDB oracle can verify it (query b14), and a spec pins
    * streaming ≡ batch on the same input.
    *
    * Scale: the sessionization window and the final aggregation both hash on
    * gtid — `HashPartitioning(gtid)` satisfies the (gtid, session_id)
    * grouping, so Catalyst plans ONE exchange for the whole job (the
    * window's sort is reused; no second shuffle). Gap math is integer
    * microseconds; spend time floors each endpoint to seconds, matching the
    * streaming path and CH DateTime semantics.
    */
  def assembleBatch(events: DataFrame, gapSec: Long = 30L): DataFrame = {
    val order = Window.partitionBy(col("gtid")).orderBy(col("t_us"), col("pos"))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("t_us", unix_micros(col("execute_time")))
      .withColumn("new_s",
        when(lag(col("t_us"), 1).over(order).isNull
          || col("t_us") - lag(col("t_us"), 1).over(order) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(cum))
      .groupBy(col("gtid"), col("session_id"))
      .agg(
        min(col("execute_time")).as("start_time"),
        max(col("execute_time")).as("end_time"),
        (expr("unix_micros(max(execute_time)) div 1000000")
          - expr("unix_micros(min(execute_time)) div 1000000")).as("transaction_spend_time"),
        (max(col("pos")) - min(col("pos")) + max_by(col("size_bytes"), col("pos")))
          .as("transaction_size"),
        sum(col("affected_rows")).cast("long").as("transaction_affected_rows"),
        count(lit(1)).as("n_events"))
      .select(col("gtid"), col("start_time"), col("end_time"),
        col("transaction_spend_time"), col("transaction_size"),
        col("transaction_affected_rows"), col("n_events"))
  }
}
