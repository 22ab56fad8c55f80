package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.binlog.Ingest

/** The streaming form of the ingestion dataflow (SURVEY.md §3.1) — the
  * reference's consumer loop (`mon_mysql_dml.py:215-335`) as one continuous
  * query:
  *
  * {{{
  *   source (kafka | parquet replay | MemoryStream)
  *     → decode (D1, pluggable) → flatten (D2) → filter (F1) → project (P1–P6)
  *     → foreachBatch: day-partitioned, sorted parquet append (K1+K3+O3)
  * }}}
  *
  * Delivery semantics: the reference is at-least-once (Kafka auto-commit +
  * insert retry, `mon_mysql_dml.py:103,199`; SURVEY.md §2.8 W4). Structured
  * Streaming checkpointing upgrades this to exactly-once source tracking
  * (S2); the parquet sink append inside foreachBatch is idempotent per
  * batchId re-run because a failed batch is replayed with the same data.
  *
  * The reference's count-based flush (5000 rows, W3) is a SINK cadence —
  * buffer rows, bulk-INSERT every N (`mon_mysql_dml.py:199-212`) — and the
  * JDBC sink reproduces it exactly: `JdbcSink` flushes `executeBatch` every
  * `batchSize` rows per task. Micro-batch *trigger* boundaries remain
  * offset/time-based (`maxOffsetsPerTrigger` approximates a per-trigger
  * row bound); only that trigger-level difference is a documented delta.
  *
  * Scale: the transform chain is narrow (no shuffle); `writeEvents`
  * repartitions by day only to avoid small-file explosion — at 100 TB/day
  * you'd widen that to (day, hash bucket) to keep per-task output bounded.
  */
object StreamingIngest {

  /** source → binlog-shaped rows; identical stages to the batch form. */
  def transform(raw: DataFrame, decode: Ingest.Decoder, payloadCol: String,
      beginValue: String = "TRANSACTIONBEGIN"): DataFrame =
    Ingest.projectRow(
      Ingest.dropTransactionBegin(
        Ingest.decodeAndFlatten(raw, decode, payloadCol), beginValue))

  /** Binary-envelope form of the same chain — what a production Canal
    * deployment runs: a stream of wire bytes (Kafka value column) →
    * codegen'd protobuf-lite decode (D1) → malformed-row drop (F2) →
    * BEGIN filter (F1) → binlog-shaped rows. Works identically on a batch
    * or streaming frame (narrow projections only).
    */
  def transformBinary(raw: DataFrame, bytesCol: String,
      beginValue: String = "TRANSACTIONBEGIN"): DataFrame =
    Ingest.dropTransactionBegin(Ingest.decodeBinaryEnvelope(raw, bytesCol), beginValue)
      .select(
        col("binlog_pos").cast("string").as("binlog_pos"),
        col("event_type"),
        timestamp_millis(col("execute_ms")).as("execute_time"),
        col("gtid"),
        col("affected_rows").as("single_statement_affected_rows"),
        col("size_bytes").cast("string").as("single_statement_size"))

  /** K1 sink: day-partitioned sorted parquet per micro-batch. Each batch
    * writes (overwrite) its own `batch_id=N` directory, so a replayed
    * micro-batch — foreachBatch is at-least-once on crash between the write
    * and the checkpoint commit — lands in the same place instead of
    * appending duplicates: this is what upgrades the checkpointed source to
    * end-to-end exactly-once (W4). Readers scan the base path; `batch_id`
    * and `day` both surface as partition columns and day pruning still
    * applies.
    */
  def writer(shaped: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    shaped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val shaped = batch
          .withColumn("day", to_date(col("execute_time")))
          .sortWithinPartitions(col("execute_time"), col("gtid"))
        // the foreachBatch INNER plan is its own query execution the
        // stream-level guard never sees (round-12, closing verdict #3's
        // parenthetical) — walk it per batch; the walk is plan-sized
        graft.plans.PlanGuard.assertNoCorpusProducts("ingest_batch", shaped)
        shaped.write
          .mode("overwrite")
          .partitionBy("day")
          .parquet(s"$path/batch_id=$batchId")
      }

  /** W2: the reference's hand-rolled closed-window trigger
    * (`compute_transaction_info.py:159-162`) — emit a window's aggregate
    * once, after it closes; late events are dropped. Spark form: watermark +
    * append-mode windowed aggregation. `delay` generalizes the reference's
    * "0 seconds past the wall clock" (we default small-positive and document
    * the delta, SURVEY.md §2.8 W2).
    */
  def closedWindowCounts(shaped: DataFrame, windowSec: Int = 300,
      delay: String = "0 seconds"): DataFrame =
    shaped
      .withWatermark("execute_time", delay)
      .groupBy(window(col("execute_time"), s"$windowSec seconds").as("w"), col("gtid"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.end").as("end_time"), col("gtid"), col("n_events"))
}
