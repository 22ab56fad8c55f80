package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.binlog.DailyCounts

/** Continuously-maintained materialized views — the Structured Streaming
  * rendering of the reference's INSERT-triggered MVs
  * (`README.md:168-184, 221-245`; SURVEY.md §2.9 M1/M2, §3.3).
  *
  * ClickHouse's mechanism is: each insert block runs the MV SELECT over just
  * that block (partial aggregate), appends partials to a SummingMergeTree
  * target, and background merges re-sum rows with equal sort keys. That is
  * *exactly* Spark's partial/final aggregation split made persistent, and it
  * maps onto two equivalent Spark forms, both provided here:
  *
  *  1. **Stateful streaming aggregation** ([[dailyEventCounts]]): the state
  *     store holds the merged counts; update-mode output emits revised rows.
  *     One shuffle per micro-batch over (day, event_type) — tiny cardinality,
  *     map-side partial aggregation does nearly all the work.
  *  2. **Append-partials + read-time re-sum** ([[partialsWriter]]): each
  *     micro-batch appends its *partial* counts (no state store, no shuffle
  *     wider than the batch), and readers go through [[DailyCounts.resum]] —
  *     the literal SummingMergeTree model, right when state size (days ×
  *     types × tables) is unbounded or restarts must be cheap.
  *
  * MVEquivalenceSpec pins: any micro-batch split of the input produces the
  * same final counts as one batch aggregation (A9 merge semantics).
  */
object StreamingMVs {

  /** M1 as a stateful streaming aggregation (update mode). */
  def dailyEventCounts(stream: DataFrame): DataFrame =
    DailyCounts.dailyEventCounts(stream)

  /** M2 streaming form. */
  def dailyTableEventCounts(stream: DataFrame, schemaCol: String, tableCol: String): DataFrame =
    DailyCounts.dailyTableEventCounts(stream, schemaCol, tableCol)

  /** Form 2: per-micro-batch partial counts appended to `targetPath`
    * (day-partitioned parquet). Restart-safe: `batchId` rides along and the
    * read path dedups on (batch_id, day, event_type) — a replayed
    * micro-batch (at-least-once foreachBatch) emits identical partial rows,
    * which the dedup collapses before the re-sum.
    */
  def partialsWriter(stream: DataFrame, targetPath: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val partials = DailyCounts
          .dailyEventCounts(batch)
          .withColumn("batch_id", lit(batchId))
        // guard the inner batch plan (round-12 — see StreamingIngest.writer)
        graft.plans.PlanGuard.assertNoCorpusProducts("mv_counts_batch", partials)
        partials.write
          .mode("append")
          .partitionBy("day")
          .parquet(targetPath)
      }

  /** The M3 read path over the partials table (re-sum view). Dedups
    * replayed batches first (see [[partialsWriter]]); tolerates compacted
    * tables where `batch_id` no longer exists.
    */
  def readDailyCounts(spark: org.apache.spark.sql.SparkSession, targetPath: String): DataFrame = {
    val raw = spark.read.parquet(targetPath)
    val deduped =
      if (raw.columns.contains("batch_id"))
        raw.dropDuplicates("batch_id", "day", "event_type").drop("batch_id")
      else raw
    DailyCounts.resum(deduped, Seq("day", "event_type"))
  }

  /** b30's mergeable-QUANTILE MV maintained by the stream — the
    * [[partialsWriter]] discipline applied to percentiles: each
    * micro-batch appends its (day, event_type, value-cent) histogram
    * partials — counts are the one quantile "sketch" that merges EXACTLY —
    * and [[readPercentiles]] re-sums them across batches and days into
    * exact p50/p95 per type. State per group is value-domain-bounded (the
    * t19/b30 histogram discipline), never row-count-bounded; `batch_id`
    * rides along so a replayed at-least-once micro-batch collapses in the
    * read-side dedup exactly as in the counts MV.
    */
  def histogramPartialsWriter(stream: DataFrame, targetPath: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val partials = batch
          .groupBy(to_date(col("ts")).as("day"), col("event_type"),
            round(col("value") * 100).cast("long").as("v_c"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
        graft.plans.PlanGuard.assertNoCorpusProducts("mv_histogram_batch", partials)
        partials.write.mode("append").partitionBy("day").parquet(targetPath)
      }

  /** Exact percentiles from the streamed histogram partials (b30's read
    * side over the streaming MV): replay-dedup, then one re-sum into
    * [[graft.operators.Percentiles.discreteFromHistogram]].
    */
  def readPercentiles(spark: org.apache.spark.sql.SparkSession,
      targetPath: String, ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    val raw = spark.read.parquet(targetPath)
    val deduped =
      if (raw.columns.contains("batch_id"))
        raw.dropDuplicates("batch_id", "day", "event_type", "v_c").drop("batch_id")
      else raw
    graft.operators.Percentiles.discreteFromHistogram(
      deduped, "event_type", "v_c", "cnt", ps, "pct_cents")
  }

  /** Count-min sketch maintained by the stream — the AggregatingMergeTree
    * half of the MV story: where b5/b30 stream SUM and HISTOGRAM partials,
    * this streams SKETCH STATES. Count-min counters merge by pure
    * addition ([[graft.operators.Sketches.mergeSketch]]), so each
    * micro-batch appends its d×w partial counters — a FIXED-size partial
    * regardless of batch or corpus size — and the read side re-sums into
    * the exact sketch one batch pass would have built (integer equality,
    * not approximation: the spec pins streamed ≡ batch sketch
    * cell-for-cell). Same `batch_id` replay-dedup contract as
    * [[partialsWriter]].
    */
  def countMinPartialsWriter(stream: DataFrame, targetPath: String,
      checkpoint: String, keyCol: String = "user_id",
      w: Int = 256): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val partials = graft.operators.Sketches.sketchPartials(batch, keyCol, w)
          .withColumn("batch_id", lit(batchId))
        graft.plans.PlanGuard.assertNoCorpusProducts("mv_sketch_batch", partials)
        partials.write.mode("append").parquet(targetPath)
      }

  /** The merged sketch from streamed partials (replay-dedup first). */
  def readCountMinSketch(spark: org.apache.spark.sql.SparkSession,
      targetPath: String): DataFrame = {
    val raw = spark.read.parquet(targetPath)
    val deduped =
      if (raw.columns.contains("batch_id"))
        raw.dropDuplicates("batch_id", "r", "bucket").drop("batch_id")
      else raw
    graft.operators.Sketches.mergeSketch(deduped)
  }
}
