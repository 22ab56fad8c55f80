package graft.binlog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-view equivalents — the reference's two incremental MVs and
  * their SummingMergeTree read semantics (SURVEY.md §2.9).
  *
  *   - MV1: daily event-type counts (`README.md:168-184`, target 155-165)
  *   - MV2: daily per-table counts (`README.md:221-245`, target 206-218)
  *   - A9/M3: rows with equal sort key are re-summed at read time because
  *     background merges may not have collapsed partials yet
  *     (`README.md:143-145, 187-194`).
  *
  * Batch form here; the continuously-maintained (Structured Streaming) form
  * is [[graft.streaming.StreamingMVs]]. Both are the same logical GROUP BY —
  * the property test in MVEquivalenceSpec pins stream ≡ batch.
  *
  * Scale: a count aggregation over (day, event_type[, schema, table]) has
  * tiny cardinality relative to input, so map-side partial aggregation
  * reduces ~all the data before the single shuffle — exactly the per-block
  * partial + merge-time combine that SummingMergeTree does declaratively
  * (SURVEY.md §3.3).
  */
object DailyCounts {

  /** MV1 SELECT: `toDate(execute_time) day, event_type, count(*)`
    * (`README.md:174-181`).
    */
  def dailyEventCounts(binlog: DataFrame): DataFrame =
    binlog
      .groupBy(to_date(col("execute_time")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("event_count"))

  /** MV2 SELECT: adds the per-table keys (`README.md:230-240`). The test
    * table has no schema/table columns; callers pass the two role columns
    * (FIXTURES.md maps gtid as the finer grouping key).
    */
  def dailyTableEventCounts(binlog: DataFrame, schemaCol: String, tableCol: String): DataFrame =
    binlog
      .groupBy(
        to_date(col("execute_time")).as("day"),
        col(schemaCol).as("schema"),
        col(tableCol).as("table"),
        col("event_type")
      )
      .agg(count(lit(1)).as("event_count"))

  /** M3/A9: read-time re-sum over possibly-uncompacted partial aggregates.
    * Reading the MV target must go through this view to get the guarantee CH
    * only gives after FINAL/merge (`README.md:143-145`).
    */
  def resum(partials: DataFrame, keys: Seq[String], valueCol: String = "event_count"): DataFrame =
    partials
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as(valueCol))

  /** DML-mix portrait — the reference's "database portrait" read in ratio
    * form: per (day, schema, table), the share of each DML type in ppm
    * next to its count, so a table whose UPDATE share doubles overnight
    * stands out regardless of volume. One count aggregation (the MV2
    * frame plus event_type) and a ppm projection against the per-table
    * window total — the window runs over the (day × table × type) frame,
    * metadata-sized relative to the log.
    */
  def dmlMix(events: org.apache.spark.sql.DataFrame, schemaCol: String,
      tableCol: String): org.apache.spark.sql.DataFrame = {
    val counts = events
      .groupBy(to_date(col("execute_time")).as("day"),
        col(schemaCol).as("schema"), col(tableCol).as("table"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    counts
      .withColumn("day_total",
        sum(col("n_events")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("day"), col("schema"), col("table"))))
      .withColumn("share_ppm", expr("(1000000 * n_events) div day_total"))
      .drop("day_total")
  }

  /** Two-level share rollup — [[dmlMix]]'s structural sibling: each
    * table's share of its schema and each schema's share of the day, in
    * ppm, on one (day × schema × table) count frame. Both ratio windows
    * run over that metadata-sized frame; the percent-of-parent dashboard
    * shape at two levels.
    */
  def shareRollup(events: org.apache.spark.sql.DataFrame, schemaCol: String,
      tableCol: String): org.apache.spark.sql.DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    events
      .groupBy(to_date(col("execute_time")).as("day"),
        col(schemaCol).as("schema"), col(tableCol).as("table"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("schema_total",
        sum(col("n_events")).over(W.partitionBy(col("day"), col("schema"))))
      .withColumn("day_total",
        sum(col("n_events")).over(W.partitionBy(col("day"))))
      .select(col("day"), col("schema"), col("table"), col("n_events"),
        expr("(1000000 * n_events) div schema_total").as("table_share_ppm"),
        expr("(1000000 * schema_total) div day_total").as("schema_share_ppm"))
  }

  /** Compaction job (SURVEY.md §7 step 5): rewrite the partials table fully
    * collapsed — the explicit analog of a background MergeTree merge. Pure
    * transformation; the maintenance wrapper in [[Maintenance]] handles the
    * write.
    */
  def compact(partials: DataFrame, keys: Seq[String], valueCol: String = "event_count"): DataFrame =
    resum(partials, keys, valueCol)
}
