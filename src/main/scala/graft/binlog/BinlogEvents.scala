package graft.binlog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Role-mapping of the driver's `events` test table onto the reference's
  * binlog event table (FIXTURES.md §1; reference `README.md:99-118`):
  *
  * {{{
  *   ts        → execute_time   (event time; window / partition key)
  *   user_id   → gtid           (transaction key, cast to String — README.md:109)
  *   event_type→ event_type     (the 5 synthetic values play the 16-value enum)
  *   event_id  → binlog_pos     (unique+monotone, stored as String — README.md:106)
  *   value     → single_statement_size (numeric-as-string — README.md:111)
  *   derived   → single_statement_affected_rows (README.md:110)
  * }}}
  *
  * The String round-trips are deliberate: the reference stores both
  * `binlog_pos` and `single_statement_size` as String and casts back with
  * `toUInt32` in every query (`compute_transaction_info.py:59`); exercising
  * `cast(StringType)` + `cast(LongType)` here covers operators P6/P7 of
  * SURVEY.md §2.4. `floor(value)` (not a straight cast) keeps the
  * double→integer step identical in Spark and the DuckDB oracle, which round
  * differently on a direct double→bigint cast.
  */
object BinlogEvents {

  /** Binlog-shaped view over `events.parquet`. Narrow (no shuffle): pure
    * projections that Catalyst collapses into the scan.
    */
  def load(spark: SparkSession, sfDir: String): DataFrame =
    shape(Tables.events(spark, sfDir))

  /** Range-restricted load with the predicate applied to the *raw* stored
    * column before the timestamp rebuild: a filter on a derived timestamp
    * cannot reach the parquet reader (it's a computed column), but a
    * comparison on the stored column pushes down and skips row groups via
    * min/max stats — the O3 sort-key data-skipping path (SURVEY.md §4).
    * Branches on the file schema like [[graft.Tables.events]]: ns-epoch
    * longs get long bounds (exact supersets of the µs-truncated values);
    * µs TIMESTAMP_NTZ gets NTZ literals built from the UTC wall clock of
    * the bounds (the session is pinned to UTC).
    */
  def loadRange(spark: SparkSession, sfDir: String,
      start: java.sql.Timestamp, end: java.sql.Timestamp): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ranged = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val startNs = start.getTime * 1000000L
        val endNs = end.getTime * 1000000L
        raw.filter(col("ts") >= startNs && col("ts") < endNs)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        def utcWall(t: java.sql.Timestamp) =
          t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        raw.filter(col("ts") >= lit(utcWall(start)) && col("ts") < lit(utcWall(end)))
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        raw.filter(col("ts") >= lit(start) && col("ts") < lit(end))
    }
    shape(ranged)
  }

  /** Same mapping over an arbitrary events-schema DataFrame (used by the
    * streaming path and unit tests).
    */
  def shape(events: DataFrame): DataFrame =
    events.select(
      col("ts").as("execute_time"),
      col("user_id").cast("string").as("gtid"),
      col("event_type"),
      col("event_id").cast("string").as("binlog_pos"),
      col("value"),
      floor(col("value")).cast("long").cast("string").as("single_statement_size"),
      (pmod(col("event_id"), lit(10)) + lit(1)).as("single_statement_affected_rows"),
      col("props")
    )

  /** `toUInt32(binlog_pos)` analog (`compute_transaction_info.py:59`). The
    * delta vs ClickHouse (throw) is documented in SURVEY.md §1.3: Spark
    * `cast` yields null on garbage, but this engine only ever writes digit
    * strings here.
    */
  val pos: Column = col("binlog_pos").cast("long")

  /** `toUInt32(single_statement_size)` analog. */
  val sizeBytes: Column = col("single_statement_size").cast("long")

  /** CH `DateTime` is second-precision (SURVEY.md §1.3) — all time
    * subtraction goes through this truncation for oracle parity.
    */
  val executeTimeSec: Column = date_trunc("second", col("execute_time"))
}
