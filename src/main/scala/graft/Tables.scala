package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table registry: uniform, schema-stable access to the driver parquet
  * tables in `/root/testdata/sf*` (see TESTDATA.md / FIXTURES.md).
  *
  * The `events` table plays the reference's binlog event table
  * `mysql_monitor.broker_binlog_local` (reference `README.md:99-118`); the
  * column role-mapping lives in [[graft.binlog.BinlogEvents]].
  *
  * Scale note: every loader returns a plain file-source DataFrame so Catalyst
  * keeps predicate pushdown / column pruning / partition pruning intact — no
  * caching, no collect. At 100 TB these reads become multi-file partitioned
  * scans with identical code.
  */
object Tables {

  /** `events.ts` has shipped in two physical encodings across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) (reads as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which the session sets)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
    * TIMESTAMP_NTZ). This loader normalizes either to a microsecond
    * TimestampType column — UTC wall clock, matching DuckDB's
    * `CAST(ts AS TIMESTAMP)` in the oracle — by branching on the FILE
    * schema (a metadata read, no data pass).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, not `/`: Long./ promotes to double, which cannot
        // represent epoch-nanos exactly and rounds the last microsecond
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session timeZone is UTC, so the NTZ wall clock IS the UTC instant
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")

  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/supplier.parquet")

  def part(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/region.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Session factory with the configs every entry point needs. Shuffle
    * partitions default to the local core count (32 in the grading env, per
    * the build contract) instead of Spark's 200 — at sf0.1 a 200-way shuffle
    * is pure scheduling overhead; on a real cluster this knob is replaced by
    * AQE coalescing, which we also enable.
    */
  def session(appName: String, master: String, shufflePartitions: Int): SparkSession =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // (round 13: `spark.sql.join.preferSortMergeJoin=false` +
      // `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m`
      // were A/B-measured over an 18-query join-heavy subset and REVERTED
      // — net +1.0 s: at these partition sizes the per-partition hash
      // build costs more than the sorts it removes, and AQE already
      // broadcasts every genuinely small side.)
      // saveAsTable targets (bucketed layouts) land outside the repo
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("graft.warehouse",
          s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"))
      .config("spark.ui.enabled", "false")
      // long-lived sessions (the test JVM runs ~200 suites through one
      // session; a production driver runs for days): without retention
      // caps the SQL status store accumulates plan metrics for every
      // execution ever run — observed as ~1M SQLPlanMetric instances and
      // an old-gen full of them after a few thousand queries
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
}
