package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join half of the storage story
  * (the day-partition + sort-key half lives in
  * [[graft.binlog.Maintenance]]). The reference delegates physical
  * distribution to its engine's sharding key (`README.md:122-137`
  * `Distributed` DDL — rows are routed to shards by a hash of the key);
  * Spark's equivalent for JOIN locality is bucketing: both tables are
  * hash-clustered into the same number of buckets on the join key at WRITE
  * time, so a later equi-join on that key reads bucket i against bucket i —
  * '''zero exchanges at read time''' (plan-pinned in BucketedLayoutSpec).
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every join and shuffling it once, at ingest: the nightly events→users
  * enrichment join, the MV re-sum against partials, and the dedup-group
  * join all hit the same user/doc key — bucketing amortizes that shuffle
  * across every downstream job. Bucket count is a write-time constant;
  * pick it so a bucket ≈ one task's worth of data at target scale (the
  * standard ~128–512 MB/bucket sizing) — buckets too few cap parallelism,
  * too many produce small files per writing task.
  *
  * Sorting within buckets (`sortBy`) additionally lets the join run as a
  * sort-merge without the per-task sort when both sides declare the same
  * sort columns.
  */
object BucketedLayout {

  /** Write `df` as a bucketed (and optionally bucket-sorted) table. Spark
    * tracks bucketing through the catalog, not bare parquet paths — the
    * bucket metadata is what lets the planner elide the exchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sorted: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** The co-located equi-join of two same-bucketed tables: plans with no
    * Exchange on either side (both inputs already hash-clustered on the
    * key into the same bucket count).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Build-if-absent lifecycle for a DETERMINISTIC materialized artifact
    * (dedup groups, IVF index, …): within one driver session the first
    * consumer pays the build, later consumers read the table; a fresh
    * session rebuilds (in-memory catalog — no cross-run staleness to
    * manage). The warehouse dir outlives the per-JVM catalog, so a table
    * written by a PREVIOUS process is an orphaned location here (no
    * catalog entry) and saveAsTable would fail with
    * LOCATION_ALREADY_EXISTS — it is cleared before the rebuild, which is
    * always safe because the artifact's contents are deterministic.
    */
  def buildIfAbsent(spark: SparkSession, table: String)(build: => Unit): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      sweepLocation(spark, table)
      build
      spark.sqlContext.clearCache() // drop the build chain's intermediates
    }
    spark.table(table)
  }

  /** Clear a table's (possibly orphaned) managed warehouse location: the
    * warehouse dir outlives the per-JVM in-memory catalog, so a table
    * written by a previous process — or a staging table a crashed swap
    * left behind — is files with no catalog entry, and saveAsTable would
    * fail with LOCATION_ALREADY_EXISTS.
    */
  private def sweepLocation(spark: SparkSession, table: String): Unit = {
    // URI.getPath is null for a relative/scheme-less warehouse dir — fall
    // back to the raw conf string in that case
    val whConf = spark.conf.get("spark.sql.warehouse.dir")
    val wh = Option(java.net.URI.create(whConf).getPath).getOrElse(whConf)
    val loc = java.nio.file.Paths.get(wh, table.toLowerCase)
    if (java.nio.file.Files.exists(loc, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      // Files.walk does not follow symlinks unless FOLLOW_LINKS is passed,
      // and deleteIfExists removes a link itself, never its target — the
      // sweep stays inside `loc`. The stream is closed (round-5 ADVICE:
      // an unclosed walk leaks a file handle per rebuild).
      val walk = java.nio.file.Files.walk(loc)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }
  }

  /** Drop `table` from the catalog AND sweep its managed location — the
    * staging-table cleanup ([[graft.ops.TextOps.compactPostings]]'s
    * `_staged` twins): a crash between a staged write and the swap leaves
    * catalog-less files that must not block the next staging write.
    */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    sweepLocation(spark, table)
  }
}
