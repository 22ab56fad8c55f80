package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** JDBC sink variants of the K1/K2 write paths — the reference's actual
  * sink is batched INSERTs into ClickHouse over the wire
  * (`mon_mysql_dml.py:199-212`: rows are buffered and flushed as one
  * multi-row INSERT); Spark's `format("jdbc")` writer does the same thing
  * per partition (one connection per task, `batchsize`-row executeBatch
  * flushes), so the sink parallelism scales with executors instead of one
  * writer process.
  *
  * The parquet paths in [[graft.binlog.Maintenance]] remain the
  * lake-native layout; these are the database-target twins behind the same
  * semantics (K1 batched append, W5/A10 idempotent window append probed by
  * `end_time`).
  */
object JdbcSink {

  /** A JDBC target: url + table (+ driver-specific options, e.g.
    * `driver`, `user`, `password`).
    */
  final case class Target(url: String, table: String, options: Map[String, String] = Map.empty)

  private def writer(df: DataFrame, target: Target, batchSize: Int) =
    df.write
      .format("jdbc")
      .option("url", target.url)
      .option("dbtable", target.table)
      .option("batchsize", batchSize.toString)
      .options(target.options)

  private def reader(spark: SparkSession, target: Target) =
    spark.read
      .format("jdbc")
      .option("url", target.url)
      .option("dbtable", target.table)
      .options(target.options)

  /** K1: batched append. Each task opens one connection and flushes
    * `batchSize`-row executeBatch inserts — the reference's
    * `buffer → bulk INSERT` loop, parallelized per partition.
    */
  def writeEvents(events: DataFrame, target: Target, batchSize: Int = 5000): Unit =
    writer(events, target, batchSize).mode(SaveMode.Append).save()

  /** Does the target table exist? Checked through driver-level JDBC
    * metadata so that a *transient* error (connection drop, auth, lock
    * timeout) PROPAGATES instead of masquerading as "table absent" — the
    * idempotence guarantee exists precisely for the retry-after-failure
    * path, where a swallowed probe error would double-write.
    */
  private def tableExists(target: Target): Boolean = {
    val props = new java.util.Properties()
    target.options.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(target.url, props)
    try {
      // confine the probe to the namespace an unqualified `dbtable` resolves
      // to (the connection's current catalog/schema) — an all-schemas listing
      // would let a same-named table elsewhere satisfy the probe and point
      // the idempotence check at the wrong target. A `schema.name` qualifier
      // in Target.table is honored. Names are compared exactly (case folded
      // per the driver's identifier normalization), never via the JDBC
      // pattern argument, where `_` is a single-char wildcard.
      val (schemaPart, namePart) = target.table.split('.') match {
        case Array(sch, n) => (Option(sch), n)
        case _ => (None, target.table)
      }
      val schema = schemaPart.orElse(Option(conn.getSchema))
      // schemaPattern stays null: JDBC metadata patterns match the STORED
      // (case-normalized) identifier case-sensitively, so passing a
      // lower-case schema would silently miss on upper-casing drivers
      // (Derby). Compare both parts exactly, case-folded, on the result set.
      val rs = conn.getMetaData.getTables(conn.getCatalog, null, "%", Array("TABLE"))
      try {
        var found = false
        while (!found && rs.next()) {
          found = rs.getString("TABLE_NAME").equalsIgnoreCase(namePart) &&
            schema.forall(s => s.equalsIgnoreCase(rs.getString("TABLE_SCHEM")))
        }
        found
      } finally rs.close()
    } finally conn.close()
  }

  /** W5/K2: idempotent window append — probe for the window's `end_time`
    * (the reference's `count(*)` existence check,
    * `compute_transaction_info.py:132-142`), insert only if absent. The
    * probe pushes the equality predicate down to the database (one indexed
    * lookup, no table scan into Spark). Returns true if the write happened.
    * Probe failures other than "table does not exist" propagate — see
    * [[tableExists]].
    */
  def idempotentAppend(spark: SparkSession, result: DataFrame, target: Target,
      endTime: java.sql.Timestamp, batchSize: Int = 5000): Boolean = {
    val exists = tableExists(target) &&
      !reader(spark, target).load().filter(col("end_time") === lit(endTime)).isEmpty
    if (!exists) writeEvents(result, target, batchSize)
    !exists
  }

  /** K1 streaming: the ingest stream lands in the database via
    * `foreachBatch` → batched JDBC append. Delivery is at-least-once on
    * retry (plain INSERT, like the reference's sink); pair with the W5
    * probe ([[idempotentAppend]]) for result tables that must not
    * double-write.
    */
  def streamWriter(shaped: DataFrame, target: Target, checkpoint: String,
      batchSize: Int = 5000): DataStreamWriter[Row] =
    shaped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeEvents(batch, target, batchSize)
      }
}
