package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source definitions for the ingestion dataflow (SURVEY.md §2.1).
  *
  * S1 — Kafka topic source: the reference consumes Canal protobuf messages
  * with explicit partition assignment, four offset modes, a consumer group,
  * and SASL/SCRAM auth (`mon_mysql_dml.py:99-147`). Spark's Kafka source
  * covers each knob via options; [[KafkaBinlogSource]] is the declarative
  * mapping. (Offline test env has no broker — the option mapping is
  * unit-tested, the dataflow is exercised through [[replay]] and
  * MemoryStream, which present the identical DataFrame surface.)
  *
  * S2 — stored-offset resume: the reference's `OFFSET_STORED` + auto-commit
  * (`mon_mysql_dml.py:103,117-118`) maps to the checkpoint location — a
  * strictly stronger guarantee (exactly-once source tracking vs
  * at-least-once).
  *
  * S4 — deterministic batch replay of the same dataflow from files.
  */
object BinlogSources {

  /** Offset modes of the reference CLI (`mon_mysql_dml.py:115-124`). */
  sealed trait OffsetMode { def startingOffsets: String }
  case object FromBeginning extends OffsetMode { val startingOffsets = "earliest" }
  case object FromEnd extends OffsetMode { val startingOffsets = "latest" }
  /** OFFSET_STORED: resume is governed by the checkpoint, not the option —
    * Spark ignores startingOffsets when a checkpoint exists, which is
    * exactly the stored-offset behavior.
    */
  case object FromStored extends OffsetMode { val startingOffsets = "earliest" }

  final case class KafkaBinlogSource(
      bootstrapServers: String,
      topic: String,
      partitions: Seq[Int] = Seq(0),          // explicit assign, mon_mysql_dml.py:125
      offsetMode: OffsetMode = FromStored,
      groupId: Option[String] = None,         // consumer group, mon_mysql_dml.py:106
      maxOffsetsPerTrigger: Option[Long] = Some(5000L), // ≈ the 5000-row flush (W3 delta)
      saslScram: Option[(String, String)] = None        // user/pass, mon_mysql_dml.py:109-113
  ) {

    /** The full option map handed to `readStream.format("kafka")`. */
    def options: Map[String, String] = {
      val assignJson =
        s"""{"$topic":[${partitions.mkString(",")}]}"""
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "assign" -> assignJson,
        "startingOffsets" -> offsetMode.startingOffsets,
        "failOnDataLoss" -> "false"
      ) ++
        groupId.map("kafka.group.id" -> _).toMap ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString).toMap ++
        saslScram.map { case (user, pass) =>
          Map(
            "kafka.security.protocol" -> "SASL_PLAINTEXT",
            "kafka.sasl.mechanism" -> "SCRAM-SHA-256",
            "kafka.sasl.jaas.config" ->
              ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
                s"""username="$user" password="$pass";""")
          )
        }.getOrElse(Map.empty)
    }

    /** The unbounded stream of raw messages: one row per Kafka record,
      * payload in `value: binary` — the input contract of
      * [[graft.streaming.StreamingIngest.transform]].
      */
    def load(spark: SparkSession): DataFrame =
      options.foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
  }

  /** S4: file-backed streaming replay with a declared schema — byte-for-byte
    * the same dataflow as Kafka, deterministic for tests/backfills.
    */
  def replay(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** S3: the batch query-side scan (`compute_transaction_info.py:61` —
    * `FROM {prefix}_binlog`): multi-cluster prefix becomes a path parameter
    * (SURVEY.md §2.8 W7, intent not the swap bug).
    */
  def clusterScan(spark: SparkSession, basePath: String, clusterPrefix: String): DataFrame =
    spark.read.parquet(s"$basePath/$clusterPrefix")
}
