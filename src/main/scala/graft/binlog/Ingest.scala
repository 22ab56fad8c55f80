package graft.binlog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The streaming-ingestion dataflow, as composable stages (SURVEY.md §3.1):
  *
  * {{{
  *   source → decode (D1) → flatten (D2) → inner decode (D3)
  *          → filter (F1) → project (P1–P6, P13) → sink (K1)
  * }}}
  *
  * Reference: `mon_mysql_dml.py` — Kafka consume :99-147, protobuf
  * Packet→Messages→[Entry] decode :150-169, per-entry flatten :244,
  * TRANSACTIONBEGIN drop :252-253, RowChange decode :254-255, header
  * projection :257-263,311-314, row assembly :318-331.
  *
  * Decode is pluggable (`Column => Column`): production wiring is
  * `from_protobuf` (spark-protobuf) over the Canal descriptors; the offline
  * test fixture uses `from_json` over the `props` column — same dataflow,
  * same operator shape (SURVEY.md §2.2 D1). Every stage is a narrow
  * transformation: the whole pipeline fuses into one whole-stage-codegen'd
  * pass with zero shuffles, so ingest throughput scales linearly with
  * executors at 100 TB.
  */
object Ingest {

  type Decoder = Column => Column

  /** Fixture decoder: `props` JSON stands in for the Canal protobuf payload
    * (FIXTURES.md §1).
    */
  val jsonPropsDecoder: Decoder =
    from_json(_, StructType(Seq(StructField("k", IntegerType))))

  /** D1+D2: decode the raw payload column into an entries array and flatten
    * one message into N statement rows — `for entry in entries`
    * (`mon_mysql_dml.py:224,242-244`). The fixture payload decodes to a
    * single entry; the array+explode keeps the 1→N generator shape of the
    * real protobuf path.
    */
  def decodeAndFlatten(raw: DataFrame, decode: Decoder, payloadCol: String): DataFrame =
    raw
      .withColumn("entries", array(decode(col(payloadCol))))
      .select(col("*"), explode(col("entries")).as("entry"))
      .drop("entries")

  /** Real D1: decode a Canal-shaped protobuf-lite binary envelope (varint +
    * length-delimited wire format — [[org.apache.spark.sql.graft.EnvelopeCodec]])
    * into its header/storeValue fields. Rows whose bytes fail to parse are
    * dropped — the F2 source-error filter falls out of the NULL-on-malformed
    * contract. Codegen'd scan-time projection, zero shuffles; the
    * `from_json` fixture decoder above remains the JSON stand-in
    * (`mon_mysql_dml.py:150-169, 254-255` is the protobuf original).
    */
  def decodeBinaryEnvelope(raw: DataFrame, bytesCol: String): DataFrame =
    raw
      .withColumn("e", org.apache.spark.sql.graft.DecodeEnvelope.column(col(bytesCol)))
      .filter(col("e").isNotNull)
      .select(col("e.binlog_pos").as("binlog_pos"), col("e.execute_ms").as("execute_ms"),
        col("e.gtid").as("gtid"), col("e.event_type").as("event_type"),
        col("e.size_bytes").as("size_bytes"), col("e.affected_rows").as("affected_rows"))

  /** F1: drop TRANSACTIONBEGIN entries (`mon_mysql_dml.py:252-253`; rationale
    * — canal only shows COMMIT for slow transactions, so keeping BEGIN would
    * ~double storage, `mon_mysql_dml.py:246-251`). The fixture plays the
    * filtered value with `error`.
    */
  def dropTransactionBegin(entries: DataFrame, beginValue: String = "TRANSACTIONBEGIN"): DataFrame =
    entries.filter(col("event_type") =!= beginValue)

  /** P2: enum id → name via a literal map (`EventType.Name`,
    * `mon_mysql_dml.py:314`). Codegen-friendly: `element_at` on a literal
    * map, no UDF.
    */
  def eventTypeName(idCol: Column): Column =
    element_at(typedlit(Schemas.eventTypeNames), idCol)

  /** Reverse of P2 for the fixture (names → stable ids) so the round-trip is
    * testable on the synthetic event_type values.
    */
  def eventTypeId(nameCol: Column, names: Seq[String]): Column =
    element_at(typedlit(names.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap), nameCol)

  /** P3–P6 + P13: the row-assembly projections of `mon_mysql_dml.py:318-331`
    * on the fixture columns — boolean→0/1, epoch-millis→timestamp,
    * collection size, int→string casts, `ctime` ingest timestamp
    * (`README.md:112`).
    */
  def projectRow(entries: DataFrame): DataFrame =
    entries.select(
      col("event_id").cast("string").as("binlog_pos"),          // P6 int→string
      col("event_type"),
      when(col("entry.k") > 50, 1).otherwise(0).as("is_ddl"),   // P3 bool→0/1
      timestamp_millis((unix_timestamp(col("ts")) * 1000)).as("execute_time_sec"), // P4
      col("ts").as("execute_time"),
      col("user_id").cast("string").as("gtid"),
      size(array(col("entry"))).cast("long")
        .as("single_statement_affected_rows"),                  // P5 len(rowDatas)
      floor(col("value")).cast("long").cast("string").as("single_statement_size"),
      col("entry.k").as("k"),                                   // decoded payload field
      current_timestamp().as("ctime")                           // P13 now() default
    )
}
