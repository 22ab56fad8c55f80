package graft.binlog

import java.sql.Timestamp

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    (1L, new Timestamp(1700000000000L), 10L, "view", 185.22, """{"k": 87}"""),
    (2L, new Timestamp(1700000001000L), 10L, "error", 9.64, """{"k": 12}"""),
    (3L, new Timestamp(1700000002000L), 11L, "click", 40.34, """{"k": 3}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("F1 filter drops the BEGIN-role value; D1 decode extracts the payload") {
    val out = Ingest.projectRow(
      Ingest.dropTransactionBegin(
        Ingest.decodeAndFlatten(raw, Ingest.jsonPropsDecoder, "props"),
        beginValue = "error"))
    val rows = out.orderBy("binlog_pos").collect()
    assert(rows.length === 2) // 'error' row dropped
    assert(rows.map(_.getAs[String]("event_type")).toSeq === Seq("view", "click"))
    // P3: is_ddl from decoded k (87 > 50 → 1; 3 → 0)
    assert(rows.map(_.getAs[Int]("is_ddl")).toSeq === Seq(1, 0))
    assert(rows.map(_.getAs[Int]("k")).toSeq === Seq(87, 3))
    // P6: numerics stored as strings (reference DDL README.md:106,111)
    assert(rows.head.getAs[String]("binlog_pos") === "1")
    assert(rows.head.getAs[String]("single_statement_size") === "185")
  }

  test("P2 enum id↔name round-trip on the canal enum table") {
    assert(Schemas.eventTypeNames(1) === "INSERT")
    assert(Schemas.eventTypeNames(16) === "TRANSACTIONBEGIN")
    assert(Schemas.eventTypeNames.size === 16)
  }
}
