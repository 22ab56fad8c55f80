package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.binlog.TransactionStats

/** The reference compute job's continuous form (SURVEY.md §3.2 "Spark
  * shape"): the *same* `TransactionStats.perWindow` code runs as a streaming
  * query over a watermarked source — closed windows emit once, with the
  * reference's metric formulas intact.
  */
class StreamingTxnStatsSpec extends SparkSpec {
  import spark.implicits._

  case class Shaped(execute_time: Timestamp, gtid: String, binlog_pos: String,
      single_statement_size: String, single_statement_affected_rows: Long)

  private def ev(sec: Long, gtid: String, pos: Long, size: Long, rows: Long) =
    Shaped(new Timestamp(sec * 1000), gtid, pos.toString, size.toString, rows)

  test("batch perWindow runs unchanged as a watermarked streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Shaped]
    val stats = TransactionStats.perWindow(
      ms.toDF().withWatermark("execute_time", "0 seconds"))
    val q = stats.writeStream.format("memory").queryName("txn_stream")
      .outputMode(OutputMode.Append).start()

    // one transaction inside window [1699999800, 1700000100)
    ms.addData(
      ev(1700000000L, "g1", 451044141L, 593, 2),
      ev(1700000040L, "g1", 451045845L, 116, 1))
    q.drainGuarded()
    // advance watermark beyond the window, then flush it
    ms.addData(ev(1700000700L, "g2", 1, 10, 1))
    q.drainGuarded()
    ms.addData(ev(1700000800L, "g2", 2, 10, 1))
    q.drainGuarded()
    assertStreamClean("txn_stats_stream", q); q.stop()

    val rows = spark.table("txn_stream").collect()
    val g1 = rows.filter(_.getAs[String]("gtid") == "g1")
    assert(g1.length === 1)
    assert(g1.head.getAs[Timestamp]("end_time").getTime === 1700000100000L)
    assert(g1.head.getAs[Long]("transaction_size") === (451045845L - 451044141L) + 116L)
    assert(g1.head.getAs[Long]("transaction_spend_time") === 40L)
    assert(g1.head.getAs[Long]("transaction_affected_rows") === 3L)
    // the still-open window of g2 has not been emitted
    assert(!rows.exists(_.getAs[String]("gtid") == "g2"))
  }
}
