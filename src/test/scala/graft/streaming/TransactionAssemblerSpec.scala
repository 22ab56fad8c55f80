package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.TransactionAssembler.TxnEvent

class TransactionAssemblerSpec extends SparkSpec {
  import spark.implicits._

  private def ev(gtid: String, sec: Long, pos: Long, size: Long, rows: Long) =
    TxnEvent(gtid, new Timestamp(sec * 1000), pos, size, rows)

  test("transactions close on event-time gap with the reference size formula") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TxnEvent]
    val q = TransactionAssembler.assemble(ms.toDS(), gapSec = 30, delay = "0 seconds")
      .writeStream.format("memory").queryName("txns")
      .outputMode(OutputMode.Append).start()

    // the reference's worked example (mon_mysql_dml.py:268-310) as a stream
    ms.addData(
      ev("g1", 1000, 451044141L, 593, 2),
      ev("g1", 1002, 451044825L, 284, 1),
      ev("g1", 1004, 451045845L, 116, 1))
    q.processAllAvailable()
    // advance the watermark well past g1's close (1004 + 30)
    ms.addData(ev("g2", 1200, 1L, 10, 1))
    q.processAllAvailable()
    // one more batch so the timeout fires under the advanced watermark
    ms.addData(ev("g2", 1300, 2L, 10, 1))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("txns").collect()
    val g1 = rows.filter(_.getAs[String]("gtid") == "g1")
    assert(g1.length === 1)
    assert(g1.head.getAs[Long]("transaction_size") === (451045845L - 451044141L) + 116L)
    assert(g1.head.getAs[Long]("transaction_spend_time") === 4L)
    assert(g1.head.getAs[Long]("transaction_affected_rows") === 4L)
    assert(g1.head.getAs[Long]("n_events") === 3L)
    // g2 is still open — no summary emitted
    assert(!rows.exists(_.getAs[String]("gtid") == "g2"))
  }

  test("events split across micro-batches merge into one transaction") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TxnEvent]
    val q = TransactionAssembler.assemble(ms.toDS(), gapSec = 10, delay = "0 seconds")
      .writeStream.format("memory").queryName("txns2")
      .outputMode(OutputMode.Append).start()
    ms.addData(ev("t", 100, 1, 5, 1))
    q.processAllAvailable()
    ms.addData(ev("t", 105, 2, 7, 2)) // within the gap: same txn
    q.processAllAvailable()
    ms.addData(ev("z", 500, 9, 1, 1)) // advances the watermark
    q.processAllAvailable()
    ms.addData(ev("z", 600, 10, 1, 1))
    q.processAllAvailable()
    q.stop()
    val t = spark.table("txns2").collect().filter(_.getAs[String]("gtid") == "t")
    assert(t.length === 1)
    assert(t.head.getAs[Long]("n_events") === 2L)
    assert(t.head.getAs[Long]("transaction_size") === (2L - 1L) + 7L)
  }
}
