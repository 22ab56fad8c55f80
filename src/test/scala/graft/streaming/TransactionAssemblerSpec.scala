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
    q.drainGuarded()
    // advance the watermark well past g1's close (1004 + 30)
    ms.addData(ev("g2", 1200, 1L, 10, 1))
    q.drainGuarded()
    // one more batch so the timeout fires under the advanced watermark
    ms.addData(ev("g2", 1300, 2L, 10, 1))
    q.drainGuarded()
    assertStreamClean("txn_assembler_stream", q); q.stop()

    val rows = spark.table("txns").collect()
    val g1 = rows.filter(_.getAs[String]("gtid") == "g1")
    assert(g1.length === 1)
    assert(g1.head.getAs[Long]("transaction_size") === (451045845L - 451044141L) + 116L)
    assert(g1.head.getAs[Long]("transaction_spend_time") === 4L)
    assert(g1.head.getAs[Long]("transaction_affected_rows") === 4L)
    assert(g1.head.getAs[Long]("n_events") === 3L)
    // g2@1200 closed eagerly when g2@1300 arrived (gap 100 > 30);
    // g2@1300 itself is still open — exactly one g2 summary
    val g2 = rows.filter(_.getAs[String]("gtid") == "g2")
    assert(g2.length === 1)
    assert(g2.head.getAs[Long]("n_events") === 1L)
    assert(g2.head.getAs[Timestamp]("start_time").getTime === 1200L * 1000)
  }

  test("events split across micro-batches merge into one transaction") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TxnEvent]
    val q = TransactionAssembler.assemble(ms.toDS(), gapSec = 10, delay = "0 seconds")
      .writeStream.format("memory").queryName("txns2")
      .outputMode(OutputMode.Append).start()
    ms.addData(ev("t", 100, 1, 5, 1))
    q.drainGuarded()
    ms.addData(ev("t", 105, 2, 7, 2)) // within the gap: same txn
    q.drainGuarded()
    ms.addData(ev("z", 500, 9, 1, 1)) // advances the watermark
    q.drainGuarded()
    ms.addData(ev("z", 600, 10, 1, 1))
    q.drainGuarded()
    assertStreamClean("txn_assembler_stream", q); q.stop()
    val t = spark.table("txns2").collect().filter(_.getAs[String]("gtid") == "t")
    assert(t.length === 1)
    assert(t.head.getAs[Long]("n_events") === 2L)
    assert(t.head.getAs[Long]("transaction_size") === (2L - 1L) + 7L)
  }

  test("streaming assembly ≡ batch gap-sessionization on the same events (b14 twin)") {
    implicit val sqlCtx = spark.sqlContext
    // per-gtid inter-event steps straddle the 30 s gap: 'a' never splits,
    // 'b' always splits, 'm' alternates
    val steps = Map("a" -> Seq.fill(11)(7L), "b" -> Seq.fill(11)(31L),
      "m" -> Seq(5L, 40L, 10L, 40L, 5L, 5L, 40L, 20L, 40L, 3L, 31L))
    val evs = steps.toSeq.sortBy(_._1).flatMap { case (g, ss) =>
      val times = ss.scanLeft(1000L)(_ + _)
      times.zipWithIndex.map { case (t, i) =>
        ev(g, t, i * 10 + g.hashCode.abs % 10, 100 + i * 3, (i % 5) + 1)
      }
    }

    val ms = MemoryStream[TxnEvent]
    val q = TransactionAssembler.assemble(ms.toDS(), gapSec = 30, delay = "0 seconds")
      .writeStream.format("memory").queryName("txns3")
      .outputMode(OutputMode.Append).start()
    // feed in global event-time order so the 0-delay watermark drops nothing
    val feed = evs.sortBy(e => (e.execute_time.getTime, e.gtid))
    feed.grouped(9).foreach { batch => ms.addData(batch: _*); q.drainGuarded() }
    // flusher batches: advance the watermark far past every close
    ms.addData(ev("zz_flush", 100000L, 1L, 1, 1)); q.drainGuarded()
    ms.addData(ev("zz_flush", 100001L, 2L, 1, 1)); q.drainGuarded()
    assertStreamClean("txn_assembler_stream", q); q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("gtid"), r.getAs[Timestamp]("start_time").getTime)
    def payload(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("end_time").getTime, r.getAs[Long]("transaction_spend_time"),
        r.getAs[Long]("transaction_size"), r.getAs[Long]("transaction_affected_rows"),
        r.getAs[Long]("n_events"))
    val streamed = spark.table("txns3").collect()
      .filter(_.getAs[String]("gtid") != "zz_flush").sortBy(key).map(r => (key(r), payload(r)))
    val batch = TransactionAssembler
      .assembleBatch(evs.toDF(), gapSec = 30).collect().sortBy(key).map(r => (key(r), payload(r)))
    assert(streamed.nonEmpty)
    // 'a' coalesces to 1 session, 'b' to 12, 'm' follows its gap pattern
    assert(streamed.count(_._1._1 == "a") === 1)
    assert(streamed.count(_._1._1 == "b") === 12)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("open-transaction state survives a kill and resume from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    // the operational case the reference's at-least-once restart covers
    // (mon_mysql_dml.py:103,117-118): the job dies with transactions OPEN;
    // on restart from the checkpoint they must continue accumulating, not
    // reset or double-emit
    val ms = MemoryStream[TxnEvent]
    val ckpt = tmpDir("assembler_ckpt")
    val out = tmpDir("assembler_out")
    // foreachBatch → parquet: a restart-capable sink (memory sink refuses
    // checkpoint recovery)
    def startQ() = TransactionAssembler.assemble(ms.toDS(), gapSec = 30, delay = "0 seconds")
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[TransactionAssembler.TxnSummary], _: Long) =>
          batch.write.mode("append").parquet(out)
      }
      .start()

    val q1 = startQ()
    ms.addData(ev("g1", 1000, 1, 5, 1), ev("g1", 1002, 2, 7, 2))
    q1.drainGuarded()
    assertStreamClean("txn_assembler_stream", q1); q1.stop() // kill with g1 open (nothing emitted yet)

    val q2 = startQ()
    // same gtid, still inside the gap: merges into the checkpointed state
    ms.addData(ev("g1", 1004, 3, 9, 1))
    q2.drainGuarded()
    // advance the watermark so g1 times out and emits
    ms.addData(ev("zz", 99999, 8, 1, 1)); q2.drainGuarded()
    ms.addData(ev("zz", 100000, 9, 1, 1)); q2.drainGuarded()
    assertStreamClean("txn_assembler_stream", q2); q2.stop()

    val g1 = spark.read.parquet(out).collect().filter(_.getAs[String]("gtid") == "g1")
    // ONE summary spanning both runs: 3 events, size (3−1)+9, spend 4 s —
    // a lost state would have reset the accumulator (n_events 1) or split
    assert(g1.length === 1, g1.mkString(";"))
    assert(g1.head.getAs[Long]("n_events") === 3L)
    assert(g1.head.getAs[Long]("transaction_size") === (3L - 1L) + 9L)
    assert(g1.head.getAs[Long]("transaction_spend_time") === 4L)
    assert(g1.head.getAs[Timestamp]("start_time").getTime === 1000L * 1000)
    assert(g1.head.getAs[Timestamp]("end_time").getTime === 1004L * 1000)
  }

  test("gap compares microseconds: a split crossing the threshold by 0.5ms agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    def microTs(sec: Long, micro: Int): Timestamp = {
      val t = new Timestamp(sec * 1000)
      t.setNanos(micro * 1000)
      t
    }
    // events 30.0005 s apart with gapSec = 30: µs math splits (30_000_500 >
    // 30_000_000); millisecond math would see 30_000 and wrongly merge
    val evs = Seq(
      TxnEvent("g", microTs(1000, 0), 1L, 5, 1),
      TxnEvent("g", microTs(1030, 500), 2L, 7, 1))
    val ms = MemoryStream[TxnEvent]
    val q = TransactionAssembler.assemble(ms.toDS(), gapSec = 30, delay = "0 seconds")
      .writeStream.format("memory").queryName("txns4")
      .outputMode(OutputMode.Append).start()
    evs.foreach { e => ms.addData(e); q.drainGuarded() }
    ms.addData(TxnEvent("zz", microTs(100000, 0), 9L, 1, 1)); q.drainGuarded()
    ms.addData(TxnEvent("zz", microTs(100001, 0), 10L, 1, 1)); q.drainGuarded()
    assertStreamClean("txn_assembler_stream", q); q.stop()
    val streamed = spark.table("txns4").collect().filter(_.getAs[String]("gtid") == "g")
    assert(streamed.length === 2, streamed.mkString(";"))
    val batch = TransactionAssembler.assembleBatch(
      evs.toDF().withColumnRenamed("pos", "pos"), gapSec = 30)
      .collect().filter(_.getAs[String]("gtid") == "g")
    assert(batch.length === 2)
    // and the µs-precise endpoints survive the round trip
    assert(streamed.map(_.getAs[Timestamp]("start_time")).toSet ===
      batch.map(_.getAs[Timestamp]("start_time")).toSet)
  }
}
