package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows

case class SEv(user_id: String, ts: Timestamp)

/** b12's session windows in streaming form: append-mode `session_window`
  * over a watermarked feed must emit exactly the batch sessions once the
  * watermark closes them — and each session exactly once (W2's
  * closed-window contract).
  */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sliding window counts: the batch operator runs unchanged as a watermarked stream") {
    // Windows.slidingCounts claims batch/streaming parity — prove it: the
    // SAME call over a watermarked MemoryStream in append mode must emit
    // exactly the batch frame once windows close
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ev(offSec: Long, typ: String) = (new Timestamp(base + offSec * 1000L), typ)
    val feed = Seq(ev(0L, "INSERT"), ev(30L, "INSERT"), ev(310L, "UPDATE"),
      ev(620L, "INSERT"), ev(900L, "DELETE"))
    val flush = ev(90000L, "FLUSH")
    val ms = MemoryStream[(Timestamp, String)]
    val q = graft.operators.Windows.slidingCounts(
      ms.toDF().toDF("ts", "event_type").withWatermark("ts", "30 minutes"))
      .writeStream.format("memory").queryName("sliding_stream")
      .outputMode(OutputMode.Append).start()
    feed.grouped(2).foreach { chunk => ms.addData(chunk); q.drainGuarded() }
    ms.addData(Seq(flush)); q.drainGuarded()
    ms.addData(Seq(flush)); q.drainGuarded()
    assertStreamClean("sessions_stream", q); q.stop()
    val streamed = spark.table("sliding_stream")
      .filter($"event_type" =!= "FLUSH")
      .orderBy("window_start", "event_type").collect().map(_.toSeq)
    val batch = graft.operators.Windows.slidingCounts(
      feed.toDF("ts", "event_type"))
      .orderBy("window_start", "event_type").collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
    // each event lands in win/slide = 2 windows: the sliding shape showed up
    assert(streamed.map(_(1)).count(_ == "INSERT") > 2)
  }

  private val t0 = 1700000000000L
  private def ev(u: String, offsetSec: Long) = SEv(u, new Timestamp(t0 + offsetSec * 1000L))

  // user a: events at 0/10/45 min — the 35-min gap (≥ 30) splits two
  // sessions; user b: one event; user c: events 5 s apart, one session
  private val feed = Seq(
    ev("a", 0L), ev("a", 600L), ev("a", 2700L),
    ev("b", 120L),
    ev("c", 300L), ev("c", 305L))
  // watermark flush: a far-future key whose own session stays open
  private val flush = ev("zz", 90000L)

  test("streaming session windows ≡ batch sessions, emitted once on close") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SEv]
    val q = StreamingSessions.sessions(ms.toDF(), keyCol = "user_id")
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode(OutputMode.Append).start()
    // two-element chunks: session merging must work across micro-batches
    feed.grouped(2).foreach { chunk =>
      ms.addData(chunk)
      q.drainGuarded()
    }
    // advance the watermark past every real session's end, then run one
    // more batch so the closed sessions actually emit
    ms.addData(Seq(flush)); q.drainGuarded()
    ms.addData(Seq(flush)); q.drainGuarded()
    assertStreamClean("sessions_stream", q); q.stop()

    val streamed = spark.table("sessions_stream")
      .filter($"user_id" =!= "zz")
      .orderBy("user_id", "session_start").collect().map(_.toSeq)
    val batch = Windows.sessions(feed.toDF(), keyCol = "user_id")
      .orderBy("user_id", "session_start").collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
    // the split really happened: user a has two sessions
    assert(streamed.count(_.head == "a") === 2)
    // exactly-once emission: no session appears twice
    assert(streamed.distinct.size === streamed.size)
  }
}
