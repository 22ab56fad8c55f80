package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows

case class FEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

/** b19's staged funnel in streaming form: per-user progress is one O(1)
  * state record advanced by a state machine; a step arriving micro-batches
  * after its predecessor still advances (cross-batch stitch), each level
  * reach emits exactly once, and per-level user counts match the batch
  * `windowFunnel` analog under any feed split.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(id: Long, u: Long, offSec: Long, typ: String) =
    FEv(id, new Timestamp(t0 + offSec * 1000L), u, typ)

  private val steps = Seq("view", "click", "purchase")
  private val windowSec = 100L

  // u1 completes all 3 inside the window; u2 reaches 2 (purchase outside
  // the window); u3 clicks before ever viewing (level 1 only, via the
  // later view); u4 purchase-only (level 0 — absent); u5's second view
  // must NOT reset the anchor, so the late purchase misses the window
  private val feed = Seq(
    ev(1L, 1L, 0L, "view"), ev(2L, 2L, 1L, "view"),
    ev(3L, 3L, 2L, "click"), ev(4L, 4L, 3L, "purchase"),
    ev(5L, 1L, 10L, "click"), ev(6L, 2L, 20L, "click"),
    ev(7L, 5L, 30L, "view"),
    ev(8L, 3L, 40L, "view"),
    ev(9L, 1L, 50L, "purchase"),
    ev(10L, 5L, 90L, "view"),
    ev(11L, 5L, 120L, "click"),
    ev(12L, 2L, 150L, "purchase"),
    ev(13L, 5L, 140L + 1L, "purchase"))

  test("streaming funnel ≡ batch level counts over any feed split; reaches emit once") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Windows.funnel(feed.toDF(), steps, windowSec).collect()
      .map(r => r.getAs[Long]("level") -> r.getAs[Long]("n_users")).toMap
    for (chunkSize <- Seq(1, 4, 13)) {
      val ms = MemoryStream[FEv]
      val name = s"funnel_stream_$chunkSize"
      val q = StreamingFunnel.reaches(ms.toDF(), steps, windowSec)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      feed.grouped(chunkSize).foreach { c => ms.addData(c); q.drainGuarded() }
      assertStreamClean("funnel_stream", q); q.stop()
      val reaches = spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("level")))
      // each (user, level) reach exactly once
      assert(reaches.distinct.length === reaches.length, s"chunkSize=$chunkSize")
      // per-user max level → per-level exact counts, vs the batch funnel
      val streamed = reaches.groupBy(_._1).map { case (_, rs) => rs.map(_._2).max }
        .groupBy(identity).map { case (l, us) => l -> us.size.toLong }
      assert(streamed === batch, s"chunkSize=$chunkSize")
    }
    // the fixture exercises every path: completion, window cut, pre-anchor
    // step ignored, never-entered, anchor not reset by a second first-step
    assert(batch === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("sub-millisecond spacing: stream compares in µs, matching the batch funnel") {
    // two events in the SAME millisecond, 500 µs apart — the fixture feed
    // is µs-NTZ so this spacing is in-domain; a ms-truncated comparison
    // (Timestamp.getTime) would see equal times, reject the strict
    // `ts > t_prev` advance, and diverge from the batch funnel
    implicit val sqlCtx = spark.sqlContext
    def at(msOff: Long, micros: Int): Timestamp = {
      val ts = new Timestamp(t0 + msOff)
      // setNanos REPLACES the whole sub-second fraction — keep the ms part
      ts.setNanos((((t0 + msOff) % 1000L).toInt * 1000 + micros) * 1000)
      ts
    }
    val subMs = Seq(
      FEv(1L, at(0L, 0), 1L, "view"),
      FEv(2L, at(0L, 500), 1L, "click"),      // same ms, +500 µs → advances
      FEv(3L, at(5L, 0), 1L, "purchase"),
      FEv(4L, at(10L, 0), 2L, "view"),
      FEv(5L, at(10L, 0), 2L, "click"))       // identical µs → strict > fails
    val batch = Windows.funnel(subMs.toDF(), steps, windowSec).collect()
      .map(r => r.getAs[Long]("level") -> r.getAs[Long]("n_users")).toMap
    val ms = MemoryStream[FEv]
    val q = StreamingFunnel.reaches(ms.toDF(), steps, windowSec)
      .writeStream.format("memory").queryName("funnel_subms")
      .outputMode(OutputMode.Append).start()
    ms.addData(subMs); q.drainGuarded(); assertStreamClean("funnel_stream", q); q.stop()
    val streamed = spark.table("funnel_subms").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("level")))
      .groupBy(_._1).map { case (_, rs) => rs.map(_._2).max }
      .groupBy(identity).map { case (l, us) => l -> us.size.toLong }
    assert(streamed === batch)
    // u1 walks all three steps (the same-ms click counts); u2 stalls at 1
    assert(batch === Map(3L -> 1L, 1L -> 1L))
  }
}
