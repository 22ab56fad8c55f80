package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows

case class SDEv(ts: Timestamp, user_id: String)

/** t50's sliding COUNT(DISTINCT) in streaming form: a user repeating
  * inside a window — same batch or a later one — must never count again
  * in that window, while still counting in every window the event
  * time-fans into; the Complete-mode frame converges to the batch query.
  */
class StreamingSlidingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000100000L // NOT slide-aligned; windows self-align
  private def ev(u: String, sec: Int) = SDEv(new Timestamp(t0 + sec * 1000L), u)

  // u1 repeats within one slide slot (dedup inside every shared window);
  // u2 overlaps u1 in some windows only; a late u1 event 19 min on reuses
  // the user in disjoint windows (must count again there)
  private val feed = Seq(
    ev("u1", 0), ev("u1", 30), ev("u2", 60),
    ev("u2", 400), ev("u1", 1140))

  test("streaming sliding distinct ≡ batch COUNT(DISTINCT) over any feed split") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Windows.slidingDistinct(feed.toDF("ts", "user_id")).collect()
      .map(r => r.getAs[Timestamp]("window_start").getTime ->
        r.getAs[Long]("distinct_users"))
      .toMap
    // the fixture really exercises dedup: some window has 2 distinct
    // users from 3+ events
    assert(batch.values.max === 2L)
    for (chunkSize <- Seq(1, 2, 5)) {
      val ms = MemoryStream[SDEv]
      val name = s"sliding_distinct_stream_$chunkSize"
      val q = StreamingSlidingDistinct.slidingDistinct(ms.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      feed.grouped(chunkSize).foreach { c => ms.addData(c); q.drainGuarded() }
      assertStreamClean("sliding_distinct_stream", q); q.stop()
      val streamed = spark.table(name).collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime ->
          r.getAs[Long]("distinct_users"))
        .toMap
      assert(streamed === batch, s"chunkSize=$chunkSize")
    }
  }
}
