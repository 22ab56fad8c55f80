package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows

case class NEv(ts: Timestamp, user_id: Long)

/** b24's first-seen split in streaming form: a user's repeat events —
  * same day or days later, same batch or later batches — must never count
  * again; the Complete-mode day counts converge to the batch frame.
  */
class StreamingNewUsersSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(u: Long, day: Int, hour: Int) =
    NEv(new Timestamp(t0 + (day * 24L + hour) * 3600000L), u)

  // day0: u1, u2 new (u1 repeats same day); day1: u3 new, u1 repeats
  // across batches; day2: u2/u3 repeat, nobody new
  private val feed = Seq(
    ev(1L, 0, 1), ev(2L, 0, 2), ev(1L, 0, 3),
    ev(3L, 1, 1), ev(1L, 1, 2),
    ev(2L, 2, 1), ev(3L, 2, 2))

  test("streaming new-user counts ≡ batch first-seen over any feed split") {
    implicit val sqlCtx = spark.sqlContext
    for (chunkSize <- Seq(1, 3, 7)) {
      val ms = MemoryStream[NEv]
      val name = s"new_users_stream_$chunkSize"
      val q = StreamingNewUsers.newUsersDaily(ms.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      feed.grouped(chunkSize).foreach { c => ms.addData(c); q.drainGuarded() }
      assertStreamClean("new_users_stream", q); q.stop()
      val streamed = spark.table(name).collect()
        .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("new_users"))
        .toMap
      // the batch frame also reports active-only days as new_users = 0
      // (day2 here); the streaming form emits only days with firsts
      val batch = Windows.newUsersDaily(feed.toDF("ts", "user_id")).collect()
        .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("new_users"))
        .filter(_._2 > 0L)
        .toMap
      assert(streamed === batch, s"chunkSize=$chunkSize")
      // the interesting rows really occurred: 2 new on day0, 1 on day1,
      // and day2 (repeats only) contributes no row at all
      assert(batch.values.toSeq.sorted === Seq(1L, 2L))
    }
  }
}
