package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows

case class TEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

/** b23's transition pairs in streaming form: the per-user last event is one
  * state record, so a transition whose two events land in different
  * micro-batches still emits — exactly once, matching the batch matrix
  * under any feed split.
  */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(id: Long, u: Long, offSec: Long, typ: String) =
    TEv(id, new Timestamp(t0 + offSec * 1000L), u, typ)

  // u1: A→B→A→C (3 transitions); u2: B→B (1); u3: single event (0)
  private val feed = Seq(
    ev(1L, 1L, 0L, "A"), ev(2L, 1L, 10L, "B"),
    ev(3L, 2L, 20L, "B"),
    ev(4L, 1L, 30L, "A"),
    ev(5L, 2L, 40L, "B"),
    ev(6L, 1L, 50L, "C"),
    ev(7L, 3L, 60L, "A"))

  test("streaming transitions ≡ batch matrix counts over any feed split") {
    implicit val sqlCtx = spark.sqlContext
    for (chunkSize <- Seq(1, 3, 7)) {
      val ms = MemoryStream[TEv]
      val name = s"trans_stream_$chunkSize"
      val q = StreamingTransitions.transitions(ms.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      feed.grouped(chunkSize).foreach { c => ms.addData(c); q.drainGuarded() }
      assertStreamClean("transitions_stream", q); q.stop()
      val streamed = spark.table(name)
        .groupBy("from_type", "to_type").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = Windows.transitionMatrix(feed.toDF()).collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n_transitions")).toMap
      assert(streamed === batch, s"chunkSize=$chunkSize")
      // the cross-batch stitch really happened at chunk 3: (4,5) and (5,6)
      // pair events from different batches
      assert(batch(("A", "B")) === 1L)
      assert(batch(("B", "A")) === 1L)
      assert(batch(("A", "C")) === 1L)
      assert(batch(("B", "B")) === 1L)
    }
  }
}
