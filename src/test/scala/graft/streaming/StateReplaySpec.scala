package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.binlog.StateReplay

case class ReplayOp(gtid: String, binlog_pos: String, event_type: String,
    single_statement_size: String)

/** The b21 compaction run as the continuously-maintained mirror table a
  * binlog consumer serves: the SAME `currentState` code over a stream,
  * Complete mode — later ops update keys in place and a late tombstone
  * retracts its key.
  */
class StateReplaySpec extends SparkSpec {
  import spark.implicits._

  private def op(g: String, p: Long, o: String, sz: Long) =
    ReplayOp(g, p.toString, o, sz.toString)

  test("streaming state replay ≡ batch; late tombstone retracts its key") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ReplayOp]
    val q = StateReplay.currentState(ms.toDF())
      .writeStream.format("memory").queryName("state_stream")
      .outputMode(OutputMode.Complete).start()

    val batch1 = Seq(op("k1", 1L, "signup", 10L), op("k2", 2L, "signup", 20L))
    ms.addData(batch1: _*)
    q.drainGuarded()
    val after1 = spark.table("state_stream").collect()
      .map(r => r.getAs[String]("gtid") -> r.getAs[String]("last_op")).toMap
    assert(after1 === Map("k1" -> "signup", "k2" -> "signup"))

    // k1 updated in place; k2 tombstoned — retracted from the mirror
    val batch2 = Seq(op("k1", 3L, "click", 30L), op("k2", 4L, "error", 40L))
    ms.addData(batch2: _*)
    q.drainGuarded()
    assertStreamClean("state_replay_stream", q); q.stop()

    val streamed = spark.table("state_stream").collect()
      .map(r => (r.getAs[String]("gtid"), r.getAs[Long]("n_ops"),
        r.getAs[Long]("last_pos"), r.getAs[String]("last_op"), r.getAs[Long]("last_size")))
      .toSet
    val batch = StateReplay.currentState((batch1 ++ batch2).toDF()).collect()
      .map(r => (r.getAs[String]("gtid"), r.getAs[Long]("n_ops"),
        r.getAs[Long]("last_pos"), r.getAs[String]("last_op"), r.getAs[Long]("last_size")))
      .toSet
    assert(streamed === batch)
    assert(streamed === Set(("k1", 2L, 3L, "click", 30L)))
  }
}
