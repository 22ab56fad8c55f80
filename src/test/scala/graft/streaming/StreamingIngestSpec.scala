package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.binlog.Ingest

case class Raw(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: decode→flatten→filter→project→partitioned sink") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    val out = tmpDir("ingest_out")
    val shaped = StreamingIngest.transform(ms.toDF(), Ingest.jsonPropsDecoder, "props",
      beginValue = "error")
    val q = shaped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("ingest_ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch
          .withColumn("day", org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.col("execute_time")))
          .write.mode("append").partitionBy("day").parquet(out)
      }
      .start()
    ms.addData(
      Raw(1, Timestamp.valueOf("2024-01-01 10:00:00"), 7, "view", 10.5, """{"k": 60}"""),
      Raw(2, Timestamp.valueOf("2024-01-01 11:00:00"), 7, "error", 11.5, """{"k": 1}"""),
      Raw(3, Timestamp.valueOf("2024-01-02 10:00:00"), 8, "click", 12.5, """{"k": 2}"""))
    q.drainGuarded()
    assertStreamClean("ingest_stream", q); q.stop()
    val res = spark.read.parquet(out)
    assert(res.count() === 2) // error row filtered
    // hive-style day partitions on disk (K3 layout)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("day="))
    assert(dirs.toSet === Set("day=2024-01-01", "day=2024-01-02"))
  }

  test("binary-envelope streaming ingest: wire bytes → decode → filter → sink") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    def envelope(pos: Long, ms: Long, gtid: String, et: String): Array[Byte] =
      org.apache.spark.sql.graft.EnvelopeCodec.encode(pos, ms,
        UTF8String.fromString(gtid), UTF8String.fromString(et), 100L, 2L)
    val ms1 = MemoryStream[Array[Byte]]
    val out = tmpDir("ingest_bin_out")
    val shaped = StreamingIngest.transformBinary(
      ms1.toDF().withColumnRenamed("value", "envelope"), "envelope")
    val q = shaped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("ingest_bin_ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    ms1.addData(
      envelope(1, 1704103200000L, "g1", "INSERT"),
      envelope(2, 1704106800000L, "g1", "TRANSACTIONBEGIN"), // F1: dropped
      "not an envelope".getBytes("UTF-8"),                    // F2: dropped
      envelope(3, 1704189600000L, "g2", "UPDATE"))
    q.drainGuarded()
    assertStreamClean("ingest_stream", q); q.stop()
    val res = spark.read.parquet(out).orderBy("binlog_pos").collect()
    assert(res.length === 2)
    assert(res.map(_.getAs[String]("gtid")).toSeq === Seq("g1", "g2"))
    assert(res.map(_.getAs[String]("event_type")).toSeq === Seq("INSERT", "UPDATE"))
    assert(res.head.getAs[String]("single_statement_size") === "100")
    assert(res.head.getAs[Timestamp]("execute_time").getTime === 1704103200000L)
  }

  test("W2 closed-window trigger: window emitted once closed, late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    val shaped = StreamingIngest.transform(ms.toDF(), Ingest.jsonPropsDecoder, "props")
    val counts = StreamingIngest.closedWindowCounts(shaped, windowSec = 300)
    val q = counts.writeStream.format("memory").queryName("w2")
      .outputMode(OutputMode.Append).start()
    def raw(id: Long, epochSec: Long) =
      Raw(id, new Timestamp(epochSec * 1000), 1, "view", 1.0, """{"k": 1}""")
    // window [0, 300): two events
    ms.addData(raw(1, 1700000000), raw(2, 1700000100))
    q.drainGuarded()
    // advance event time past the window end → watermark moves after this batch
    ms.addData(raw(3, 1700000700))
    q.drainGuarded()
    // one more batch so the closed window flushes; include a LATE event for
    // the first window — reference semantics drop it (SURVEY.md §2.8 W2)
    ms.addData(raw(4, 1700000110), raw(5, 1700000800))
    q.drainGuarded()
    assertStreamClean("ingest_stream", q); q.stop()
    val rows = spark.table("w2").collect()
    // [1699999800, 1700000100) holds only event t=1700000000
    val w1 = rows.filter(_.getAs[Timestamp]("end_time").getTime == 1700000100000L)
    assert(w1.map(_.getAs[Long]("n_events")).sum === 1L)
    // [1700000100, 1700000400) held event t=1700000100 when it closed; the
    // late arrival t=1700000110 (behind the watermark) must have been dropped
    val w2 = rows.filter(_.getAs[Timestamp]("end_time").getTime == 1700000400000L)
    assert(w2.map(_.getAs[Long]("n_events")).sum === 1L)
  }
}
