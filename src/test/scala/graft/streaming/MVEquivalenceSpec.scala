package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.binlog.DailyCounts

/** A9/M1 semantics: incremental (micro-batched) MV maintenance must equal
  * one batch aggregation over the same events, for any batch split
  * (SURVEY.md §5 property b).
  */
case class Ev(execute_time: Timestamp, event_type: String)

class MVEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val events = (1 to 300).map { _ =>
    Ev(new Timestamp(1700000000000L + rnd.nextInt(5) * 86400000L),
      Seq("INSERT", "UPDATE", "DELETE")(rnd.nextInt(3)))
  }

  test("append-partials + read-time re-sum ≡ batch aggregation (3-way split)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val target = tmpDir("mv_target")
    val q = ms.toDF().writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("mv_ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        DailyCounts.dailyEventCounts(batch)
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").partitionBy("day").parquet(target)
      }
      .start()
    events.grouped(100).foreach { chunk =>
      ms.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()

    val incremental = DailyCounts
      .resum(spark.read.parquet(target).drop("batch_id"), Seq("day", "event_type"))
      .orderBy("day", "event_type").collect()
    val batch = DailyCounts.dailyEventCounts(events.toDF())
      .orderBy("day", "event_type").collect()
    assert(incremental.toSeq === batch.toSeq)
    // and the partials table really is partial (more than one row per key
    // before the re-sum) — i.e. the test exercised the merge semantics
    assert(spark.read.parquet(target).count() > batch.length)
  }

  test("stateful streaming aggregation (complete mode) ≡ batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingMVs.dailyEventCounts(ms.toDF())
      .writeStream.format("memory").queryName("mv_complete")
      .outputMode(OutputMode.Complete).start()
    events.grouped(75).foreach { chunk =>
      ms.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streaming = spark.table("mv_complete").orderBy("day", "event_type").collect()
    val batch = DailyCounts.dailyEventCounts(events.toDF())
      .orderBy("day", "event_type").collect()
    assert(streaming.toSeq === batch.toSeq)
  }
}
