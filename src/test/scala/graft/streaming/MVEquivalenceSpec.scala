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
case class EvV(ts: Timestamp, event_type: String, value: Double)

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
      q.drainGuarded()
    }
    assertStreamClean("mv_stream", q); q.stop()

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
      q.drainGuarded()
    }
    assertStreamClean("mv_stream", q); q.stop()
    val streaming = spark.table("mv_complete").orderBy("day", "event_type").collect()
    val batch = DailyCounts.dailyEventCounts(events.toDF())
      .orderBy("day", "event_type").collect()
    assert(streaming.toSeq === batch.toSeq)
  }

  test("streamed histogram partials re-sum to exact percentiles ≡ batch; replayed batch collapses") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rnd2 = new scala.util.Random(13)
    val evs = (1 to 400).map { _ =>
      EvV(new Timestamp(1700000000000L + rnd2.nextInt(3) * 86400000L),
        Seq("view", "click")(rnd2.nextInt(2)), rnd2.nextInt(500) / 7.0)
    }
    val ms = MemoryStream[EvV]
    val target = tmpDir("hmv_target")
    val ck = tmpDir("hmv_ckpt")
    def runChunk(chunk: Seq[EvV]): Unit = {
      ms.addData(chunk) // BEFORE start: AvailableNow latches offsets at start
      val q = StreamingMVs.histogramPartialsWriter(ms.toDF(), target, ck).start()
      q.drainGuarded()
      assertStreamClean("mv_stream", q); q.stop() // the KILL: next chunk restarts from the checkpoint
    }
    evs.grouped(150).foreach(runChunk)
    // at-least-once redelivery: batch 0's partial rows land a SECOND time
    // with the same batch_id — the read-side dedup must collapse them
    val replay = spark.read.parquet(target)
      .filter(col("batch_id") === 0).persist()
    assert(replay.count() > 0)
    replay.write.mode("append").partitionBy("day").parquet(target)
    val streamed = StreamingMVs.readPercentiles(spark, target)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Double]("p"),
        r.getAs[Long]("pct_cents"), r.getAs[Long]("n_rows"))).toSet
    val raw = evs.toDF()
    val partials = raw.groupBy(to_date(col("ts")).as("day"), col("event_type"),
        round(col("value") * 100).cast("long").as("v_c"))
      .agg(count(lit(1)).as("cnt"))
    val batch = graft.operators.Percentiles.discreteFromHistogram(
        partials, "event_type", "v_c", "cnt", Seq(0.5, 0.95), "pct_cents")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Double]("p"),
        r.getAs[Long]("pct_cents"), r.getAs[Long]("n_rows"))).toSet
    assert(streamed === batch)
    assert(streamed.size === 4) // 2 types × 2 percentiles
  }

  test("streamed count-min partials merge to the EXACT batch sketch; replayed batch collapses") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rnd3 = new scala.util.Random(17)
    // skewed keys so the sketch has real mass concentrations
    val keys = (1 to 500).map(_ => (rnd3.nextInt(40) * rnd3.nextInt(40)).toLong)
    val ms = MemoryStream[Long]
    val target = tmpDir("cm_target")
    val ck = tmpDir("cm_ckpt")
    def runChunk(chunk: Seq[Long]): Unit = {
      ms.addData(chunk) // BEFORE start: AvailableNow latches offsets at start
      val q = StreamingMVs.countMinPartialsWriter(
        ms.toDF().withColumnRenamed("value", "user_id"), target, ck).start()
      q.drainGuarded()
      assertStreamClean("mv_stream", q); q.stop()
    }
    keys.grouped(180).foreach(runChunk)
    // at-least-once redelivery of batch 0's partial counters
    val replay = spark.read.parquet(target).filter(col("batch_id") === 0).persist()
    assert(replay.count() > 0)
    replay.write.mode("append").parquet(target)
    val streamed = StreamingMVs.readCountMinSketch(spark, target)
      .collect().map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    val batchSketch = graft.operators.Sketches
      .sketchPartials(keys.toDF("user_id"))
      .collect().map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    // sketch STATES merge exactly: cell-for-cell integer equality
    assert(streamed === batchSketch)
    assert(streamed.values.sum === 4L * keys.size) // d rows × every event
  }
}
