package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("band join equals the brute-force range filter, incl. bin boundaries") {
    // times straddle bin boundaries of width tol=5s deliberately
    val a = Seq(
      (1L, ts("2024-01-01 00:00:04")),
      (2L, ts("2024-01-01 00:00:10")),
      (3L, ts("2024-01-01 00:01:00"))
    ).toDF("a_id", "a_ts")
    val b = Seq(
      (10L, ts("2024-01-01 00:00:00")), // Δ to a1 = 4s (≤5), crosses bin edge
      (11L, ts("2024-01-01 00:00:09")), // Δ to a1 = 5s exactly; to a2 = 1s
      (12L, ts("2024-01-01 00:00:16")), // Δ to a2 = 6s (>5): excluded
      (13L, ts("2024-01-01 00:00:59"))  // Δ to a3 = 1s
    ).toDF("b_id", "b_ts")
    val banded = RangeJoin.band(a, b, "a_ts", "b_ts", 5L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = a.crossJoin(b)
      .filter(abs(expr("unix_micros(a_ts) - unix_micros(b_ts)")) <= 5000000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
    assert(banded === Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 13L)))
  }

  test("no duplicate pairs: each qualifying pair meets in exactly one bin") {
    val a = Seq((1L, ts("2024-01-01 00:00:05"))).toDF("a_id", "a_ts")
    val b = Seq((9L, ts("2024-01-01 00:00:05"))).toDF("b_id", "b_ts")
    assert(RangeJoin.band(a, b, "a_ts", "b_ts", 5L).count() === 1L)
  }

  test("streaming interval join: in-window pairs emit, out-of-window and late drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val q = RangeJoin.streamingIntervalJoin(
      clicks.toDF().toDF("c_user", "c_ts"), views.toDF().toDF("v_user", "v_ts"),
      key = "c_user", rKey = "v_user", lTs = "c_ts", rTs = "v_ts",
      tolSec = 60L, delay = "10 seconds")
      .select("c_user", "c_ts", "v_ts")
      .writeStream.format("memory").queryName("sij")
      .outputMode(OutputMode.Append).start()
    def t(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    views.addData((1L, t(0)), (2L, t(5)))
    clicks.addData((1L, t(30)))            // within 60 s of view@0: pair
    q.drainGuarded()
    clicks.addData((2L, t(300)))           // 295 s after view@5: no pair
    views.addData((1L, t(305)))            // also within 60 s of... nothing yet
    q.drainGuarded()
    // advance both watermarks far past everything so state drains
    clicks.addData((9L, t(10000))); views.addData((9L, t(10001)))
    q.drainGuarded()
    // LATE row: arrives behind the advanced watermark (≈ 9990 s); its view
    // partner's state is long evicted, so it must produce no pair
    clicks.addData((1L, t(0)))
    q.drainGuarded()
    assertStreamClean("range_join_stream", q); q.stop()
    val rows = spark.table("sij").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
    // exactly the in-window pairs: (1, click@30, view@0) and (9, 10000, 10001)
    assert(rows.toSet === Set(
      (1L, t(30).getTime, t(0).getTime),
      (9L, t(10000).getTime, t(10001).getTime)))
  }
}
