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
}
