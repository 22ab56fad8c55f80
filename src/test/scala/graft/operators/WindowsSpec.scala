package graft.operators

import java.sql.Timestamp

import org.apache.spark.SparkException

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private val events = (0 until 200).map { i =>
    (Timestamp.valueOf(f"2024-01-0${1 + i % 3} 10:${i % 60}%02d:00"),
      s"u${i % 23}", if (i % 2 == 0) "INSERT" else "UPDATE")
  }.toDF("ts", "user_id", "event_type")

  test("checked approx-distinct passes within 3·rsd and reports exact + flag") {
    val out = Windows.approxDailyDistinctChecked(events).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("sketch_ok"))
      assert(r.getAs[Double]("rel_err") <= 3.0 * 0.02)
      assert(r.getAs[Long]("exact_users") > 0L)
    }
  }

  test("checked approx-distinct raises when the bound cannot hold") {
    // an impossible tolerance forces the assert path: the query must FAIL,
    // not return plausible numbers — this is what gives b13 teeth
    val ex = intercept[Exception] {
      Windows.approxDailyDistinctChecked(events, tolSigma = -1.0).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists {
      case s: SparkException => s.getMessage.contains("HLL")
      case t => t.getMessage != null && t.getMessage.contains("HLL")
    }, ex.toString)
  }
}
