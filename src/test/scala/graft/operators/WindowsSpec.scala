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

  test("peakConcurrency: sweep-line peaks, same-instant close/open nets, cross-day close counts") {
    // u1 [10:00,10:40) u2 [10:20,10:50) u3 [10:45,11:15) u5 [10:40,11:10)
    // u4 [23:50, 00:20 next day). At 10:40 u1 closes as u5 opens (net 0);
    // peak 3 at 10:45 (u2,u5,u3 open)
    val ev = Seq(
      ("2024-03-01 10:00:00", "u1"), ("2024-03-01 10:10:00", "u1"),
      ("2024-03-01 10:20:00", "u2"), ("2024-03-01 10:45:00", "u3"),
      ("2024-03-01 10:40:00", "u5"), ("2024-03-01 23:50:00", "u4")
    ).map { case (t, u) => (Timestamp.valueOf(t), u) }.toDF("ts", "user_id")
    val out = Windows.peakConcurrency(ev).orderBy("day").collect()
    assert(out.length === 2)
    val d1 = out.head
    assert(d1.getAs[java.sql.Date]("day").toString === "2024-03-01")
    assert(d1.getAs[Long]("peak_concurrent") === 3L)
    assert(d1.getAs[Long]("sessions_started") === 5L)
    assert(d1.getAs[Long]("sessions_ended") === 4L)
    val d2 = out.last
    assert(d2.getAs[Long]("peak_concurrent") === 0L)
    assert(d2.getAs[Long]("sessions_started") === 0L)
    assert(d2.getAs[Long]("sessions_ended") === 1L)
  }

  test("propsFieldStats: JSON field extracted in place, malformed and missing counted") {
    val ev = Seq(
      ("A", """{"k": 5}"""), ("A", """{"k": 7}"""),
      ("A", """{"other": 1}"""),  // missing k
      ("B", "not json at all"),   // malformed → missing
      ("B", """{"k": 3}""")
    ).toDF("event_type", "props")
    val out = Windows.propsFieldStats(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_missing"),
          r.getAs[Long]("sum_v"), r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))).toMap
    assert(out("A") === ((3L, 1L, 12L, 5L, 7L)))
    assert(out("B") === ((2L, 1L, 3L, 3L, 3L)))
  }

  test("hourlyProfile: peak hour argmax with earlier-hour ties, totals exact") {
    val ev = Seq(
      ("2024-03-01 09:10:00", "A"), ("2024-03-01 09:20:00", "A"),
      ("2024-03-01 14:10:00", "A"),
      // B: hours 7 and 9 tie at 1 → earlier hour wins
      ("2024-03-01 07:00:00", "B"), ("2024-03-02 09:00:00", "B")
    ).map { case (t, ty) => (Timestamp.valueOf(t), ty) }.toDF("ts", "event_type")
    val out = Windows.hourlyProfile(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("peak_hour"), r.getAs[Long]("peak_events"),
          r.getAs[Long]("total_events"))).toMap
    assert(out("A") === ((9L, 2L, 3L)))
    assert(out("B") === ((7L, 1L, 2L)))
  }

  test("sessionPaths: trigrams never cross a session boundary, deterministic top order") {
    // u1 session1: A B C D → ABC, BCD; a 40-min gap, then session2: A B C
    // → ABC. u2: A B C → ABC. Expect ABC×3, BCD×1; no trigram spans the gap
    def e(id: Long, u: Long, offMin: Long, t: String) =
      (id, new Timestamp(1700000000000L + offMin * 60000L), u, t)
    val rows = Seq(
      e(1, 1, 0, "A"), e(2, 1, 1, "B"), e(3, 1, 2, "C"), e(4, 1, 3, "D"),
      e(5, 1, 43, "A"), e(6, 1, 44, "B"), e(7, 1, 45, "C"),
      e(8, 2, 0, "A"), e(9, 2, 1, "B"), e(10, 2, 2, "C")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Windows.sessionPaths(rows).collect()
      .map(r => (r.getAs[String]("step1"), r.getAs[String]("step2"),
        r.getAs[String]("step3")) -> r.getAs[Long]("n_paths")).toMap
    assert(out === Map(("A", "B", "C") -> 3L, ("B", "C", "D") -> 1L))
  }

  test("funnelLatency: exact elapsed-seconds percentiles over completed funnels only") {
    // u1 completes view→click→purchase in 100 s; u2 in 300 s; u3 stalls at
    // click (never counted)
    def e(u: Long, off: Long, t: String) =
      (u * 100 + off, Timestamp.valueOf(s"2024-03-01 10:0${0}:00").getTime + off * 1000L, u, t)
    val rows = Seq(
      e(1L, 0L, "view"), e(1L, 40L, "click"), e(1L, 100L, "purchase"),
      e(2L, 0L, "view"), e(2L, 200L, "click"), e(2L, 300L, "purchase"),
      e(3L, 0L, "view"), e(3L, 10L, "click")
    ).map { case (id, ms, u, t) => (id, new Timestamp(ms), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Windows.funnelLatency(rows, Seq("view", "click", "purchase"),
        windowSec = 604800L).collect()
      .map(r => r.getAs[Double]("p") -> (r.getAs[Long]("pct_sec"), r.getAs[Long]("n_rows")))
      .toMap
    // two completions (100 s, 300 s): lower-median = 100, p90/p99 = 300
    assert(out(0.5) === ((100L, 2L)))
    assert(out(0.9) === ((300L, 2L)))
    assert(out(0.99) === ((300L, 2L)))
  }

  test("newUsersDaily: first-seen split, actives distinct, cumulative reach") {
    // day1: u1,u2 (both new) ; day2: u1 again + u3 new ; day3: u1,u2,u3 (none new)
    val ev = Seq(
      ("2024-03-01 09:00:00", 1L), ("2024-03-01 10:00:00", 2L),
      ("2024-03-01 11:00:00", 1L), // same-day repeat: active counts once
      ("2024-03-02 09:00:00", 1L), ("2024-03-02 10:00:00", 3L),
      ("2024-03-03 09:00:00", 1L), ("2024-03-03 10:00:00", 2L),
      ("2024-03-03 11:00:00", 3L)
    ).map { case (t, u) => (Timestamp.valueOf(t), u) }.toDF("ts", "user_id")
    val out = Windows.newUsersDaily(ev).orderBy("day").collect()
      .map(r => (r.getAs[Long]("active_users"), r.getAs[Long]("new_users"),
        r.getAs[Long]("cum_users")))
    assert(out.toSeq === Seq((2L, 2L, 2L), (2L, 1L, 3L), (3L, 0L, 3L)))
  }

  test("transitionMatrix: per-user next-event pairs, conditional ppm per from-type") {
    // u1: A→B→A ; u2: A→B — transitions: A→B ×2, B→A ×1
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "A"),
      (2L, Timestamp.valueOf("2024-03-01 10:01:00"), 1L, "B"),
      (3L, Timestamp.valueOf("2024-03-01 10:02:00"), 1L, "A"),
      (4L, Timestamp.valueOf("2024-03-01 11:00:00"), 2L, "A"),
      (5L, Timestamp.valueOf("2024-03-01 11:05:00"), 2L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Windows.transitionMatrix(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Long]("prob_ppm"))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 1000000L)),
      ("B", "A") -> ((1L, 1000000L))))
  }

  test("daily trends: cumulative is a running total, ma7 row-framed, first delta = count") {
    val out = Windows.dailyTrends(events)
      .orderBy("event_type", "day").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      // cumulative = prefix sum of n_events in day order
      val counts = rows.map(_.getAs[Long]("n_events"))
      val cums = rows.map(_.getAs[Long]("cum_events"))
      assert(cums.toSeq === counts.scanLeft(0L)(_ + _).tail.toSeq)
      // ma7 averages the last ≤7 observed days exactly
      rows.zipWithIndex.foreach { case (r, i) =>
        val w = counts.slice(math.max(0, i - 6), i + 1)
        assert(r.getAs[Double]("ma7") === w.sum.toDouble / w.length)
      }
      // day-over-day delta; the first observed day baselines at 0
      val deltas = rows.map(_.getAs[Long]("delta"))
      assert(deltas.head === counts.head)
      assert(deltas.tail.toSeq === counts.sliding(2).map(p => p(1) - p(0)).toSeq)
    }
  }

  test("inter-event gaps: per-user lag, ts ties broken by event_id, integer microseconds") {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(sec: Int) = Timestamp.from(t0.toInstant.plusSeconds(sec.toLong))
    val ev = Seq(
      // user A: gaps 10s and 20s on type "x"
      (1L, at(0), "A", "x"), (2L, at(10), "A", "x"), (3L, at(30), "A", "x"),
      // user B: two events at the SAME ts — event_id orders them (gap 0),
      // then 5s to the third
      (4L, at(0), "B", "y"), (5L, at(0), "B", "y"), (6L, at(5), "B", "y"),
      // user C: single event → no gap row
      (7L, at(0), "C", "x")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Windows.interEventGaps(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap_us"),
          r.getAs[Long]("max_gap_us"), r.getAs[Long]("sum_gap_us")))).toMap
    assert(got("x") === ((2L, 10000000L, 20000000L, 30000000L)))
    assert(got("y") === ((2L, 0L, 5000000L, 5000000L)))
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

  test("funnel: levels respect order and window; out-of-order/late steps don't count") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // u1: full funnel inside the window → level 3
      (t("2024-01-01 10:00:00"), 1L, "view"),
      (t("2024-01-01 11:00:00"), 1L, "click"),
      (t("2024-01-01 12:00:00"), 1L, "purchase"),
      // u2: purchase BEFORE click (order violation) → level 2
      (t("2024-01-01 10:00:00"), 2L, "view"),
      (t("2024-01-01 12:00:00"), 2L, "click"),
      (t("2024-01-01 11:00:00"), 2L, "purchase"),
      // u3: click outside the 2h window (anchored at its view) → level 1
      (t("2024-01-01 10:00:00"), 3L, "view"),
      (t("2024-01-01 13:00:00"), 3L, "click"),
      // u4: never viewed → no level at all
      (t("2024-01-01 10:00:00"), 4L, "click"),
      (t("2024-01-01 10:30:00"), 4L, "purchase")
    ).toDF("ts", "user_id", "event_type")
    val out = Windows.funnel(ev, Seq("view", "click", "purchase"), windowSec = 7200L)
      .collect().map(r => r.getAs[Long]("level") -> r.getAs[Long]("n_users")).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // u3, u2, u1
  }

  test("cohort retention: week-0 count equals cohort size; later offsets only actives") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (t("2024-01-01 10:00:00"), 1L, "view"), // Mon wk0 cohort
      (t("2024-01-08 10:00:00"), 1L, "view"), // active wk1
      (t("2024-01-22 10:00:00"), 1L, "view"), // active wk3 (skips wk2)
      (t("2024-01-02 10:00:00"), 2L, "view"), // wk0 cohort, never returns
      (t("2024-01-10 10:00:00"), 3L, "view")  // wk1 cohort
    ).toDF("ts", "user_id", "event_type")
    val out = Windows.cohortRetention(ev).collect()
      .map(r => (r.getAs[Timestamp]("cohort_week").toString.take(10),
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out(("2024-01-01", 0L)) === 2L) // u1 + u2
    assert(out(("2024-01-01", 1L)) === 1L) // u1
    assert(out(("2024-01-01", 3L)) === 1L) // u1
    assert(!out.contains(("2024-01-01", 2L)))
    assert(out(("2024-01-08", 0L)) === 1L) // u3
  }

  test("gapFillLocf: dense spine, gaps carry the last close, pre-first-observation stays null") {
    val e = Seq(
      ("2024-01-01 09:00:00", "a", 1.00),
      ("2024-01-01 17:00:00", "a", 2.00),  // day close for a@01-01 = 200
      ("2024-01-04 10:00:00", "a", 5.00),  // 01-02, 01-03 are gaps
      ("2024-01-03 10:00:00", "b", 7.00)   // b unseen before 01-03
    ).map { case (t, k, v) => (Timestamp.valueOf(t), k, v) }
      .toDF("ts", "event_type", "value")
    val out = Windows.gapFillLocf(e).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (if (r.isNullAt(2)) None else Some(r.getAs[Long]("close_filled")), r.getAs[Int]("observed")))
      .toMap
    // spine spans the global [min, max] day for every key: 4 days × 2 keys
    assert(out.size === 8)
    assert(out(("a", "2024-01-01")) === (Some(200L), 1))
    assert(out(("a", "2024-01-02")) === (Some(200L), 0)) // carried
    assert(out(("a", "2024-01-03")) === (Some(200L), 0)) // still carried
    assert(out(("a", "2024-01-04")) === (Some(500L), 1))
    assert(out(("b", "2024-01-01")) === (None, 0))       // before first obs
    assert(out(("b", "2024-01-03")) === (Some(700L), 1))
    assert(out(("b", "2024-01-04")) === (Some(700L), 0))
  }

  test("idGapReport: bucket decomposition counts boundary gaps, dense day reports zero") {
    val base = 1700006400000L // 2023-11-15 00:00:00 UTC
    // day 1 ids {1,2,3,7,8,25}, bucketWidth 10: 3→7 is an in-bucket gap
    // (3 missing), 8→25 straddles buckets 0→2 with bucket 1 empty (16
    // missing — the boundary path must skip the empty bucket by id, not
    // index); day 2 ids {40,41} are dense
    val ev = (Seq(1L, 2L, 3L, 7L, 8L, 25L).map(id => (base, id)) ++
      Seq(40L, 41L).map(id => (base + 86400000L, id)))
      .map { case (t, id) => (new Timestamp(t + id), id) }
      .toDF("ts", "event_id")
    val out = Windows.idGapReport(ev, bucketWidth = 10L).collect()
      .map(r => r.getAs[Long]("min_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("max_id"),
          r.getAs[Long]("n_missing"), r.getAs[Long]("n_gaps"),
          r.getAs[Long]("max_gap")))).toMap
    assert(out(1L) === ((6L, 25L, 19L, 2L, 16L)))
    // identity: n_missing = (max − min + 1) − n_events
    assert(19L === (25L - 1L + 1L) - 6L)
    assert(out(40L) === ((2L, 41L, 0L, 0L, 0L)))
  }

  test("writeAnomalies: planted spike flags high, spike-inflated variance suppresses, warm-up silent") {
    val base = 1700006400000L // 2023-11-15 00:00:00 UTC
    // days 1–7: 10 events each; day 8: 100 (spike over a zero-variance
    // week → high); day 9: 1 event, but the trailing week now contains
    // the spike, so the inflated σ keeps it normal
    val counts = (1 to 7).map(_ -> 10) :+ (8 -> 100) :+ (9 -> 1)
    val ev = counts.flatMap { case (d, n) =>
      (1 to n).map(i => (new Timestamp(base + d * 86400000L + i * 1000L), s"u$i", "INSERT"))
    }.toDF("ts", "user_id", "event_type")
    val out = Windows.writeAnomalies(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_events"), r.getAs[String]("direction"))).toMap
    assert(out.size === 2) // days 2–7 are warm-up (< 7 predecessors)
    assert(out("2023-11-23") === ((100L, "high")))
    assert(out("2023-11-24") === ((1L, "normal")))
  }

  test("attribution: first/last touch within lookback, direct fallback, stale touch ignored") {
    val t0 = 1700000000000L
    def e(id: Long, u: Long, typ: String, offSec: Long, v: Double) =
      (id, new Timestamp(t0 + offSec * 1000L), u, typ, v)
    val ev = Seq(
      // u1: view → click → purchase inside the day: first=view, last=click
      e(1, 1, "view", 0, 0.0), e(2, 1, "click", 100, 0.0),
      e(3, 1, "purchase", 200, 10.0),
      // u2: cold purchase → direct both ways
      e(4, 2, "purchase", 0, 5.0),
      // u3: only touch is 200 000 s stale (> 86 400) → direct both ways
      e(5, 3, "view", 0, 0.0), e(6, 3, "purchase", 200000, 7.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Windows.attribution(ev).collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[String]("kind")) ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("value_cents")))).toMap
    assert(out(("view", "first")) === ((1L, 1000L)))
    assert(out(("click", "last")) === ((1L, 1000L)))
    assert(out(("direct", "first")) === ((2L, 1200L)))
    assert(out(("direct", "last")) === ((2L, 1200L)))
    assert(out.size === 4)
  }

  test("slidingDistinct: win/slide fan-out, users deduped per window") {
    // three events of two users inside one slide slot → the same 3 windows
    // each see distinct 2 / events 3; one lone event 19 min later → 3 more
    // windows at distinct 1 / events 1
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "u1"),
      (Timestamp.valueOf("2024-01-01 10:00:30"), "u1"),
      (Timestamp.valueOf("2024-01-01 10:01:00"), "u2"),
      (Timestamp.valueOf("2024-01-01 10:20:00"), "u1")
    ).toDF("ts", "user_id")
    val out = Windows.slidingDistinct(ev).collect()
      .map(r => (r.getAs[Long]("distinct_users"), r.getAs[Long]("n_events")))
      .sorted.toSeq
    assert(out === Seq((1L, 1L), (1L, 1L), (1L, 1L), (2L, 3L), (2L, 3L), (2L, 3L)))
  }

  test("decayedTrend: exact 2^-age ppm weights; ages past 20 days contribute 0") {
    // B: 1 event on the anchor day, 2 one day old, 4 two days old, 1
    // twenty-five days old → 10⁶ + 2·5·10⁵ + 4·25·10⁴ + 0 = 3·10⁶
    // A: 4 events all on the anchor day → 4·10⁶
    val ev = (Seq.fill(4)(("2024-02-01 12:00:00", "A")) ++
      Seq(("2024-02-01 09:00:00", "B")) ++
      Seq.fill(2)(("2024-01-31 09:00:00", "B")) ++
      Seq.fill(4)(("2024-01-30 23:59:59", "B")) ++
      Seq(("2024-01-07 00:00:00", "B")))
      .map { case (t, k) => (Timestamp.valueOf(t), k) }.toDF("ts", "event_type")
    val out = Windows.decayedTrend(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("trend_ppm")))).toMap
    assert(out === Map("A" -> ((4L, 4000000L)), "B" -> ((8L, 3000000L))))
  }
}
