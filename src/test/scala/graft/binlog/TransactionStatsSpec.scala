package graft.binlog

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the transaction-size formula to the reference's own worked example
  * (`mon_mysql_dml.py:268-310`): 6 events, one gtid, expected
  * transaction_size = (451045845 − 451044141) + 116 = 1820.
  */
class TransactionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val workedExample = Seq(
    // (execute_time, gtid, binlog_pos, single_statement_size, affected_rows)
    ("2020-05-30 10:00:01", "g1", 451044141L, 593L, 2L),
    ("2020-05-30 10:00:02", "g1", 451044825L, 284L, 1L),
    ("2020-05-30 10:00:03", "g1", 451045109L, 239L, 1L),
    ("2020-05-30 10:00:04", "g1", 451045419L, 116L, 1L),
    ("2020-05-30 10:00:05", "g1", 451045535L, 239L, 1L),
    ("2020-05-30 10:00:06", "g1", 451045845L, 116L, 1L)
  ).map { case (t, g, p, sz, r) => (ts(t), g, p.toString, sz.toString, r) }
    .toDF("execute_time", "gtid", "binlog_pos", "single_statement_size",
      "single_statement_affected_rows")

  test("state replay: last op per key wins, tombstoned keys absent, n_ops counts full history") {
    val b = Seq(
      ("k1", 1L, "signup", 10L), ("k1", 3L, "click", 30L), ("k1", 2L, "view", 20L),
      ("k2", 4L, "signup", 40L), ("k2", 5L, "error", 50L), // tombstoned
      ("k3", 6L, "error", 60L), ("k3", 7L, "purchase", 70L) // revived after delete
    ).map { case (g, p, op, sz) => (g, p.toString, op, sz.toString) }
      .toDF("gtid", "binlog_pos", "event_type", "single_statement_size")
    val out = StateReplay.currentState(b).collect()
      .map(r => r.getAs[String]("gtid") ->
        (r.getAs[Long]("n_ops"), r.getAs[Long]("last_pos"), r.getAs[String]("last_op"), r.getAs[Long]("last_size")))
      .toMap
    assert(out === Map(
      "k1" -> (3L, 3L, "click", 30L),
      "k3" -> (2L, 7L, "purchase", 70L)))
  }

  test("reference worked example: transaction_size = 1820") {
    val out = TransactionStats
      .forRange(workedExample, ts("2020-05-30 10:00:00"), ts("2020-05-30 10:05:00"), "5min")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("transaction_size") === 1820L)
    assert(r.getAs[Long]("transaction_spend_time") === 5L)
    assert(r.getAs[Long]("transaction_affected_rows") === 7L)
    assert(r.getAs[String]("interval") === "5min")
  }

  test("events outside [start, end) are excluded (F3 half-open range)") {
    val out = TransactionStats
      .forRange(workedExample, ts("2020-05-30 10:00:00"), ts("2020-05-30 10:00:06"), "x")
      .collect()
    // the 10:00:06 event is excluded: size = (451045535 - 451044141) + 239
    assert(out.head.getAs[Long]("transaction_size") === (451045535L - 451044141L) + 239L)
  }

  test("agg-based and row_number-based per-window top-1 agree") {
    val rnd = new scala.util.Random(42)
    val events = (1 to 500).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(1800) * 1000L),
        s"g${rnd.nextInt(20)}", i.toString, (rnd.nextInt(900) + 100).toString,
        rnd.nextInt(10).toLong + 1)
    }.toDF("execute_time", "gtid", "binlog_pos", "single_statement_size",
      "single_statement_affected_rows")
    for (m <- TransactionStats.metrics) {
      val a = TransactionStats.top1PerWindow(events, m).orderBy("end_time").collect()
      val b = TransactionStats.top1PerWindowViaRowNumber(events, m).orderBy("end_time").collect()
      assert(a.toSeq === b.toSeq, s"metric $m")
    }
  }

  test("shareRollup: table shares sum to ~1e6 per schema, schema shares per day") {
    val ev = Seq(
      ("2024-03-01 10:00:00", "s1", "a"), ("2024-03-01 10:01:00", "s1", "a"),
      ("2024-03-01 10:02:00", "s1", "b"),
      ("2024-03-01 11:00:00", "s2", "c")
    ).map { case (t, s, tb) => (Timestamp.valueOf(t), s, tb) }
      .toDF("execute_time", "schema", "table")
    val out = DailyCounts.shareRollup(ev, "schema", "table").collect()
      .map(r => (r.getAs[String]("schema"), r.getAs[String]("table")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("table_share_ppm"),
          r.getAs[Long]("schema_share_ppm"))).toMap
    assert(out(("s1", "a")) === ((2L, 666666L, 750000L))) // 2/3 of s1; s1 = 3/4 of day
    assert(out(("s1", "b")) === ((1L, 333333L, 750000L)))
    assert(out(("s2", "c")) === ((1L, 1000000L, 250000L)))
  }

  test("per-window stats invariant under input permutation") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (new Timestamp(1700000000000L + rnd.nextInt(1200) * 1000L),
        s"g${rnd.nextInt(10)}", i.toString, (rnd.nextInt(500) + 1).toString, 1L)
    }
    val cols = Seq("execute_time", "gtid", "binlog_pos", "single_statement_size",
      "single_statement_affected_rows")
    val df1 = rows.toDF(cols: _*)
    val df2 = rnd.shuffle(rows).toDF(cols: _*).repartition(7)
    val a = TransactionStats.perWindow(df1).orderBy("end_time", "gtid").collect()
    val b = TransactionStats.perWindow(df2).orderBy("end_time", "gtid").collect()
    assert(a.toSeq === b.toSeq)
  }
}
