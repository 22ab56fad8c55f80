package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._
import graft.binlog.{BinlogEvents, DailyCounts, Ingest, TransactionStats}
import graft.ops.{Dedup, TextOps, Vectors, Vocab}

import RegistryLib._

/** The binlog-parity surface (reference operators, SURVEY.md §2) — one slice of the
  * [[SparkEntry]] registry (round-7 verdict #7: the single-file registry
  * split by query-name prefix). Names, query semantics, and oracle
  * strings are verbatim from the pre-split registry; [[SparkEntry]]
  * merges the per-domain maps, so the driver contract is unchanged.
  */
private[graft] object RegistryB {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binlog-parity surface (SURVEY.md §2) ----
    "b1_txn_stats" -> ((s, dir) =>
      // loadRange pushes the range onto the raw ns column (row-group skip);
      // forRange re-applies it on execute_time (same rows, belt+braces)
      TransactionStats.forRange(
        BinlogEvents.loadRange(s, dir, rangeStart, rangeEnd), rangeStart, rangeEnd, "1day")),
    "b2_top1_size" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_size")),
    "b3_top1_rows" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_affected_rows")),
    "b4_top1_time" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_spend_time")),
    "b15_binary_decode" -> ((s, dir) => {
      // real D1: fixture columns → protobuf-lite wire bytes → codegen'd
      // decode; the oracle projects the same fields directly, so a decode
      // bug (or a dropped row) breaks the hash match
      val env = binlog(s, dir).select(
        org.apache.spark.sql.graft.EncodeEnvelope.column(
          BinlogEvents.pos, unix_millis(col("execute_time")), col("gtid"),
          col("event_type"), BinlogEvents.sizeBytes,
          col("single_statement_affected_rows")).as("envelope"))
      Ingest.decodeBinaryEnvelope(env, "envelope")
    }),
    "b5_mv_daily_counts" -> ((s, dir) =>
      DailyCounts.dailyEventCounts(
        Tables.events(s, dir).withColumnRenamed("ts", "execute_time"))),
    "b6_mv_daily_table_counts" -> ((s, dir) =>
      DailyCounts.dailyTableEventCounts(
        Tables.events(s, dir)
          .withColumnRenamed("ts", "execute_time")
          .withColumn("schema", concat(lit("db"), pmod(col("user_id"), lit(4))))
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        "schema", "table")),
    "b27_dml_mix" -> ((s, dir) =>
      // the database portrait in ratio form: per (day, table) DML-type
      // shares in ppm — a doubled UPDATE share stands out at any volume
      DailyCounts.dmlMix(
        Tables.events(s, dir)
          .withColumnRenamed("ts", "execute_time")
          .withColumn("schema", concat(lit("db"), pmod(col("user_id"), lit(4))))
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        "schema", "table")),
    "b7_ingest_flatten" -> ((s, dir) =>
      Ingest.projectRow(
        Ingest.dropTransactionBegin(
          Ingest.decodeAndFlatten(Tables.events(s, dir), Ingest.jsonPropsDecoder, "props"),
          beginValue = "error"))
        .drop("ctime")),
    "b8_mv_resum" -> ((s, dir) => {
      // partial aggregates (as a micro-batched MV target would hold), then
      // the A9 read-time re-sum — result ≡ the direct daily counts
      val partials = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"),
          pmod(col("user_id"), lit(4)).as("bucket"))
        .agg(count(lit(1)).as("event_count"))
      DailyCounts.resum(partials, Seq("day", "event_type"))
    }),
    "b30_histogram_mv" -> ((s, dir) => {
      // mergeable-QUANTILE MV (b8's re-sum discipline applied to
      // percentiles): the MV holds daily value-histograms — the one
      // quantile "sketch" that merges EXACTLY (counts add) — and the read
      // side re-sums them across days into exact p50/p95 per type
      // (Percentiles.discreteFromHistogram); result ≡ the direct
      // percentile over raw rows, which is what the oracle computes
      val partials = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"),
          round(col("value") * 100).cast("long").as("v_c"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Percentiles.discreteFromHistogram(
        partials, "event_type", "v_c", "cnt", Seq(0.5, 0.95), "pct_cents")
    }),
    // ---- more binlog surface ----
    "b9_retention_window" -> ((s, dir) => {
      // scalar-subquery retention probe: keep only the trailing 7 days
      // relative to the corpus max — the read-side shape of the K4 TTL job
      val ev = Tables.events(s, dir)
      val maxTs = ev.agg(max(col("ts")).as("max_ts"))
      ev.crossJoin(F.broadcast(maxTs))
        .filter(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
    }),
    "b10_enum_roundtrip" -> ((s, dir) => {
      val idByName = fixtureTypes.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
      val nameById = idByName.map(_.swap)
      Tables.events(s, dir).select(
        col("event_id"),
        col("event_type"),
        element_at(typedlit(idByName), col("event_type")).as("type_id"),
        element_at(typedlit(nameById),
          element_at(typedlit(idByName), col("event_type"))).as("type_name"),
        // P10: formatting parity (strftime in the oracle)
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_time_str"))
    }),
    "b11_sliding_counts" -> ((s, dir) =>
      graft.operators.Windows.slidingCounts(Tables.events(s, dir))),
    "b12_session_windows" -> ((s, dir) =>
      graft.operators.Windows.sessions(Tables.events(s, dir), keyCol = "user_id")),
    "b17_table_trends" -> ((s, dir) =>
      // the reference's per-table daily MV (b6), taken to its reporting
      // conclusion: cumulative / moving-average / delta per table — the
      // "which table's write rate changed?" DBA dashboard; windows run over
      // the (day × table) frame only
      graft.operators.Windows.dailyTrends(
        Tables.events(s, dir)
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        keyCol = "table")),
    "b19_window_funnel" -> ((s, dir) =>
      // windowFunnel parity (the reference engine's flagship product-
      // analytics function): view→click→purchase within 7 days of the
      // first view, strictly ordered; staged per-user-frame aggregation,
      // never a per-user event collection
      graft.operators.Windows.funnel(Tables.events(s, dir),
        Seq("view", "click", "purchase"), windowSec = 604800L)),
    "b28_write_anomalies" -> ((s, dir) =>
      // daily count vs trailing-7-day mean ± 3σ, the z-test cross-
      // multiplied into exact integers — windows over the (day × type)
      // frame only
      graft.operators.Windows.writeAnomalies(Tables.events(s, dir))),
    "b29_id_gaps" -> ((s, dir) =>
      // replication completeness: missing-id count/gap profile per day —
      // the one-task-per-day lag window decomposed over id buckets +
      // a metadata-sized boundary pass
      graft.operators.Windows.idGapReport(Tables.events(s, dir))),
    "b20_cohort_retention" -> ((s, dir) =>
      // cohort × week-offset retention matrix: two event-log aggregations
      // joined on the user-sized frame
      graft.operators.Windows.cohortRetention(Tables.events(s, dir))),
    "b22_peak_concurrency" -> ((s, dir) =>
      // sweep-line over b12's session intervals: ±1 boundary deltas netted
      // per timestamp, running sum via the bounded three-level prefix scan
      // (never a global-ORDER-BY window), per-day max = peak concurrency
      graft.operators.Windows.peakConcurrency(Tables.events(s, dir))),
    "b23_transition_matrix" -> ((s, dir) =>
      // first-order Markov behavioral counts: per-user next-event pairs →
      // (from, to) counts with conditional ppm over the metadata-sized
      // type×type frame
      graft.operators.Windows.transitionMatrix(Tables.events(s, dir))),
    "b24_new_users" -> ((s, dir) =>
      // DAU dashboard: active/new/cumulative users per day; cumulative
      // window over the day-count-sized frame only
      graft.operators.Windows.newUsersDaily(Tables.events(s, dir))),
    "b25_hourly_profile" -> ((s, dir) =>
      // load seasonality: peak hour (ties earlier) + totals per type from
      // a ≤24·|types| metadata frame
      graft.operators.Windows.hourlyProfile(Tables.events(s, dir))),
    "b26_props_stats" -> ((s, dir) =>
      // query the JSON you landed: per-type stats of props.$.k straight
      // from the string column, malformed/missing counted not crashed
      graft.operators.Windows.propsFieldStats(Tables.events(s, dir))),
    "b13_approx_distinct" -> ((s, dir) =>
      // checked variant: the query RAISES if any group's HLL estimate is
      // off by > 3·rsd vs exact. Only cross-engine-deterministic columns are
      // returned (sketch_ok still forces the assert through its rel_err
      // dependency), so the oracle hash-verifies the row set while the
      // assert bounds the engine-specific estimate
      graft.operators.Windows.approxDailyDistinctChecked(Tables.events(s, dir))
        .select(col("day"), col("event_type"), col("exact_users"),
          col("n_events"), col("sketch_ok"))),
    "b31_countmin_checked" -> ((s, dir) =>
      // the 4th checked sketch (HLL=b13, percentiles=t37, freqItems=x32):
      // count-min per-user frequency estimates next to exact counts — the
      // no-undercount guarantee asserted per key; fixed literal hash
      // constants make the whole sketch integer-exact on both engines
      graft.operators.Sketches.countMinChecked(Tables.events(s, dir))),
    "b32_countmin_merged_probe" -> ((s, dir) =>
      // the MERGED-sketch read side at arbitrary keys (round-7 verdict
      // "next" #5): per-event_type partials folded by addition, probed
      // with a 1-in-97 key sample PLUS keys the build never saw
      // (max+1…max+5, exact count 0) — pins the LEFT-join/coalesce-0
      // estimate contract that makes absent keys read their true minimum
      graft.operators.Sketches.countMinMergedProbe(Tables.events(s, dir))),
    "b14_txn_assembly" -> ((s, dir) => {
      // batch twin of the flatMapGroupsWithState assembler (gap = 1 day on
      // the fixture's user-level gtids); one exchange for window + agg.
      // P7 cast-backs: the reference stores pos/size as strings
      val b = binlog(s, dir).select(
        col("gtid"), col("execute_time"),
        BinlogEvents.pos.as("pos"),
        BinlogEvents.sizeBytes.as("size_bytes"),
        col("single_statement_affected_rows").as("affected_rows"))
      graft.streaming.TransactionAssembler.assembleBatch(b, gapSec = 86400L)
    }),
    "b21_state_replay" -> ((s, dir) =>
      // what does each row look like NOW: latest-op-per-key compaction
      // with tombstones (last op = 'error' removes the key) — one
      // map-side-combinable hash agg riding the unique position, no sort
      // window; n_ops carries the compaction ratio
      graft.binlog.StateReplay.currentState(binlog(s, dir))),
    "b18_ordering_integrity" -> ((s, dir) => {
      // replication-integrity check: within each gtid's (execute_time,
      // pos) order, how often does the binlog position run BACKWARD?
      // Nonzero counts mean out-of-order apply or position reuse — the
      // first thing a DBA audits when downstream counts drift. One window
      // per gtid (per-stream partitions, never one task) + one map-side-
      // combined aggregation
      val b = binlog(s, dir).select(
        col("gtid"), col("execute_time"), BinlogEvents.pos.as("pos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("gtid")).orderBy(col("execute_time"), col("pos"))
      b.withColumn("prev", lag(col("pos"), 1).over(w))
        .groupBy(col("gtid"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("prev").isNotNull && col("pos") < col("prev"), 1L)
            .otherwise(0L)).as("n_violations"))
    }),
    "b16_txn_duration_histogram" -> ((s, dir) => {
      // the reporting layer over b14's assembly: how long do transactions
      // run, and how much work rides in each duration class? The histogram
      // domain is seconds-valued spend times — value-domain compressed
      // (t19 pattern), so the second agg is metadata-sized
      val b = binlog(s, dir).select(
        col("gtid"), col("execute_time"),
        BinlogEvents.pos.as("pos"),
        BinlogEvents.sizeBytes.as("size_bytes"),
        col("single_statement_affected_rows").as("affected_rows"))
      graft.streaming.TransactionAssembler.assembleBatch(b, gapSec = 86400L)
        .groupBy(col("transaction_spend_time"))
        .agg(count(lit(1)).as("n_transactions"),
          sum(col("n_events")).as("total_events"),
          sum(col("transaction_affected_rows")).as("total_affected_rows"))
    })
  )

  val oracles: Map[String, String] = Map(
    "b1_txn_stats" ->
      (oracleBinlogCte + """
        |SELECT TIMESTAMP '2024-01-06 00:00:00' AS end_time,
        |       '1day' AS "interval", gtid,
        |       CAST(epoch(date_trunc('second', max(execute_time)))
        |            - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
        |       max(pos) - min(pos) + max_by(size_bytes, pos) AS transaction_size,
        |       CAST(sum(affected_rows) AS BIGINT) AS transaction_affected_rows
        |FROM b
        |WHERE execute_time >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND execute_time < TIMESTAMP '2024-01-06 00:00:00'
        |GROUP BY gtid""".stripMargin),
    "b2_top1_size" -> oracleTop1PerWindow("transaction_size"),
    "b3_top1_rows" -> oracleTop1PerWindow("transaction_affected_rows"),
    "b4_top1_time" -> oracleTop1PerWindow("transaction_spend_time"),
    "b14_txn_assembly" ->
      (oracleBinlogCte + """,
        |m AS (SELECT *, epoch_us(execute_time) AS t_us FROM b),
        |g AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |                          OR t_us - lag(t_us) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_s
        |      FROM m WINDOW w AS (PARTITION BY gtid ORDER BY t_us, pos)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY gtid ORDER BY t_us, pos
        |                                 ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
        |SELECT gtid, min(execute_time) AS start_time, max(execute_time) AS end_time,
        |       CAST(epoch(date_trunc('second', max(execute_time)))
        |            - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
        |       max(pos) - min(pos) + max_by(size_bytes, pos) AS transaction_size,
        |       CAST(sum(affected_rows) AS BIGINT) AS transaction_affected_rows,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY gtid, session_id""".stripMargin),
    "b21_state_replay" ->
      // latest per key via the unique position: max(pos) then join back —
      // the two-step the struct-max resolves in one agg
      (oracleBinlogCte + """,
        |mx AS (SELECT gtid, CAST(count(*) AS BIGINT) AS n_ops, max(pos) AS last_pos
        |       FROM b GROUP BY gtid)
        |SELECT m.gtid, m.n_ops, m.last_pos, b.event_type AS last_op,
        |       b.size_bytes AS last_size
        |FROM mx m JOIN b ON b.gtid = m.gtid AND b.pos = m.last_pos
        |WHERE b.event_type <> 'error'""".stripMargin),
    "b18_ordering_integrity" ->
      (oracleBinlogCte + """,
        |m AS (SELECT gtid, pos,
        |             lag(pos) OVER (PARTITION BY gtid ORDER BY execute_time, pos) AS prev
        |      FROM b)
        |SELECT gtid, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN prev IS NOT NULL AND pos < prev THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_violations
        |FROM m GROUP BY 1""".stripMargin),
    "b16_txn_duration_histogram" ->
      (oracleBinlogCte + """,
        |m AS (SELECT *, epoch_us(execute_time) AS t_us FROM b),
        |g AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |                          OR t_us - lag(t_us) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_s
        |      FROM m WINDOW w AS (PARTITION BY gtid ORDER BY t_us, pos)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY gtid ORDER BY t_us, pos
        |                                 ROWS UNBOUNDED PRECEDING) AS session_id FROM g),
        |txn AS (SELECT CAST(epoch(date_trunc('second', max(execute_time)))
        |               - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
        |               CAST(count(*) AS BIGINT) AS n_events,
        |               CAST(sum(affected_rows) AS BIGINT) AS affected
        |        FROM s GROUP BY gtid, session_id)
        |SELECT transaction_spend_time,
        |       CAST(count(*) AS BIGINT) AS n_transactions,
        |       CAST(sum(n_events) AS BIGINT) AS total_events,
        |       CAST(sum(affected) AS BIGINT) AS total_affected_rows
        |FROM txn GROUP BY 1""".stripMargin),
    "b15_binary_decode" ->
      """SELECT event_id AS binlog_pos,
        |       epoch_ms(CAST(ts AS TIMESTAMP)) AS execute_ms,
        |       CAST(user_id AS VARCHAR) AS gtid,
        |       event_type,
        |       CAST(floor(value) AS BIGINT) AS size_bytes,
        |       (event_id % 10) + 1 AS affected_rows
        |FROM events""".stripMargin,
    "b5_mv_daily_counts" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS event_count
        |FROM events GROUP BY 1, 2""".stripMargin,
    "b6_mv_daily_table_counts" ->
      """SELECT CAST(ts AS DATE) AS day,
        |       'db' || (user_id % 4) AS "schema",
        |       't' || (event_id % 8) AS "table",
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS event_count
        |FROM events GROUP BY 1, 2, 3, 4""".stripMargin,
    "b27_dml_mix" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day,
        |                  'db' || (user_id % 4) AS "schema",
        |                  't' || (event_id % 8) AS "table",
        |                  event_type,
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2, 3, 4)
        |SELECT day, "schema", "table", event_type, n_events,
        |       CAST((1000000 * n_events)
        |              // sum(n_events) OVER (PARTITION BY day, "schema", "table")
        |            AS BIGINT) AS share_ppm
        |FROM c""".stripMargin,
    "b7_ingest_flatten" ->
      """SELECT CAST(event_id AS VARCHAR) AS binlog_pos,
        |       event_type,
        |       CASE WHEN CAST(props->>'k' AS INTEGER) > 50 THEN 1 ELSE 0 END AS is_ddl,
        |       date_trunc('second', CAST(ts AS TIMESTAMP)) AS execute_time_sec,
        |       CAST(ts AS TIMESTAMP) AS execute_time,
        |       CAST(user_id AS VARCHAR) AS gtid,
        |       CAST(1 AS BIGINT) AS single_statement_affected_rows,
        |       CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS single_statement_size,
        |       CAST(props->>'k' AS INTEGER) AS k
        |FROM events WHERE event_type <> 'error'""".stripMargin,
    "b8_mv_resum" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS event_count
        |FROM events GROUP BY 1, 2""".stripMargin,
    "b30_histogram_mv" ->
      // the DIRECT percentile over raw rows — the MV's daily partials must
      // re-sum to exactly this (mergeable-histogram claim); t19's oracle
      // idiom at p50/p95
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.event_type, p, min(v) AS pct_cents, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.event_type = cum.event_type
        |JOIN (VALUES (0.5), (0.95)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "b9_retention_window" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >=
        |      (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAY
        |GROUP BY 1""".stripMargin,
    "b10_enum_roundtrip" ->
      """SELECT event_id, event_type,
        |       CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 WHEN 'error' THEN 5 END AS type_id,
        |       event_type AS type_name,
        |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS event_time_str
        |FROM events""".stripMargin,
    "b11_sliding_counts" ->
      """SELECT make_timestamp(CAST(s AS BIGINT) * 1000000) AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT unnest([CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT),
        |                     CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 - 300 AS BIGINT)]) AS s,
        |             event_type
        |      FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "b19_window_funnel" ->
      """WITH s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |            FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(s1.t1) AS t1, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |         AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 604800 SECOND
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(s2.t1) AS t1, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |         AND CAST(e.ts AS TIMESTAMP) <= s2.t1 + INTERVAL 604800 SECOND
        |       GROUP BY 1),
        |lv AS (SELECT user_id, 1 AS level FROM s1
        |       UNION ALL SELECT user_id, 2 FROM s2
        |       UNION ALL SELECT user_id, 3 FROM s3)
        |SELECT CAST(level AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_users
        |FROM (SELECT user_id, max(level) AS level FROM lv GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "b20_cohort_retention" ->
      """WITH fs AS (SELECT user_id,
        |              min(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
        |            FROM events GROUP BY 1),
        |aw AS (SELECT DISTINCT user_id,
        |              date_trunc('week', CAST(ts AS TIMESTAMP)) AS active_week
        |       FROM events)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
        |       CAST(datediff('day', cohort_week, active_week) // 7 AS BIGINT) AS week_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM aw JOIN fs USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "b22_peak_concurrency" ->
      // b12's sessions → ±1 boundary deltas netted per timestamp (half-open
      // [start, end): concurrency AT t is prev + net) → running sum →
      // per-day max; the oracle's global window is our three-level scan
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT user_id, t,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |sess AS (SELECT user_id, min(t) AS st, max(t) + INTERVAL 30 MINUTE AS en
        |         FROM s GROUP BY user_id, sid),
        |pts AS (SELECT st AS t, 1 AS delta FROM sess
        |        UNION ALL SELECT en, -1 FROM sess),
        |byts AS (SELECT t, sum(delta) AS net,
        |                sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS starts,
        |                sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS ends
        |         FROM pts GROUP BY t),
        |run AS (SELECT t, starts, ends,
        |               sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS open_after
        |        FROM byts)
        |SELECT CAST(t AS DATE) AS day,
        |       CAST(max(open_after) AS BIGINT) AS peak_concurrent,
        |       CAST(sum(starts) AS BIGINT) AS sessions_started,
        |       CAST(sum(ends) AS BIGINT) AS sessions_ended
        |FROM run GROUP BY 1""".stripMargin,
    "b23_transition_matrix" ->
      """WITH p AS (SELECT event_type AS from_type,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |           FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
        |       CAST((1000000 * n) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
        |FROM c""".stripMargin,
    "b25_hourly_profile" ->
      """WITH h AS (SELECT event_type,
        |                  CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, hour, n_events,
        |             row_number() OVER (PARTITION BY event_type
        |               ORDER BY n_events DESC, hour ASC) AS rn,
        |             sum(n_events) OVER (PARTITION BY event_type) AS total
        |      FROM h)
        |SELECT event_type, hour AS peak_hour, n_events AS peak_events,
        |       CAST(total AS BIGINT) AS total_events
        |FROM r WHERE rn = 1""".stripMargin,
    "b24_new_users" ->
      """WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
        |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM fs GROUP BY 1),
        |ac AS (SELECT CAST(ts AS DATE) AS day,
        |              CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |       FROM events GROUP BY 1)
        |SELECT ac.day, active_users, coalesce(new_users, 0) AS new_users,
        |       CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY ac.day
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM ac LEFT JOIN nu ON nu.day = ac.day""".stripMargin,
    "b26_props_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |       CAST(sum(v) AS BIGINT) AS sum_v,
        |       CAST(min(v) AS BIGINT) AS min_v,
        |       CAST(max(v) AS BIGINT) AS max_v
        |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS v FROM events)
        |GROUP BY 1""".stripMargin,
    "b17_table_trends" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |                      't' || (event_id % 8) AS "table",
        |                      CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1, 2)
        |SELECT "table", day, n_events,
        |       CAST(sum(n_events) OVER (PARTITION BY "table" ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
        |       CAST(sum(n_events) OVER w7 AS DOUBLE) / count(*) OVER w7 AS ma7,
        |       CAST(n_events - coalesce(lag(n_events) OVER (PARTITION BY "table" ORDER BY day), 0)
        |            AS BIGINT) AS delta
        |FROM daily
        |WINDOW w7 AS (PARTITION BY "table" ORDER BY day
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "b12_session_windows" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT user_id, t,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(t) AS session_start,
        |       max(t) + INTERVAL 30 MINUTE AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "b13_approx_distinct" ->
      // only the deterministic columns: the engine-specific HLL estimate
      // stays inside the query's assert_true bound (sketch_ok ≡ the assert
      // passed on every group — the oracle's literal true matches iff the
      // Spark side didn't raise)
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       true AS sketch_ok
        |FROM events GROUP BY 1, 2""".stripMargin,
    "b31_countmin_checked" ->
      // the count-min sketch is pure integer arithmetic over literal hash
      // constants, so — unlike b13's HLL — the ESTIMATE itself is
      // oracle-hashable: both engines build the identical 4×256 sketch
      """WITH h(r, a, b) AS (VALUES
        |  (0, 1299709, 104729), (1, 15485863, 32452843),
        |  (2, 982451653, 715225739), (3, 179424673, 373587883)),
        |cells AS (SELECT h.r, ((e.user_id * h.a + h.b) % 2147483647) % 256 AS bucket
        |          FROM events e CROSS JOIN h),
        |s AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
        |      FROM cells GROUP BY 1, 2),
        |k AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events
        |      FROM events GROUP BY 1),
        |est AS (SELECT k.key, k.n_events, CAST(min(s.c) AS BIGINT) AS cm_est
        |        FROM k CROSS JOIN h
        |        JOIN s ON s.r = h.r
        |         AND s.bucket = ((k.key * h.a + h.b) % 2147483647) % 256
        |        GROUP BY 1, 2)
        |SELECT key AS user_id, n_events, cm_est,
        |       cm_est - n_events AS overcount, TRUE AS sketch_ok
        |FROM est ORDER BY n_events DESC, user_id ASC LIMIT 20""".stripMargin,
    "b32_countmin_merged_probe" ->
      // two-level build (per-event_type partials, then the additive
      // merge) and a LEFT join with absent cells coalesced to 0 — the
      // absent probe keys (max+1…max+5) must read their true minimum
      """WITH h(r, a, b) AS (VALUES
        |  (0, 1299709, 104729), (1, 15485863, 32452843),
        |  (2, 982451653, 715225739), (3, 179424673, 373587883)),
        |par AS (SELECT e.event_type AS slice, h.r,
        |               ((e.user_id * h.a + h.b) % 2147483647) % 256 AS bucket,
        |               CAST(count(*) AS BIGINT) AS c
        |        FROM events e CROSS JOIN h GROUP BY 1, 2, 3),
        |s AS (SELECT r, bucket, CAST(sum(c) AS BIGINT) AS c
        |      FROM par GROUP BY 1, 2),
        |present AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events
        |            FROM events WHERE user_id % 97 = 0 GROUP BY 1),
        |ab AS (SELECT (SELECT max(user_id) FROM events) + i AS key,
        |              CAST(0 AS BIGINT) AS n_events
        |       FROM range(1, 6) t(i)),
        |probe AS (SELECT * FROM present UNION ALL SELECT * FROM ab),
        |est AS (SELECT p.key, p.n_events,
        |               CAST(min(coalesce(s.c, 0)) AS BIGINT) AS cm_est
        |        FROM probe p CROSS JOIN h
        |        LEFT JOIN s ON s.r = h.r
        |         AND s.bucket = ((p.key * h.a + h.b) % 2147483647) % 256
        |        GROUP BY 1, 2)
        |SELECT CAST(key AS BIGINT) AS user_id, n_events, cm_est,
        |       cm_est - n_events AS overcount, TRUE AS sketch_ok
        |FROM est ORDER BY user_id""".stripMargin,
    "b29_id_gaps" ->
      // the naive single-window form IS the oracle; the engine's bucket
      // decomposition must reproduce it exactly
      """WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_id FROM events),
        |g AS (SELECT day, event_id,
        |             event_id - lag(event_id) OVER (PARTITION BY day ORDER BY event_id) - 1 AS gp
        |      FROM e)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(min(event_id) AS BIGINT) AS min_id,
        |       CAST(max(event_id) AS BIGINT) AS max_id,
        |       CAST(coalesce(sum(CASE WHEN gp > 0 THEN gp END), 0) AS BIGINT) AS n_missing,
        |       CAST(coalesce(sum(CASE WHEN gp > 0 THEN 1 END), 0) AS BIGINT) AS n_gaps,
        |       CAST(coalesce(max(CASE WHEN gp > 0 THEN gp END), 0) AS BIGINT) AS max_gap
        |FROM g GROUP BY day""".stripMargin,
    "b28_write_anomalies" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT *,
        |        CAST(count(n_events) OVER w AS BIGINT) AS trail_n,
        |        CAST(sum(n_events) OVER w AS BIGINT) AS trail_sum,
        |        CAST(sum(n_events * n_events) OVER w AS BIGINT) AS trail_sumsq
        |      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |x AS (SELECT *, 7 * n_events - trail_sum AS dev FROM t WHERE trail_n = 7)
        |SELECT day, event_type, n_events, trail_sum,
        |       CASE WHEN dev * dev > 9 * (7 * trail_sumsq - trail_sum * trail_sum)
        |            THEN CASE WHEN dev > 0 THEN 'high' ELSE 'low' END
        |            ELSE 'normal' END AS direction
        |FROM x""".stripMargin
  )
}
