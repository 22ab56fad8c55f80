package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

import graft.binlog.{BinlogEvents, DailyCounts, Ingest, TransactionStats}
import graft.ops.{Dedup, TextOps, Vectors, Vocab}

/** Driver contract (SURVEY.md §7): the complete query surface of the engine,
  * each entry paired with equivalent ANSI SQL for the DuckDB oracle.
  *
  * Naming convention: `b*` = binlog-parity surface (reference operators,
  * SURVEY.md §2), `t*` = generic relational operators over the TPC-H-ish
  * tables, `d*` = dedup, `s*` = similarity search, `x*` = text analysis.
  *
  * Oracle determinism rules used throughout (SURVEY.md §5, FIXTURES.md §4):
  * every aggregate is either integer-exact (counts, sums of longs, money in
  * cents via `round(x*100)`) or an identically-ordered double expression;
  * every top-k has a total-order tie-break; timestamps are truncated to
  * seconds before subtraction (CH DateTime parity) and written as
  * TIMESTAMP_NTZ (see Verify) so both sides compare wall-clock UTC values.
  */
object SparkEntry {

  /** Binlog-shaped view of `events` — FIXTURES.md §1 role mapping. */
  private def binlog(s: SparkSession, dir: String): DataFrame =
    BinlogEvents.load(s, dir)

  /** The shared mapping CTE for binlog-surface oracles. */
  private val oracleBinlogCte: String =
    """WITH b AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS execute_time,
      |         CAST(user_id AS VARCHAR) AS gtid,
      |         event_type,
      |         event_id AS pos,
      |         CAST(floor(value) AS BIGINT) AS size_bytes,
      |         (event_id % 10) + 1 AS affected_rows
      |  FROM events)""".stripMargin

  private val oracleTxnAggCte: String =
    oracleBinlogCte + """,
      |agg AS (
      |  SELECT time_bucket(INTERVAL '5 minutes', execute_time) + INTERVAL '5 minutes' AS end_time,
      |         '5min' AS "interval", gtid,
      |         CAST(epoch(date_trunc('second', max(execute_time)))
      |              - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
      |         max(pos) - min(pos) + max_by(size_bytes, pos) AS transaction_size,
      |         CAST(sum(affected_rows) AS BIGINT) AS transaction_affected_rows
      |  FROM b GROUP BY 1, 3)""".stripMargin

  private def oracleTop1PerWindow(metric: String): String =
    oracleTxnAggCte + s"""
      |SELECT end_time, "interval", gtid, transaction_spend_time,
      |       transaction_size, transaction_affected_rows
      |FROM (SELECT *, row_number() OVER (PARTITION BY end_time
      |        ORDER BY $metric DESC, gtid DESC) AS rn FROM agg)
      |WHERE rn = 1""".stripMargin

  private val rangeStart = Timestamp.valueOf("2024-01-05 00:00:00")
  private val rangeEnd = Timestamp.valueOf("2024-01-06 00:00:00")

  /** Flagship (driver smoke-checks rows > 0 on sf0.001): all-windows top-1
    * transaction by size — the reference's headline query
    * (`compute_transaction_info.py:53-66`) in its batch-backfill form.
    */
  def entry(spark: SparkSession): DataFrame =
    TransactionStats.top1PerWindow(binlog(spark, "/root/testdata/sf0.001"), "transaction_size")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binlog-parity surface (SURVEY.md §2) ----
    "b1_txn_stats" -> ((s, dir) =>
      TransactionStats.forRange(binlog(s, dir), rangeStart, rangeEnd, "1day")),
    "b2_top1_size" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_size")),
    "b3_top1_rows" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_affected_rows")),
    "b4_top1_time" -> ((s, dir) =>
      TransactionStats.top1PerWindowViaRowNumber(binlog(s, dir), "transaction_spend_time")),
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

    // ---- generic relational surface (TPC-H-ish) ----
    "t1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_c"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
            .as("sum_disc_c"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")) * 100).cast("long")).as("sum_charge_c"),
          count(lit(1)).as("n_rows"))),
    "t2_join_topn" -> ((s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-06-01"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > lit("1998-06-01"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
          .as("revenue_c"))
        .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue_c"))
        .orderBy(col("revenue_c").desc, col("l_orderkey").asc)
        .limit(10)),
    "t3_broadcast_agg" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(F.broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(F.broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_c"))),
    "t4_window_topn" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("rank").cast("long").as("rank"))
    }),
    "t5_anti_join" -> ((s, dir) =>
      // customers with no large order — anti join against a filtered build side
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))),
    "t6_distinct_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))),

    // ---- dedup surface ----
    "d1_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),

    // ---- text analysis ----
    "x1_token_stats" -> ((s, dir) => TextOps.tokenStats(Tables.documents(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
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
    "t1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,
    "t2_join_topn" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_c DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "t3_broadcast_agg" ->
      """SELECT r_name, n_name,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "t4_window_topn" ->
      """SELECT c_nationkey, c_custkey,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
        |       CAST(rank AS BIGINT) AS rank
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |             row_number() OVER (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
        |      FROM customer)
        |WHERE rank <= 3""".stripMargin,
    "t5_anti_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1""".stripMargin,
    "t6_distinct_agg" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id,
        |       CAST(count(*) AS BIGINT) AS n_copies,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents GROUP BY text""".stripMargin,
    "x1_token_stats" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS mean_token_len,
        |       CAST(len(list_filter(string_split(text, ' '),
        |              t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS n_stopwords
        |FROM documents""".stripMargin
  )
}
