package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._
import graft.binlog.{BinlogEvents, DailyCounts, Ingest, TransactionStats}
import graft.ops.{Dedup, TextOps, Vectors, Vocab}

import RegistryLib._

/** The generic relational / window / graph surface over the TPC-H-ish tables — one slice of the
  * [[SparkEntry]] registry (round-7 verdict #7: the single-file registry
  * split by query-name prefix). Names, query semantics, and oracle
  * strings are verbatim from the pre-split registry; [[SparkEntry]]
  * merges the per-domain maps, so the driver contract is unchanged.
  */
private[graft] object RegistryT {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t49_share_rollup" -> ((s, dir) =>
      // percent-of-parent at two levels: table-in-schema and schema-in-day
      // ppm shares on one metadata-sized count frame
      DailyCounts.shareRollup(
        Tables.events(s, dir)
          .withColumnRenamed("ts", "execute_time")
          .withColumn("schema", concat(lit("db"), pmod(col("user_id"), lit(4))))
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        "schema", "table")),
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
    "t7_semi_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))),
    "t8_set_ops" -> ((s, dir) => {
      val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val bigSpenders = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
        .select(col("o_custkey").as("custkey"))
      val building = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      rich.intersect(bigSpenders).except(building)
    }),
    "t9_rollup" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(F.broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(F.broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_c"))),
    "t27_unpivot" -> ((s, dir) =>
      // wide→long reshaping (melt): the per-language report card unpivoted
      // to (lang, metric, value) rows — the Expand-based generator shape,
      // metadata-sized input after the first aggregation
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          max(col("n_chars")).as("max_chars"))
        .unpivot(Array(col("lang")),
          Array(col("n_docs"), col("total_chars"), col("max_chars")),
          "metric", "value")),
    "t28_sql_simhash" -> ((s, dir) => {
      // the round-4 codegen expression on the registered-extension SQL
      // surface (t21 pattern): plain spark.sql produces bit-identical
      // fingerprints to the DataFrame path — same oracle as d5
      Tables.documents(s, dir).createOrReplaceTempView("documents_sql2")
      s.sql("""
        SELECT doc_id,
               simhash_bits(token_hash_array(split(text, ' ')), 16) AS simhash
        FROM documents_sql2""")
    }),
    "t26_outer_join" -> ((s, dir) =>
      // LEFT OUTER with the filter INSIDE the join condition (the planner
      // case where pushing it to WHERE would wrongly drop unmatched left
      // rows): regions keep a row even with zero A-named nations, and the
      // null-aware count(col) makes the zero visible
      Tables.region(s, dir)
        .join(Tables.nation(s, dir).filter(col("n_name").startsWith("A")),
          col("r_regionkey") === col("n_regionkey"), "left")
        .groupBy(col("r_name"))
        .agg(count(col("n_name")).as("n_a_nations"))),
    "t24_grouping_sets" -> ((s, dir) =>
      // two independent one-column breakdowns in ONE pass — the
      // grouping-sets shape neither rollup (t9) nor cube (t15) expresses;
      // Expand multiplies rows map-side, then one partial-agg'd shuffle
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))),
    "t10_in_subquery" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir).filter(col("c_acctbal") > 9000),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))),
    "t11_cast_order_topk" -> ((s, dir) =>
      // O4: sort keyed on CAST(binlog_pos AS BIGINT) — the reference's
      // ORDER BY toUInt32(binlog_pos) (mon_mysql_dml.py:279). The top-100
      // SET differs under lexicographic order ('1','10','100',…), so the
      // oracle attests the cast ordering; orderBy+limit plans as
      // TakeOrderedAndProject (distributed top-k, no full sort)
      binlog(s, dir)
        .select(col("binlog_pos"), BinlogEvents.pos.as("pos_num"), col("gtid"))
        .orderBy(BinlogEvents.pos.asc, col("gtid").asc)
        .limit(100)),
    "t12_asof_join" -> ((s, dir) => {
      // as-of: each event picks the user's most recent order on or before
      // the event time (ties by largest orderkey)
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.operators.AsOfJoin
        .asOf(ev, ord, Seq("user_id"), "ts", "o_orderdate", "o_orderkey", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("asof_o_orderkey").as("last_orderkey"))
    }),
    "t39_asof_tolerance" -> ((s, dir) => {
      // tolerance-bounded as-of (click→view attribution): each click takes
      // the same user's most recent view ONLY if it happened within 6 h —
      // staler matches go NULL instead of attributing to the distant past
      // (feature-freshness semantics; one projection over the t12 scan)
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
      graft.operators.AsOfJoin
        .asOfWithin(clicks, views, Seq("user_id"), "ts", "vts", "view_id",
          Seq("view_id"), toleranceSec = 6L * 3600L)
        .select(col("event_id"), col("user_id"),
          col("asof_view_id").as("attributed_view"))
    }),
    "t45_asof_nearest" -> ((s, dir) => {
      // merge_asof(direction='nearest'): each event takes the user's order
      // closest in time EITHER direction (equal distances → backward);
      // same union-and-scan as t12, two running frames, zero extra joins
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.operators.AsOfJoin
        .asOfNearest(ev, ord, Seq("user_id"), "ts", "o_orderdate",
          "o_orderkey", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderkey").as("nearest_orderkey"))
    }),
    "t18_band_join" -> ((s, dir) => {
      // keyless range join via time-axis binning (one day's clicks ×
      // views within ±1 h) — a cross join with a range filter would be
      // O(n²) and keyless; binning restores an equi-join key
      val d = Tables.events(s, dir)
        .filter(to_date(col("ts")) === lit(java.sql.Date.valueOf("2024-01-05")))
      val a = d.filter(col("event_type") === "click")
        .select(col("event_id").as("a_id"), col("ts").as("a_ts"))
      val b = d.filter(col("event_type") === "view")
        .select(col("event_id").as("b_id"), col("ts").as("b_ts"))
      graft.operators.RangeJoin.band(a, b, "a_ts", "b_ts", tolSec = 3600L)
        .select(col("a_id"), col("b_id"))
    }),
    "t13_having" -> ((s, dir) =>
      // HAVING: only nations with enough customers
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_c"))
        .filter(col("n_customers") >= 20)),
    "t14_case_pivot" -> ((s, dir) =>
      // manual pivot: per-priority order-status counts in one pass
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast("long").as("n_p"))),
    "t15_cube" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(F.broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))),
    "t38_grouping_sets" -> ((s, dir) =>
      // arbitrary grouping-set lattice — the general form t9's ROLLUP and
      // t15's CUBE are shorthands of: per-(status, priority), per-status,
      // and grand-total slices in ONE pass (Catalyst Expand: each input
      // row fans out once per set, then a single hash aggregate — no
      // re-scan per slice, partial aggs map-side as usual)
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")) * 100).cast("long").as("total_cents"))),
    "t16_above_avg" -> ((s, dir) => {
      // customers above their nation's mean balance — integer-exact form:
      // cents*count > sum(cents) avoids cross-engine double averaging
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c_nationkey"))
      Tables.customer(s, dir)
        .withColumn("acctbal_c", round(col("c_acctbal") * 100).cast("long"))
        .withColumn("_sum", sum(col("acctbal_c")).over(w))
        .withColumn("_cnt", count(lit(1)).over(w))
        .filter(col("acctbal_c") * col("_cnt") > col("_sum"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_above"))
    }),
    "t17_salted_agg" -> ((s, dir) =>
      // skew-safe two-phase aggregation ≡ direct groupBy().count()
      graft.operators.Skew.saltedCount(
        Tables.events(s, dir), Seq("event_type"), salts = 32, countCol = "n_events")),
    "t20_salted_join" -> ((s, dir) => {
      // manual skew join: events (skewed fact) × customer-keyed dim via
      // (key, salt) — result ≡ the plain inner join (the oracle); a hot
      // user's rows spread over `salts` reducers instead of stalling one
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))
      val users = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(ev, users, "user_id", salts = 8)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value_cents")).as("cents"))
    }),
    "t21_sql_surface" -> ((s, dir) => {
      // the registered-extension SQL surface: the same engine functions
      // (token_hash / token_hash_array / shingle_hash) driven from plain
      // spark.sql over a temp view — what a SQL-first user of the library
      // writes; results hash-match the DataFrame path's oracle arithmetic
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql(s"""
        SELECT doc_id,
               token_hash(text) AS text_id,
               CAST(size(shingle_hash(token_hash_array(split(text, ' ')), 5)) AS BIGINT)
                 AS n_shingles
        FROM documents_v""")
    }),
    "t22_event_gaps" -> ((s, dir) =>
      // LAG over a per-user total order (ts, event_id), aggregated per
      // event_type in integer microseconds — the cadence/latency dashboard
      // query; one shuffle for the window, map-side-combined agg after
      graft.operators.Windows.interEventGaps(Tables.events(s, dir))),
    "t19_percentiles" -> ((s, dir) => {
      // exact discrete percentiles (p50/p90/p99 of value-cents per type) in
      // the histogram-compressed form: pre-aggregate counts per (group,
      // value) — map-side combinable, collapses duplicate values — then one
      // cumulative window over the compressed histogram, not the raw rows.
      // At 100 TB the histogram is bounded by the value domain (distinct
      // cents), so the window input is orders of magnitude below row count;
      // the percentile is the smallest value whose running count reaches
      // ⌈p·n⌉ (no float interpolation — cross-engine exact).
      graft.operators.Percentiles.discrete(Tables.events(s, dir), "event_type",
        round(col("value") * 100).cast("long"), Seq(0.5, 0.9, 0.99), "pct_cents")
    }),
    "t48_ltv_deciles" -> ((s, dir) =>
      // scale-correct ntile: exact decile thresholds from the compressed
      // spend histogram, 9 unrolled codegen comparisons assign buckets —
      // no global sort anywhere
      graft.operators.Percentiles.decileReport(
        Tables.orders(s, dir).groupBy(col("o_custkey"))
          // cast per-order cents to long BEFORE summing: a double sum's
          // accumulation order is engine-dependent at the ulp
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend_c")),
        col("spend_c"))),
    "t44_mad" -> ((s, dir) => {
      // robust dispersion: exact lower-median of |x − median| per type,
      // both medians over value-domain-compressed histograms (t19 ×2)
      graft.operators.Percentiles.mad(Tables.events(s, dir), "event_type",
        round(col("value") * 100).cast("long"), "mad_cents")
    }),
    "t50_sliding_distinct" -> ((s, dir) =>
      // unique users per 15-min window refreshed every 5: the distinct
      // twin of b11 — Expand + two-phase agg, partial dedup before shuffle
      graft.operators.Windows.slidingDistinct(Tables.events(s, dir))),
    "t29_range_frames" -> ((s, dir) => {
      // the RANGE-framed twin of t23's ROWS windows: a calendar-correct
      // trailing-7-day sum (value-range frame over day numbers — skips
      // in the date series shrink the window, where a ROWS frame would
      // silently reach further back); days_observed exposes the width
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("day_num",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      val cal = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day_num"))
        .rangeBetween(-6, 0)
      daily.select(col("event_type"), col("day"), col("n_events"),
        sum(col("n_events")).over(cal).as("sum7_cal"),
        count(lit(1)).over(cal).cast("long").as("days_observed"))
    }),
    "t30_bloom_semi" -> ((s, dir) => {
      // runtime Bloom-filter pruning: lineitem ⋉ (brand-filtered part).
      // The bitmap is one bounded-size aggregation over the small side,
      // broadcast as a literal and probed with codegen'd built-ins INSIDE
      // the lineitem scan — at 100 TB only the ~selectivity fraction of
      // lineitem reaches the exact semi join's shuffle. Result is exactly
      // the plain IN-subquery (the oracle).
      val smallParts = Tables.part(s, dir).filter(col("p_brand") === "Brand#13")
      graft.operators.BloomFilter
        .semiJoin(Tables.lineitem(s, dir), smallParts, "l_partkey", "p_partkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"))
    }),
    "t31_zorder_key" -> ((s, dir) => {
      // Morton-interleaved clustering key (K7/O3 taken to two dimensions):
      // sorting by z bounds BOTH p_size and the hash dimension per file,
      // so min/max skipping prunes on either predicate — a single-column
      // sort only ever prunes its leading column. The key arithmetic is
      // pure built-in bit ops (one WSCG span) and oracle-attested
      val p = Tables.part(s, dir).select(col("p_partkey"),
        col("p_size").cast("long").as("x"), (col("p_partkey") % 4096).as("y"))
      p.select(col("p_partkey"), col("x"), col("y"),
          graft.operators.ZOrder.zValue(col("x"), col("y")).as("z"))
        .orderBy(col("z"), col("p_partkey"))
        .limit(100)
    }),
    "t32_pagerank" -> ((s, dir) => {
      // PageRank over the part↔supplier co-occurrence graph (bipartite,
      // node ids disambiguated by parity). Fixed 5 rounds of join+agg;
      // adjacency persists once, only the node-sized rank frame iterates —
      // the weighted companion of the d7/d9 component machinery
      val edges = Tables.lineitem(s, dir).select(
        (col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      // ranks are order-dependent float sums (not bit-stable across
      // engines); parts-per-billion rounding makes the compare integer-
      // exact — FP noise is ~1e-15 relative, 5 orders below the quantum
      graft.operators.Graph.pageRank(edges, iterations = 5)
        .select(col("node"), round(col("rank") * lit(1e9)).cast("long").as("rank_ppb"))
    }),
    "t40_triangles" -> ((s, dir) => {
      // per-node triangle counts over the part co-purchase graph (parts
      // sharing an order). Degree-ordered orientation bounds wedge work by
      // the oriented out-degree (O(arboricity) per node): a part in every
      // order generates zero wedges because all its edges point into it —
      // the skew armor the hot-shingle df cap gives the dedup surface,
      // applied to graph enumeration. One ship-year window: co-purchase
      // projections densify quadratically with basket overlap, so the
      // analysis window — not the operator — is what bounds graph density
      // (full-history edges at sf0.1 already cost 40M wedges; 100 TB of
      // them would be the graph the orientation alone can't save)
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      graft.operators.Graph.triangleCounts(edges)
    }),
    "t42_kcore" -> ((s, dir) => {
      // the 3-core of the same ship-year co-purchase graph: where cohesive
      // part clusters live after peeling the long tail. Fixed 8 peel
      // rounds — deterministic and attestable whether or not converged
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      graft.operators.Graph.kCore(edges, k = 3, rounds = 8)
    }),
    "t52_label_prop" -> ((s, dir) => {
      // community detection on the ship-year co-purchase graph — the
      // missing member of the graph suite (CC: membership, PageRank:
      // centrality, k-core: cohesion, LPA: dense regions). Synchronous
      // label propagation, 4 fixed rounds; the per-node argmax is the
      // integer encoding max(cnt·K + (K−1−label)), so ties break to the
      // smallest label identically on both engines — no max_by bet
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      graft.operators.Graph.labelPropagation(edges, rounds = 4)
    }),
    "t55_sssp" -> ((s, dir) => {
      // weighted blast radius (Bellman–Ford, fixed 4 rounds): hop cost =
      // 10⁶ div shared-order-count, so strong co-purchase ties are cheap
      // corridors — t53 counts hops, this weighs them; integer weights
      // keep every distance cross-engine exact
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .groupBy(col("pk").as("src"), col("pk2").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"), expr("1000000 div cnt").as("w"))
      val seeds = Tables.part(s, dir).filter(col("p_size") === 50)
        .select(col("p_partkey").as("node"))
      graft.operators.Graph.ssspDistances(edges, seeds, rounds = 4)
    }),
    "t54_decayed_trend" -> ((s, dir) =>
      // "trending now": per-type activity with yesterday worth half of
      // today — integer 2^-age weights (a right shift, no float pow), so
      // the score is cross-engine exact; counts reduce per (type, day)
      // before any weighting touches them
      graft.operators.Windows.decayedTrend(Tables.events(s, dir))),
    "t53_bfs_reach" -> ((s, dir) => {
      // blast radius: exact hop distance (≤ 4) from the size-50 parts
      // through the ship-year co-purchase graph — multi-source BFS with a
      // fixed horizon; monotone min-relaxation makes extra rounds
      // idempotent, so the fixed count is safe, not merely attestable
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      val seeds = Tables.part(s, dir).filter(col("p_size") === 50)
        .select(col("p_partkey").as("node"))
      graft.operators.Graph.bfsDistances(edges, seeds, rounds = 4)
    }),
    "t56_components" -> ((s, dir) => {
      // connected components over the same relational co-purchase graph —
      // the dedup-group CC machinery applied to the graph suite, checked
      // against an INDEPENDENTLY authored recursive-CTE transitive closure
      // (like t53's hand oracle); group = min part key in the component.
      // STAR directly, not dedupGroupsAuto (round-7 verdict #2): a
      // co-purchase graph is the opposite geometry of near-dup clusters —
      // one giant component whose diameter far exceeds the 4-round
      // propagation cap, so auto always burned 4 wasted rounds before
      // restarting on star (profiled at sf0.1: auto 11.3 s vs star 3.5 s
      // for the same 17k-node output; the hash is algorithm-independent)
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("doc_a"), col("pk2").as("doc_b"))
      Dedup.dedupGroupsStar(edges)
        .select(col("doc_id").as("node"), col("group_id"))
    }),
    "t43_tree_paths" -> ((s, dir) => {
      // hierarchy flattening by pointer doubling: every part resolves to
      // its root and depth in the synthetic decimal-digit forest
      // (parent = key/10) in 4 doubling rounds — ⌈log₂ depth⌉ shuffle
      // stages, not depth sequential joins
      val pf = Tables.part(s, dir).select(col("p_partkey").as("node"),
        when(col("p_partkey") >= 10, expr("p_partkey DIV 10")).as("parent"))
      graft.operators.Graph.treePaths(pf, rounds = 4)
    }),
    "t37_approx_pct_checked" -> ((s, dir) =>
      // the b13 discipline for quantile sketches: percentile_approx runs
      // next to the exact histogram percentiles and RAISES outside the
      // exact ±0.001 quantile window; only deterministic columns return
      graft.operators.Percentiles.discreteChecked(
        Tables.events(s, dir)
          .select(col("event_type"), round(col("value") * 100).cast("long").as("v_c")),
        "event_type", col("v_c"), Seq(0.5, 0.95), "pct_cents")),
    "t46_funnel_latency" -> ((s, dir) =>
      // the question b19's level counts stop short of: exact p50/p90/p99
      // time-to-convert for completed funnels, t19 histogram discipline
      graft.operators.Windows.funnelLatency(Tables.events(s, dir),
        Seq("view", "click", "purchase"), windowSec = 604800L)),
    "t51_attribution" -> ((s, dir) =>
      // first-/last-touch revenue attribution: both touches from ONE
      // per-user RANGE-framed window pass — no events×events lookback join
      graft.operators.Windows.attribution(Tables.events(s, dir))),
    "t47_session_paths" -> ((s, dir) =>
      // top-20 within-session event trigrams: two windows on one per-user
      // sort, metadata-sized trigram count, TakeOrdered
      graft.operators.Windows.sessionPaths(Tables.events(s, dir))),
    "t35_correlated_scalar" -> ((s, dir) => {
      // correlated scalar subquery — Catalyst decorrelates it into an
      // aggregate + left outer join (no per-row re-execution; the t21
      // pattern: plain spark.sql on registered views). Nations with no
      // customer keep a NULL max (coalesced to -1 for the compare)
      Tables.nation(s, dir).createOrReplaceTempView("nation_t35")
      Tables.customer(s, dir).createOrReplaceTempView("customer_t35")
      s.sql("""
        SELECT n_nationkey, n_name,
               coalesce((SELECT CAST(round(max(c_acctbal) * 100) AS BIGINT)
                         FROM customer_t35 WHERE c_nationkey = n_nationkey), -1)
                 AS max_bal_c
        FROM nation_t35""")
    }),
    "t36_offset_windows" -> ((s, dir) => {
      // the offset-window family (lag/lead/first/nth) over each user's
      // event sequence: previous/next event type, session start, second
      // event — one window, one shuffle on user_id, total order by (ts,
      // event_id) so every offset is deterministic
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("event_type")).over(w).as("first_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
    }),
    "t33_full_outer" -> ((s, dir) => {
      // FULL OUTER completes the join-type surface (inner/left/semi/anti
      // already attested): hourly purchases vs errors — sparse enough that
      // both sides contribute unmatched hours, kept with zero-coalesced
      // counts. Both inputs aggregate BEFORE the join (hour-sized frames)
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_purchases"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_errors"))
      purchases.join(errors, Seq("hour"), "full")
        .select(col("hour"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"))
    }),
    "t34_rank_family" -> ((s, dir) => {
      // the rank-normalization window family over customers within each
      // nation: percent_rank / cume_dist are single exact int divisions
      // (bit-stable), ntile buckets are ints; total order via custkey
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),
    "t23_daily_trends" -> ((s, dir) =>
      // cumulative / 7-day moving average / day-over-day delta per type —
      // windows run over the aggregated (day × type) frame, never raw rows
      graft.operators.Windows.dailyTrends(Tables.events(s, dir))),
    "t41_gap_fill" -> ((s, dir) =>
      // dense key × day grid with LOCF: missing days carry the previous
      // close; the LOCF window runs over the spine (keys × days), never
      // over raw events
      graft.operators.Windows.gapFillLocf(Tables.events(s, dir)))
  )

  val oracles: Map[String, String] = Map(
    "t49_share_rollup" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day,
        |                  'db' || (user_id % 4) AS "schema",
        |                  't' || (event_id % 8) AS "table",
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2, 3)
        |SELECT day, "schema", "table", n_events,
        |       CAST((1000000 * n_events)
        |              // sum(n_events) OVER (PARTITION BY day, "schema") AS BIGINT)
        |         AS table_share_ppm,
        |       CAST((1000000 * sum(n_events) OVER (PARTITION BY day, "schema"))
        |              // sum(n_events) OVER (PARTITION BY day) AS BIGINT)
        |         AS schema_share_ppm
        |FROM c""".stripMargin,
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
    "t7_semi_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,
    "t8_set_ops" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "t9_rollup" ->
      """SELECT r_name, n_name,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "t27_unpivot" ->
      """WITH w AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |                  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |                  CAST(max(n_chars) AS BIGINT) AS max_chars
        |           FROM documents GROUP BY lang)
        |SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
        |UNION ALL SELECT lang, 'total_chars', total_chars FROM w
        |UNION ALL SELECT lang, 'max_chars', max_chars FROM w""".stripMargin,
    "t26_outer_join" ->
      """SELECT r_name, CAST(count(n_name) AS BIGINT) AS n_a_nations
        |FROM region
        |LEFT JOIN (SELECT * FROM nation WHERE n_name LIKE 'A%') n
        |  ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin,
    "t24_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin,
    "t10_in_subquery" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY 1""".stripMargin,
    "t13_having" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer GROUP BY 1 HAVING count(*) >= 20""".stripMargin,
    "t14_case_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    "t15_cube" ->
      """SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin,
    "t38_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "t16_above_avg" ->
      """WITH c AS (SELECT c_nationkey,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
        |           FROM customer),
        |n AS (SELECT c_nationkey, sum(acctbal_c) AS s, count(*) AS cnt
        |      FROM c GROUP BY 1)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_above
        |FROM c JOIN n ON c.c_nationkey = n.c_nationkey
        |WHERE c.acctbal_c * n.cnt > n.s
        |GROUP BY 1""".stripMargin,
    "t17_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "t22_event_gaps" ->
      // ns→µs truncation (CAST ts AS TIMESTAMP) matches Tables.events'
      // `ts div 1000`; (us, event_id) is the same total order both engines
      // lag over, and all aggregates are integer µs
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |                epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT event_type,
        |             us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |      FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
        |       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
        |FROM g WHERE gap_us IS NOT NULL GROUP BY event_type""".stripMargin,
    // the salted (key, salt) join is result-identical to the plain inner
    // join — the oracle is the unsalted formulation
    "t20_salted_join" ->
      """SELECT c.c_mktsegment, e.event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(e.value_cents) AS BIGINT) AS cents
        |FROM (SELECT user_id, event_type,
        |             CAST(round(value * 100) AS BIGINT) AS value_cents
        |      FROM events) e
        |JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2""".stripMargin,
    "t21_sql_surface" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1)
         |SELECT d.doc_id,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         [CAST(unicode(c) AS BIGINT) for c in string_split(d.text, '') if c <> '']),
         |         (a, c) -> (a * 131 + c) % 2147483647) AS text_id,
         |       coalesce(cnt.n, CAST(0 AS BIGINT)) AS n_shingles
         |FROM documents d LEFT JOIN cnt ON cnt.doc_id = d.doc_id""".stripMargin
    },
    "t19_percentiles" ->
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
        |JOIN (VALUES (0.5), (0.9), (0.99)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "t48_ltv_deciles" ->
      // identical bounds (lower-percentile thresholds at .1….9 over the
      // spend histogram), identical strictly-greater bucket rule
      """WITH sp AS (SELECT o_custkey,
        |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |            FROM orders GROUP BY 1),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM sp GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h),
        |bnd AS (SELECT p, min(v) AS b
        |        FROM cum, t,
        |             (VALUES (0.1), (0.2), (0.3), (0.4), (0.5),
        |                     (0.6), (0.7), (0.8), (0.9)) ps(p)
        |        WHERE cum >= ceil(p * n) GROUP BY p)
        |SELECT CAST(1 + (SELECT count(*) FROM bnd WHERE sp.v > bnd.b) AS BIGINT) AS decile,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(v) AS BIGINT) AS sum_v
        |FROM sp GROUP BY 1""".stripMargin,
    "t44_mad" ->
      // two lower-median passes over integer histograms (t19's machinery
      // applied to values, then to |x − median|)
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h),
        |med AS (SELECT cum.event_type, min(v) AS med
        |        FROM cum JOIN t ON t.event_type = cum.event_type
        |        WHERE cum >= ceil(0.5 * n) GROUP BY 1),
        |d AS (SELECT v.event_type, med, abs(v.v - med) AS d
        |      FROM v JOIN med ON med.event_type = v.event_type),
        |hd AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
        |td AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM hd GROUP BY 1),
        |cumd AS (SELECT event_type, d,
        |                CAST(sum(c) OVER (PARTITION BY event_type ORDER BY d
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |         FROM hd)
        |SELECT cumd.event_type, min(med.med) AS median, min(d) AS mad_cents,
        |       CAST(min(n) AS BIGINT) AS n_rows
        |FROM cumd
        |JOIN td ON td.event_type = cumd.event_type
        |JOIN med ON med.event_type = cumd.event_type
        |WHERE cum >= ceil(0.5 * n)
        |GROUP BY 1""".stripMargin,
    "t11_cast_order_topk" ->
      """SELECT CAST(event_id AS VARCHAR) AS binlog_pos,
        |       event_id AS pos_num,
        |       CAST(user_id AS VARCHAR) AS gtid
        |FROM events
        |ORDER BY event_id ASC, CAST(user_id AS VARCHAR) ASC
        |LIMIT 100""".stripMargin,
    "t12_asof_join" ->
      """SELECT event_id, user_id,
        |       (SELECT o_orderkey FROM orders
        |        WHERE o_custkey = e.user_id AND o_orderdate <= CAST(e.ts AS TIMESTAMP)
        |        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) AS last_orderkey
        |FROM events e""".stripMargin,
    "t45_asof_nearest" ->
      // nearest by |Δt|; equal distances prefer backward; backward ties →
      // larger orderkey (the asOf contract), forward ties → smaller
      """SELECT event_id, user_id,
        |       (SELECT o_orderkey FROM orders o
        |        WHERE o.o_custkey = e.user_id
        |        ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(CAST(e.ts AS TIMESTAMP))) ASC,
        |                 CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP) THEN 0 ELSE 1 END ASC,
        |                 CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        |                      THEN -o_orderkey ELSE o_orderkey END ASC
        |        LIMIT 1) AS nearest_orderkey
        |FROM events e""".stripMargin,
    "t39_asof_tolerance" ->
      // the within-window most-recent IS the unbounded most-recent when it
      // clears the window (any other row is older) — both forms agree
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vt
        |      FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id,
        |       (SELECT view_id FROM v
        |        WHERE v.user_id = c.user_id AND v.vt <= c.t
        |          AND v.vt >= c.t - INTERVAL 6 HOUR
        |        ORDER BY v.vt DESC, view_id DESC LIMIT 1) AS attributed_view
        |FROM c""".stripMargin,
    "t18_band_join" ->
      // the oracle takes the brute form (DuckDB's IEJoin handles the range
      // predicate); Spark takes the binned equi-join — same pair set
      """WITH d AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS t, event_type FROM events
        |           WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-05'),
        |a AS (SELECT event_id AS a_id, t AS a_t FROM d WHERE event_type = 'click'),
        |b AS (SELECT event_id AS b_id, t AS b_t FROM d WHERE event_type = 'view')
        |SELECT a_id, b_id FROM a, b
        |WHERE abs(epoch_us(a_t) - epoch_us(b_t)) <= 3600000000""".stripMargin,
    "t50_sliding_distinct" ->
      """SELECT make_timestamp(s * 1000000) AS window_start,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT unnest([f, f - 300, f - 600]) AS s, user_id
        |      FROM (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT) AS f,
        |                   user_id
        |            FROM events))
        |GROUP BY 1""".stripMargin,
    "t29_range_frames" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |                      CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num FROM daily)
        |SELECT event_type, day, n_events,
        |       CAST(sum(n_events) OVER w AS BIGINT) AS sum7_cal,
        |       CAST(count(*) OVER w AS BIGINT) AS days_observed
        |FROM d2
        |WINDOW w AS (PARTITION BY event_type ORDER BY day_num
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "t31_zorder_key" ->
      s"""SELECT p_partkey, x, y,
         |       ${graft.operators.ZOrder.zValueSql("x", "y")} AS z
         |FROM (SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
         |             p_partkey % 4096 AS y FROM part)
         |ORDER BY z, p_partkey LIMIT 100""".stripMargin,
    "t32_pagerank" ->
      s"""SELECT node, CAST(round(rank * 1e9) AS BIGINT) AS rank_ppb FROM (
         |${graft.operators.Graph.pageRankSql(
             "SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem",
             iterations = 5)})""".stripMargin,
    // HAND-INDEPENDENT oracle, algorithm-independent of
    // Graph.triangleCounts: the Spark side orients edges by (degree, id)
    // and closes wedges from the low-degree endpoint; this SQL never
    // computes a degree — it enumerates each triangle exactly once as
    // x < y < z via the naive ordered 3-way self-join over the distinct
    // undirected edge set (e1=(x,y), e2=(y,z), e3=(x,z)). An orientation
    // bug on the Spark side (wrong tie-break, wedge double-count) cannot
    // reproduce here.
    "t40_triangles" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_shipdate >= DATE '1995-01-01'
        |              AND l_shipdate < DATE '1996-01-01'),
        |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1
        |        JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT x AS node FROM tri
        |            UNION ALL SELECT y FROM tri
        |            UNION ALL SELECT z FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |FROM corners GROUP BY node""".stripMargin,
    "t42_kcore" ->
      // HAND-INDEPENDENT oracle (round-5 verdict #4, the t53/t56
      // discipline): peeling authored directly here, NOT Graph.kCoreSql's
      // generated unroll — and structurally different: the edge list stays
      // UNDIRECTED (src < dst, never symmetrized) and degrees count both
      // endpoints via UNION ALL, where the Spark side duplicates edges in
      // both directions and counts per src. An algorithmic
      // misunderstanding in the shared formulation cannot pass both sides.
      oracleKcorePeel(
        """SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          |FROM (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') a
          |JOIN (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') b
          |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin,
        k = 3, rounds = 8),
    "t52_label_prop" ->
      // HAND-INDEPENDENT oracle (see oracleLpaRounds): two-step
      // max-count / min-label argmax instead of the shared integer
      // encoding
      oracleLpaRounds(
        """SELECT a.l_partkey AS src, b.l_partkey AS dst
          |FROM (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') a
          |JOIN (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') b
          |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin,
        rounds = 4),
    "t55_sssp" ->
      // HAND-INDEPENDENT oracle (round-5 verdict #4): a recursive CTE with
      // min-aggregation authored directly here — NOT Graph.ssspDistancesSql's
      // unrolled Bellman–Ford. The recursive member enumerates weighted
      // walks of ≤ 4 edges under UNION (set) dedup of (node, dist, hops)
      // states; min(dist) per node over all enumerated walks ≡ 4 relaxation
      // rounds, by the ≤-r-edge-walk characterization of Bellman–Ford —
      // the same result through a different algorithmic expression
      """WITH RECURSIVE yr AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'),
        |wedges AS (
        |  SELECT src, dst, 1000000 // cnt AS w FROM (
        |    SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS BIGINT) AS cnt
        |    FROM yr a JOIN yr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |    GROUP BY 1, 2)),
        |sym AS (SELECT src, dst, w FROM wedges UNION SELECT dst, src, w FROM wedges),
        |walk(node, dist, hops) AS (
        |  SELECT p_partkey, CAST(0 AS BIGINT), 0 FROM part WHERE p_size = 50
        |  UNION
        |  SELECT s.dst, wk.dist + s.w, wk.hops + 1
        |  FROM walk wk JOIN sym s ON s.src = wk.node
        |  WHERE wk.hops < 4)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node""".stripMargin,
    "t53_bfs_reach" ->
      // HAND-INDEPENDENT oracle (round-4 verdict #4): a recursive CTE
      // authored directly here — NOT generated by Graph.scala's unrolled
      // SQL — so the BFS result is checked against an independently
      // expressed algorithm, not a same-module translation. The recursive
      // member uses UNION (set) semantics, so the working set per step is
      // the newly discovered (node, dist) pairs — each node appears at
      // most once per level (≤ 5 rows/node total), never one row per path
      """WITH RECURSIVE yr AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'),
        |edges AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM yr a JOIN yr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |walk(node, dist) AS (
        |  SELECT p_partkey, 0 FROM part WHERE p_size = 50
        |  UNION
        |  SELECT s.dst, w.dist + 1
        |  FROM walk w JOIN sym s ON s.src = w.node
        |  WHERE w.dist < 4)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node""".stripMargin,
    "t43_tree_paths" ->
      // HAND-INDEPENDENT oracle (the t53/t55/t42 discipline, taken
      // further): for THIS forest (parent = key div 10) root and depth
      // have a CLOSED FORM — root is the leading decimal digit, depth is
      // digits−1 — so the pointer-doubling walk is checked against pure
      // digit algebra, sharing no algorithmic structure at all with
      // either the Spark side or Graph.treePathsSql's recursive chase
      // `//` against a DOUBLE divisor is plain double division in DuckDB —
      // the power must become a BIGINT before the floor-div or 150//100.0
      // reads 1.5 and the cast rounds it to 2
      """SELECT p_partkey AS node,
        |       p_partkey // CAST(power(10, length(CAST(p_partkey AS VARCHAR)) - 1)
        |         AS BIGINT) AS root_key,
        |       CAST(length(CAST(p_partkey AS VARCHAR)) - 1 AS BIGINT) AS depth
        |FROM part""".stripMargin,
    "t37_approx_pct_checked" ->
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.event_type, p, min(v) AS pct_cents, CAST(min(n) AS BIGINT) AS n_rows,
        |       TRUE AS sketch_ok
        |FROM cum
        |JOIN t ON t.event_type = cum.event_type
        |JOIN (VALUES (0.5), (0.95)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "t47_session_paths" ->
      // lag-based sessionization (the b12 split rule), trigrams via two
      // leads on the same in-session order, deterministic top-20
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |                       OR t - lag(t) OVER w >= INTERVAL 30 MINUTE
        |                     THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |tri AS (SELECT event_type AS step1,
        |               lead(event_type, 1) OVER w2 AS step2,
        |               lead(event_type, 2) OVER w2 AS step3
        |        FROM s WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY t, event_id))
        |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
        |FROM tri WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
        |LIMIT 20""".stripMargin,
    "t35_correlated_scalar" ->
      """SELECT n_nationkey, n_name,
        |       coalesce((SELECT CAST(round(max(c_acctbal) * 100) AS BIGINT)
        |                 FROM customer WHERE c_nationkey = n_nationkey), -1) AS max_bal_c
        |FROM nation""".stripMargin,
    "t36_offset_windows" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       lag(event_type, 1) OVER w AS prev_type,
        |       lead(event_type, 1) OVER w AS next_type,
        |       first_value(event_type) OVER w AS first_type,
        |       nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)""".stripMargin,
    "t33_full_outer" ->
      """WITH p AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |                  CAST(count(*) AS BIGINT) AS n_purchases
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |             CAST(count(*) AS BIGINT) AS n_errors
        |      FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT coalesce(p.hour, e.hour) AS hour,
        |       coalesce(n_purchases, 0) AS n_purchases,
        |       coalesce(n_errors, 0) AS n_errors
        |FROM p FULL OUTER JOIN e ON p.hour = e.hour""".stripMargin,
    "t34_rank_family" ->
      """SELECT c_custkey, c_nationkey,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin,
    "t30_bloom_semi" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')
        |GROUP BY 1""".stripMargin,
    "t41_gap_fill" ->
      // daily close = max(v) at the day's max ts (the same two-step the
      // struct-max resolves); spine via end-exclusive range over [d0, d1+1)
      """WITH d0 AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, ts,
        |                   CAST(round(value * 100) AS BIGINT) AS v
        |            FROM events),
        |mx AS (SELECT event_type, day, max(ts) AS mt FROM d0 GROUP BY 1, 2),
        |daily AS (SELECT d.event_type, d.day, max(d.v) AS close_c
        |          FROM d0 d JOIN mx ON mx.event_type = d.event_type
        |                            AND mx.day = d.day AND d.ts = mx.mt
        |          GROUP BY 1, 2),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT k.event_type, CAST(g.day AS DATE) AS day
        |          FROM (SELECT DISTINCT event_type FROM daily) k,
        |               (SELECT unnest(range(lo, hi + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS day
        |                FROM span) g)
        |SELECT s.event_type, s.day,
        |       last_value(d.close_c IGNORE NULLS) OVER (
        |         PARTITION BY s.event_type ORDER BY s.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
        |       CAST(d.close_c IS NOT NULL AS INT) AS observed
        |FROM spine s LEFT JOIN daily d
        |  ON d.event_type = s.event_type AND d.day = s.day""".stripMargin,
    "t23_daily_trends" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |                      CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |       CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
        |       CAST(sum(n_events) OVER w7 AS DOUBLE) / count(*) OVER w7 AS ma7,
        |       CAST(n_events - coalesce(lag(n_events) OVER (PARTITION BY event_type ORDER BY day), 0)
        |            AS BIGINT) AS delta
        |FROM daily
        |WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "t28_sql_simhash" -> oracleSimhash,
    "t56_components" ->
      // hand-authored transitive closure (the t53 discipline): symmetrized
      // edges, reachability walk with UNION-set dedup, component id = min
      // reachable node — algorithm-independent of the Spark CC iteration
      """WITH RECURSIVE yr AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'),
        |e0 AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM yr a JOIN yr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT src AS a, dst AS b FROM e0
        |          UNION ALL SELECT dst, src FROM e0),
        |walk AS (SELECT DISTINCT a AS node, a AS reach FROM edges
        |         UNION
        |         SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach)
        |SELECT node, min(reach) AS group_id FROM walk GROUP BY node""".stripMargin,
    "t54_decayed_trend" ->
      // the identical integer shift: 10^6 // 2^min(age, 62); counts reduce
      // per (type, day) first on both engines
      """WITH daily AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |                      CAST(count(*) AS BIGINT) AS n
        |               FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS max_day FROM daily),
        |wtd AS (SELECT event_type, n,
        |               1000000 // (CAST(1 AS BIGINT) << least(
        |                 date_diff('day', day, (SELECT max_day FROM mx)), 62)) AS w
        |        FROM daily)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
        |       CAST(sum(n * w) AS BIGINT) AS trend_ppm
        |FROM wtd GROUP BY 1""".stripMargin,
    "t51_attribution" ->
      // the same struct-min/max-over-RANGE-frame pass; struct comparison
      // is lexicographic (tus, event_id, ch) on both engines
      """WITH e AS (SELECT user_id, event_type, value, event_id,
        |                  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS tus
        |           FROM events),
        |t AS (SELECT *,
        |  min(CASE WHEN event_type IN ('view', 'click', 'signup')
        |        THEN {'tus': tus, 'event_id': event_id, 'ch': event_type} END)
        |    OVER w AS ft,
        |  max(CASE WHEN event_type IN ('view', 'click', 'signup')
        |        THEN {'tus': tus, 'event_id': event_id, 'ch': event_type} END)
        |    OVER w AS lt
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |               RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)),
        |c AS (SELECT value, coalesce(ft['ch'], 'direct') AS first_ch,
        |             coalesce(lt['ch'], 'direct') AS last_ch
        |      FROM t WHERE event_type = 'purchase'),
        |u AS (SELECT 'first' AS kind, first_ch AS channel, value FROM c
        |      UNION ALL SELECT 'last', last_ch, value FROM c)
        |SELECT channel, kind, CAST(count(*) AS BIGINT) AS n_conversions,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM u GROUP BY 1, 2""".stripMargin,
    "t46_funnel_latency" ->
      // b19's staged CTEs, then the t19 percentile machinery over whole-
      // second elapsed times of completed funnels
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
        |v AS (SELECT 'all' AS funnel,
        |             (epoch_us(t3) - epoch_us(t1)) // 1000000 AS v FROM s3),
        |h AS (SELECT funnel, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT funnel, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT funnel, v,
        |               CAST(sum(c) OVER (PARTITION BY funnel ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.funnel, p, min(v) AS pct_sec, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.funnel = cum.funnel
        |JOIN (VALUES (0.5), (0.9), (0.99)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin
  )
}
