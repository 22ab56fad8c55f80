package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Exact discrete percentiles in the histogram-compressed form (the t19
  * pattern, factored for reuse): pre-aggregate counts per (group, value) —
  * map-side combinable, collapses duplicate values — then one cumulative
  * window over the COMPRESSED histogram, never the raw rows. At 100 TB the
  * histogram is bounded by the value domain, so the window input is orders
  * of magnitude below row count; the percentile is the smallest value
  * whose running count reaches ⌈p·n⌉ (no float interpolation —
  * cross-engine exact).
  */
object Percentiles {
  def discrete(df: DataFrame, groupCol: String, value: Column, ps: Seq[Double],
      pctCol: String): DataFrame =
    discreteFromHistogram(
      df.select(col(groupCol), value.as("v"), lit(1L).as("c")),
      groupCol, "v", "c", ps, pctCol)

  /** The same exact percentiles over a PRE-BUILT (group, value, count)
    * histogram — the read side of a mergeable-quantile MV (b30): value
    * histograms are the one quantile "sketch" that merges EXACTLY (counts
    * add), so partials held per day/shard re-sum to the same percentile
    * the raw rows would give, at value-domain-bounded state per group —
    * the A9/b8 re-aggregation discipline applied to quantiles. Duplicate
    * (group, value) rows (one per partial) are merged here.
    */
  def discreteFromHistogram(hist: DataFrame, groupCol: String,
      valueCol: String, cntCol: String, ps: Seq[Double],
      pctCol: String): DataFrame =
    discreteFromHistogramImpl(hist, groupCol, valueCol, cntCol, ps, pctCol,
      preMerged = false)

  /** `preMerged = true` skips the duplicate-(group, value) merge pass and
    * its persist — the caller attests the histogram is ALREADY unique per
    * (group, value) and persisted (the [[mad]] fast path, round-14 ADVICE:
    * re-grouping an already-merged histogram was one redundant exchange +
    * one redundant cached copy per call). Re-grouping a unique histogram
    * is a semantic no-op, so both paths return identical rows.
    */
  private def discreteFromHistogramImpl(hist: DataFrame, groupCol: String,
      valueCol: String, cntCol: String, ps: Seq[Double],
      pctCol: String, preMerged: Boolean): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    // persist: the histogram feeds both the totals and the cumulative
    // window — without it each branch re-scans and re-aggregates the
    // input. (Released by the session/harness cache clear, not here: the
    // result is lazy, so the cached plan must stay live for the consumer.)
    val h =
      if (preMerged) hist.select(col(groupCol), col(valueCol).as("v"),
        col(cntCol).as("c"))
      else hist.groupBy(col(groupCol), col(valueCol).as("v"))
        .agg(sum(col(cntCol)).as("c"))
        .persist()
    val totals = h.groupBy(col(groupCol)).agg(sum(col("c")).as("n"))
    // nulls LAST to match DuckDB's default (Spark defaults nulls first —
    // a null value bucket would shift every cumulative count)
    val w = W.partitionBy(col(groupCol)).orderBy(col("v").asc_nulls_last)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = h.withColumn("cum", sum(col("c")).over(w))
    val psDf = ps.toDF("p")
    cum.join(broadcast(totals), groupCol)
      .join(broadcast(psDf), col("cum") >= ceil(col("p") * col("n")))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("v")).as(pctCol), min(col("n")).as("n_rows"))
  }

  /** Exact median absolute deviation — the robust dispersion statistic —
    * composed from two [[discrete]] median passes: per-group median over
    * the value histogram, then the median of |x − median| over the
    * deviation histogram. Both medians are lower-medians (smallest value
    * whose cumulative count reaches ⌈n/2⌉) over integer domains, so the
    * result is cross-engine exact — no float interpolation anywhere.
    *
    * Scale shape: the group medians frame is group-count-sized and
    * broadcasts back onto the rows for the deviation projection; each
    * median pass is the t19 histogram discipline (windows over the
    * value-domain-compressed histogram, never the raw rows).
    */
  def mad(df: DataFrame, groupCol: String, value: Column,
      madCol: String): DataFrame = {
    // ONE raw-row aggregation feeds BOTH medians (round-13 optimization):
    // the deviation multiset is a pure value transform of the value
    // histogram — |v − med| with the same counts — so the second median
    // runs over the already-compressed histogram instead of re-scanning
    // and re-aggregating the raw rows (the old shape's second corpus
    // pass). Result-identical: fold-by-|·| merges value buckets the
    // re-aggregation inside discreteFromHistogram merges anyway.
    val h = df.select(col(groupCol), value.as("v"), lit(1L).as("c"))
      .groupBy(col(groupCol), col("v"))
      .agg(sum(col("c")).as("c"))
      .persist()
    // preMerged: h is unique per (group, v) by construction (it IS the
    // merge) and persisted above — the round-14 fast path skips the
    // redundant re-group + second cached copy inside the first median
    val med = discreteFromHistogramImpl(h, groupCol, "v", "c", Seq(0.5), "med",
      preMerged = true)
      .select(col(groupCol), col("med"))
    val devHist = h.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(col("v") - col("med")).as("d"), col("c"))
    discreteFromHistogram(devHist, groupCol, "d", "c", Seq(0.5), madCol)
      .join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), col("med").as("median"), col(madCol), col("n_rows"))
  }

  /** Decile assignment at scale — the histogram-threshold form of
    * `ntile(10)`: compute the nine exact decile boundaries over the
    * value-domain-compressed histogram ([[discrete]] at p = 0.1 … 0.9),
    * broadcast them (9 longs), and bucket every row by counting
    * boundaries strictly below its value — a codegen projection, where a
    * windowed ntile would global-sort the whole frame. Ties at a boundary
    * all land in the same decile (deterministic; exact row balance is
    * ntile's contract, not this one's — at 100 TB you want the
    * value-defined buckets anyway, so equal values never split).
    * Output: per decile (1…10), row count and value sum.
    */
  def decileReport(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    val v = df.select(value.as("v"), lit("all").as("g"))
    val bounds = discrete(v, "g", col("v"), (1 to 9).map(_ / 10.0), "b")
      .select(col("b")).collect().map(_.getLong(0)).sorted
    // bounds are driver-side: unroll the bucket test into 9 codegen'd
    // comparisons (no interpreted HOF in the per-row path)
    val decile = bounds
      .map(b => when(col("v") > lit(b), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    v.select(col("v"), decile.as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
  }

  /** Self-checked approximate percentiles (the b13 discipline for quantile
    * sketches): run `percentile_approx` (KLL-style mergeable sketch — the
    * one-pass form a 100 TB scan actually affords) NEXT TO the exact
    * histogram percentiles, and RAISE unless each sketch value lands inside
    * the exact [p−δ, p+δ] quantile window (the sketch's rank-error
    * guarantee is n/accuracy ≪ δ·n). Only cross-engine-deterministic
    * columns are returned — the exact percentile and the `sketch_ok` flag
    * whose computation forces the assert — so the oracle hash-verifies the
    * rows while the assert bounds the engine-specific estimate.
    */
  def discreteChecked(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[Double], pctCol: String, accuracy: Int = 10000,
      delta: Double = 0.001): DataFrame = {
    val allPs = ps.flatMap(p => Seq(p - delta, p, p + delta))
      .filter(p => p > 0 && p <= 1).distinct
    val exact = discrete(df, groupCol, value, allPs, pctCol).persist()
    val approx = df.groupBy(col(groupCol))
      .agg(percentile_approx(value, typedlit(ps), lit(accuracy)).as("apx"))
    ps.zipWithIndex.map { case (p, i) =>
      val e = exact.filter(col("p") === p)
        .select(col(groupCol), col(pctCol), col("n_rows"))
      val lo = exact.filter(col("p") === (p - delta))
        .select(col(groupCol), col(pctCol).as("lo"))
      val hi = exact.filter(col("p") === (p + delta))
        .select(col(groupCol), col(pctCol).as("hi"))
      e.join(lo, groupCol).join(hi, groupCol)
        .join(approx.select(col(groupCol),
          element_at(col("apx"), i + 1).as("a")), groupCol)
        .select(col(groupCol), lit(p).as("p"), col(pctCol), col("n_rows"),
          when(assert_true(col("a") >= col("lo") && col("a") <= col("hi"),
            concat(lit(s"percentile_approx outside exact ±$delta window at p=$p: "),
              col("a"), lit(" not in ["), col("lo"), lit(", "), col("hi"), lit("]")))
            .isNull, lit(true)).as("sketch_ok"))
    }.reduce(_ union _)
  }
}
