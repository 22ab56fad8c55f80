package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Windows.slidingDistinct]] (the t50
  * batch query): live "unique users in the last 15 minutes, refreshed
  * every 5". The window generator fans each event into win/slide windows
  * map-side (a stateless projection), `dropDuplicates` keeps one state
  * record per (window, user) and passes through only each pair's first
  * arrival, and the Complete-mode count then aggregates those firsts —
  * the same two-stateful-op chain as the d10/d12 keep-first twins, with
  * counts revised live as micro-batches land (the b21/b24 dashboard
  * pattern).
  *
  * A repeat (window, user) arrival — same batch or a later one — never
  * counts again, so the streamed frame converges to the batch
  * COUNT(DISTINCT) exactly (spec-pinned over feed splits). The batch
  * twin's n_events column deliberately doesn't ride along: it would need
  * a second, dedup-free aggregation of the same input, which is its own
  * (stateless-counting) query.
  *
  * At scale: dedup state is one record per (window, user) — the same
  * cardinality the batch job's Expand+two-phase aggregate shuffles — and
  * a production deployment bounds it by putting `withWatermark(tsCol, …)`
  * (≥ the window length) ahead of this chain so closed windows' state is
  * evicted; the count frame itself is windows-sized metadata.
  */
object StreamingSlidingDistinct {

  def slidingDistinct(events: DataFrame, tsCol: String = "ts",
      win: Int = 900, slide: Int = 300): DataFrame =
    events
      .select(window(col(tsCol), s"$win seconds", s"$slide seconds").as("w"),
        col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("distinct_users"))
      .select(col("w.start").as("window_start"), col("distinct_users"))
}
