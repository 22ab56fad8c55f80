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
      pctCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persist: the histogram feeds both the totals and the cumulative
    // window — without it each branch re-scans and re-aggregates the input
    val h = df.groupBy(col(groupCol), value.as("v"))
      .agg(count(lit(1)).as("c"))
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
}
