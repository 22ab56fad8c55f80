package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join: all pairs whose event times lie within `tolSec` of
  * each other — the keyless variant of the interval-join family (the as-of
  * join in [[AsOfJoin]] is the keyed one-sided member).
  *
  * A naive formulation is a cross join with a range filter — O(|L|·|R|)
  * and un-shuffleable (no equality key). The banded form restores an
  * equi-join key: bucket both sides into `tolSec`-wide bins of the time
  * axis; any qualifying pair's bins differ by at most 1, so exploding the
  * right side into its bin and both neighbors turns the range predicate
  * into `JOIN ON bin` + an exact |Δt| filter. Shuffle cost is
  * O(|L| + 3·|R|) rows hashed on bin, pair work is O(Σ per-bin |L|·|R|) —
  * the time-axis analog of the shingle inverted index. Each qualifying
  * pair meets in exactly one bin (the left row's), so no dedup stage.
  * Bin-boundary skew (everything in one hot bin) is AQE-skew-join
  * territory, same as any hot key.
  */
object RangeJoin {

  /** Pairs (left row, right row) with |lTs − rTs| ≤ tolSec. Column names
    * of the two inputs must be disjoint (select/alias beforehand).
    */
  def band(left: DataFrame, right: DataFrame, lTs: String, rTs: String,
      tolSec: Long): DataFrame = {
    val tolUs = tolSec * 1000000L
    val l = left.withColumn("_bin", expr(s"unix_micros($lTs) div $tolUs"))
    val r = right
      .withColumn("_bin0", expr(s"unix_micros($rTs) div $tolUs"))
      .withColumn("_bin", explode(array(col("_bin0") - 1, col("_bin0"), col("_bin0") + 1)))
      .drop("_bin0")
    l.join(r, "_bin")
      .filter(abs(expr(s"unix_micros($lTs) - unix_micros($rTs)")) <= tolUs)
      .drop("_bin")
  }

  /** Streaming twin: the watermarked stream-stream interval join (the
    * click-to-view attribution shape). Spark's stream-stream join already
    * keys state by the equality columns and bounds it by the time-range
    * predicate + watermarks — rows older than `delay` + `tolSec` are
    * evicted, so state is O(rate · horizon), not history. The batch [[band]]
    * needs the explicit bin trick because a keyless range has no shuffle
    * key; here `key` provides the shuffle key and the range rides along as
    * the state-eviction bound. Inputs must carry disjoint column names;
    * both sides watermarked on their own time column.
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      rKey: String, lTs: String, rTs: String, tolSec: Long,
      delay: String): DataFrame = {
    val l = left.withWatermark(lTs, delay)
    val r = right.withWatermark(rTs, delay)
    l.join(r,
      col(key) === col(rKey) &&
        col(rTs) >= col(lTs) - expr(s"INTERVAL $tolSec SECONDS") &&
        col(rTs) <= col(lTs) + expr(s"INTERVAL $tolSec SECONDS"))
  }
}
