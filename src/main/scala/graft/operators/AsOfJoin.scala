package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single most recent right row
  * with `rightTs <= leftTs` for the same key (ties on the timestamp broken
  * by the largest `tieCol`) — the trades-to-quotes operator Spark has no
  * built-in for (SURVEY.md notes the reference has no joins at all; this is
  * engine surface beyond it).
  *
  * Implementation is the union-and-scan form, not a join: tag both inputs,
  * union them, and run one `last(_, ignoreNulls)` over a window ordered by
  * (ts, side, tie) within the key. Right rows sort *before* left rows at
  * equal timestamps, giving inclusive (`<=`) semantics.
  *
  * Scale: one shuffle on the key and a sorted scan per partition — the same
  * cost as a sort-merge join but with no pairwise matching blow-up; skew on
  * a hot key behaves like any windowed aggregation (AQE-visible). A
  * broadcast variant is unnecessary: if the right side were small enough to
  * broadcast, the union costs even less.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its columns in `payloadCols` are
    *                  attached, prefixed `asof_`)
    * @param keyCols   equi-key (same names both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param tieCol    right column breaking equal-timestamp ties (max wins)
    * @param payloadCols right columns to carry onto the left rows
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      payloadCols: Seq[String]): DataFrame =
    core(left, right, keyCols, leftTs, rightTs, tieCol, payloadCols, None)

  /** [[asOf]] bounded by a freshness tolerance — pandas `merge_asof`'s
    * `tolerance`, kdb's windowed form: the matched right row is kept only
    * when `leftTs − rightTs ≤ toleranceSec`; a staler match yields NULL
    * payloads instead of silently attaching reference data from the
    * distant past (the guard a trades-to-quotes or feature-freshness
    * pipeline needs). Because the unbounded match is the MOST RECENT right
    * row, bounding it afterwards is exact — any other row is older still —
    * so the tolerance costs one post-scan projection, never a second join
    * or a widened window.
    */
  def asOfWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      payloadCols: Seq[String], toleranceSec: Long): DataFrame =
    core(left, right, keyCols, leftTs, rightTs, tieCol, payloadCols,
      Some(toleranceSec))

  /** Nearest-in-time join — pandas `merge_asof(direction='nearest')`: attach
    * the right row minimizing |leftTs − rightTs| within the key. On equal
    * distances the BACKWARD row wins (attribution prefers causes over
    * effects); backward ties on equal timestamps take the largest `tieCol`
    * (the [[asOf]] contract), forward ties the smallest (first in scan
    * order). Left rows whose key has no right rows get NULL payloads.
    *
    * Same union-and-scan cost as [[asOf]]: one shuffle on the key, one
    * sorted scan carrying TWO running frames (last-non-null behind, first-
    * non-null ahead), and the nearest choice is a pure projection — never
    * a second join or a per-row subquery.
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val payload = struct(col(rightTs).cast("timestamp").as("_rts") +:
      (tieCol +: payloadCols).distinct.map(col): _*)
    val taggedRight = right.select(
      key :+ col(rightTs).cast("timestamp").as("_ts") :+ lit(0).as("_side") :+
        col(tieCol).cast("long").as("_tie") :+ payload.as("_payload"): _*)
    val leftCols = left.columns.map(col)
    val taggedLeft = left.select(
      key :+ col(leftTs).cast("timestamp").as("_ts") :+ lit(1).as("_side") :+
        lit(Long.MaxValue).as("_tie") :+ lit(null).cast(taggedRight.schema("_payload").dataType)
          .as("_payload") :+ struct(leftCols: _*).as("_left"): _*)
    val unioned = taggedLeft
      .select((keyCols.map(col) ++ Seq(col("_ts"), col("_side"), col("_tie"),
        col("_payload"), col("_left"))): _*)
      .unionByName(taggedRight.withColumn("_left",
        lit(null).cast(taggedLeft.schema("_left").dataType)))
    val ord = Window
      .partitionBy(key: _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
    val backW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // right rows at the left row's own timestamp sort BEFORE it (side 0 <
    // 1), so the forward frame sees strictly-later rights only — equal-ts
    // matches are distance-0 backward matches and win regardless
    val fwdW = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("_back", last(col("_payload"), ignoreNulls = true).over(backW))
      .withColumn("_fwd", first(col("_payload"), ignoreNulls = true).over(fwdW))
      .filter(col("_side") === 1)
    val distBack = unix_micros(col("_ts")) - unix_micros(col("_back").getField("_rts"))
    val distFwd = unix_micros(col("_fwd").getField("_rts")) - unix_micros(col("_ts"))
    val useBack = col("_fwd").isNull || (col("_back").isNotNull && distBack <= distFwd)
    val chosen = when(useBack, col("_back")).otherwise(col("_fwd"))
    val outCols = left.columns.map(c => col("_left").getField(c).as(c)) ++
      payloadCols.map(c => chosen.getField(c).as(s"asof_$c"))
    matched.select(outCols: _*)
  }

  private def core(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, tieCol: String,
      payloadCols: Seq[String], toleranceSec: Option[Long]): DataFrame = {
    val key = keyCols.map(col)
    // the payload carries the matched right timestamp so the tolerance
    // check can run after the scan (pure projection, no second join)
    val payload = struct(col(rightTs).cast("timestamp").as("_rts") +:
      (tieCol +: payloadCols).distinct.map(col): _*)
    val taggedRight = right.select(
      key :+ col(rightTs).cast("timestamp").as("_ts") :+ lit(0).as("_side") :+
        col(tieCol).cast("long").as("_tie") :+ payload.as("_payload"): _*)
    val leftCols = left.columns.map(col)
    val taggedLeft = left.select(
      key :+ col(leftTs).cast("timestamp").as("_ts") :+ lit(1).as("_side") :+
        lit(Long.MaxValue).as("_tie") :+ lit(null).cast(taggedRight.schema("_payload").dataType)
          .as("_payload") :+ struct(leftCols: _*).as("_left"): _*)
    val unioned = taggedLeft
      .select((keyCols.map(col) ++ Seq(col("_ts"), col("_side"), col("_tie"),
        col("_payload"), col("_left"))): _*)
      .unionByName(taggedRight.withColumn("_left",
        lit(null).cast(taggedLeft.schema("_left").dataType)))
    val w = Window
      .partitionBy(key: _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val fresh = toleranceSec match {
      case None => lit(true)
      case Some(tol) =>
        unix_micros(col("_asof").getField("_rts")) >=
          unix_micros(col("_ts")) - lit(tol * 1000000L)
    }
    val outCols = left.columns.map(c => col("_left").getField(c).as(c)) ++
      payloadCols.map(c =>
        when(fresh, col("_asof").getField(c)).as(s"asof_$c"))
    matched.select(outCols: _*)
  }
}
