package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: interleave the bits of two dimensions so
  * that sorting by ONE long key co-locates rows that are close in BOTH.
  *
  * Why it matters at 100 TB: min/max skipping (parquet row groups, O3-style
  * sort keys) only prunes on the leading sort column — a layout sorted by
  * `x` leaves every file covering the full `y` range, so a `y` predicate
  * reads everything. A z-ordered layout bounds BOTH dimensions per file:
  * each file covers a contiguous z range ≈ a quadrant of the (x, y) plane,
  * so either predicate skips most files (ZOrderSpec measures exactly this).
  *
  * The interleave is the classic magic-number bit spread — five shift/mask
  * rounds per dimension, all built-in bitwise ops, fully inside
  * whole-stage codegen. The identical arithmetic is expressible in ANSI
  * SQL (the t31 oracle inlines it), so the key itself is oracle-attested.
  */
object ZOrder {

  private val masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Column): Column =
    masks.foldLeft(v.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (shift, mask)) =>
        acc.bitwiseOR(call_function("shiftleft", acc, lit(shift)))
          .bitwiseAND(lit(mask))
    }

  /** Morton key of two non-negative 32-bit dimensions: `y` bits land one
    * position above `x` bits, so z = interleave(x, y).
    */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(call_function("shiftleft", spread(y), lit(1)))

  /** The identical spread as SQL text (for the DuckDB oracle and for SQL
    * surfaces): five rounds of `(v | (v << s)) & mask`.
    */
  def spreadSql(v: String): String =
    masks.foldLeft(s"($v & 4294967295)") { case (acc, (shift, mask)) =>
      s"(($acc | ($acc << $shift)) & $mask)"
    }

  def zValueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Rewrite `df` into a z-clustered layout: range-partition + sort by the
    * Morton key of (xCol, yCol). Downstream writes inherit min/max bounds
    * on BOTH dimensions per file/row-group.
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("_z", zValue(col(xCol), col(yCol)))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("_z"))
      else keyed.repartitionByRange(col("_z"))
    ranged.sortWithinPartitions(col("_z")).drop("_z")
  }
}
