package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave on the JVM, bit by bit. */
  private def zRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("column zValue matches the bit-by-bit reference on random inputs") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 30).toLong, rnd.nextInt(1 << 30).toLong)) ++
      Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 31) - 1, (1L << 31) - 1))
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === zRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-clustered layout bounds BOTH dimensions per partition; x-sorted does not") {
    // 64x64 grid, one row per cell; 16 output partitions
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    def spanStats(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
        .agg(avg($"xs"), avg($"ys"))
        .head()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zx, zy) = spanStats(ZOrder.cluster(grid, "x", "y", partitions = 16))
    val (sx, sy) = spanStats(
      grid.repartitionByRange(16, $"x").sortWithinPartitions($"x"))
    // single-column layout: each partition covers a narrow x but ALL of y
    assert(sy > 60, s"x-sorted y-span should be ~full, got $sy")
    // z-order: both spans are quadrant-sized (≤ ~half the domain), so
    // min/max skipping engages for predicates on either dimension
    assert(zx <= 32 && zy <= 32, s"z spans too wide: x=$zx y=$zy")
  }

  test("SQL form of the spread equals the column form") {
    val rows = Seq((3L, 5L), (123456L, 654321L), (0L, 0L)).toDF("x", "y")
    val both = rows.select(
      ZOrder.zValue($"x", $"y").as("zc"),
      expr(ZOrder.zValueSql("x", "y")).as("zs"))
    assert(both.filter($"zc" =!= $"zs").count() === 0)
  }
}
