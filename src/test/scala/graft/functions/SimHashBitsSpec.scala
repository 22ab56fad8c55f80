package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class SimHashBitsSpec extends SparkSpec {
  import spark.implicits._

  test("projection form equals the ±1-sum aggregation on seeded random id arrays") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(40) // non-empty: empty arrays tested below
      (i.toLong, Seq.fill(n)(rnd.nextLong(2147483647L)))
    }
    val df = docs.toDF("doc_id", "ids")
    for (bits <- Seq(16, 60)) {
      val viaExpr = Dedup.simhashFromArrays(df, bits)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val viaAgg = Dedup.simhash(
        df.select(col("doc_id"), explode(col("ids")).as("token_id")), bits)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(viaExpr.toSeq === viaAgg.toSeq, s"bits=$bits")
    }
  }

  test("duplicate tokens count with multiplicity, exactly as exploded rows did") {
    // [x, x, y]: x's bits vote twice — a set-semantics bug would tie them
    val df = Seq((1L, Seq(42L, 42L, 99L))).toDF("doc_id", "ids")
    val expr = Dedup.simhashFromArrays(df, 16).collect().head.getLong(1)
    val agg = Dedup.simhash(
      df.select(col("doc_id"), explode(col("ids")).as("token_id")), 16)
      .collect().head.getLong(1)
    assert(expr === agg)
  }

  test("empty and null id arrays emit no fingerprint row (absent, like the agg form)") {
    val df = Seq(
      (1L, Some(Seq(5L, 6L))),
      (2L, Some(Seq.empty[Long])),
      (3L, None)
    ).toDF("doc_id", "ids")
    val got = Dedup.simhashFromArrays(df, 60).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
  }
}
