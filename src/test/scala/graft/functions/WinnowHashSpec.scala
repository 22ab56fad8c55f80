package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WinnowHash

class WinnowHashSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: positional k-gram fold, min per complete
    * w-window, distinct in first-occurrence order.
    */
  private def ref(ids: Seq[Long], k: Int, w: Int): Seq[Long] = {
    if (ids.length < k) return Seq.empty
    val grams = ids.sliding(k).map(
      _.foldLeft(0L)((a, t) => (a * 37L + t + 1L) % 2147483647L)).toVector
    if (grams.length < w) return Seq.empty
    grams.sliding(w).map(_.min).toVector.distinct
  }

  test("matches the reference on seeded random id arrays (sizes 0..40, k 1..6, w 1..5)") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(41))(rnd.nextLong(1L << 31)))
    }
    val df = docs.toDF("doc_id", "ids")
    for (k <- 1 to 6; w <- 1 to 5) {
      val got = df.select(col("doc_id"), WinnowHash.column(col("ids"), k, w).as("fps"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
      docs.foreach { case (id, ids) =>
        assert(got(id) === ref(ids, k, w), s"doc=$id k=$k w=$w")
      }
    }
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(11)
    val (k, w) = (5, 4)
    val shared = Seq.fill(w + k - 1)(rnd.nextLong(1L << 31))
    // two otherwise-unrelated documents embedding the shared run
    val a = Seq.fill(30)(rnd.nextLong(1L << 31)) ++ shared ++ Seq.fill(30)(rnd.nextLong(1L << 31))
    val b = Seq.fill(17)(rnd.nextLong(1L << 31)) ++ shared ++ Seq.fill(9)(rnd.nextLong(1L << 31))
    assert(ref(a, k, w).toSet.intersect(ref(b, k, w).toSet).nonEmpty)
    // and the density bound holds in expectation: far fewer fps than grams
    assert(ref(a, k, w).length < a.length - k + 1)
  }

  test("short sequences and the SQL surface") {
    // no complete window (< k+w-1 ids) → empty, never null
    val short = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long])).toDF("doc_id", "ids")
    val out = short.select(WinnowHash.column(col("ids"), 5, 4).as("fps"))
      .collect().map(_.getSeq[Long](0))
    assert(out.forall(_.isEmpty))
    // registered SQL function produces the same result as the column form
    val df = Seq((1L, (0 until 20).map(_.toLong))).toDF("doc_id", "ids")
    df.createOrReplaceTempView("winnow_in")
    val sql = spark.sql("SELECT winnow_hash(ids, 5, 4) AS fps FROM winnow_in")
      .collect().head.getSeq[Long](0)
    val col0 = df.select(WinnowHash.column(col("ids"), 5, 4)).collect().head.getSeq[Long](0)
    assert(sql === col0 && sql === ref((0 until 20).map(_.toLong), 5, 4))
  }
}
