package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ShingleHash

class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted HOF form shingle_hash replaced — kept here as the
    * executable contract: both must stay bit-identical or the d2/d4/d7
    * oracle hashes drift.
    */
  private def hofForm(idsDf: DataFrame, k: Int): DataFrame = {
    val n = size(col("ids"))
    val sids = when(n >= k,
      transform(sequence(lit(0), n - k),
        i => aggregate(slice(col("ids"), i + 1, lit(k)), lit(0L),
          (a, t) => (a * 37L + t + 1L) % 2147483647L))
    ).otherwise(array().cast("array<bigint>"))
    idsDf.select(col("doc_id"), array_distinct(sids).as("shingles"))
  }

  private def exprForm(idsDf: DataFrame, k: Int): DataFrame =
    idsDf.select(col("doc_id"), ShingleHash.column(col("ids"), k).as("shingles"))

  test("equals the HOF form on seeded random id arrays (sizes 0..40, k 1..7)") {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(41)
      // token ids live in [0, 2^31-1) like TokenHash output; include runs of
      // repeats so distinct-order actually gets exercised
      val ids = Seq.fill(n)(if (rnd.nextBoolean()) rnd.nextLong(2147483647L)
        else rnd.nextInt(3).toLong)
      (i.toLong, ids)
    }
    val df = docs.toDF("doc_id", "ids")
    for (k <- Seq(1, 2, 5, 7)) {
      val expected = hofForm(df, k).orderBy("doc_id").collect().map(_.getSeq[Long](1))
      val actual = exprForm(df, k).orderBy("doc_id").collect().map(_.getSeq[Long](1))
      assert(actual.toSeq === expected.toSeq, s"k=$k")
    }
  }

  test("short arrays yield empty, duplicates collapse in first-occurrence order") {
    val df = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(5L, 6L)),                   // n < k
      (3L, Seq(1L, 2L, 1L, 2L, 1L, 2L)),  // period-2: shingles repeat
      (4L, Seq(7L, 7L, 7L, 7L, 7L))       // all-same: one distinct shingle
    ).toDF("doc_id", "ids")
    val exp = hofForm(df, 3).orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val act = exprForm(df, 3).orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(act.toSeq === exp.toSeq)
    assert(act(0).isEmpty && act(1).isEmpty)
    assert(act(3).length === 1)
  }

  test("null array propagates; SQL-callable via the session extension") {
    val r = Seq((1L, Seq(1L, 2L, 3L)), (2L, null))
      .toDF("doc_id", "ids")
      .select(col("doc_id"), ShingleHash.column(col("ids"), 2).as("s"))
      .orderBy("doc_id").collect()
    assert(!r(0).isNullAt(1))
    assert(r(1).isNullAt(1))
    val sql = spark.sql("SELECT shingle_hash(array(1L,2L,3L), 2) AS s")
      .collect().head.getSeq[Long](0)
    // (0·37+1+1)=2 → (2·37+2+1)=77 ; (0·37+2+1)=3 → (3·37+3+1)=115
    assert(sql === Seq(77L, 115L))
    // windows containing a NULL id yield no shingle (getLong on a null slot
    // would silently read 0 and fabricate an id); null-free windows survive
    val withNull = spark.sql(
      "SELECT shingle_hash(array(1L, CAST(NULL AS BIGINT), 3L, 4L), 2) AS s")
      .collect().head.getSeq[Long](0)
    // windows: (1,null) skip, (null,3) skip, (3,4) = ((0·37+3+1)·37+4+1)=153
    assert(withNull === Seq(153L))
  }

  test("shingle_hash_pos: distinct of positional form ≡ shingle_hash; positions preserved") {
    import org.apache.spark.sql.graft.PositionalShingleHash
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(35)
      val ids = Seq.fill(n)(if (rnd.nextBoolean()) rnd.nextLong(2147483647L)
        else rnd.nextInt(3).toLong)
      (i.toLong, ids)
    }
    val df = docs.toDF("doc_id", "ids")
    for (k <- Seq(1, 3, 5)) {
      val dis = df.select(col("doc_id"),
          array_distinct(PositionalShingleHash.column(col("ids"), k)).as("s"))
        .orderBy("doc_id").collect().map(_.getSeq[Long](1))
      val set = exprForm(df, k).orderBy("doc_id").collect().map(_.getSeq[Long](1))
      assert(dis.toSeq === set.toSeq, s"k=$k")
      // positional: element i is the fold over ids[i..i+k-1] — check length
      // and a driver-side recompute on one doc
      val lens = df.select(size(PositionalShingleHash.column(col("ids"), k)))
        .collect().map(_.getInt(0))
      docs.zip(lens).foreach { case ((_, ids), l) =>
        assert(l === math.max(0, ids.length - k + 1))
      }
    }
    // a null id nulls exactly the windows covering it, positions intact
    val withNull = spark.sql(
      "SELECT shingle_hash_pos(array(1L, CAST(NULL AS BIGINT), 3L, 4L), 2) AS s")
      .collect().head.getSeq[Any](0)
    assert(withNull === Seq(null, null, 153L))
  }

  test("the shingle-id stage stays inside whole-stage codegen over parquet") {
    // real parquet scan (in-memory Seqs fold to LocalTableScan and hide the
    // physical plan); the Project carrying shingle_hash + explode must carry
    // the `*(n)` codegen marker — the HOF form this replaced could not
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = graft.ops.Dedup.shingleIdsFromArrays(
      graft.ops.Vocab.hashTokenIdArrays(docs), 5)
    val plan = q.queryExecution.executedPlan.toString
    val node = """.*?(\+- |^)(\*\(\d+\) )?(Generate|Project|Filter)[ \[].*"""
    val nodes = plan.linesIterator.filter(_.matches(node)).toSeq
    assert(nodes.nonEmpty, plan)
    nodes.foreach(l => assert(l.contains("*("), s"not codegen'd: $l\n$plan"))
    assert(q.limit(1).count() === 1L)
  }
}
