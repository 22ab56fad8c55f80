package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, Vocab}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted HOF form minhash_sigs replaced in the streaming paths —
    * kept as the executable contract: both must stay bit-identical or the
    * d3/d4/d10/d14 oracle hashes drift.
    */
  private def hofForm(df: DataFrame): DataFrame = {
    val sigCols = Dedup.minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("ids"), x => (x * a + b) % Dedup.minhashPrime)).as(s"sig_$i")
    }
    df.select(col("doc_id") +: sigCols: _*)
  }

  /** The exploded-and-reaggregated form the batch projection replaced. */
  private def aggForm(df: DataFrame): DataFrame =
    Dedup.minhashSignaturesFromShingles(
      df.select(col("doc_id"), explode(col("ids")).as("shingle_id")))

  test("equals the HOF and agg forms on seeded random id arrays") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(40) // non-empty: empty arrays tested below
      (i.toLong, Seq.fill(n)(rnd.nextLong(2147483647L)))
    }
    val df = docs.toDF("doc_id", "ids")
    val viaExpr = Dedup.minhashSignaturesFromIdArrays(df)
      .orderBy("doc_id").collect().map(r => (0 until 8).map(j => r.getLong(1 + j)))
    val viaHof = hofForm(df)
      .orderBy("doc_id").collect().map(r => (0 until 8).map(j => r.getLong(1 + j)))
    val viaAgg = aggForm(df)
      .orderBy("doc_id").collect().map(r => (0 until 8).map(j => r.getLong(1 + j)))
    assert(viaExpr.toSeq === viaHof.toSeq)
    assert(viaExpr.toSeq === viaAgg.toSeq)
  }

  test("empty and null id arrays emit no signature row (absent, like the exploded form)") {
    val df = Seq(
      (1L, Some(Seq(5L, 6L))),
      (2L, Some(Seq.empty[Long])),
      (3L, None)
    ).toDF("doc_id", "ids")
    val got = Dedup.minhashSignaturesFromIdArrays(df).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("shingle-signature projection equals the explode-regroup path on real docs") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long trip home"),
      (3L, "a b"), // too short to shingle at k=5 — absent from both forms
      (4L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val ids = Vocab.hashTokenIdArrays(docs)
    val viaArrays = Dedup.minhashShingleSignaturesFromArrays(ids, 5)
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaExplode = Dedup.minhashSignaturesFromShingles(
        Dedup.shingleIdsFromArrays(ids, 5))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaArrays.toSeq === viaExplode.toSeq)
    assert(!viaArrays.map(_.head).contains(3L))
  }

  test("signature projection plans with no exchange and stays in whole-stage codegen") {
    // range-backed (a local Seq constant-folds to LocalTableScan)
    val df = spark.range(10).select(col("id").as("doc_id"),
      sequence(lit(1L), col("id") + 1).as("ids"))
    val plan = Dedup.minhashSignaturesFromIdArrays(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature projection should not shuffle:\n$plan")
    // "*(1)" is the WholeStageCodegen marker in executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
  }
}
