package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "the slow fox naps"),
    (2L, "zeta alpha")
  ).toDF("doc_id", "text")

  test("rank build: dense sorted ids, no global window, no driver vocabulary") {
    val vocab = Vocab.build(docs).orderBy("token_id").collect()
    val expected = docs.collect().flatMap(_.getString(1).split(" ")).distinct.sorted
    assert(vocab.map(_.getString(0)).toSeq === expected.toSeq)
    assert(vocab.map(_.getLong(1)).toSeq === expected.indices.map(_.toLong))
    // the distributed rank must not fall back to a single-partition window
    val plan = Vocab.build(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("hash mode: token_id is token_hash(token), structure matches rank mode") {
    val hashed = Vocab.hashTokenIds(docs)
    val viaSql = hashed.filter(col("token_id") =!= expr("token_hash(token)")).count()
    assert(viaSql === 0L)
    // same (doc_id, pos, token) stream in both modes
    val h = hashed.select("doc_id", "pos", "token").orderBy("doc_id", "pos").collect()
    val r = Vocab.tokenIds(docs).select("doc_id", "pos", "token").orderBy("doc_id", "pos").collect()
    assert(h.toSeq === r.toSeq)
  }

  test("hash arrays ≡ exploded hash stream; rank arrays ≡ exploded rank stream") {
    def flatten(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), posexplode(col("ids")).as(Seq("pos", "token_id")))
      .orderBy("doc_id", "pos").collect()
    assert(flatten(Vocab.hashTokenIdArrays(docs)).toSeq ===
      Vocab.hashTokenIds(docs).select("doc_id", "pos", "token_id")
        .orderBy("doc_id", "pos").collect().toSeq)
    assert(flatten(Vocab.tokenIdArrays(docs)).toSeq ===
      Vocab.tokenIds(docs).select("doc_id", "pos", "token_id")
        .orderBy("doc_id", "pos").collect().toSeq)
  }

  test("xxhash mode: token_id is xxhash64(token)") {
    val bad = Vocab.xxhashTokenIds(docs)
      .filter(col("token_id") =!= xxhash64(col("token"))).count()
    assert(bad === 0L)
  }
}
