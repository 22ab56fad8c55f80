package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary with dense, deterministic token ids (rank of the token
  * in the sorted distinct vocabulary). Used by MinHash / SimHash /
  * fingerprinting so that "hashing" is reproducible in the SQL oracle —
  * production deployments would swap in xxhash64 over the token bytes (one
  * line) without touching the dataflow.
  *
  * Scale: the distinct-token aggregation is a map-side-combined shuffle over
  * tokens (vocabulary ≪ corpus). The `row_number` ranking runs over the
  * *vocabulary*, not the corpus; for a natural-language vocab (≤ tens of
  * millions) a single-partition rank of the distinct set is fine, and the
  * result is broadcast-joined back to the token stream — the corpus itself is
  * never globally sorted.
  */
object Vocab {

  /** (token, token_id) — token_id is the 0-based rank in sorted order. */
  def build(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .distinct()
      .withColumn("token_id", row_number().over(Window.orderBy(col("token"))).cast("long") - 1)

  /** (doc_id, pos, token, token_id): position-indexed token stream with ids
    * attached via broadcast join (the vocab side is small by construction).
    */
  def tokenIds(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token"))
    )
    toks.join(F.broadcast(build(docs)), "token")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"), col("token_id"))
  }

  /** Driver-collected vocabulary — the dictionary-broadcast variant for
    * vocabularies that fit the driver (natural-language vocabularies do; for
    * an unbounded id space fall back to the [[tokenIds]] join).
    */
  def tokenIdMap(docs: DataFrame): Map[String, Long] =
    build(docs).collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("token_id")).toMap

  /** (doc_id, ids: array<bigint>) — the whole token-id sequence in one
    * narrow projection (literal-map lookup), skipping the
    * explode → join → collect_list round trip entirely. This is the fast
    * path for sequence-shaped consumers (shingling): zero shuffles before
    * the shingle index itself.
    */
  def tokenIdArrays(docs: DataFrame, vocab: Map[String, Long]): DataFrame =
    docs.select(
      col("doc_id"),
      transform(TextOps.tokens(col("text")), t => element_at(typedlit(vocab), t)).as("ids"))
}
