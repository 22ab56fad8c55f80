package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The round-7 CDC rebuild (VERDICT r6 "next" #1): `cdcChunks` must keep its
  * round-6 output bit-for-bit while the plan drops the per-character shuffle.
  * The old window-form is re-implemented HERE (verbatim from the round-6
  * tree) as the equivalence reference — the oracle SQL keeps the same window
  * shape, so this spec pins Spark-vs-Spark what the driver pins
  * Spark-vs-DuckDB.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  /** Round-6 `cdcChunks`, verbatim: posexplode per char → per-doc sort
    * window with k chained leads → prefix-sum chunk index → re-aggregate →
    * join back for the digest.
    */
  private def cdcChunksWindowForm(docs: DataFrame, k: Int = 3,
      divisor: Long = 64L): DataFrame = {
    val p = graft.ops.Dedup.minhashPrime
    val d = docs.filter(col("text").isNotNull && length(col("text")) > 0)
    val chars = graft.ops.Dedup.charIds(d)
      .select(col("doc_id"), posexplode(col("ids")).as(Seq("pos0", "cid")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    var acc: Column = lit(0L)
    for (i <- 0 until k)
      acc = (acc * 37 + lead(col("cid"), i).over(w) + 1) % p
    val bnd = when(acc.isNotNull && acc % divisor === 0, 1L).otherwise(0L)
    val idx = chars
      .withColumn("bnd", bnd)
      .withColumn("chunk_idx",
        coalesce(sum(col("bnd"))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
    idx.groupBy(col("doc_id"), col("chunk_idx"))
      .agg(min(col("pos")).as("start_pos"), count(lit(1)).as("chunk_len"))
      .join(d.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"), col("chunk_len"),
        md5(expr("substring(text, CAST(start_pos AS INT), CAST(chunk_len AS INT))"))
          .as("chunk_md5"))
  }

  private def rowsOf(df: DataFrame): Seq[(Long, Long, Long, Long, String)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
      r.getAs[Long]("start_pos"), r.getAs[Long]("chunk_len"),
      r.getAs[String]("chunk_md5"))).toSeq.sortBy(t => (t._1, t._2))

  test("cdc_chunk_spans expression ≡ round-6 window form, bit-for-bit, random corpus") {
    val rnd = new scala.util.Random(41)
    // mixed alphabet sizes force dense AND sparse boundary regimes; include
    // short docs (< k), exact-multiple docs, and unicode beyond ASCII
    val docs = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(300)
      val alpha = if (i % 3 == 0) 4 else 26
      val s = (1 to n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
      // i%7: multi-byte BMP chars; i%11: an astral-plane char (surrogate
      // pair) — pins that the text-direct code-point scan, the id-array
      // form, and split(text,"")'s element semantics all agree
      val suffix = if (i % 11 == 0) " 😀ok" else if (i % 7 == 0) " héllo wörld" else ""
      (i, s + suffix)
    }.toDF("doc_id", "text")
    assert(rowsOf(TextOps.cdcChunks(docs)) === rowsOf(cdcChunksWindowForm(docs)))
  }

  test("text-direct form ≡ id-array form (same expression family, no split/token_hash front-end)") {
    val rnd = new scala.util.Random(97)
    val docs = (1L to 30L)
      .map(i => (i, (1 to 200).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
        + (if (i % 5 == 0) " 🌀" else "")))
      .toDF("doc_id", "text")
    val viaIds = docs.filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.CdcChunkSpans.column(
          org.apache.spark.sql.graft.TokenHashArray.column(split(col("text"), "")),
          3, 64L).as("spans"))
    val viaText = docs.filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.CdcChunkSpansText.column(col("text"), 3, 64L)
          .as("spans"))
    def flat(df: DataFrame) = df
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("i", "sp")))
      .select(col("doc_id"), col("i"), col("sp.start_pos"), col("sp.chunk_len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(flat(viaIds) === flat(viaText))
  }

  test("cdc_chunk_spans ≡ window form when a k-gram cuts at the very last position") {
    // engineer a doc whose final complete k-gram is a boundary: brute-force
    // a 1-char suffix until the tail trigram hash divides 64
    val p = graft.ops.Dedup.minhashPrime
    def h3(a: Char, b: Char, c: Char): Long =
      Seq(a, b, c).foldLeft(0L)((acc, ch) => (acc * 37 + ch.toLong + 1) % p)
    val tail = (for { b <- 'a' to 'z'; c <- 'a' to 'z' if h3('x', b, c) % 64 == 0 }
      yield s"$b$c").headOption
    assert(tail.isDefined, "no 2-char suffix makes the tail trigram divide 64")
    val docs = Seq((1L, "x" + tail.get), (2L, "ab" + "x" + tail.get))
      .toDF("doc_id", "text")
    assert(rowsOf(TextOps.cdcChunks(docs)) === rowsOf(cdcChunksWindowForm(docs)))
    // the cut at the last position is absorbed: chunks still tile the doc
    val r1 = rowsOf(TextOps.cdcChunks(docs)).filter(_._1 == 1L)
    assert(r1.map(_._4).sum === 3L)
  }

  test("non-default k and divisor agree too") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 20L)
      .map(i => (i, (1 to 150).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString))
      .toDF("doc_id", "text")
    assert(rowsOf(TextOps.cdcChunks(docs, k = 5, divisor = 16L)) ===
      rowsOf(cdcChunksWindowForm(docs, k = 5, divisor = 16L)))
  }

  test("plan pin: cdcChunks has no Exchange, no WindowExec, no join (the char-shuffle is gone)") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val plan = TextOps.cdcChunks(docs).queryExecution.executedPlan
    val bad = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(bad.isEmpty, s"per-doc chunking must not shuffle:\n$plan")
  }
}
