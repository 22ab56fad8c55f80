package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(s, ls, rs)` → the separator-encoded tokenization `s` after
  * applying the WHOLE merge table `(ls(i), rs(i))` in rank order, each
  * merge as one greedy left-to-right non-overlapping pass over the token
  * sequence — per document, in memory, in a single expression evaluation.
  *
  * This is the one-pass READ side of the BPE surface (round-7 verdict
  * "next" #3, the [[CdcChunkSpans]] discipline): training
  * ([[graft.ops.TextOps.bpeMerges]]) necessarily runs one corpus pass per round —
  * each round's decision depends on the counts AFTER the previous merge —
  * but APPLYING a learned table must not: the old fertility read re-ran
  * the training loop, i.e. `rounds` persisted full-corpus regex passes
  * (10⁴ Spark stages for a realistic 10⁴-merge table). Here the merge
  * table broadcasts as two literal arrays and each document tokenizes in
  * one `scan → project` pass — no per-round materialization, no shuffle,
  * nothing cached.
  *
  * Semantics are EXACTLY the training loop's rewrite
  * (`graft/ops/TextOps.scala` `bpeLoop`): one merge's anchored-regex pass
  * `(?<=^|SEP)l SEP r(?=SEP|$) → l+r` is greedy left-to-right
  * non-overlapping replacement on token boundaries, which over the token
  * ARRAY is: scan left to right, on `toks(i) == l && toks(i+1) == r` emit
  * `l+r` and advance by 2, else emit `toks(i)` and advance by 1
  * (an "aaaa" run under merge (a,a) → "aa","aa"; "aaa" → "aa","a").
  * EngineProperties pins `bpe_apply ≡` the sequential loop on
  * overlapping-run stress corpora, and the x63 oracle re-attests the
  * equality end-to-end at every verify run.
  *
  * Cost: O(|merges| · |tokens|) per document, all in one JVM loop over an
  * in-place array (a pass that matches nothing only reads). Tokens here
  * are short strings; equality checks are length-first. The per-document
  * loop lives in a static helper invoked from generated code (the
  * [[CdcChunkSpans]] pattern), keeping the expression inside the
  * whole-stage-codegen span.
  */
case class BpeApply(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(s: Any, ls: Any, rs: Any): Any =
    BpeApply.compute(s.asInstanceOf[UTF8String],
      ls.asInstanceOf[ArrayData], rs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, ls, rs) => {
      s"${ev.value} = org.apache.spark.sql.graft.BpeApply.compute($s, $ls, $rs);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeApply {

  private val SEP = '\u0001'

  /** One document's tokenization under the full merge table. Null merge
    * slots (never produced by the trainer) are skipped. An empty input
    * string is the empty tokenization (no tokens) and returns itself.
    */
  def compute(s: UTF8String, ls: ArrayData, rs: ArrayData): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return s
    // split on the separator; -1 keeps trailing empty tokens (the trainer
    // never produces them, but a hand-built state must round-trip)
    val toks: Array[String] = {
      var cnt = 1
      var i = 0
      while (i < str.length) { if (str.charAt(i) == SEP) cnt += 1; i += 1 }
      val out = new Array[String](cnt)
      var start = 0
      var w = 0
      i = 0
      while (i < str.length) {
        if (str.charAt(i) == SEP) { out(w) = str.substring(start, i); w += 1; start = i + 1 }
        i += 1
      }
      out(w) = str.substring(start)
      out
    }
    var n = toks.length
    val m = ls.numElements()
    var r = 0
    while (r < m) {
      if (!ls.isNullAt(r) && !rs.isNullAt(r)) {
        val l = ls.getUTF8String(r).toString
        val rt = rs.getUTF8String(r).toString
        // greedy left-to-right non-overlapping pass, compacting in place;
        // the merged token is built lazily (a pass with no match allocates
        // nothing but the two pair strings)
        var merged: String = null
        var i = 0
        var w = 0
        while (i < n) {
          if (i + 1 < n && toks(i) == l && toks(i + 1) == rt) {
            if (merged == null) merged = l + rt
            toks(w) = merged
            i += 2
          } else {
            toks(w) = toks(i)
            i += 1
          }
          w += 1
        }
        n = w
      }
      r += 1
    }
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(SEP)
      sb.append(toks(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def column(s: Column, ls: Column, rs: Column): Column =
    ExpressionUtils.column(BpeApply(
      ExpressionUtils.expression(s),
      ExpressionUtils.expression(ls),
      ExpressionUtils.expression(rs)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_apply"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BpeApply].getName, "bpe_apply"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"bpe_apply expects 3 arguments, got ${args.length}")
      BpeApply(args.head, args(1), args(2))
    }
  )
}
