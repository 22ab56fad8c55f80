package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** `winnow_hash(ids, k, w)` → the winnowing fingerprints of a token-id
  * sequence (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms
  * for Document Fingerprinting", SIGMOD 2003 — the MOSS scheme): compute
  * the POSITIONAL rolling-polynomial k-gram ids (same fold and modulus as
  * [[ShingleHash]], but keeping every window, not the distinct set), slide
  * a window of `w` consecutive k-gram hashes over them, select each
  * window's minimum, and return the distinct selected values in
  * first-occurrence order. The winnowing guarantee: any match of length
  * ≥ w + k − 1 tokens between two documents shares at least one
  * fingerprint, while only ~2/(w+1) of the k-grams are kept — a tunable
  * density/recall trade no plain-distinct shingle set offers.
  *
  * Whole algorithm in ONE codegen'd expression (the [[ShingleHash]]
  * pattern — a static helper invoked from generated code, no iterator
  * boundary), so the fingerprint pass over a corpus is a shuffle-free
  * whole-stage-codegen projection; only the per-doc fingerprint summary
  * ever reaches an exchange.
  *
  * Sequences with fewer than k + w − 1 ids have no complete window and
  * yield an empty array ("too short to fingerprint"). A window containing
  * a NULL id contributes no k-gram (the [[ShingleHash]] null rule;
  * unreachable from the pipeline's `split()` front-end).
  */
case class WinnowHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), IntegerType, IntegerType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_hash"

  override protected def nullSafeEval(ids: Any, k: Any, w: Any): Any =
    WinnowHash.compute(ids.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, k, w) => {
      s"${ev.value} = org.apache.spark.sql.graft.WinnowHash.compute($ids, $k, $w);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowHash {

  private val prime = 2147483647L // 2³¹ − 1, the shared dedup modulus

  def compute(ids: ArrayData, k: Int, w: Int): ArrayData = {
    val n = ids.numElements()
    if (k <= 0 || w <= 0 || n < k) return new GenericArrayData(Array.emptyLongArray)
    // positional k-gram hashes (null-bearing windows skipped, positions
    // compressed — identical to ShingleHash pre-distinct on null-free input)
    val raw = new Array[Long](n - k + 1)
    var m = 0
    var i = 0
    while (i <= n - k) {
      var acc = 0L
      var nullSeen = false
      var j = 0
      while (j < k) {
        if (ids.isNullAt(i + j)) nullSeen = true
        else acc = (acc * 37L + ids.getLong(i + j) + 1L) % prime
        j += 1
      }
      if (!nullSeen) { raw(m) = acc; m += 1 }
      i += 1
    }
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    // min of each complete w-window, distinct in first-occurrence order;
    // w is small (≤ a few dozen), so the rescan-per-window is O(m·w) with
    // no allocation — cheaper than a deque for the sizes this sees
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, m))
    val out = new Array[Long](m - w + 1)
    var o = 0
    i = 0
    while (i <= m - w) {
      var min = raw(i)
      var j = 1
      while (j < w) {
        if (raw(i + j) < min) min = raw(i + j)
        j += 1
      }
      if (seen.add(min)) { out(o) = min; o += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  def column(ids: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowHash(
      ExpressionUtils.expression(ids),
      org.apache.spark.sql.catalyst.expressions.Literal(k),
      org.apache.spark.sql.catalyst.expressions.Literal(w)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_hash"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[WinnowHash].getName, "winnow_hash"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"winnow_hash expects 3 arguments, got ${args.length}")
      WinnowHash(args.head, args(1), args(2))
    }
  )
}
