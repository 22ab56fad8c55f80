package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** `shingle_hash(ids, k)` → the distinct rolling-polynomial k-gram ids of a
  * token-id sequence: for each window of k consecutive ids, fold
  * `acc ← (acc·37 + id + 1) mod (2³¹−1)` (acc starts at 0), then keep the
  * distinct values in first-occurrence order. Sequences shorter than k
  * yield an empty array.
  *
  * This is the codegen'd replacement for the interpreted higher-order-
  * function chain `array_distinct(transform(sequence(0, n−k),
  * i → aggregate(slice(ids, i+1, k), 0, (a,t) → (a·37+t+1) mod p)))` —
  * HOFs never participate in whole-stage codegen, so that form paid n·k
  * interpreted lambda calls plus a per-window slice allocation for every
  * document, and it is the shared front-end of the Jaccard, LSH-banding,
  * and dedup-group queries. Same fold, same mod, same distinct order ⇒
  * bit-identical output (the oracle SQL inlining the fold stays valid);
  * property-tested equal to the HOF form in ShingleHashSpec.
  *
  * The per-document loop lives in a static helper invoked from generated
  * code (the [[DecodeEnvelope]] pattern): branchy imperative code stays out
  * of the generated source, but the expression remains inside the
  * whole-stage-codegen span — no iterator boundary, no fallback.
  *
  * Intermediate values stay inside a signed long: acc < 2³¹−1, so
  * acc·37 + id + 1 < 2³⁶·² + 2³¹.
  */
case class ShingleHash(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), IntegerType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash"

  override protected def nullSafeEval(ids: Any, k: Any): Any =
    ShingleHash.compute(ids.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, k) => {
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHash.compute($ids, $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHash {

  private val prime = 2147483647L // 2³¹ − 1, the shared dedup modulus

  /** The k-gram fold over one id array; distinct, first-occurrence order
    * (matching `array_distinct` so the HOF form and this one interleave).
    *
    * Windows containing a NULL id yield no shingle, where the HOF form
    * folds them to a null shingle id — so the two forms are identical for
    * null-free id arrays (the only case the pipeline produces: `split()`
    * never yields null tokens, so TokenHashArray emits no null slots). On
    * a hypothetical null-bearing array the HOF's null row would still
    * inflate `n_shingles` in a Jaccard denominator, which is why consumers
    * use this form. (`ids.getLong` on a null slot would silently read 0
    * and fabricate a plausible-looking id.)
    */
  def compute(ids: ArrayData, k: Int): ArrayData = {
    val n = ids.numElements()
    if (k <= 0 || n < k) return new GenericArrayData(Array.emptyLongArray)
    val nOut = n - k + 1
    val raw = new Array[Long](nOut)
    var m0 = 0
    var i = 0
    while (i < nOut) {
      var acc = 0L
      var nullSeen = false
      var j = 0
      while (j < k) {
        if (ids.isNullAt(i + j)) nullSeen = true
        else acc = (acc * 37L + ids.getLong(i + j) + 1L) % prime
        j += 1
      }
      if (!nullSeen) { raw(m0) = acc; m0 += 1 }
      i += 1
    }
    // distinct in first-occurrence order; shingle sets are small (≤ doc
    // tokens), so a HashSet of boxed longs is fine here — the hot cost this
    // expression removes is the interpreted lambda fold, not the dedup
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, m0 * 2))
    val out = new Array[Long](m0)
    var m = 0
    i = 0
    while (i < m0) {
      if (seen.add(raw(i))) { out(m) = raw(i); m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == m0) out else java.util.Arrays.copyOf(out, m))
  }

  def column(ids: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHash(
      ExpressionUtils.expression(ids),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hash"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ShingleHash].getName, "shingle_hash"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"shingle_hash expects 2 arguments, got ${args.length}")
      ShingleHash(args.head, args(1))
    }
  )
}
