package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** `shingle_hash_pos(ids, k)` → the POSITIONAL rolling-polynomial k-gram ids
  * of a token-id sequence: element i is the fold
  * `acc ← (acc·37 + id + 1) mod (2³¹−1)` over ids[i..i+k−1] — the same fold,
  * modulus, and window order as [[ShingleHash]], but WITHOUT the distinct
  * step and with array index = gram start position. Windows containing a
  * NULL id yield a null slot (position-preserving — dropping them would
  * shift every later gram's position); sequences shorter than k yield an
  * empty array.
  *
  * This is the front-end of the duplicated-substring span report
  * ([[graft.ops.Dedup.dupSpans]]): exact substring-level dedup à la Lee et
  * al. 2022 ("Deduplicating Training Data Makes Language Models Better")
  * needs to know WHERE a duplicated k-gram sits in the document so that
  * maximal runs of consecutive duplicated grams can be merged into spans.
  * [[ShingleHash]]'s distinct set form is the right input for Jaccard /
  * MinHash (set semantics); this positional form is the right input for
  * span extraction (sequence semantics). `array_distinct(shingle_hash_pos)`
  * ≡ `shingle_hash` on null-free input, property-tested in ShingleHashSpec.
  *
  * Same codegen discipline as its siblings: the loop lives in a static
  * helper invoked from generated code, so the expression stays inside the
  * whole-stage-codegen span.
  */
case class PositionalShingleHash(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), IntegerType)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "shingle_hash_pos"

  override protected def nullSafeEval(ids: Any, k: Any): Any =
    PositionalShingleHash.compute(ids.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, k) => {
      s"${ev.value} = org.apache.spark.sql.graft.PositionalShingleHash.compute($ids, $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PositionalShingleHash {

  private val prime = 2147483647L // 2³¹ − 1, the shared dedup modulus

  def compute(ids: ArrayData, k: Int): ArrayData = {
    val n = ids.numElements()
    if (k <= 0 || n < k) return new GenericArrayData(Array.emptyLongArray)
    val nOut = n - k + 1
    val out = new Array[Any](nOut)
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
      out(i) = if (nullSeen) null else java.lang.Long.valueOf(acc)
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(ids: Column, k: Int): Column =
    ExpressionUtils.column(PositionalShingleHash(
      ExpressionUtils.expression(ids),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hash_pos"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[PositionalShingleHash].getName, "shingle_hash_pos"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"shingle_hash_pos expects 2 arguments, got ${args.length}")
      PositionalShingleHash(args.head, args(1))
    }
  )
}
