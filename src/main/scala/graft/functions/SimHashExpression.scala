package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** The whole `bits`-wide SimHash fingerprint of a token-id array in ONE
  * codegen'd pass — for each token x (with multiplicity), g(x) =
  * (x·2654435761 + 0x9747b28c) mod 2^bits, and bit b of the output is the
  * sign of Σ_tokens (±1 as bit b of g(x)) — the
  * [[graft.ops.Dedup.simhash]] aggregation as a pure projection.
  *
  * The aggregate form it replaces exploded every document into token rows
  * and folded them back through a `bits`-wide hash-aggregate (one ±1 sum
  * column per bit — 60 aggregation buffers per group for the d22 pair
  * fingerprints). Per-bit integer sums are exactly order- and
  * grouping-insensitive, so folding them in array order inside whole-stage
  * codegen produces the identical fingerprint (SimHashBitsSpec pins the
  * equivalence) with no explode, no aggregate, and no exchange before the
  * banding stage.
  *
  * Null semantics match [[MinHashSigs]]: strict on a null array or null
  * elements; an EMPTY array yields NULL ("too short to fingerprint" — the
  * aggregate form simply had no rows for such a document), so callers
  * filter nulls exactly as the minhash path does.
  */
case class SimHashBits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), IntegerType)

  override def dataType: DataType = LongType

  // empty input → null output, so nullability can't be derived statically
  override def nullable: Boolean = true

  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(idsAny: Any, bitsAny: Any): Any = {
    val ids = idsAny.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[Int]
    val n = ids.numElements()
    if (n == 0) return null
    val mask = (1L << bits) - 1L
    val counters = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) return null
      val g = (ids.getLong(i) * SimHashBits.mult + SimHashBits.add) & mask
      var b = 0
      while (b < bits) {
        counters(b) += (if (((g >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) hash |= 1L << b
      b += 1
    }
    hash
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, bits) => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val mask = ctx.freshName("mask")
      val counters = ctx.freshName("counters")
      val hash = ctx.freshName("hash")
      s"""
         |int $n = $ids.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long $mask = (1L << $bits) - 1L;
         |  int[] $counters = new int[$bits];
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($ids.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $g = ($ids.getLong($i) * ${SimHashBits.mult}L + ${SimHashBits.add}L) & $mask;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $counters[$b] += ((($g >> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    long $hash = 0L;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      if ($counters[$b] > 0) $hash |= 1L << $b;
         |    }
         |    ${ev.value} = $hash;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SimHashBits {

  /** Per-token hash constants shared with [[graft.ops.Dedup.simhash]] (and
    * its oracle): g(x) = (x·mult + add) mod 2^bits. `bits` ≤ 62 keeps the
    * product of a token id (< 2³¹) and `mult` inside a signed long.
    */
  val mult: Long = 2654435761L
  val add: Long = 0x9747b28cL

  def column(ids: Column, bits: Int): Column =
    ExpressionUtils.column(
      SimHashBits(ExpressionUtils.expression(ids),
        ExpressionUtils.expression(lit(bits))))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_bits"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SimHashBits].getName, "simhash_bits"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"simhash_bits expects 2 arguments, got ${args.length}")
      SimHashBits(args(0), args(1))
    }
  )
}
