package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** All k MinHash minima of a feature-id array in ONE codegen'd pass —
  * `sig_j = min over x in ids of (x·a_j + b_j) mod p`, p = 2³¹ − 1 (the
  * shared dedup modulus; ids are token/shingle hashes < p, coefficients are
  * small, so the product never overflows a long).
  *
  * This replaces two formulations that both paid more than the arithmetic:
  *
  *   - the batch path exploded the shingle array to (doc_id, shingle_id)
  *     rows and re-aggregated `min((x·a+b) % p)` per doc — correct and
  *     partial-agg-friendly, but it rebuilt each document's rows into a
  *     hash-aggregate just to fold them back down; as an expression the
  *     signature is a pure PROJECTION (no explode, no aggregate, no
  *     hash-map) that stays inside whole-stage codegen;
  *   - the streaming path folded `array_min(transform(sids, …))` once per
  *     coefficient — k interpreted lambda passes over every array.
  *
  * One loop over the ids with all k minima in registers does the identical
  * arithmetic (min is order- and duplicate-insensitive, so distinctness of
  * the input ids is irrelevant), keeping d3/d4/d10/d14 oracle hashes
  * byte-for-byte unchanged (MinHashSigsSpec pins equivalence to both old
  * forms).
  *
  * Null semantics: strict for a null input array and for null elements; an
  * EMPTY ids array yields NULL (matching `array_min` over an empty
  * transform — "too short to sign"), so the expression is always nullable
  * and callers filter `size(ids) > 0` exactly as before.
  */
case class MinHashSigs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty input → null output, so nullability can't be derived statically
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(idsAny: Any, aAny: Any, bAny: Any): Any = {
    val ids = idsAny.asInstanceOf[ArrayData]
    val as = aAny.asInstanceOf[ArrayData]
    val bs = bAny.asInstanceOf[ArrayData]
    val n = ids.numElements()
    if (n == 0) return null
    val k = as.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) return null
      val x = ids.getLong(i)
      var j = 0
      while (j < k) {
        if (as.isNullAt(j) || bs.isNullAt(j)) return null
        val h = (x * as.getLong(j) + bs.getLong(j)) % MinHashSigs.prime
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, as, bs) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $ids.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  int $k = $as.numElements();
         |  long[] $av = new long[$k];
         |  long[] $bv = new long[$k];
         |  long[] $mins = new long[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($as.isNullAt($j) || $bs.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $av[$j] = $as.getLong($j);
         |    $bv[$j] = $bs.getLong($j);
         |    $mins[$j] = Long.MAX_VALUE;
         |  }
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($ids.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $x = $ids.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = ($x * $av[$j] + $bv[$j]) % ${MinHashSigs.prime}L;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinHashSigs {

  /** 2³¹ − 1 — the shared dedup modulus ([[graft.ops.Dedup.minhashPrime]]). */
  val prime: Long = 2147483647L

  def column(ids: Column, as: Column, bs: Column): Column =
    ExpressionUtils.column(
      MinHashSigs(ExpressionUtils.expression(ids),
        ExpressionUtils.expression(as), ExpressionUtils.expression(bs)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sigs"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinHashSigs].getName, "minhash_sigs"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"minhash_sigs expects 3 arguments, got ${args.length}")
      MinHashSigs(args(0), args(1), args(2))
    }
  )
}
