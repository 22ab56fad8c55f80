package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType}

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * interpreted — fine for a projection over N rows, ruinous on an O(N·k)
  * candidate-pair stage where the fold runs millions of times. This
  * expression generates a tight primitive loop inside whole-stage codegen
  * (`doGenCode`) — the "(b) custom Catalyst Expression" rung of the
  * extension ladder, used exactly because the built-in operators genuinely
  * can't express a codegen'd array fold.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]`; the engine-facing API is
  * [[graft.functions.VectorFunctions]].
  *
  * Semantics are identical to the sequential HOF fold (same left-to-right
  * double accumulation), so results stay bit-compatible with the DuckDB
  * oracle's `list_dot_product`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // nullable even over non-null array columns: a null *element* yields null
  // (without this, codegen would emit `false = true` for that path)
  override def nullable: Boolean = {
    def elemNullable(e: Expression) = e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)
  }

  override def prettyName: String = "dot_product"

  // a null *element* propagates null (matching the HOF fold and DuckDB's
  // list_dot_product, whose null arithmetic poisons the accumulator) — the
  // inputTypes accept containsNull arrays, so this case is reachable
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // when the expression is non-nullable, ev.isNull is the literal
      // `false` — emitting an assignment to it would be uncompilable Java
      // (`false = true;`), so the element-null check is only generated when
      // an element can actually be null
      val nullCheck =
        if (nullable) s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction` —
    * makes `dot_product(a, b)` callable from `spark.sql`.
    */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProduct].getName, "dot_product"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
      DotProduct(args(0), args(1))
    }
  )
}

/** 8-bit scalar-quantization encode for the s8 ANN path: element-wise
  * `code_i = hi_i > lo_i ? min(floor((x_i − lo_i)·255 / (hi_i − lo_i)), 255)
  *                       : 0`
  * over a (unit) vector and the per-dimension corpus min/max arrays
  * (literals — dimension stats are metadata-sized), emitted as BINARY: one
  * byte per dimension, the 8×-smaller representation that is the entire
  * point of scalar quantization at 100 TB (the corpus that travels through
  * the scoring join is byte codes, not doubles). The HOF formulation this
  * replaces (`transform` + two `element_at`s on broadcast literals) was
  * evaluated interpreted, paying a lambda dispatch plus two lookups per
  * element per row; this expression runs the identical arithmetic in the
  * identical operation order (sub, mul, div, floor, clamp — codes stay
  * bit-reproducible against the oracle) as one primitive loop inside
  * whole-stage codegen (plan-pinned in PlanSpec).
  *
  * Null semantics: strict — a null element in any input array yields a
  * null RESULT (bytes cannot hold a null slot). Embeddings contain no null
  * elements, so this is unreachable in the pipeline (ShingleHash stance).
  */
case class QuantizeCode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = BinaryType

  private def elemNullable(e: Expression) = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    children.exists(_.nullable) || children.exists(elemNullable)

  override def prettyName: String = "quantize_code"

  override protected def nullSafeEval(v: Any, mn: Any, mx: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val lo = mn.asInstanceOf[ArrayData]
    val hi = mx.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || lo.isNullAt(i) || hi.isNullAt(i)) return null
      val l = lo.getDouble(i)
      val h = hi.getDouble(i)
      val c =
        if (h > l) math.min(math.floor((x.getDouble(i) - l) * 255.0 / (h - l)), 255.0)
        else 0.0
      out(i) = c.toInt.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, mx) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val l = ctx.freshName("lo")
      val h = ctx.freshName("hi")
      val c = ctx.freshName("c")
      // ev.isNull is the literal `false` when non-nullable — only emit the
      // element-null guard when a null slot is actually possible
      val nullCheck =
        if (nullable)
          s"if ($v.isNullAt($i) || $mn.isNullAt($i) || $mx.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $l = $mn.getDouble($i);
         |  double $h = $mx.getDouble($i);
         |  double $c;
         |  if ($h > $l) {
         |    $c = java.lang.Math.floor(($v.getDouble($i) - $l) * 255.0 / ($h - $l));
         |    if ($c > 255.0) $c = 255.0;
         |  } else { $c = 0.0; }
         |  $out[$i] = (byte) (int) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Decode-corrected dot product over two 8-bit code vectors — the scoring
  * half of scalar-quantized ANN: each byte is dequantized in-register
  * (`lo_i + c_i·((hi_i − lo_i)/255)`, the standard SQ reconstruction) and
  * the products accumulate sequentially, so the score approximates the
  * TRUE unit-space dot (≈ cosine — recall tracked in RECALL.json) rather
  * than an affine-distorted code dot. Codes stay bytes end-to-end: the 8×
  * memory/bandwidth win survives the scoring join, and only this fused
  * expression ever sees decoded doubles (one at a time, in-register — no
  * decoded array is materialized). Arithmetic order is pinned
  * (`lo + c·Δ`, product, left-to-right sum) so the DuckDB oracle
  * reproduces scores bit-for-bit.
  */
case class DequantizeDot(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, BinaryType, ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  private def elemNullable(e: Expression) = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    children.exists(_.nullable) || elemNullable(third) || elemNullable(fourth)

  override def prettyName: String = "dequantize_dot"

  override protected def nullSafeEval(a: Any, b: Any, mn: Any, mx: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val lo = mn.asInstanceOf[ArrayData]
    val hi = mx.asInstanceOf[ArrayData]
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (lo.isNullAt(i) || hi.isNullAt(i)) return null
      val l = lo.getDouble(i)
      val d = (hi.getDouble(i) - l) / 255.0
      acc += (l + (x(i) & 0xFF) * d) * (l + (y(i) & 0xFF) * d)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, mn, mx) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val l = ctx.freshName("lo")
      val d = ctx.freshName("delta")
      val nullCheck =
        if (nullable)
          s"if ($mn.isNullAt($i) || $mx.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $l = $mn.getDouble($i);
         |  double $d = ($mx.getDouble($i) - $l) / 255.0;
         |  $acc += ($l + ($a[$i] & 0xFF) * $d) * ($l + ($b[$i] & 0xFF) * $d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object DequantizeDot {
  def column(a: Column, b: Column, mins: Column, maxs: Column): Column =
    ExpressionUtils.column(
      DequantizeDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b),
        ExpressionUtils.expression(mins), ExpressionUtils.expression(maxs)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("dequantize_dot"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DequantizeDot].getName, "dequantize_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 4, s"dequantize_dot expects 4 arguments, got ${args.length}")
      DequantizeDot(args(0), args(1), args(2), args(3))
    }
  )
}

object QuantizeCode {
  def column(vec: Column, mins: Column, maxs: Column): Column =
    ExpressionUtils.column(
      QuantizeCode(ExpressionUtils.expression(vec),
        ExpressionUtils.expression(mins), ExpressionUtils.expression(maxs)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_code"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[QuantizeCode].getName, "quantize_code"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"quantize_code expects 3 arguments, got ${args.length}")
      QuantizeCode(args(0), args(1), args(2))
    }
  )
}

/** L2 normalization as one codegen'd expression — the front-end of EVERY
  * ANN/embedding query (s1–s8, d6, d12 all normalize once and dot
  * everywhere). The HOF formulation (`transform(v, x → x / sqrt(aggregate(
  * v, 0.0, (acc, y) → acc + y·y)))`) is evaluated interpreted and re-enters
  * the lambda interpreter per element; this expression runs the identical
  * arithmetic — squares accumulated sequentially left-to-right, `sqrt`,
  * then one divide per element, so unit vectors stay bit-identical to the
  * oracle's `[x / sqrt(list_dot_product(v0, v0)) for x in v0]` — in one
  * primitive loop inside whole-stage codegen. A zero vector divides by
  * 0.0 exactly as the HOF did (IEEE ±Inf/NaN elements), preserving parity.
  *
  * Null semantics: strict — a null element yields a null result (the HOF's
  * null arithmetic would poison the norm anyway; embeddings contain no
  * null elements).
  */
case class UnitVector(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def prettyName: String = "unit_vector"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val e = x.getDouble(i)
      acc += e * e
      i += 1
    }
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val e = ctx.freshName("e")
      val nullCheck =
        if (nullable) s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val guard = if (nullable) s"if (!${ev.isNull})" else ""
      s"""
         |int $n = $v.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $e = $v.getDouble($i);
         |  $acc += $e * $e;
         |}
         |$guard {
         |  double $norm = java.lang.Math.sqrt($acc);
         |  double[] $out = new double[$n];
         |  for (int $j = 0; $j < $n; $j++) { $out[$j] = $v.getDouble($j) / $norm; }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnitVector {
  def column(v: Column): Column =
    ExpressionUtils.column(UnitVector(ExpressionUtils.expression(v)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("unit_vector"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[UnitVector].getName, "unit_vector"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"unit_vector expects 1 argument, got ${args.length}")
      UnitVector(args(0))
    }
  )
}
