package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

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
  * over a vector and the per-dimension corpus min/max arrays (literals —
  * dimension stats are metadata-sized). The HOF formulation
  * (`transform` + two `element_at`s on broadcast literals) is evaluated
  * interpreted, paying a lambda dispatch plus two catalogue lookups per
  * element per row — this expression runs the identical arithmetic, in the
  * identical operation order (sub, mul, div, floor, clamp — so codes stay
  * bit-reproducible against the oracle), as one primitive loop inside
  * whole-stage codegen (plan-pinned in PlanSpec).
  *
  * Null semantics: a null in any of the three array slots yields a null
  * output element. (The HOF form's `least(floor(null…), 255.0)` would yield
  * 255.0 on a null element because `least` skips nulls — an accident, not a
  * contract; embeddings contain no null elements, so the two forms are
  * identical on every input the pipeline produces — the ShingleHash stance.)
  */
case class QuantizeCode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))

  private def elemNullable(e: Expression) = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def dataType: DataType =
    ArrayType(DoubleType,
      containsNull = elemNullable(first) || elemNullable(second) || elemNullable(third))

  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  override def prettyName: String = "quantize_code"

  override protected def nullSafeEval(v: Any, mn: Any, mx: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val lo = mn.asInstanceOf[ArrayData]
    val hi = mx.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || lo.isNullAt(i) || hi.isNullAt(i)) out(i) = null
      else {
        val l = lo.getDouble(i)
        val h = hi.getDouble(i)
        out(i) =
          if (h > l) math.min(math.floor((x.getDouble(i) - l) * 255.0 / (h - l)), 255.0)
          else 0.0
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, mx) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val l = ctx.freshName("lo")
      val h = ctx.freshName("hi")
      val c = ctx.freshName("c")
      if (dataType.asInstanceOf[ArrayType].containsNull) {
        // element nulls possible: box into an Object[] (GenericArrayData)
        s"""
           |int $n = $v.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($v.isNullAt($i) || $mn.isNullAt($i) || $mx.isNullAt($i)) {
           |    $out[$i] = null;
           |  } else {
           |    double $l = $mn.getDouble($i);
           |    double $h = $mx.getDouble($i);
           |    double $c;
           |    if ($h > $l) {
           |      $c = java.lang.Math.floor(($v.getDouble($i) - $l) * 255.0 / ($h - $l));
           |      if ($c > 255.0) $c = 255.0;
           |    } else { $c = 0.0; }
           |    $out[$i] = (Double) $c;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      } else {
        // all-non-null path: primitive double[] → UnsafeArrayData, no boxing
        s"""
           |int $n = $v.numElements();
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  double $l = $mn.getDouble($i);
           |  double $h = $mx.getDouble($i);
           |  double $c;
           |  if ($h > $l) {
           |    $c = java.lang.Math.floor(($v.getDouble($i) - $l) * 255.0 / ($h - $l));
           |    if ($c > 255.0) $c = 255.0;
           |  } else { $c = 0.0; }
           |  $out[$i] = $c;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
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
