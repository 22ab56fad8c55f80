package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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
