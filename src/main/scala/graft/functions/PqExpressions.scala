package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Product-quantization encode — the s9 ANN compression: split the d-dim
  * unit vector into `m` contiguous subspaces of d/m dims, and store per
  * subspace the index of the nearest of `ks` sub-centroids (squared-L2,
  * ties to the smaller index). Output is BINARY(m): ONE BYTE PER SUBSPACE —
  * for d=64, m=8 that is 8 bytes/vector, 64× smaller than the float64
  * units and 8× smaller than s8's scalar codes, which is the
  * representation that lets a 100 TB corpus's index live in memory.
  *
  * `cent` is the flattened centroid table (ks full d-dim vectors,
  * row-major by centroid index — ks·d doubles, metadata-sized, passed as a
  * literal). Only sub-slice [s·d/m, (s+1)·d/m) of centroid c is read when
  * scoring subspace s, so one flat literal serves all subspaces.
  *
  * Determinism (oracle parity): each squared distance accumulates
  * `(x−y)²` left-to-right from 0.0 — exactly the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, [(x−y)*(x−y) …]), +)` — and the argmin
  * keeps the EARLIEST index on exact ties (strict `<` update), matching
  * `row_number() ORDER BY dist ASC, cidx ASC`. Codes are therefore
  * byte-identical cross-engine.
  *
  * Null semantics: strict — null array or null element yields null.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType)

  override def dataType: DataType = BinaryType

  private def elemNullable(e: Expression) = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    children.exists(_.nullable) || elemNullable(first) || elemNullable(second)

  override def prettyName: String = "pq_code"

  override protected def nullSafeEval(vAny: Any, cAny: Any, mAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val cent = cAny.asInstanceOf[ArrayData]
    val m = mAny.asInstanceOf[Int]
    val n = v.numElements()
    val subDim = n / m
    val ks = cent.numElements() / n
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          val i = s * subDim + j
          if (v.isNullAt(i) || cent.isNullAt(c * n + i)) return null
          val d = v.getDouble(i) - cent.getDouble(c * n + i)
          acc += d * d
          j += 1
        }
        if (acc < bestDist) { bestDist = acc; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cent, m) => {
      val n = ctx.freshName("n")
      val subDim = ctx.freshName("subDim")
      val ks = ctx.freshName("ks")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val nullCheck =
        if (nullable)
          s"if ($v.isNullAt($i) || $cent.isNullAt($c * $n + $i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $v.numElements();
         |int $subDim = $n / $m;
         |int $ks = $cent.numElements() / $n;
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |  int $best = 0;
         |  double $bestDist = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ks && !${ev.isNull}; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      int $i = $s * $subDim + $j;
         |      $nullCheck
         |      double $d = $v.getDouble($i) - $cent.getDouble($c * $n + $i);
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestDist) { $bestDist = $acc; $best = $c; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  def column(vec: Column, cent: Column, m: Column): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(cent), ExpressionUtils.expression(m)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("pq_code"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[PqEncode].getName, "pq_code"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"pq_code expects 3 arguments, got ${args.length}")
      PqEncode(args(0), args(1), args(2))
    }
  )
}

/** Asymmetric-distance (ADC) scoring for product-quantized ANN: the query
  * stays a FULL d-dim unit vector, each corpus neighbor is its m-byte PQ
  * code, and the score is `Σ_s dot(q_sub(s), cent[code[s]]_sub(s))` — the
  * dot of the query against the neighbor's RECONSTRUCTION, without ever
  * materializing it (each centroid element is read straight from the
  * flat literal, in-register). Codes stay bytes through the whole
  * O(|Q|·N) scoring join — the 64× scan-size reduction IS the operator.
  *
  * Determinism: per-subspace partials accumulate left-to-right from 0.0
  * and the m partials add in subspace order — exactly the oracle's
  * `list_reduce(list_prepend(0.0, list(part ORDER BY s)), +)` — so scores
  * and ranks are bit-reproducible cross-engine.
  *
  * Null semantics: strict (embeddings contain no null elements).
  */
case class PqAdcDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), BinaryType, ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  private def elemNullable(e: Expression) = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    children.exists(_.nullable) || elemNullable(first) || elemNullable(third)

  override def prettyName: String = "pq_adc_dot"

  override protected def nullSafeEval(qAny: Any, codeAny: Any, cAny: Any): Any = {
    val q = qAny.asInstanceOf[ArrayData]
    val code = codeAny.asInstanceOf[Array[Byte]]
    val cent = cAny.asInstanceOf[ArrayData]
    val n = q.numElements()
    val m = code.length
    val subDim = n / m
    var total = 0.0
    var s = 0
    while (s < m) {
      val c = code(s) & 0xFF
      var acc = 0.0
      var j = 0
      while (j < subDim) {
        val i = s * subDim + j
        if (q.isNullAt(i) || cent.isNullAt(c * n + i)) return null
        acc += q.getDouble(i) * cent.getDouble(c * n + i)
        j += 1
      }
      total += acc
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, code, cent) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val subDim = ctx.freshName("subDim")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val total = ctx.freshName("total")
      val nullCheck =
        if (nullable)
          s"if ($q.isNullAt($i) || $cent.isNullAt($c * $n + $i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $q.numElements();
         |int $m = $code.length;
         |int $subDim = $n / $m;
         |double $total = 0.0;
         |for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |  int $c = $code[$s] & 0xFF;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $subDim; $j++) {
         |    int $i = $s * $subDim + $j;
         |    $nullCheck
         |    $acc += $q.getDouble($i) * $cent.getDouble($c * $n + $i);
         |  }
         |  $total += $acc;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $total; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcDot {
  def column(q: Column, code: Column, cent: Column): Column =
    ExpressionUtils.column(PqAdcDot(ExpressionUtils.expression(q),
      ExpressionUtils.expression(code), ExpressionUtils.expression(cent)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("pq_adc_dot"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[PqAdcDot].getName, "pq_adc_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"pq_adc_dot expects 3 arguments, got ${args.length}")
      PqAdcDot(args(0), args(1), args(2))
    }
  )
}
