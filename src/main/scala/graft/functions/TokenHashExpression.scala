package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-reproducible token hash: a polynomial fold of the string's
  * Unicode code points, `h ← (h·131 + cp) mod (2³¹−1)`, starting at 0.
  *
  * This is the production token-id function of [[graft.ops.Vocab]]: a pure
  * projection — no vocabulary build, no distinct, no rank, no join — so the
  * token-id stage of the dedup/fingerprint operators costs zero shuffles and
  * zero driver state at any corpus size. The fold is deliberately simple
  * arithmetic over code points so that any engine can reproduce the ids in
  * plain SQL (the DuckDB oracle inlines
  * `list_reduce(list_prepend(0, [unicode(c) for c in string_split(t,'')]),
  * (a,c) -> (a*131+c) % 2147483647)`); when cross-engine reproducibility is
  * not needed, `xxhash64(token)` is the drop-in alternative with a wider id
  * space.
  *
  * Collisions: ids live in [0, 2³¹−1); two distinct tokens may collide, but
  * every engine computing the same fold sees the *same* collisions, so
  * results stay comparable bit-for-bit. Intermediate values stay well inside
  * a signed 64-bit long (acc < 2³¹, acc·131 < 2³⁸, + cp ≤ 0x10FFFF).
  *
  * Codegen'd (like [[DotProduct]]): the per-character loop runs inside
  * whole-stage codegen rather than through an interpreted HOF chain of
  * `aggregate(transform(sequence(...)))`.
  */
case class TokenHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "token_hash"

  override protected def nullSafeEval(input: Any): Any =
    TokenHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $s.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $h = ($h * 131L + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHash {

  /** The fold shared by [[TokenHash]] and [[TokenHashArray]]. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  def column(s: Column): Column =
    ExpressionUtils.column(TokenHash(ExpressionUtils.expression(s)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("token_hash"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TokenHash].getName, "token_hash"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"token_hash expects 1 argument, got ${args.length}")
      TokenHash(args.head)
    }
  )
}

/** `token_hash_array(array<string>)` → `array<bigint>`: [[TokenHash]] mapped
  * over a token array in one codegen'd expression. This replaces
  * `transform(tokens, t → token_hash(t))` — `transform` is a higher-order
  * function, which never participates in whole-stage codegen, so the
  * array-assembly stage of the shingling front-end (Vocab.hashTokenIdArrays,
  * feeding the Jaccard / LSH-band / dedup-group queries) paid one
  * interpreted lambda invocation per token. With this expression the whole
  * chain `split → token_hash_array → shingle_hash → explode` stays inside a
  * single codegen span (plan-pinned in ShingleHashSpec).
  *
  * Null elements map to null elements (matching `transform`'s semantics);
  * a null array yields null.
  */
case class TokenHashArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }

  override def prettyName: String = "token_hash_array"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashArray.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = org.apache.spark.sql.graft.TokenHashArray.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashArray {

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        out(i) = TokenHash.hash(tokens.getUTF8String(i).toString)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(tokens: Column): Column =
    ExpressionUtils.column(TokenHashArray(ExpressionUtils.expression(tokens)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("token_hash_array"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TokenHashArray].getName, "token_hash_array"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"token_hash_array expects 1 argument, got ${args.length}")
      TokenHashArray(args.head)
    }
  )
}
