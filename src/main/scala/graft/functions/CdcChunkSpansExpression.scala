package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** `cdc_chunk_spans(ids, k, divisor)` → the content-defined chunk spans of a
  * character-id sequence as `array<struct<start_pos, chunk_len>>` (1-based
  * start positions, in document order — the array index IS the chunk index).
  *
  * Boundary rule (rsync/LBFS/restic): position `p` ends a chunk when the
  * rolling k-gram hash of ids[p..p+k−1] — the shared dedup fold
  * `acc ← (acc·37 + id + 1) mod (2³¹−1)`, the same one [[ShingleHash]]
  * attests — is ≡ 0 mod `divisor`. Incomplete tail k-grams never cut (the
  * window form's null-lead poisoning, made explicit); a cut at the last
  * position is absorbed by the final chunk. Empty input yields no spans;
  * `n < k` yields the single span [1, n].
  *
  * This is the codegen'd replacement for the round-6 plan that exploded one
  * row PER CHARACTER through a shuffled per-doc sort window (`posexplode` →
  * `Window.partitionBy(doc_id).orderBy(pos)` with k chained `lead`s → prefix
  * sum → re-aggregate → join): linear, but at 100 TB of text it shuffled and
  * sorted ~10¹⁴ char rows (~20× row-overhead amplification) to compute what
  * is a pure per-doc streaming fold. Here the whole chain
  * `split → token_hash_array → cdc_chunk_spans → posexplode` runs where the
  * document lives — no pre-aggregation Exchange, no WindowExec, no join
  * (plan-pinned in CdcChunkSpec). Same fold, same modulus, same boundary
  * and indexing semantics ⇒ bit-identical chunks (the x37/d31 oracle SQL
  * keeps its window form and stays green).
  *
  * The per-document loop lives in a static helper invoked from generated
  * code (the [[ShingleHash]] pattern): branchy imperative code stays out of
  * the generated source but the expression remains inside the
  * whole-stage-codegen span. Intermediate values stay inside a signed long:
  * acc < 2³¹−1, so acc·37 + id + 1 < 2³⁶·² + 2³¹.
  */
case class CdcChunkSpans(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), IntegerType, LongType)

  override def dataType: DataType = CdcChunkSpans.outType

  override def prettyName: String = "cdc_chunk_spans"

  override protected def nullSafeEval(ids: Any, k: Any, divisor: Any): Any =
    CdcChunkSpans.compute(ids.asInstanceOf[ArrayData], k.asInstanceOf[Int],
      divisor.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, k, divisor) => {
      s"${ev.value} = org.apache.spark.sql.graft.CdcChunkSpans.compute($ids, $k, $divisor);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcChunkSpans {

  private val prime = 2147483647L // 2³¹ − 1, the shared dedup modulus

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("start_pos", LongType, nullable = false),
    StructField("chunk_len", LongType, nullable = false))), containsNull = false)

  /** One document's chunk spans. Cuts fall at 1-based positions `p ≤ n−k+1`
    * whose complete k-gram hash is divisible; a cut at `p` means the chunk
    * ENDS at `p` (the window form's "chunk_idx counts boundaries strictly
    * before this position"). A cut at `p = n` adds no empty trailing chunk.
    * Null id slots (never produced by the split front-end) poison every
    * window containing them — no cut there, matching the lead-chain's
    * null-propagation (here: a null's window-offset value is the sentinel
    * 0 so the rolling update stays consistent, and `lastNull` suppresses
    * the cut while the null is inside the window).
    */
  def compute(ids: ArrayData, k: Int, divisor: Long): ArrayData = {
    val n = ids.numElements()
    // one pass to the shared core's (id + 1) offset form; null → sentinel
    // 0 with its index recorded (valid offsets are ≥ 1, so 0 is free)
    val v = new Array[Long](n)
    var hasNull = false
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) { v(i) = 0L; hasNull = true }
      else {
        // reduce mod P up front: congruent to the old (acc·37 + id + 1)
        // fold for any id, and keeps v·37^(k−1) inside a signed long even
        // for out-of-contract SQL inputs (token ids are < P already)
        v(i) = (((ids.getLong(i) + 1L) % prime) + prime) % prime
      }
      i += 1
    }
    spansOf(v, if (hasNull) ids else null, k, divisor)
  }

  /** The shared span scan over window-offset values `v(i) = id(i) + 1`
    * (0 = null sentinel): ONE rolling Rabin–Karp pass — slide out
    * `v(p−1)·37^(k−1)`, slide in `v(p+k−1)`, all mod 2³¹−1 — instead of
    * recomputing each k-gram from scratch (O(n) vs O(n·k); the SQL
    * functions accept arbitrary k, and rsync-sized windows are k = 32–64).
    * The rolling value always equals the fold over the CURRENT window's
    * offsets (the sentinel keeps the arithmetic consistent through nulls),
    * and a window is eligible to cut only when no null sits inside it.
    * Bit-equality with the recompute form (and the round-6 window plan) is
    * property-pinned in CdcChunkSpec.
    */
  private def spansOf(v: Array[Long], nullSrc: ArrayData, k: Int,
      divisor: Long): ArrayData = {
    val n = v.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (k <= 0 || divisor <= 0 || k > n) {
      return new GenericArrayData(Array[Any](InternalRow(1L, n.toLong)))
    }
    // worst case every eligible position cuts: ≤ n spans
    val starts = new Array[Long](n)
    val ends = new Array[Long](n)
    var m = 0
    var chunkStart = 1L
    val lastFull = n - k + 1 // last position with a complete k-gram
    // 37^(k−1) mod P for the slide-out term
    var pow = 1L
    var e = 1
    while (e < k) { pow = (pow * 37L) % prime; e += 1 }
    // initial window [0, k−1]; track the most recent null index seen
    var acc = 0L
    var lastNull = -1
    var j = 0
    while (j < k) {
      if (nullSrc != null && nullSrc.isNullAt(j)) lastNull = j
      acc = (acc * 37L + v(j)) % prime
      j += 1
    }
    var p = 1
    while (p <= lastFull) {
      // window is [p−1, p+k−2], 0-based
      if (lastNull < p - 1 && acc % divisor == 0L && p < n) {
        starts(m) = chunkStart
        ends(m) = p.toLong
        m += 1
        chunkStart = p + 1L
      }
      if (p <= lastFull - 1) {
        // slide: out v(p−1), in v(p+k−1); keep the residue non-negative
        val in = p + k - 1
        if (nullSrc != null && nullSrc.isNullAt(in)) lastNull = in
        acc = ((acc - (v(p - 1) * pow) % prime) % prime + prime) % prime
        acc = (acc * 37L + v(in)) % prime
      }
      p += 1
    }
    starts(m) = chunkStart
    ends(m) = n.toLong
    m += 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = InternalRow(starts(i), ends(i) - starts(i) + 1L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[compute]] straight off the document string — the hot form
    * [[CdcChunkSpansText]] generates into: one code-point scan per doc, no
    * per-character UTF8String array from `split(text, "")` and no boxed id
    * array from `token_hash_array` (measured 0.77 → sub-0.5 s on the
    * sf0.1 x37 query). A 1-code-point token's [[TokenHash]] id IS its code
    * point ((0·131 + cp) mod P = cp), so hashing code points directly is
    * the identical fold; positions are counted in code points, matching
    * both `split`'s elements and `substring`'s offsets (UTF8String counts
    * complete UTF-8 sequences). Bit-equality with the array form (and with
    * the round-6 window form) is property-pinned in CdcChunkSpec.
    */
  def computeText(text: org.apache.spark.unsafe.types.UTF8String, k: Int,
      divisor: Long): ArrayData = {
    val s = text.toString
    val nChars = s.length
    // code points in (id + 1) offset form, one scan; surrogate pairs
    // collapse to one id — then the same shared rolling span scan as the
    // array form (no second copy of the boundary algorithm to keep in sync)
    val v = new Array[Long](nChars)
    var n = 0
    var ci = 0
    while (ci < nChars) {
      val cp = s.codePointAt(ci)
      v(n) = cp.toLong + 1L
      n += 1
      ci += Character.charCount(cp)
    }
    spansOf(if (n == nChars) v else java.util.Arrays.copyOf(v, n), null, k, divisor)
  }

  def column(ids: Column, k: Int, divisor: Long): Column =
    ExpressionUtils.column(CdcChunkSpans(
      ExpressionUtils.expression(ids),
      org.apache.spark.sql.catalyst.expressions.Literal(k),
      org.apache.spark.sql.catalyst.expressions.Literal(divisor)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunk_spans"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CdcChunkSpans].getName, "cdc_chunk_spans"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"cdc_chunk_spans expects 3 arguments, got ${args.length}")
      CdcChunkSpans(args.head, args(1), args(2))
    }
  )
}

/** `cdc_chunk_spans_text(text, k, divisor)` — [[CdcChunkSpans]] taking the
  * document STRING directly: same spans, one code-point scan, none of the
  * `split(text, "")` per-character array or `token_hash_array` boxing the
  * array form pays just to rebuild ids the string already carries
  * (semantics and the equality proof in [[CdcChunkSpans.computeText]]'s
  * doc). This is the form [[graft.ops.TextOps.cdcChunks]] plans.
  */
case class CdcChunkSpansText(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType, IntegerType, LongType)

  override def dataType: DataType = CdcChunkSpans.outType

  override def prettyName: String = "cdc_chunk_spans_text"

  override protected def nullSafeEval(text: Any, k: Any, divisor: Any): Any =
    CdcChunkSpans.computeText(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k.asInstanceOf[Int], divisor.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, k, divisor) => {
      s"${ev.value} = org.apache.spark.sql.graft.CdcChunkSpans.computeText($text, $k, $divisor);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcChunkSpansText {

  def column(text: Column, k: Int, divisor: Long): Column =
    ExpressionUtils.column(CdcChunkSpansText(
      ExpressionUtils.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(k),
      org.apache.spark.sql.catalyst.expressions.Literal(divisor)))

  /** SQL registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunk_spans_text"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CdcChunkSpansText].getName, "cdc_chunk_spans_text"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"cdc_chunk_spans_text expects 3 arguments, got ${args.length}")
      CdcChunkSpansText(args.head, args(1), args(2))
    }
  )
}
