package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf-lite wire-format codec for a Canal-shaped binlog envelope —
  * the real D1 decode path (the reference deserializes Canal protobuf
  * `Packet→Messages→[Entry]` then `RowChange.MergeFromString(storeValue)`,
  * `/root/reference/mon_mysql_dml.py:150-169, 254-255`). The envelope is an
  * `Entry`-like outer message with a nested `Header` and a nested
  * `RowChange`-like `storeValue`, in standard protobuf wire encoding
  * (varint / length-delimited — a public, stable format):
  *
  * {{{
  *   Entry   := 1:LEN Header  5:LEN Store
  *   Header  := 1:VARINT pos  2:VARINT execute_ms  3:LEN gtid  4:LEN event_type
  *   Store   := 1:VARINT affected_rows  2:VARINT size_bytes
  * }}}
  *
  * Decoding skips unknown fields (forward compatibility, like any proto
  * reader) and yields NULL for malformed bytes — the row-level error
  * filter (F2) falls out as `WHERE decoded IS NOT NULL`.
  */
object EnvelopeCodec {

  // ---- varint primitives (unsigned LEB128, the protobuf base encoding) ----

  private def varintSize(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0) { x >>>= 7; n += 1 }
    n
  }

  private def writeVarint(buf: Array[Byte], at: Int, v: Long): Int = {
    var x = v; var i = at
    while ((x & ~0x7fL) != 0) { buf(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i += 1 }
    buf(i) = x.toByte
    i + 1
  }

  /** Parse cursor: positions are (value, nextOffset) packed by the caller. */
  private final class Reader(val bytes: Array[Byte], var at: Int, val end: Int) {
    def hasMore: Boolean = at < end
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (shift < 64) {
        if (at >= end) throw new IllegalArgumentException("truncated varint")
        val b = bytes(at); at += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      throw new IllegalArgumentException("varint too long")
    }
    def lenDelimited(): (Int, Int) = {
      val n = varint()
      // compare as `n > end - at` (never `at + n > end`): a crafted length
      // varint near 2^63 would overflow the addition to a negative long,
      // pass the check, and step the cursor backwards — an infinite decode
      // loop on one poison message
      if (n < 0 || n > end - at) throw new IllegalArgumentException("truncated field")
      val r = (at, n.toInt); at += n.toInt; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 2 => lenDelimited(); ()
      case 5 =>
        if (at + 4 > end) throw new IllegalArgumentException("truncated fixed32")
        at += 4
      case 1 =>
        if (at + 8 > end) throw new IllegalArgumentException("truncated fixed64")
        at += 8
      case _ => throw new IllegalArgumentException(s"unsupported wire type $wireType")
    }
  }

  // ---- encode (test-harness side: builds envelopes from fixture columns) ----

  def encode(pos: Long, executeMs: Long, gtid: UTF8String, eventType: UTF8String,
      sizeBytes: Long, affectedRows: Long): Array[Byte] = {
    val g = gtid.getBytes
    val t = eventType.getBytes
    val headerLen = 1 + varintSize(pos) + 1 + varintSize(executeMs) +
      1 + varintSize(g.length.toLong) + g.length + 1 + varintSize(t.length.toLong) + t.length
    val storeLen = 1 + varintSize(affectedRows) + 1 + varintSize(sizeBytes)
    val total = 1 + varintSize(headerLen.toLong) + headerLen +
      1 + varintSize(storeLen.toLong) + storeLen
    val buf = new Array[Byte](total)
    var i = 0
    i = writeVarint(buf, i, (1 << 3) | 2); i = writeVarint(buf, i, headerLen.toLong)
    i = writeVarint(buf, i, (1 << 3) | 0); i = writeVarint(buf, i, pos)
    i = writeVarint(buf, i, (2 << 3) | 0); i = writeVarint(buf, i, executeMs)
    i = writeVarint(buf, i, (3 << 3) | 2); i = writeVarint(buf, i, g.length.toLong)
    System.arraycopy(g, 0, buf, i, g.length); i += g.length
    i = writeVarint(buf, i, (4 << 3) | 2); i = writeVarint(buf, i, t.length.toLong)
    System.arraycopy(t, 0, buf, i, t.length); i += t.length
    i = writeVarint(buf, i, (5 << 3) | 2); i = writeVarint(buf, i, storeLen.toLong)
    i = writeVarint(buf, i, (1 << 3) | 0); i = writeVarint(buf, i, affectedRows)
    i = writeVarint(buf, i, (2 << 3) | 0); i = writeVarint(buf, i, sizeBytes)
    assert(i == total)
    buf
  }

  /** Decode one envelope → InternalRow(pos, execute_ms, gtid, event_type,
    * size_bytes, affected_rows), or null if the bytes are malformed or a
    * required section is absent.
    */
  def decode(bytes: Array[Byte]): InternalRow =
    try {
      var pos = 0L; var execMs = 0L
      var gtid: UTF8String = null; var eventType: UTF8String = null
      var size = 0L; var rows = 0L
      var sawHeader = false; var sawStore = false
      val outer = new Reader(bytes, 0, bytes.length)
      while (outer.hasMore) {
        val tag = outer.varint()
        val field = (tag >>> 3).toInt; val wt = (tag & 7).toInt
        (field, wt) match {
          case (1, 2) =>
            val (off, len) = outer.lenDelimited()
            val h = new Reader(bytes, off, off + len)
            while (h.hasMore) {
              val htag = h.varint()
              ((htag >>> 3).toInt, (htag & 7).toInt) match {
                case (1, 0) => pos = h.varint()
                case (2, 0) => execMs = h.varint()
                case (3, 2) =>
                  val (o, n) = h.lenDelimited(); gtid = UTF8String.fromBytes(bytes, o, n)
                case (4, 2) =>
                  val (o, n) = h.lenDelimited(); eventType = UTF8String.fromBytes(bytes, o, n)
                case (_, w) => h.skip(w)
              }
            }
            sawHeader = true
          case (5, 2) =>
            val (off, len) = outer.lenDelimited()
            val s = new Reader(bytes, off, off + len)
            while (s.hasMore) {
              val stag = s.varint()
              ((stag >>> 3).toInt, (stag & 7).toInt) match {
                case (1, 0) => rows = s.varint()
                case (2, 0) => size = s.varint()
                case (_, w) => s.skip(w)
              }
            }
            sawStore = true
          case (_, w) => outer.skip(w)
        }
      }
      if (!sawHeader || !sawStore || gtid == null || eventType == null) null
      else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](pos, execMs, gtid, eventType, size, rows))
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => null }

  val decodedSchema: StructType = StructType(Seq(
    StructField("binlog_pos", LongType, nullable = false),
    StructField("execute_ms", LongType, nullable = false),
    StructField("gtid", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("affected_rows", LongType, nullable = false)))
}

/** `decode_envelope(binary)` → struct — codegen'd via a static call to
  * [[EnvelopeCodec.decode]] (the same shape Spark's own `from_protobuf`
  * takes: the parse is branchy imperative code, so the expression stays
  * inside whole-stage codegen by *invoking* the codec rather than inlining
  * it). Malformed input yields NULL, not an exception.
  */
case class DecodeEnvelope(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = EnvelopeCodec.decodedSchema
  override def nullable: Boolean = true
  override def prettyName: String = "decode_envelope"

  override protected def nullSafeEval(input: Any): Any =
    EnvelopeCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.EnvelopeCodec.decode($bytes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeEnvelope {
  def column(bytes: Column): Column =
    ExpressionUtils.column(DecodeEnvelope(ExpressionUtils.expression(bytes)))

  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("decode_envelope"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DecodeEnvelope].getName, "decode_envelope"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"decode_envelope expects 1 argument, got ${args.length}")
      DecodeEnvelope(args.head)
    }
  )
}

/** `encode_envelope(pos, execute_ms, gtid, event_type, size_bytes,
  * affected_rows)` → binary. The write side of the codec — used by the
  * correctness harness to build wire bytes from fixture columns (and by any
  * test emitting Canal-shaped envelopes). Interpreted (CodegenFallback):
  * encoding is the producer side, not the engine's scan-time hot path —
  * the decode expression is the one that stays codegen'd.
  */
case class EncodeEnvelope(children: Seq[Expression])
    extends Expression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, StringType, StringType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "encode_envelope"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else EnvelopeCodec.encode(
      vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[UTF8String], vs(3).asInstanceOf[UTF8String],
      vs(4).asInstanceOf[Long], vs(5).asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object EncodeEnvelope {
  def column(pos: Column, executeMs: Column, gtid: Column, eventType: Column,
      sizeBytes: Column, affectedRows: Column): Column =
    ExpressionUtils.column(EncodeEnvelope(
      Seq(pos, executeMs, gtid, eventType, sizeBytes, affectedRows)
        .map(ExpressionUtils.expression)))

  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("encode_envelope"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[EncodeEnvelope].getName, "encode_envelope"),
    (args: Seq[Expression]) => {
      require(args.length == 6, s"encode_envelope expects 6 arguments, got ${args.length}")
      EncodeEnvelope(args)
    }
  )
}
