package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DecodeEnvelope, EncodeEnvelope, EnvelopeCodec}
import org.apache.spark.unsafe.types.UTF8String

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(pos: Long, ms: Long, gtid: String, et: String, size: Long, rows: Long) =
    EnvelopeCodec.encode(pos, ms, UTF8String.fromString(gtid), UTF8String.fromString(et), size, rows)

  test("codec round-trips edge values (zero, negative, huge, empty/unicode strings)") {
    val cases = Seq(
      (0L, 0L, "", "", 0L, 0L),
      (Long.MaxValue, 1700000000123L, "gtid-é", "UPDATE", -1L, 127L),
      (128L, 300L, "x" * 500, "DELETE", Long.MinValue, 1L))
    cases.foreach { case (p, m, g, t, s, r) =>
      val row = EnvelopeCodec.decode(enc(p, m, g, t, s, r))
      assert(row !== null)
      assert(row.getLong(0) === p)
      assert(row.getLong(1) === m)
      assert(row.getUTF8String(2).toString === g)
      assert(row.getUTF8String(3).toString === t)
      assert(row.getLong(4) === s)
      assert(row.getLong(5) === r)
    }
  }

  test("malformed / truncated bytes decode to null, unknown fields are skipped") {
    assert(EnvelopeCodec.decode(Array[Byte](0x08, -1)) === null) // truncated varint
    assert(EnvelopeCodec.decode(Array[Byte](0x0a, 0x7f)) === null) // length overruns
    assert(EnvelopeCodec.decode("garbage".getBytes("UTF-8")) === null)
    val ok = enc(7, 8, "g", "t", 9, 10)
    assert(EnvelopeCodec.decode(ok) !== null)
    // append an unknown varint field (tag 99, wiretype 0): still decodes
    val extra = ok ++ Array[Byte]((99 << 3).toByte, 0x06, 0x01)
    val row = EnvelopeCodec.decode(ok ++ Array[Byte](((99 << 3) | 0).toByte, 0x05))
    assert(row !== null)
    assert(row.getLong(0) === 7L)
    // a truncated copy of a valid envelope is rejected, not mis-parsed
    assert(EnvelopeCodec.decode(ok.take(ok.length - 1)) === null)
    assert(extra.length > ok.length) // (silence unused warning)
    // unknown FIXED-WIDTH field truncated mid-payload: also rejected
    // (tag wiretype 5 = fixed32, but only 2 of 4 bytes present)
    assert(EnvelopeCodec.decode(
      ok ++ Array[Byte](((99 << 3) | 5).toByte, 0x01, 0x02)) === null)
  }

  test("huge length varints are rejected, never loop or escape the null contract") {
    // length ≈ 2^63: `at + n` would overflow negative and pass a naive
    // `at + n > end` bounds check, stepping the cursor BACKWARDS — the
    // decode loop would never terminate on this one 10-byte message
    val poison = Array[Byte](0x0a, 0xf6.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    // other overflow magnitudes: n.toInt lands negative → would surface as
    // NegativeArraySizeException (escaping the catch) without the guard
    val lens = Seq(poison) ++ Seq(
      java.lang.Long.MAX_VALUE, java.lang.Long.MAX_VALUE - 5, 1L << 62, (1L << 32) + 1, Int.MaxValue.toLong
    ).map { n =>
      val buf = new Array[Byte](11); buf(0) = 0x0a
      var x = n; var i = 1
      while ((x & ~0x7fL) != 0) { buf(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i += 1 }
      buf(i) = x.toByte
      buf.take(i + 1)
    }
    lens.foreach { bytes =>
      val done = new java.util.concurrent.CompletableFuture[AnyRef]()
      val t = new Thread(() => done.complete(EnvelopeCodec.decode(bytes)))
      t.setDaemon(true); t.start()
      // 5 s is decode-a-few-bytes eternity; a hang here is the overflow bug
      assert(done.get(5, java.util.concurrent.TimeUnit.SECONDS) === null)
    }
    // same guard on the inner (header) reader
    val innerPoison = Array[Byte](0x0a, 0x0a, 0x1a, 0xf6.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    assert(EnvelopeCodec.decode(innerPoison) === null)
  }

  test("expression round trip in a distributed plan; malformed rows filtered (F2)") {
    val df = Seq(
      (1L, 1000L, "g1", "INSERT", 100L, 2L),
      (2L, 2000L, "g2", "UPDATE", 200L, 3L)
    ).toDF("pos", "ms", "gtid", "et", "size", "rows")
    val env = df.select(EncodeEnvelope.column(
      col("pos"), col("ms"), col("gtid"), col("et"), col("size"), col("rows")).as("b"))
    val good = graft.binlog.Ingest.decodeBinaryEnvelope(env, "b")
      .orderBy("binlog_pos").collect()
    assert(good.length === 2)
    assert(good(0).getAs[Long]("binlog_pos") === 1L)
    assert(good(0).getAs[String]("gtid") === "g1")
    assert(good(1).getAs[Long]("size_bytes") === 200L)
    // mix in garbage rows: they are dropped, not crashed on
    val withGarbage = env.union(Seq(Array[Byte](1, 2, 3)).toDF("b"))
    assert(graft.binlog.Ingest.decodeBinaryEnvelope(withGarbage, "b").count() === 2L)
  }

  test("SQL surface: encode_envelope/decode_envelope callable via extension") {
    val r = spark.sql(
      """SELECT decode_envelope(encode_envelope(5L, 6L, 'g', 'INSERT', 7L, 8L)) AS e"""
    ).select("e.binlog_pos", "e.gtid", "e.affected_rows").collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getString(1) === "g")
    assert(r.getLong(2) === 8L)
  }
}
