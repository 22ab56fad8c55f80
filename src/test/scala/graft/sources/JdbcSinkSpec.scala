package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** JDBC sink against embedded Derby (in-JVM database — the same jar Spark
  * ships for its Hive metastore, so no new dependency).
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def derbyTarget(name: String): JdbcSink.Target = {
    val dir = tmpDir(s"derby_$name")
    JdbcSink.Target(
      url = s"jdbc:derby:$dir/db;create=true",
      table = "results",
      options = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
  }

  private def stats(rows: (String, String, Long)*) =
    rows.toSeq.map { case (t, g, v) => (Timestamp.valueOf(t), g, v) }
      .toDF("end_time", "gtid", "transaction_size")

  test("K1 batched append: rows land and read back through the JDBC source") {
    val t = derbyTarget("append")
    val df = stats(("2024-01-01 00:05:00", "g1", 10L), ("2024-01-01 00:10:00", "g2", 20L))
    JdbcSink.writeEvents(df, t, batchSize = 1) // force multiple batch flushes
    val back = spark.read.format("jdbc")
      .option("url", t.url).option("dbtable", t.table).options(t.options).load()
    assert(back.count() === 2L)
    assert(back.columns.map(_.toLowerCase).sorted === Array("end_time", "gtid", "transaction_size"))
    JdbcSink.writeEvents(df, t)
    assert(spark.read.format("jdbc").option("url", t.url).option("dbtable", t.table)
      .options(t.options).load().count() === 4L) // plain append is not idempotent
  }

  test("W5 idempotent window append: second run probes end_time and skips") {
    val t = derbyTarget("idem")
    val w1 = Timestamp.valueOf("2024-01-01 00:05:00")
    val df = stats(("2024-01-01 00:05:00", "g1", 10L))
    assert(JdbcSink.idempotentAppend(spark, df, t, w1) === true)
    assert(JdbcSink.idempotentAppend(spark, df, t, w1) === false) // already there
    val w2 = Timestamp.valueOf("2024-01-01 00:10:00")
    val df2 = stats(("2024-01-01 00:10:00", "g9", 99L))
    assert(JdbcSink.idempotentAppend(spark, df2, t, w2) === true) // new window appends
    val back = spark.read.format("jdbc")
      .option("url", t.url).option("dbtable", t.table).options(t.options).load()
    assert(back.count() === 2L)
  }

  test("W5 probe failure propagates (no silent duplicate write on unreachable DB)") {
    // an unreachable target must THROW from the probe — treating it as
    // "table absent" would append a duplicate on the retry path
    val bad = JdbcSink.Target("jdbc:derby://no-such-host:1527/nope", "results")
    val df = stats(("2024-01-01 00:05:00", "g1", 10L))
    intercept[Exception] {
      JdbcSink.idempotentAppend(spark, df, bad, Timestamp.valueOf("2024-01-01 00:05:00"))
    }
  }

  test("W5 probe is schema-scoped: a same-named table elsewhere doesn't satisfy it") {
    val t = derbyTarget("schemas")
    // plant RESULTS in a DIFFERENT schema; the probe must not find it (a
    // cross-schema match would read the wrong table's end_time — or fail on
    // an absent one — and break the idempotent append)
    val conn = java.sql.DriverManager.getConnection(t.url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE SCHEMA other")
      st.executeUpdate("CREATE TABLE other.results (end_time TIMESTAMP)")
      st.close()
    } finally conn.close()
    val w1 = Timestamp.valueOf("2024-01-01 00:05:00")
    val df = stats(("2024-01-01 00:05:00", "g1", 10L))
    assert(JdbcSink.idempotentAppend(spark, df, t, w1) === true) // current schema: absent → writes
    assert(JdbcSink.idempotentAppend(spark, df, t, w1) === false)
    // a schema-qualified target resolves to the planted (empty) table: the
    // probe finds it, sees no w1 row there despite APP.results having one,
    // and writes — then the second call skips
    val qualified = t.copy(table = "other.results")
    assert(JdbcSink.idempotentAppend(spark,
      stats(("2024-01-01 00:05:00", "g7", 7L)).select($"end_time"), qualified, w1) === true)
    assert(JdbcSink.idempotentAppend(spark,
      stats(("2024-01-01 00:05:00", "g7", 7L)).select($"end_time"), qualified, w1) === false)
  }

  test("K1 streaming: foreachBatch lands the stream via batched JDBC inserts") {
    implicit val sqlCtx = spark.sqlContext
    val t = derbyTarget("stream")
    val ms = MemoryStream[(Timestamp, String, Long)]
    ms.addData((Timestamp.valueOf("2024-01-01 00:05:00"), "g1", 1L))
    ms.addData((Timestamp.valueOf("2024-01-01 00:10:00"), "g2", 2L))
    val q = JdbcSink.streamWriter(
      ms.toDF().toDF("end_time", "gtid", "transaction_size"),
      t, tmpDir("ckpt_jdbc")).start()
    q.awaitTermination()
    val back = spark.read.format("jdbc")
      .option("url", t.url).option("dbtable", t.table).options(t.options).load()
    assert(back.count() === 2L)
    assert(back.select("gtid").as[String].collect().toSet === Set("g1", "g2"))
  }
}
