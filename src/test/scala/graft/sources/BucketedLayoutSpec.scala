package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Drop the table AND its managed location: the warehouse dir outlives the
    * per-JVM in-memory catalog, and a stale location makes the next
    * saveAsTable fail with LOCATION_ALREADY_EXISTS.
    */
  private def reset(names: String*): Unit = names.foreach { name =>
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def events = (0L until 2000L).map(i => (i % 97L, s"e$i", i)).toDF("user_id", "tag", "n")
  private def users = (0L until 97L).map(i => (i, s"u$i")).toDF("user_id", "name")

  /** Each test writes its own table — no cross-test table dependency (a
    * -z filtered run must not fail on a missing sibling's fixture).
    */
  private def writeEventsBucketed(table: String): Unit = {
    reset(table)
    BucketedLayout.writeBucketed(events, table, "user_id", buckets = 8)
  }

  test("same-bucketed tables join with zero exchanges; unbucketed twin shuffles") {
    reset("us_bucketed", "ev_plain", "us_plain")
    writeEventsBucketed("ev_bucketed")
    BucketedLayout.writeBucketed(users, "us_bucketed", "user_id", buckets = 8)
    // force a sort-merge join so locality (not broadcast) is what's tested
    val joined = spark.table("ev_bucketed").hint("merge")
      .join(spark.table("us_bucketed").hint("merge"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // co-located: bucket i reads bucket i
    assert(joined.count() === 2000L)
    // the unbucketed twin of the same join DOES shuffle — the layout, not
    // the data, is what removed the exchanges
    events.write.mode("overwrite").saveAsTable("ev_plain")
    users.write.mode("overwrite").saveAsTable("us_plain")
    val plain = spark.table("ev_plain").hint("merge")
      .join(spark.table("us_plain").hint("merge"), "user_id")
      .queryExecution.executedPlan.toString
    assert(plain.contains("Exchange"), plain)
    // and the bucket metadata survives the catalog round trip
    val catalog = spark.sql("DESCRIBE EXTENDED ev_bucketed").collect().map(_.mkString("|"))
    assert(catalog.exists(_.contains("Num Buckets")), catalog.mkString("\n"))
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    writeEventsBucketed("ev_bucketed_agg")
    val agg = spark.table("ev_bucketed_agg").groupBy("user_id").agg(sum("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(agg.count() === 97L)
  }
}
