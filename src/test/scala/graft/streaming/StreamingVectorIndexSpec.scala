package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Vectors

case class VecChunk(vec_id: Long, embedding: Array[Float])

/** The CDC half of the persisted IVF index (the StreamingDedupGroupsSpec
  * story on the vector surface): an index built once over the initial
  * corpus keeps its centroid set PINNED, and each arriving micro-batch of
  * new vectors assigns against those centroids and appends
  * ([[Vectors.appendToIvfIndex]]) — with a kill/restart at every chunk
  * boundary. The final index must equal one batch assignment of the WHOLE
  * corpus against the pinned centroids: routing never drifts between
  * rebuilds, so a vector's bucket is independent of when it arrived.
  */
class StreamingVectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def reset(names: String*): Unit = names.foreach { name =>
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val whConf = spark.conf.get("spark.sql.warehouse.dir")
    val wh = Option(java.net.URI.create(whConf).getPath).getOrElse(whConf)
    val dir = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(dir)) {
      val walk = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }
  }

  test("per-batch appends against pinned ledger centroids across kill/restart ≡ " +
      "one batch assignment of the whole corpus; replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val table = "svi_ivf_index"
    reset(table, table + "_centroids")

    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
      .map(r => VecChunk(r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id).toSeq
    val cut = rows.size / 2
    val initial = rows.take(cut)
    val arriving = rows.drop(cut)

    // the index is born from the initial corpus — TRAINED centroids (the
    // round-7 artifact default), persisted in the ledger; every later
    // append must keep routing against exactly that set
    Vectors.materializedIvfIndex(initial.toDF("vec_id", "embedding"), table)
    val pinned = Vectors.readCentroidLedger(spark, table)
    // the ledger holds the full trained set, C = ⌈√|initial|⌉
    assert(pinned.size === Vectors.spacedCentroidIds(initial.size.toLong).size)

    val ms = MemoryStream[VecChunk]
    val ck = tmpDir("svi_ck")
    def runChunk(chunk: Seq[VecChunk]): Unit = {
      ms.addData(chunk) // BEFORE start: AvailableNow latches offsets at start
      val q = ms.toDS().writeStream
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[VecChunk], _: Long) =>
          Vectors.appendToIvfIndex(batch.toDF(), table)
        }
        .start()
      q.drainGuarded()
      assertStreamClean("vector_index_stream", q); q.stop() // the KILL: next chunk restarts from the checkpoint
    }
    val mid = arriving.size / 2
    Seq(arriving.take(mid), arriving.drop(mid)).foreach(runChunk)

    spark.catalog.refreshTable(table) // reads below are in THIS session
    def assignments(df: DataFrame): Set[(Long, Long)] =
      df.select(col("vec_id"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = assignments(spark.table(table))

    // batch twin: the WHOLE corpus assigned against the PINNED ledger
    // centroids — routing must be independent of arrival time
    val batch = assignments(
      Vectors.ivfAssignWithCentroids(emb, pinned).select(col("vec_id"), col("bucket")))
    assert(streamed === batch)
    assert(streamed.size === rows.size) // every vector indexed exactly once
    // the arriving half actually spread over several buckets (the append
    // path exercised real routing, not one degenerate bucket)
    val arrivingBuckets = streamed.filter(_._1 >= cut).map(_._2)
    assert(arrivingBuckets.size > 3, s"arriving buckets: $arrivingBuckets")

    // REPLAY (ADVICE r6, the medium finding): redeliver an already-applied
    // batch — the crash-between-append-and-checkpoint path of an
    // at-least-once sink. The anti-join guard must make it a no-op: same
    // row count, same assignments, no duplicate (vec_id, bucket) rows
    // occupying extra top-k slots in the serve path.
    val countBefore = spark.table(table).count()
    Vectors.appendToIvfIndex(arriving.take(mid).toDF(), table)
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() === countBefore, "replayed batch re-appended rows")
    assert(assignments(spark.table(table)) === batch)
  }
}
