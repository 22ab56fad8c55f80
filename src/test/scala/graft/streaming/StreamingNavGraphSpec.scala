package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Vectors

case class NavVecChunk(vec_id: Long, embedding: Array[Float])

/** CDC for the navigable-graph artifact: HNSW-style insert-by-search
  * ([[Vectors.appendToNavGraph]]) driven from a MemoryStream with a
  * kill/restart at every chunk boundary. The pinned contract is
  * OPERATIONAL, not hash-equality to a rebuild (an inserted node's edges
  * come from a walk of the graph as it was — the HNSW-standard
  * approximation, stated in the scaladoc): appended nodes are degree-
  * bounded, REACHABLE (a later served search finds a planted near-twin at
  * rank 1), the pre-existing graph is untouched, and a replayed batch is
  * a no-op.
  */
class StreamingNavGraphSpec extends SparkSpec {
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

  test("insert-by-search appends across kill/restart: reachable, degree-bounded, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val table = "sng_nav_graph"
    reset(table)

    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
      .map(r => NavVecChunk(r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id).toSeq
    val cut = rows.size * 3 / 4
    val initial = rows.take(cut)
    // arriving vectors: the held-out tail, plus a PLANTED near-twin of an
    // initial vector (id 9000, vector ≈ initial head + tiny perturbation)
    // — the reachability probe: searching for the twin's anchor must
    // surface the appended twin at rank 1
    val anchor = initial.head
    val twin = NavVecChunk(9000L,
      anchor.embedding.zipWithIndex.map { case (v, i) =>
        if (i == 0) v + 1e-3f else v })
    val arriving = rows.drop(cut) :+ twin

    val initDf = initial.toDF("vec_id", "embedding")
    Vectors.materializedNavGraph(initDf, table)
    val entryIds = Vectors.spacedCentroidIds(initial.size.toLong)
    val preEdges = spark.table(table).count()

    val corpusAll = rows.toDF("vec_id", "embedding") // lookup frame for walks

    val ms = MemoryStream[NavVecChunk]
    val ck = tmpDir("sng_ck")
    def runChunk(chunk: Seq[NavVecChunk]): Unit = {
      ms.addData(chunk) // BEFORE start: AvailableNow latches offsets at start
      val q = ms.toDS().writeStream
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[NavVecChunk], _: Long) =>
          Vectors.appendToNavGraph(batch.toDF(), corpusAll, table, entryIds)
        }
        .start()
      q.drainGuarded()
      assertStreamClean("nav_graph_stream", q); q.stop() // the KILL: next chunk restarts from the checkpoint
    }
    val mid = arriving.size / 2
    Seq(arriving.take(mid), arriving.drop(mid)).foreach(runChunk)

    spark.catalog.refreshTable(table) // appends ran in the CLONED session
    val edges = spark.table(table)
      .select(col("src_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val newIds = arriving.map(_.vec_id).toSet

    // every appended node got its full graphK forward fan-out; nodes from
    // EARLIER chunks additionally accumulate reverse edges from later
    // inserts (that's cross-batch navigability working — later walks found
    // them — and the degree growth the periodic-rebuild compaction
    // contract is for), so only the LAST chunk's degrees are exactly 24
    val outDeg = edges.filter(e => newIds(e._1)).groupBy(_._1).map { case (s, es) =>
      s -> es.length }
    val lastChunk = arriving.drop(mid).map(_.vec_id).toSet
    assert(outDeg.keySet === newIds)
    assert(outDeg.values.forall(_ >= 24), s"degrees: $outDeg")
    assert(lastChunk.forall(id => outDeg(id) === 24), s"degrees: $outDeg")
    // every edge touching an appended node is paired with its reverse
    // (forward + reverse land in the same atomic append)
    val eset = edges.toSet
    assert(edges.filter(e => newIds(e._1) || newIds(e._2))
      .forall(e => eset((e._2, e._1))))
    // the pre-existing graph is untouched: old→old edge count unchanged
    assert(edges.count(e => !newIds(e._1) && !newIds(e._2)) === preEdges)

    // reachability through the SERVE path: the anchor's search must find
    // the planted twin first (cosine ≈ 1, strictly above every other node)
    val hits = Vectors.beamSearchServed(
      corpusAll.unionByName(Seq(twin).toDF("vec_id", "embedding")).dropDuplicates("vec_id"),
      spark.table(table), queryIds = Seq(anchor.vec_id), entryIds = entryIds,
      k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank")))
    assert(hits.contains((twin.vec_id, 1L)), s"twin not found first: ${hits.toSeq}")

    // a COMPLETED batch replayed wholesale is a no-op (src-set guard)
    val before = spark.table(table).count()
    Vectors.appendToNavGraph(arriving.take(mid).toDF("vec_id", "embedding"),
      corpusAll, table, entryIds)
    assert(spark.table(table).count() === before)
  }
}
