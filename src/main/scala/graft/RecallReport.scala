package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.ops.Vectors

/** Recall report for the ANN surface (round-3 verdict "next" #6): measure
  * recall@k of every approximate variant against the brute-force ground
  * truth on the fixture embeddings, and write one small JSON artifact
  * (`RECALL.json`, committed per round) so retrieval-quality drift across
  * rounds is visible — the correctness gate attests *determinism* of these
  * queries, not their retrieval quality, and a silent recall regression
  * (e.g. a centroid-training change) would otherwise pass every hash.
  *
  * Everything here is seeded/deterministic, so the numbers are replayable:
  * same data + same code ⇒ same artifact.
  */
object RecallReport {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "RECALL.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.session("graft-recall", s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).persist()
    val n = emb.count()
    val k = 5
    val queries = 0L until 16L

    def hits(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    val exact = hits(Vectors.bruteForceTopK(emb, queries, k))
    val spacedIds = Vectors.spacedCentroidIds(n)
    val trained = Vectors.trainedCentroids(emb, c = spacedIds.size)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ivf_spaced" -> (() => Vectors.ivfTopK(emb, spacedIds, queries, k)),
      "ivf_trained" -> (() => Vectors.ivfTopKTrained(emb, trained, queries, k)),
      "ivf_multiprobe4" -> (() => Vectors.ivfTopKMultiProbe(emb, spacedIds, queries, k, nprobe = 4)),
      "ivf_twolevel" -> (() =>
        Vectors.ivfTopKTwoLevel(emb, spacedIds, Vectors.coarseSubset(spacedIds), queries, k)),
      "lsh" -> (() => Vectors.lshTopK(emb, queries, k)),
      "lsh_multitable4" -> (() => Vectors.lshTopKMultiTable(emb, queries, k)),
      "quantized8bit" -> (() => Vectors.quantizedTopK(emb, queries, k)),
      "pq_m8_ks16" -> (() => Vectors.pqTopK(emb, queries, k)),
      "pq_rerank40" -> (() => Vectors.pqRerankTopK(emb, queries, k)),
      "jl_rerank40" -> (() => Vectors.jlRerankTopK(emb, queries, k)),
      "ivfpq" -> (() => Vectors.ivfPqTopK(emb, spacedIds, queries, k)),
      "pq_trained" -> (() => {
        import org.apache.spark.sql.functions.col
        Vectors.pqTopKWithCodebook(
          Vectors.withUnit(emb).select(col("vec_id"), col("unit")),
          queries, k, 8, Vectors.trainedPqCodebooks(emb))
      }),
      "graph_beam8x3" -> (() => Vectors.beamSearch(emb, queries,
        entryIds = spacedIds, k = k, beam = 8, rounds = 3))
    )
    val recalls = variants.map { case (name, fn) =>
      val r = hits(fn()).intersect(exact).size.toDouble / exact.size
      spark.sqlContext.clearCache()
      emb.persist() // keep the shared input cached across variants
      System.err.println(f"[recall] $name%-18s recall@$k = $r%.4f")
      name -> r
    }
    val json = recalls.map { case (name, r) => f""""$name":$r%.6f""" }
      .mkString(
        s"""{"sf":"$sfDir","n_vectors":$n,"k":$k,"n_queries":${queries.size},""" +
          s""""n_centroids":${spacedIds.size},"recall_at_k":{""",
        ",", "}}")
    Files.writeString(Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}
