package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Vector similarity over the `embeddings` table (`embedding:
  * Array[Float]`): brute-force cosine top-k as the exact baseline, and an
  * IVF-style bucketed variant as the scale path.
  *
  * Numeric determinism: floats are widened to double *before* any product
  * (float→double is exact; a product of two widened floats is exact in
  * double), and `aggregate()` folds the array sequentially, so the same
  * left-to-right summation happens in the DuckDB oracle's `list_dot_product`.
  * Ranking ties are broken by vector id.
  *
  * Scale design:
  *   - Brute force is a broadcast nested-loop of a *small query set* against
  *     the full corpus — the corpus side streams, never shuffles, and top-k
  *     per query is an aggregation (`max_by` over a k-slot struct would be
  *     ideal; we use window `row_number` over the per-query candidate set
  *     after an aggregation prune). Cost O(|Q|·N·d): right for |Q| ≪ N.
  *   - IVF: assign every vector to its nearest of C centroids (broadcast,
  *     O(N·C·d)), then only search the query's bucket — the classic
  *     recall/cost trade, with the probe list expressible as `nprobe` best
  *     centroids.
  */
object Vectors {

  /** Sequential-fold dot product of two float arrays, widened to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (`vec_id` in
    * `queryIds`), excluding self. Output: (query_id, neighbor_id, rank).
    */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = embeddings
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val scored = F.broadcast(queries)
      .join(embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("e")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("q"), col("e")).as("sim"))
    topKPerGroup(scored, "query_id", k)
  }

  /** Rank candidates per group by (sim desc, neighbor asc) and keep top-k. */
  private def topKPerGroup(scored: DataFrame, groupCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** IVF-style ANN: centroids are the vectors with `vec_id` in
    * `centroidIds`; every vector is assigned to its nearest centroid (cosine,
    * ties by centroid id); each query searches only its own bucket.
    * Output: (query_id, neighbor_id, rank) — rank within the probed bucket.
    */
  def ivfTopK(embeddings: DataFrame, centroidIds: Seq[Long], queryIds: Seq[Long], k: Int): DataFrame = {
    val centroids = embeddings
      .filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c"))
    // nearest-centroid assignment: argmax over (sim, -centroid_id)
    val assigned = embeddings
      .join(F.broadcast(centroids))
      .select(col("vec_id"), col("embedding"),
        col("centroid_id"), cosine(col("embedding"), col("c")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("centroid_id"), col("embedding")),
          struct(col("csim"), -col("centroid_id"))).as("best")
      )
      .select(col("vec_id"), col("best.centroid_id").as("bucket"), col("best.embedding").as("embedding"))
    val queries = assigned
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("bucket"), col("embedding").as("q"))
    val scored = F.broadcast(queries)
      .join(assigned.select(col("vec_id").as("neighbor_id"), col("bucket"), col("embedding").as("e")),
        Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("q"), col("e")).as("sim"))
    topKPerGroup(scored, "query_id", k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, restricted to
    * same-IVF-bucket candidates (the blocked form that scales; exact over
    * the bucket). Output: (vec_a, vec_b) pairs, a < b.
    */
  def cosineNearDupPairs(embeddings: DataFrame, centroidIds: Seq[Long], threshold: Double): DataFrame = {
    val centroids = embeddings
      .filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c"))
    val assigned = embeddings
      .join(F.broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cosine(col("embedding"), col("c")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("centroid_id"), col("embedding")),
        struct(col("csim"), -col("centroid_id"))).as("best"))
      .select(col("vec_id"), col("best.centroid_id").as("bucket"), col("best.embedding").as("embedding"))
    assigned.as("x")
      .join(assigned.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"))
  }
}
