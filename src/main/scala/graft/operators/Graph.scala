package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge frames — the weighted
  * companion of the connected-components machinery in [[graft.ops.Dedup]]
  * (min-label / star contraction): PageRank scores node centrality where CC
  * only answers membership.
  *
  * Execution shape per iteration: one hash join (adjacency ⋈ ranks, both
  * hashed on the source node) + one aggregation (contributions by target).
  * The adjacency (edges + out-degrees) is computed once and persisted; the
  * rank frame — node-count-sized metadata, not corpus-sized — is the only
  * thing that moves between rounds. With the edge table written bucketed on
  * `src` ([[graft.sources.BucketedLayout]], as plan-pinned for CC), every
  * round's join plans exchange-free on the edge side.
  *
  * Iterations are FIXED (not to-convergence): a deterministic round count
  * makes the result oracle-attestable (the t32 oracle unrolls the identical
  * rounds as SQL CTEs) and bounds the job count — at 100 TB you schedule
  * k·2 stages, not an unknown fixpoint chase.
  */
object Graph {

  /** PageRank over an UNDIRECTED graph given as an edge list `(src, dst)`.
    * Self-loops and duplicate edges are dropped; each edge contributes both
    * directions, so the graph has no dangling nodes by construction (every
    * node has out-degree ≥ 1 — the dangling-mass redistribution term of
    * directed PageRank is unnecessary).
    *
    * r_{i+1}(v) = (1-d)/N + d · Σ_{u ∈ Γ(v)} r_i(u) / deg(u)
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val raw = edges
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    // one distinct over the symmetrized stream (instead of distinct-then-
    // distinct): a single wide shuffle canonicalizes duplicates in either
    // orientation
    val sym = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // (src, dst, deg): the loop-invariant adjacency, persisted once
    val adj = sym
      .join(sym.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .persist()
    val n = adj.select(col("src")).distinct().count()
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      ranks = adj
        .join(ranks, adj("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node"))
        .agg((lit((1.0 - damping) / n) + lit(damping) * sum(col("c")))
          .as("rank"))
    }
    ranks
  }

  /** The identical computation as DuckDB SQL: `edgesCte` must produce
    * columns `(src, dst)`; rounds are unrolled as chained CTEs (recursive
    * CTEs can't aggregate in the recursive term). Kept textually parallel
    * to [[pageRank]] so the two stay provably in lockstep.
    */
  def pageRankSql(edgesCte: String, iterations: Int = 5,
      damping: Double = 0.85): String = {
    val base =
      s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesCte) WHERE src <> dst),
         |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
         |n AS (SELECT count(*) AS cnt FROM deg),
         |pr0 AS (SELECT src AS node, CAST(1 AS DOUBLE)/(SELECT cnt FROM n) AS rank FROM deg)""".stripMargin
    val rounds = (1 to iterations).map { i =>
      s"""pr$i AS (
         |  SELECT s.dst AS node,
         |         CAST(${1.0 - damping} AS DOUBLE)/(SELECT cnt FROM n)
         |           + ${damping} * sum(p.rank / d.deg) AS rank
         |  FROM sym s JOIN deg d ON s.src = d.src JOIN pr${i - 1} p ON p.node = s.src
         |  GROUP BY s.dst)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT node, rank FROM pr$iterations"
  }
}
