package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("path graph: middle node dominates, ends symmetric, mass sums to 1") {
    val r = ranksOf(Seq((1L, 2L), (2L, 3L)))
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(math.abs(r(1L) - r(3L)) < 1e-12) // symmetry is exact
    assert(r(2L) > r(1L))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("star graph: hub outranks every leaf; duplicate/self edges ignored") {
    val edges = (2L to 9L).map(leaf => (1L, leaf)) ++
      Seq((1L, 2L), (2L, 1L), (5L, 5L)) // dup, reversed dup, self-loop
    val r = ranksOf(edges)
    assert(r.keySet === (1L to 9L).toSet)
    val leaves = (2L to 9L).map(r)
    assert(leaves.forall(l => r(1L) > l))
    // all leaves are structurally identical → identical rank
    assert(leaves.distinct.size === 1)
  }

  test("result is invariant to input partitioning") {
    val edges = (1L to 200L).map(i => (i, (i * 7) % 200 + 1))
    val a = ranksOf(edges)
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(13), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"node $k") }
  }

  private def trianglesOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 plus a pendant: every K4 node sits in 3 triangles, pendant absent") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = trianglesOf(k4 :+ (4L, 5L))
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle with dup/reversed/self edges counts once per corner; square without diagonal has none") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L), (3L, 3L))
    assert(trianglesOf(tri) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(trianglesOf(square) === Map.empty)
  }

  test("triangle counts are invariant to input partitioning") {
    val edges = (1L to 120L).flatMap(i => Seq((i, i % 40 + 1), (i, i % 7 + 1)))
    val a = trianglesOf(edges)
    val b = Graph.triangleCounts(edges.toDF("src", "dst").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.sum % 3 === 0) // every triangle contributes exactly 3 corners
  }

  private def coreOf(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: K4 with a pendant chain — the chain peels away cascade-style, K4 survives at k=3") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // chain 4-5-6-7: 5,6,7 have degree ≤ 2, and peeling cascades through
    val r = coreOf(k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L)), k = 3)
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: triangle survives k=2, everything peels at k=3; empty core is empty") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(coreOf(tri, k = 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(coreOf(tri, k = 3) === Map.empty)
  }

  test("unrolled SQL text contains one CTE per round and the final select") {
    val sql = Graph.pageRankSql("SELECT a AS src, b AS dst FROM t", 3)
    assert(sql.contains("pr3 AS"))
    assert(!sql.contains("pr4 AS"))
    assert(sql.endsWith("SELECT node, rank FROM pr3"))
  }

  private def treeOf(nodes: Seq[(Long, Option[Long])], rounds: Int = 4): Map[Long, (Long, Long)] =
    Graph.treePaths(nodes.toDF("node", "parent"), rounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("treePaths: a 10-deep chain resolves root and exact depth in 4 doubling rounds") {
    val chain = (1L to 10L).map(i => (i, if (i == 1) None else Some(i - 1)))
    val r = treeOf(chain) // depth ≤ 9 ≤ 2^4
    assert(r === (1L to 10L).map(i => i -> ((1L, i - 1))).toMap)
  }

  test("treePaths: doubling covers depth up to exactly 2^rounds, and converged rows are idempotent") {
    val chain = (1L to 5L).map(i => (i, if (i == 1) None else Some(i - 1)))
    assert(treeOf(chain, rounds = 2) === treeOf(chain, rounds = 6)) // depth 4 = 2^2
    // a forest: second tree rooted at 100
    val forest = chain ++ Seq((100L, None: Option[Long]), (101L, Some(100L)))
    val r = treeOf(forest)
    assert(r(101L) === ((100L, 1L)) && r(100L) === ((100L, 0L)) && r(5L) === ((1L, 4L)))
  }

  test("treePaths result is invariant to input partitioning") {
    val nodes = (1L to 300L).map(i => (i, if (i < 10) None else Some(i / 10)))
    val a = treeOf(nodes)
    val b = Graph.treePaths(nodes.toDF("node", "parent").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a === b)
    assert(a(299L) === ((2L, 2L))) // 299 → 29 → 2
  }

  private def distsOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int = 4): Map[Long, Long] =
    Graph.bfsDistances(edges.toDF("src", "dst"), seeds.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfsDistances: exact hop distances, horizon cut, idempotent past convergence") {
    // path 1-2-3-4-5-6 with a shortcut 1-4: dist(4) = 1 via the shortcut
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 4L))
    assert(distsOf(edges, Seq(1L)) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L, 6L -> 3L))
    // horizon 1: only the frontier; unreached nodes absent
    assert(distsOf(edges, Seq(1L), rounds = 1) ===
      Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
    // extra rounds past convergence change nothing (monotone relaxation)
    assert(distsOf(edges, Seq(1L), rounds = 8) === distsOf(edges, Seq(1L), rounds = 4))
  }

  test("bfsDistances: multi-source takes the nearer seed; isolated seeds sit at 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r = distsOf(edges, Seq(1L, 5L, 99L))
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L, 99L -> 0L))
  }

  private def ssspOf(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int = 4): Map[Long, Long] =
    Graph.ssspDistances(edges.toDF("src", "dst", "w"), seeds.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ssspDistances: cheap long path beats expensive direct edge; horizon bounds path length") {
    // 1→2→3 costs 1+1=2; direct 1→3 costs 5 → dist(3)=2 needs 2 rounds
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L))
    assert(ssspOf(edges, Seq(1L)) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // horizon 1: only single-edge paths → the expensive direct edge wins
    assert(ssspOf(edges, Seq(1L), rounds = 1) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 5L))
    // duplicate/reversed edges keep the MINIMUM weight
    val dup = edges ++ Seq((3L, 1L, 2L))
    assert(ssspOf(dup, Seq(1L), rounds = 1) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // idempotent past convergence
    assert(ssspOf(edges, Seq(1L), rounds = 8) === ssspOf(edges, Seq(1L), rounds = 2))
  }

  private def labelsOf(edges: Seq[(Long, Long)], rounds: Int = 4): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: bridged triangles resolve to two communities") {
    // two triangles joined by one weak edge — ONE connected component but
    // two dense regions; 4 synchronous rounds (hand-derived with the
    // min-label tie rule) settle each triangle on its own label
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
    assert(labelsOf(edges) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: clique absorbs its pendant; dup/self edges ignored") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((1L, 5L), (2L, 1L), (3L, 3L)) // pendant, rev-dup, self
    val r = labelsOf(edges)
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("labelPropagation: deterministic under repartitioning; ties break to the smallest label") {
    // a 3-path oscillates with period 2 under synchronous update — the
    // fixed round count makes the result deterministic anyway, and the
    // exact labels pin the min-label tie rule (node 2 sees {1,3}: tie → 1)
    val path = Seq((1L, 2L), (2L, 3L))
    assert(labelsOf(path, rounds = 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    val edges = (1L to 150L).map(i => (i, (i * 11) % 150 + 1))
    val a = labelsOf(edges)
    val b = Graph.labelPropagation(edges.toDF("src", "dst").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("labelPropagation: out-of-contract node ids fail LOUDLY, not silently wrong") {
    // the cnt-major argmax encoding max(cnt·K + (K−1−label)) requires
    // 0 ≤ id < K; an id at/above K (or negative) used to corrupt labels
    // silently — now the folded assert_true throws
    val tooBig = Seq((1L, 1L << 31), (1L, 2L)).toDF("src", "dst")
    val eBig = intercept[Exception] {
      Graph.labelPropagation(tooBig, rounds = 1).collect()
    }
    assert(eBig.getMessage.contains("labelPropagation") ||
      Option(eBig.getCause).exists(_.getMessage.contains("labelPropagation")),
      eBig.toString)
    val negative = Seq((-3L, 2L)).toDF("src", "dst")
    val eNeg = intercept[Exception] {
      Graph.labelPropagation(negative, rounds = 1).collect()
    }
    assert(eNeg.getMessage.contains("labelPropagation") ||
      Option(eNeg.getCause).exists(_.getMessage.contains("labelPropagation")),
      eNeg.toString)
    // and a RAISED bound restores the big-id graph (ids now in contract)
    val ok = Graph.labelPropagation(tooBig, rounds = 1, labelBound = 1L << 33)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok === Map(1L -> 2L, (1L << 31) -> 1L, 2L -> 1L))
  }
}
