package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._
import graft.binlog.{BinlogEvents, DailyCounts, Ingest, TransactionStats}
import graft.ops.{Dedup, TextOps, Vectors, Vocab}

import RegistryLib._

/** The similarity-search / vector surface over the embeddings table — one slice of the
  * [[SparkEntry]] registry (round-7 verdict #7: the single-file registry
  * split by query-name prefix). Names, query semantics, and oracle
  * strings are verbatim from the pre-split registry; [[SparkEntry]]
  * merges the per-domain maps, so the driver contract is unchanged.
  */
private[graft] object RegistryS {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- similarity search ----
    "s1_ann_bruteforce" -> ((s, dir) =>
      Vectors.bruteForceTopK(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s16_ann_jl" -> ((s, dir) =>
      // Rademacher JL projection (64→16 dense ±1 dims, deterministic sign
      // hash) → shortlist in the small space → exact re-rank: the
      // dimensionality lever next to s8/s9's quantization levers
      Vectors.jlRerankTopK(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s17_knn_classify" -> ((s, dir) =>
      // retrieval applied to labeling: each query's label = majority vote
      // of its 10 exact nearest neighbors (votes desc, ties to smaller
      // label) — the semi-supervised label-propagation pass
      Vectors.knnClassify(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s25_knn_confusion" -> ((s, dir) =>
      // leave-one-out eval of the embedding space itself: does geometry
      // separate the labels? (true, predicted) cell counts over a
      // 100-query batch — diagonal-heavy ⇒ the embedding screens
      // (s17/s18/d28) can be trusted on this corpus
      Vectors.knnConfusion(Tables.embeddings(s, dir), 0L until 100L, k = 10)),
    "s19_ivf_recall" -> ((s, dir) =>
      // the checked-sketch discipline applied to ANN routing: per-query
      // recall of IVF vs the exact top-10 — a deterministic fact of
      // data+parameters, so a routing regression fails the gate
      Vectors.ivfRecall(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s20_pq_distortion" -> ((s, dir) =>
      // s19's twin for the other ANN error source: mean |exact − ADC|
      // over each query's exact top-10, per-pair ppb floor then integer
      // mean — why the s12 re-rank stage exists, as a gated number
      Vectors.pqDistortion(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s24_ann_beam" -> ((s, dir) =>
      // graph-based ANN — the fourth index family (hashing/routing/
      // quantization/graph): HNSW-style beam search over the NAVIGABLE
      // graph (Vectors.navGraph — multi-assigned buckets, 24 edges/node;
      // the round-6 rebuild of the round-5 `weak` k=3 islands) as a
      // relational fixpoint; fixed 4 rounds, beam 32, deterministic prune,
      // so the walk is oracle-attestable. Entry points are the IVF
      // centroids (the DiskANN-style seed set). Query cost is
      // O(rounds·beam·graphK·d), independent of N once the graph exists;
      // recall@10 at this operating point = 0.956 on the fixture
      // (RECALL.json beam curve), above tuned IVF's 0.925
      {
        val emb = Tables.embeddings(s, dir)
        Vectors.beamSearch(emb, queryIds = 0L until 8L,
          entryIds = Vectors.spacedCentroidIds(emb.count()),
          k = 5, beam = 32, rounds = 4)
      }),
    "s33_ann_beam_served" -> ((s, dir) => {
      // the graph family's build-once/serve-many path (the s29/d16
      // artifact lifecycle): the navigable graph persists as a
      // src_id-bucketed table and the beam walk reads edges from it —
      // same walk, zero build work per query batch; the result is
      // layout-independent, so the hash must equal s24's. Spaced-seed
      // PARITY build (explicit centroidIds): the oracle reproduces this
      // graph edge-for-edge; the TRAINED default artifact is s37's
      // checked query
      val emb = Tables.embeddings(s, dir)
      val spaced = Vectors.spacedCentroidIds(emb.count())
      val g = Vectors.materializedNavGraph(emb,
        "nav_graph_spaced_" + dir.replaceAll("[^A-Za-z0-9]", "_"),
        centroidIds = Some(spaced))
      Vectors.beamSearchServed(emb, g, queryIds = 0L until 8L,
        entryIds = spaced, k = 5, beam = 32, rounds = 4)
    }),
    "s34_ann_beam_pruned" -> ((s, dir) => {
      // the point-lookup seam implemented (beamSearch's cost-model note):
      // per-round frontier ids — bounded metadata — push as a literal IN
      // into the vec_id-sorted units store, so vector reads track the
      // frontier, not the corpus; identical walk semantics, so the hash
      // must equal s24/s33's (spaced parity artifact, like s33)
      val emb = Tables.embeddings(s, dir)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val spaced = Vectors.spacedCentroidIds(emb.count())
      val g = Vectors.materializedNavGraph(emb, "nav_graph_spaced_" + sfx,
        centroidIds = Some(spaced))
      Vectors.materializedNavUnits(emb, "nav_units_" + sfx)
      Vectors.beamSearchServedPruned(s, "nav_units_" + sfx, g,
        queryIds = 0L until 8L,
        entryIds = spaced, k = 5, beam = 32, rounds = 4)
    }),
    "s36_ann_trained_ivf_checked" -> ((s, dir) =>
      // the TRAINED-default IVF artifact (round-7 verdict #4: maxmin-
      // trained centroids + centroid ledger), attested the b13 checked
      // way: trained routing is corpus-derived, so no static oracle can
      // reproduce it — the query returns the brute truth (oracle-exact)
      // and RAISES in-plan if the artifact serve's recall drops below the
      // floor; a dropped ledger centroid, a torn append, or a bad
      // training run fails loudly instead of shipping
      Vectors.servedTrainedChecked(Tables.embeddings(s, dir),
        "ivf_index_" + dir.replaceAll("[^A-Za-z0-9]", "_"),
        queryIds = 0L until 8L, k = 10)),
    "s37_ann_trained_beam_checked" -> ((s, dir) =>
      // the trained-default navigable-graph artifact: beam walk entered
      // at the ledger's per-bucket representatives (coverage-guaranteed,
      // recorded at build time — the clustered-geometry lesson), recall
      // floor asserted in-plan against the returned brute truth
      Vectors.beamTrainedChecked(Tables.embeddings(s, dir),
        "nav_graph_" + dir.replaceAll("[^A-Za-z0-9]", "_"),
        queryIds = 0L until 8L, k = 5)),
    "s26_beam_sweep" -> ((s, dir) =>
      // the tuning-table trilogy's third panel (d36: LSH bands, s23: IVF
      // nprobe, s26: graph beam width): recall@5 at beam 4/8/16/32 against
      // brute truth, served from the SAME persisted graph artifact s33
      // reads (one build per session feeds search, serve, and tuning —
      // the d16/d23/d27 cost-sharing discipline; the graph is
      // deterministic, so the result is build-vs-serve-independent)
      {
        val emb = Tables.embeddings(s, dir)
        val spaced = Vectors.spacedCentroidIds(emb.count())
        Vectors.beamSweepServed(emb,
          Vectors.materializedNavGraph(emb,
            "nav_graph_spaced_" + dir.replaceAll("[^A-Za-z0-9]", "_"),
            centroidIds = Some(spaced)),
          queryIds = 0L until 8L,
          entryIds = spaced,
          k = 5, beams = Seq(4, 8, 16, 32), rounds = 4)
      }),
    "s31_margin_mining" -> ((s, dir) => {
      // aligned-pair mining with the margin criterion: forward-top-1
      // cross-corpus matches whose cosine stands out vs BOTH sides'
      // neighborhoods — the hub-resistant bitext/parallel-data step.
      // The test side carries a LITERAL id ceiling on top of the residue
      // slice (round-12 ADVICE): a bare % filter is a corpus-proportional
      // 20% — it passed boundedTestSide only because fixtures are small,
      // and at a larger scale factor this registry row would abort rather
      // than run. vec_id < 20000 covers every fixture vector (sf0.1 tops
      // out at 2000), so rows are unchanged, while at ANY scale the test
      // side is ≤ 4000 rows by construction — the |Q|≪N contract the
      // exact miner is for. Corpus-×-corpus mining routes to the
      // bucketed/routed paths, not this row.
      val emb = Tables.embeddings(s, dir)
      Vectors.marginPairs(
        emb.filter(col("vec_id") % 10 < 2 && col("vec_id") < 20000),
        emb.filter(col("vec_id") % 10 >= 2))
    }),
    "s32_margin_scan" -> ((s, dir) => {
      // s31's geometry-robust SCALE path, oracle-attested end-to-end (the
      // annTopK design applied to pair mining): SQ8 byte-code scoring of
      // the full (test × train) grid, per-side top-8 shortlists from the
      // compressed scores, exact re-rank of only those pairs, then the
      // margin tail — pair recovery ≈ 1.0 at 1/8 the scan bandwidth where
      // the sign-hash bucket path caps near its candidate fraction on this
      // isotropic corpus (RECALL.json margin_overlap_curve)
      // same literal-bounded test side as s31 (round-12 ADVICE) — a no-op
      // on every fixture, a by-construction |Q|≪N bound at any scale
      val emb = Tables.embeddings(s, dir)
      Vectors.marginPairsScan(
        emb.filter(col("vec_id") % 10 < 2 && col("vec_id") < 20000),
        emb.filter(col("vec_id") % 10 >= 2))
    }),
    "s38_margin_gated" -> ((s, dir) => {
      // the geometry-GATED dispatch (round-7 verdict #5): measure the
      // pair-cosine tail of the combined corpus, route candidates through
      // trained IVF buckets when it shows cluster structure (sub-linear
      // candidates at overlap ≥ 0.9 — RECALL.json margin_routed on the
      // clustered twin), fall back to the s32 compressed scan when
      // isotropic (routing would prune true neighbors at candidate-
      // fraction rates). This fixture measures isotropic, so the gate
      // deterministically picks scan and the oracle is s32's verbatim
      // same literal-bounded test side as s31 (round-12 ADVICE) — a no-op
      // on every fixture, a by-construction |Q|≪N bound at any scale
      val emb = Tables.embeddings(s, dir)
      Vectors.marginPairsGated(
        emb.filter(col("vec_id") % 10 < 2 && col("vec_id") < 20000),
        emb.filter(col("vec_id") % 10 >= 2))
    }),
    "s30_cluster_balanced_sample" -> ((s, dir) =>
      // topic-balanced subset: ⌈√N⌉ IVF clusters as label-free topic
      // proxies, ≤5 members each in deterministic hash order — the
      // DoReMi-style mixture-balance step on semantic buckets
      Vectors.clusterBalancedSample(Tables.embeddings(s, dir), quota = 5)),
    "s39_index_staleness" -> ((s, dir) => {
      // the d39 rebuild-decision report for the VECTOR surface, on the
      // spaced PARITY artifact (trained routing isn't static-SQL-
      // expressible; the drift math is identical on both recipes):
      // vectors the index doesn't hold assign against the PINNED ledger
      // and the report reads per-bucket occupancy shift — the
      // retrain-vs-append signal. Delta = every 5th vector re-ingested
      // rotated 8 coordinates under a new id (norm-preserving and
      // oracle-reproducible from the embeddings table alone)
      val emb = Tables.embeddings(s, dir)
      val t = "ivf_index_spaced_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Vectors.materializedIvfIndex(emb, t,
        centroidIds = Some(Vectors.spacedCentroidIds(emb.count())))
      val delta = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + lit(10000000L)).as("vec_id"),
          concat(slice(col("embedding"), 9, 56),
            slice(col("embedding"), 1, 8)).as("embedding"))
      Vectors.ivfIndexStaleness(
        emb.select(col("vec_id"), col("embedding")).unionByName(delta), t)
    }),
    "s40_nav_append_decision" -> ((s, dir) => {
      // the staleness family's third member — the ONE artifact whose
      // maintenance decision is append-vs-rebuild rather than
      // rebuild-vs-wait (the nav graph's append is a DIFFERENT
      // approximation by contract): build on the corpus as of the cut
      // (last 4% of the id space plays the arrived batch), fold the
      // batch in via insert-by-search, rebuild a twin from scratch, and
      // report per query the brute-truth hits of both serves plus the
      // global appended fraction — the compaction decision's inputs,
      // oracle-attested end to end (three beam walks, spaced parity)
      val emb = Tables.embeddings(s, dir)
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      Vectors.navAppendDecision(emb, "nav_stale_" + sfx,
        "nav_graph_spaced_" + sfx)
    }),
    "s29_ann_batch_index" -> ((s, dir) =>
      // build-once/query-many: the persisted bucket-clustered IVF index
      // serves a query BATCH too large to broadcast (every 25th corpus
      // vector) — the offline re-scoring job shape; with the index bucketed
      // on `bucket` the corpus side plans exchange-free (BucketedLayoutSpec
      // pins the plan; this query oracle-attests the math end-to-end).
      // Spaced parity index (explicit centroidIds) — the trained default
      // is s36's checked query
      {
        val emb = Tables.embeddings(s, dir)
        Vectors.servedBatchTopK(emb,
          "ivf_index_spaced_" + dir.replaceAll("[^A-Za-z0-9]", "_"), k = 3,
          centroidIds = Some(Vectors.spacedCentroidIds(emb.count())))
      }),
    "s28_tuned_probe" -> ((s, dir) =>
      // the tuning DECISION oracle-attested: for each recall target the
      // smallest swept nprobe that meets it (widest as fallback) — the
      // tunedNprobe rule over the fused s23 sweep, DuckDB-hash-checked;
      // the trained-centroid twin runs the same rule (property-pinned)
      Vectors.tunedOperatingPoints(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s23_probe_sweep" -> ((s, dir) =>
      // the d36 tuning-table discipline applied to IVF routing: recall@10
      // at nprobe 1/2/4/8 vs the exact truth, one row per config
      Vectors.probeSweep(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s21_vector_health" -> ((s, dir) =>
      // the pre-index sanity gate: dim consistency, null/zero-norm/non-
      // finite counts, norm range ppb — one projection + one metadata agg
      Vectors.vectorHealth(Tables.embeddings(s, dir))),
    "s18_embedding_leakage" -> ((s, dir) => {
      // the vector twin of d13/x38 decontamination: test split (vec_id%10
      // < 2) screened against the train split via shared sign-hash
      // buckets, exact cosine confirm, per-test leak count + nearest
      val emb = Tables.embeddings(s, dir)
      Vectors.crossCorpusLeakage(
        emb.filter(col("vec_id") % 10 < 2),
        emb.filter(col("vec_id") % 10 >= 2), threshold = 0.4)
    }),
    "s14_knn_graph" -> ((s, dir) =>
      // every vector's top-3 in-bucket neighbors — N^1.5 pair work via the
      // √N IVF blocking; the edge list near-dup clustering consumes
      Vectors.knnGraph(Tables.embeddings(s, dir), k = 3)),
    "s15_ann_radius" -> ((s, dir) =>
      // threshold retrieval: everything ≥ τ-similar in the query's IVF
      // bucket — float-free output, the d6 discipline query-centric
      Vectors.radiusSearch(Tables.embeddings(s, dir), 0L until 8L, tau = 0.2)),
    "s13_ann_mmr" -> ((s, dir) =>
      // diversified retrieval: greedy MMR over the per-query shortlist —
      // corpus-sized work is one scoring pass; selection is k fixed
      // argmax rounds over metadata-sized frames
      Vectors.mmrRerank(Tables.embeddings(s, dir), 0L until 8L, k = 5,
        shortlist = 20)),
    "s8_ann_quantized" -> ((s, dir) =>
      // 8-bit scalar quantization + integer-dot scoring: the 100 TB
      // memory/bandwidth form (codes are 8x smaller than float64 units)
      Vectors.quantizedTopK(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s7_ann_filtered" -> ((s, dir) => {
      // hybrid search: neighbors drawn only from quality-passing documents
      // (vec_id ≡ doc_id); the gate is a semi join applied before scoring
      val allowed = Tables.documents(s, dir)
        .filter(TextOps.qualityPassExpr(col("text")))
        .select(col("doc_id").as("vec_id"))
      Vectors.bruteForceTopKFiltered(Tables.embeddings(s, dir), allowed, 0L until 8L, k = 10)
    }),
    "s2_ann_ivf" -> ((s, dir) => {
      // ⌈√N⌉ spaced centroids like d6/s4/s6 — bucket count grows with the
      // corpus (a constant count would degrade to O(N²/C) pair scans).
      // Round 5: ships MULTI-PROBE (nprobe=4) — the round-4 verdict showed
      // the single-probe default retrieved 2-of-5 right neighbors; probing
      // the 4 nearest buckets is the standard recall floor (RECALL.json
      // tracks the curve; single-probe stays a diagnostic row there)
      val emb = Tables.embeddings(s, dir)
      Vectors.ivfTopKMultiProbe(emb, Vectors.spacedCentroidIds(emb.count()),
        0L until 8L, k = 5, nprobe = 4)
    }),
    "s27_ann_default" -> ((s, dir) =>
      // THE production one-call ANN: SQ8 compressed scan (1 byte/dim, 8×
      // below the float corpus) shortlists 4k candidates, exact re-rank
      // orders them — recall 1.0 at sf0.1 regardless of corpus geometry
      // (bucket-pruned recall is data-bounded; see Vectors.annTopK doc)
      Vectors.annTopK(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s9_ann_pq" -> ((s, dir) =>
      // product quantization at the round-5 shipped point: 16 subspaces ×
      // 64 spaced sub-centroids (16 bytes/vector — still 32× below
      // float64) ADC-shortlists 80 candidates, exact re-rank orders them.
      // Recall@10 = 0.89 at sf0.1 vs 0.16 for the round-4 ADC-only
      // m=8/ks=16 default (RECALL.json); the ADC-only small-code point
      // remains on the record as s12's stage 1 and a diagnostics row
      Vectors.pqRerankTopK(Tables.embeddings(s, dir), 0L until 8L, k = 10,
        shortlist = 80, m = 16, ks = 64)),
    "s11_ann_ivfpq" -> ((s, dir) => {
      // the production composition at the shipped operating point: IVF
      // multi-probe routing (nprobe=4) bounds WHICH vectors are scored, PQ
      // codes (m=16, ks=64) bound WHAT the scan reads, and the ADC
      // shortlist re-ranks exactly — a probe touches O(4·√N·m) bytes and
      // quantization error affects WHICH candidates surface, not their
      // final order
      val emb = Tables.embeddings(s, dir)
      Vectors.ivfPqRerankTopK(emb, Vectors.spacedCentroidIds(emb.count()), 0L until 8L,
        k = 5, nprobe = 4, shortlist = 40, m = 16, ks = 64)
    }),
    "s12_ann_pq_rerank" -> ((s, dir) =>
      // two-stage retrieval: the PQ byte-code scan shortlists 40
      // candidates per query, then ONLY those are re-scored exactly —
      // recall ≈ brute force without a float corpus scan
      Vectors.pqRerankTopK(Tables.embeddings(s, dir), 0L until 8L, k = 10)),
    "s10_ivf_profile" -> ((s, dir) => {
      // index health check: per-bucket population of the spaced-centroid
      // IVF assignment — the balance report that decides nprobe/centroid
      // retraining; one assignment pass + a metadata-sized aggregation
      val emb = Tables.embeddings(s, dir)
      Vectors.ivfAssign(emb, Vectors.spacedCentroidIds(emb.count()))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("vec_id")).as("min_vec_id"),
          max(col("vec_id")).as("max_vec_id"))
    }),
    "s3_ann_lsh" -> ((s, dir) =>
      // round-5 default: multi-probe (own bucket + all Hamming-1 buckets)
      // — the single-bucket form retrieved 1-of-20 right neighbors
      Vectors.lshTopKMultiProbe(Tables.embeddings(s, dir), 0L until 8L, k = 5)),
    "s4_ann_ivf_multiprobe" -> ((s, dir) => {
      // recall knob one step past s2's shipped nprobe=4 default: 8 probes
      // over the ⌈√N⌉ spaced-centroid buckets (s23 sweeps the full curve)
      val emb = Tables.embeddings(s, dir)
      Vectors.ivfTopKMultiProbe(emb, Vectors.spacedCentroidIds(emb.count()),
        0L until 8L, k = 5, nprobe = 8)
    }),
    "s5_ann_lsh_multitable" -> ((s, dir) =>
      // recall amplifier: candidate iff colliding in ANY of 4 hash tables
      Vectors.lshTopKMultiTable(Tables.embeddings(s, dir), 0L until 8L, k = 5)),
    "s6_ann_ivf_twolevel" -> ((s, dir) => {
      // hierarchical assignment: O(N·√C·d) instead of O(N·C·d) — the
      // routing that keeps IVF assignment affordable at 100 TB. Round 5:
      // the SEARCH side is multi-probe (nprobe=4 fine buckets, scored
      // directly — the query side is |Q| rows, hierarchy saves nothing
      // there and the single-probe form retrieved 0.16 recall@5)
      val emb = Tables.embeddings(s, dir)
      val fine = Vectors.spacedCentroidIds(emb.count())
      Vectors.ivfTopKTwoLevelMultiProbe(emb, fine, Vectors.coarseSubset(fine),
        0L until 8L, k = 5, nprobe = 4)
    }),
    "s22_cross_knn" -> ((s, dir) => {
      // the embedding-match join: every test vector's top-3 train
      // neighbors among its bucket candidates — s14 across two corpora
      val emb = Tables.embeddings(s, dir)
      Vectors.crossCorpusTopK(
        emb.filter(col("vec_id") % 10 < 2),
        emb.filter(col("vec_id") % 10 >= 2), k = 3)
    })
  )

  val oracles: Map[String, String] = Map(
    "s18_embedding_leakage" -> {
      val anyMatch = (0 until 4).map(t => s"te.b$t = tr.b$t").mkString(" OR ")
      s"""WITH $oracleEmbCte,
         |bt AS (SELECT vec_id, ${oracleLshTableCols(4)} FROM e),
         |te AS (SELECT * FROM bt WHERE vec_id % 10 < 2),
         |tr AS (SELECT * FROM bt WHERE vec_id % 10 >= 2),
         |cand AS (SELECT DISTINCT te.vec_id AS test_id, tr.vec_id AS train_id
         |         FROM te JOIN tr ON ($anyMatch)),
         |sc AS (SELECT c.test_id, c.train_id, ${oracleCos("et.v", "ev.v")} AS sim
         |       FROM cand c
         |       JOIN e et ON et.vec_id = c.test_id
         |       JOIN e ev ON ev.vec_id = c.train_id),
         |g AS (SELECT test_id, train_id,
         |             row_number() OVER (PARTITION BY test_id
         |               ORDER BY sim DESC, train_id ASC) AS rn,
         |             count(*) OVER (PARTITION BY test_id) AS n_leaks
         |      FROM sc WHERE sim >= 0.4)
         |SELECT test_id, CAST(n_leaks AS BIGINT) AS n_leaks,
         |       train_id AS nearest_train_id
         |FROM g WHERE rn = 1""".stripMargin
    },
    "s13_ann_mmr" -> oracleMmr,
    "s15_ann_radius" ->
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |q AS (SELECT vec_id AS query_id, bucket, v AS qv FROM av WHERE vec_id < 8)
         |SELECT q.query_id, av.vec_id AS neighbor_id
         |FROM q JOIN av ON av.bucket = q.bucket AND av.vec_id <> q.query_id
         |WHERE ${oracleCos("q.qv", "av.v")} >= 0.2""".stripMargin,
    "s14_knn_graph" ->
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |scored AS (SELECT a.vec_id AS src_id, b.vec_id AS neighbor_id,
         |                  ${oracleCos("a.v", "b.v")} AS sim
         |           FROM av a JOIN av b ON a.bucket = b.bucket
         |            AND a.vec_id <> b.vec_id)
         |SELECT src_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT src_id, neighbor_id, row_number() OVER (PARTITION BY src_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin,
    "s1_ann_bruteforce" ->
      s"""WITH $oracleEmbCte,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |scored AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("q.qv", "e.v")} AS sim
         |           FROM q, e WHERE e.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 10""".stripMargin,
    "s16_ann_jl" ->
      // identical sign matrix from the same integer hash; projections fold
      // via list_dot_product in the same order as the codegen'd dot, then
      // normalize exactly as the e CTE does
      s"""WITH $oracleEmbCte,
         |dim AS (SELECT len(v) AS d FROM e LIMIT 1),
         |sgn AS (SELECT j, list(CASE WHEN (i * 2654435761 + j * 40503) % 2147483648 // 65536 % 2 = 0
         |                            THEN 1.0 ELSE -1.0 END ORDER BY i) AS sv
         |        FROM range(16) t(j), (SELECT unnest(range((SELECT d FROM dim))) AS i)
         |        GROUP BY j),
         |p0 AS (SELECT vec_id, list(list_dot_product(e.v, s.sv) ORDER BY s.j) AS pv
         |       FROM e, sgn s GROUP BY vec_id),
         |p AS (SELECT vec_id, [x / sqrt(list_dot_product(pv, pv)) for x in pv] AS pu FROM p0),
         |shortl AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY list_dot_product(q.pu, c.pu) DESC, c.vec_id ASC) AS rn
         |  FROM p q JOIN p c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8)
         | WHERE rn <= 40),
         |scored AS (SELECT s.query_id, s.neighbor_id,
         |                  ${oracleCos("eq.v", "ec.v")} AS sim
         |           FROM shortl s
         |           JOIN e eq ON eq.vec_id = s.query_id
         |           JOIN e ec ON ec.vec_id = s.neighbor_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 10""".stripMargin,
    "s25_knn_confusion" ->
      // s17's chain over a 100-query batch, then the (true, pred) rollup
      s"""WITH $oracleEmbCte,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 100),
         |scored AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("q.qv", "e.v")} AS sim
         |           FROM q, e WHERE e.vec_id <> q.query_id),
         |top AS (SELECT query_id, neighbor_id FROM (
         |          SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |            ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |        WHERE rank <= 10),
         |v AS (SELECT t.query_id, emb.label, count(*) AS votes
         |      FROM top t JOIN embeddings emb ON emb.vec_id = t.neighbor_id
         |      GROUP BY 1, 2),
         |pred AS (SELECT query_id, label AS pred_label FROM (
         |           SELECT query_id, label, row_number() OVER (PARTITION BY query_id
         |             ORDER BY votes DESC, label ASC) AS rn FROM v)
         |         WHERE rn = 1)
         |SELECT emb.label AS true_label, p.pred_label,
         |       CAST(count(*) AS BIGINT) AS n_queries
         |FROM pred p JOIN embeddings emb ON emb.vec_id = p.query_id
         |GROUP BY 1, 2""".stripMargin,
    "s17_knn_classify" ->
      // s1's exact top-10 (bit-identical dots and ranks), then a vote
      // count and a (votes desc, label asc) argmax — all integer
      s"""WITH $oracleEmbCte,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |scored AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("q.qv", "e.v")} AS sim
         |           FROM q, e WHERE e.vec_id <> q.query_id),
         |top AS (SELECT query_id, neighbor_id FROM (
         |          SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |            ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |        WHERE rank <= 10),
         |v AS (SELECT t.query_id, emb.label, count(*) AS votes
         |      FROM top t JOIN embeddings emb ON emb.vec_id = t.neighbor_id
         |      GROUP BY 1, 2)
         |SELECT query_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
         |FROM (SELECT query_id, label, votes, row_number() OVER (PARTITION BY query_id
         |        ORDER BY votes DESC, label ASC) AS rn FROM v)
         |WHERE rn = 1""".stripMargin,
    // quantization is over UNIT vectors (so scores approximate cosine) and
    // scoring is decode-corrected: per-dimension min/max are exact aggs,
    // encode `floor((x − mn)·255/(mx − mn))` and decode `mn + c·Δ` run in
    // the identical operand order on both engines, products accumulate
    // sequentially — so codes, sims, and ranks are bit-reproducible
    "s8_ann_quantized" ->
      s"""WITH $oracleEmbCte,
        |ex AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x FROM e),
        |stats AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i),
        |codes AS (SELECT vec_id, i, mn, mx,
        |            CASE WHEN mx > mn THEN least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
        |                 ELSE 0.0 END AS c
        |          FROM ex JOIN stats USING (i)),
        |dec AS (SELECT vec_id, list(mn + c * ((mx - mn) / 255.0) ORDER BY i) AS dv
        |        FROM codes GROUP BY vec_id),
        |q AS (SELECT vec_id AS query_id, dv AS a FROM dec WHERE vec_id < 8),
        |scored AS (SELECT query_id, dec.vec_id AS neighbor_id,
        |             list_dot_product(a, dec.dv) AS sim
        |           FROM q, dec WHERE dec.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,
    // PQ with m=8 subspaces of 8 dims (d=64), ks=16 spaced centroids:
    // squared distances and subspace dots fold left-to-right from 0.0 and
    // the m partials add in subspace order — the exact accumulation order
    // of PqEncode/PqAdcDot — so codes, sims, and ranks match bit-for-bit
    "s9_ann_pq" ->
      // round-5 shipped point: m=16/ks=64 codes, ADC shortlist 80, exact
      // re-rank top-10 — mirrors Vectors.pqRerankTopK(shortlist=80, m=16,
      // ks=64) stage-for-stage
      s"""WITH $oracleEmbCte,
         |${oraclePqCtesFor(16, 64)},
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |${oraclePqScoredFor(16)("q JOIN e nb ON nb.vec_id <> q.query_id")},
         |coarse AS (SELECT query_id, neighbor_id FROM (
         |            SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |              ORDER BY sim DESC, neighbor_id ASC) AS rn FROM scored) WHERE rn <= 80),
         |rr AS (SELECT c.query_id, c.neighbor_id,
         |         list_dot_product(q.qv, nb.v) AS sim2
         |       FROM coarse c
         |       JOIN e nb ON nb.vec_id = c.neighbor_id
         |       JOIN q ON q.query_id = c.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim2 DESC, neighbor_id ASC) AS rank FROM rr)
         |WHERE rank <= 10""".stripMargin,
    "s12_ann_pq_rerank" ->
      // stage 1 = s9's ADC shortlist (top-40 by PQ sim), stage 2 re-ranks
      // only those by the exact dot over the full unit vectors
      s"""WITH $oracleEmbCte,
         |$oraclePqCtes,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |${oraclePqScored("q JOIN e nb ON nb.vec_id <> q.query_id")},
         |coarse AS (SELECT query_id, neighbor_id FROM (
         |            SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |              ORDER BY sim DESC, neighbor_id ASC) AS rn FROM scored) WHERE rn <= 40),
         |rr AS (SELECT c.query_id, c.neighbor_id,
         |         list_dot_product(q.qv, nb.v) AS sim2
         |       FROM coarse c
         |       JOIN e nb ON nb.vec_id = c.neighbor_id
         |       JOIN q ON q.query_id = c.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim2 DESC, neighbor_id ASC) AS rank FROM rr)
         |WHERE rank <= 10""".stripMargin,
    "s11_ann_ivfpq" ->
      // round-5 shipped composition: multi-probe routing (nprobe=4), PQ
      // codes m=16/ks=64, ADC shortlist 40 across the probed buckets,
      // exact re-rank top-5 — mirrors Vectors.ivfPqRerankTopK stage-for-
      // stage (probes rank ties to the smaller centroid id, shortlist and
      // final ranks tie to the smaller neighbor id)
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |${oraclePqCtesFor(16, 64)},
         |qp AS (SELECT query_id, bucket FROM (
         |         SELECT vec_id AS query_id, centroid_id AS bucket,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY cs DESC, centroid_id ASC) AS rn
         |         FROM sc WHERE vec_id < 8)
         |       WHERE rn <= 4),
         |q AS (SELECT qp.query_id, qp.bucket, e.v AS qv
         |      FROM qp JOIN e ON e.vec_id = qp.query_id),
         |${oraclePqScoredFor(16)(
          "q JOIN av nb ON nb.bucket = q.bucket AND nb.vec_id <> q.query_id")},
         |coarse AS (SELECT query_id, neighbor_id FROM (
         |            SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |              ORDER BY sim DESC, neighbor_id ASC) AS rn FROM scored) WHERE rn <= 40),
         |rr AS (SELECT c.query_id, c.neighbor_id,
         |         list_dot_product(q2.v, nb.v) AS sim2
         |       FROM coarse c
         |       JOIN e nb ON nb.vec_id = c.neighbor_id
         |       JOIN e q2 ON q2.vec_id = c.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim2 DESC, neighbor_id ASC) AS rank FROM rr)
         |WHERE rank <= 5""".stripMargin,
    "s27_ann_default" ->
      // the one-call production default: s8's SQ8 decode-corrected scan
      // shortlists rn <= 40, exact re-rank over the normalized vectors
      // orders the final top-10 — mirrors Vectors.annTopK stage-for-stage
      s"""WITH $oracleEmbCte,
         |ex AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x FROM e),
         |stats AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i),
         |codes AS (SELECT vec_id, i, mn, mx,
         |            CASE WHEN mx > mn THEN least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
         |                 ELSE 0.0 END AS c
         |          FROM ex JOIN stats USING (i)),
         |dec AS (SELECT vec_id, list(mn + c * ((mx - mn) / 255.0) ORDER BY i) AS dv
         |        FROM codes GROUP BY vec_id),
         |q AS (SELECT vec_id AS query_id, dv AS a FROM dec WHERE vec_id < 8),
         |qscored AS (SELECT query_id, dec.vec_id AS neighbor_id,
         |              list_dot_product(a, dec.dv) AS sim
         |            FROM q, dec WHERE dec.vec_id <> q.query_id),
         |coarse AS (SELECT query_id, neighbor_id FROM (
         |            SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |              ORDER BY sim DESC, neighbor_id ASC) AS rn FROM qscored) WHERE rn <= 40),
         |rr AS (SELECT c.query_id, c.neighbor_id,
         |         list_dot_product(q2.v, nb.v) AS sim2
         |       FROM coarse c
         |       JOIN e nb ON nb.vec_id = c.neighbor_id
         |       JOIN e q2 ON q2.vec_id = c.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim2 DESC, neighbor_id ASC) AS rank FROM rr)
         |WHERE rank <= 10""".stripMargin,
    "s10_ivf_profile" ->
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
         |       min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
         |FROM av GROUP BY bucket""".stripMargin,
    "s2_ann_ivf" -> oracleIvfMultiProbeAt(nprobe = 4, k = 5),
    "s31_margin_mining" ->
      // per-side top-4 sims fold in RANK order (list ORDER BY rn +
      // list_reduce — the pinned-fold discipline), margin rounds to ppm
      // BEFORE the threshold so the cut is boundary-stable
      s"""WITH $oracleEmbCte,
         |t AS (SELECT vec_id AS test_id, v AS tv FROM e
         |      WHERE vec_id % 10 < 2 AND vec_id < 20000),
         |r AS (SELECT vec_id AS train_id, v AS rv FROM e WHERE vec_id % 10 >= 2),
         |sc AS (SELECT test_id, train_id, ${oracleCos("tv", "rv")} AS sim FROM t, r),
         |fr AS (SELECT test_id, train_id, sim, row_number() OVER (PARTITION BY test_id
         |         ORDER BY sim DESC, train_id ASC) AS rn FROM sc),
         |br AS (SELECT test_id, train_id, sim, row_number() OVER (PARTITION BY train_id
         |         ORDER BY sim DESC, test_id ASC) AS rn FROM sc),
         |fa AS (SELECT test_id,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(sim ORDER BY rn)),
         |           (a, b) -> a + b) / count(*) AS f_avg
         |       FROM fr WHERE rn <= 4 GROUP BY test_id),
         |ba AS (SELECT train_id,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(sim ORDER BY rn)),
         |           (a, b) -> a + b) / count(*) AS b_avg
         |       FROM br WHERE rn <= 4 GROUP BY train_id),
         |top1 AS (SELECT test_id, train_id, sim FROM fr WHERE rn = 1)
         |SELECT test_id, train_id,
         |       CAST(round(2000000 * sim / (f_avg + b_avg)) AS BIGINT) AS margin_ppm
         |FROM top1 JOIN fa USING (test_id) JOIN ba USING (train_id)
         |WHERE CAST(round(2000000 * sim / (f_avg + b_avg)) AS BIGINT) >= 1200000""".stripMargin,
    "s32_margin_scan" -> oracleMarginScan,
    // the GATED dispatch resolves to the scan branch on this
    // measured-isotropic fixture (gate p99 ≈ 2.33/√d < 3.5/√d), so the
    // result — and the oracle — is s32's verbatim; the routed branch is
    // attested on the clustered twin (RECALL.json margin_routed +
    // VectorsSpec)
    "s38_margin_gated" -> oracleMarginScan,
    "s30_cluster_balanced_sample" ->
      // per-bucket quota in deterministic multiplicative-hash order —
      // exact integer arithmetic end-to-end (2654435761 mod (2³¹−1)
      // inlined), ties to the smaller vec_id
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |keyed AS (SELECT vec_id, bucket,
         |            ((vec_id % 2147483647) * ${2654435761L % 2147483647L}) % 2147483647 AS skey
         |          FROM av)
         |SELECT vec_id, bucket, CAST(rn AS BIGINT) AS pick_rank
         |FROM (SELECT vec_id, bucket, row_number() OVER (PARTITION BY bucket
         |        ORDER BY skey ASC, vec_id ASC) AS rn FROM keyed)
         |WHERE rn <= 5""".stripMargin,
    "s39_index_staleness" ->
      // same spaced assignment chain as s29's index contents; the delta's
      // rotated vectors normalize and score in the ROTATED element order
      // on both engines (same fold order ⇒ bit-identical dots)
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |d0 AS (SELECT vec_id + 10000000 AS vec_id,
         |              v0[9:64] || v0[1:8] AS v0
         |       FROM e0 WHERE vec_id % 5 = 0),
         |dn AS (SELECT vec_id, [x / sqrt(list_dot_product(v0, v0)) for x in v0] AS v FROM d0),
         |dsc AS (SELECT dn.vec_id, cent.centroid_id, ${oracleCos("dn.v", "cent.cv")} AS cs
         |        FROM dn, cent),
         |dassigned AS (SELECT vec_id, centroid_id AS bucket
         |              FROM (SELECT vec_id, centroid_id,
         |                      row_number() OVER (PARTITION BY vec_id
         |                        ORDER BY cs DESC, centroid_id ASC) AS rn FROM dsc)
         |              WHERE rn = 1),
         |nb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_indexed FROM assigned GROUP BY 1),
         |nn AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new FROM dassigned GROUP BY 1),
         |j AS (SELECT c.centroid_id AS bucket,
         |             coalesce(nb.n_indexed, 0) AS n_indexed,
         |             coalesce(nn.n_new, 0) AS n_new
         |      FROM cent c LEFT JOIN nb ON nb.bucket = c.centroid_id
         |                  LEFT JOIN nn ON nn.bucket = c.centroid_id),
         |tot AS (SELECT sum(n_indexed) AS tb, sum(n_indexed) + sum(n_new) AS ta FROM j)
         |SELECT bucket, CAST(n_indexed AS BIGINT) AS n_indexed,
         |       CAST(n_new AS BIGINT) AS n_new,
         |       CAST((1000000 * n_indexed) // tb AS BIGINT) AS share_before_ppm,
         |       CAST((1000000 * (n_indexed + n_new)) // ta AS BIGINT) AS share_after_ppm
         |FROM j CROSS JOIN tot""".stripMargin,
    "s29_ann_batch_index" ->
      // the batch-probe math over the same spaced assignment: every 25th
      // vector queries its own bucket, exact cosine, top-3 (the INDEX
      // mechanics — bucketed table, exchange-free scan — are the Spark
      // side's layout; the result set is layout-independent)
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |q AS (SELECT vec_id AS query_id, bucket, v AS qv FROM av WHERE vec_id % 25 = 0),
         |scored AS (SELECT q.query_id, av.vec_id AS neighbor_id, ${oracleCos("q.qv", "av.v")} AS sim
         |           FROM q JOIN av ON av.bucket = q.bucket AND av.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin,
    "s19_ivf_recall" ->
      // exact top-10 ∩ IVF top-10 per query; recall is deterministic, so
      // zero-hit queries still emit a 0 row
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |qall AS (SELECT vec_id AS query_id FROM e WHERE vec_id < 8),
         |bq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |bscored AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("bq.qv", "e.v")} AS sim
         |            FROM bq, e WHERE e.vec_id <> bq.query_id),
         |btop AS (SELECT query_id, neighbor_id FROM (
         |           SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM bscored)
         |         WHERE rn <= 10),
         |iq AS (SELECT vec_id AS query_id, bucket, v AS qv FROM av WHERE vec_id < 8),
         |iscored AS (SELECT iq.query_id, av.vec_id AS neighbor_id, ${oracleCos("iq.qv", "av.v")} AS sim
         |            FROM iq JOIN av ON av.bucket = iq.bucket AND av.vec_id <> iq.query_id),
         |itop AS (SELECT query_id, neighbor_id FROM (
         |           SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM iscored)
         |         WHERE rn <= 10),
         |hits AS (SELECT b.query_id, count(*) AS n_hits
         |         FROM btop b JOIN itop i
         |           ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         |         GROUP BY 1)
         |SELECT q.query_id,
         |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST((1000000 * coalesce(h.n_hits, 0)) // 10 AS BIGINT) AS recall_ppm
         |FROM qall q LEFT JOIN hits h ON h.query_id = q.query_id""".stripMargin,
    "s24_ann_beam" -> oracleBeam,
    "s40_nav_append_decision" -> oracleNavAppendDecision,
    // s33 serves the SAME deterministic graph from a bucketed artifact —
    // result is layout-independent, so the oracle is s24's walk verbatim
    "s33_ann_beam_served" -> oracleBeam,
    "s34_ann_beam_pruned" -> oracleBeam,
    // the trained-default artifact checked queries return the BRUTE truth
    // (trained routing is corpus-derived — not static-SQL-expressible) and
    // attest the artifact serve via an in-plan recall-floor assert; the
    // serve_ok column is constant TRUE when the assert passes (the
    // countMinChecked sketch_ok discipline)
    "s36_ann_trained_ivf_checked" -> oracleBruteChecked(k = 10, qn = 8),
    "s37_ann_trained_beam_checked" -> oracleBruteChecked(k = 5, qn = 8),
    "s26_beam_sweep" -> oracleBeamSweep,
    "s23_probe_sweep" ->
      s"""${oracleProbeSweepCtes(k = 10, qn = 8, cfg = Seq(1, 2, 4, 8))}
         |SELECT nprobe, n_hits, n_truth, recall_ppm FROM sweep""".stripMargin,
    "s28_tuned_probe" -> {
      // the tuning DECISION over the same sweep: smallest nprobe meeting
      // each recall target, widest config as the fallback — mirrors
      // Vectors.tunedOperatingPoints row-for-row
      val widest = 8
      s"""${oracleProbeSweepCtes(k = 10, qn = 8, cfg = Seq(1, 2, 4, 8))},
         |targets AS (SELECT unnest([250000, 400000, 990000]) AS target_ppm),
         |sel AS (SELECT t.target_ppm, min(s.nprobe) AS np
         |        FROM targets t LEFT JOIN sweep s ON s.recall_ppm >= t.target_ppm
         |        GROUP BY t.target_ppm)
         |SELECT CAST(sel.target_ppm AS BIGINT) AS target_ppm,
         |       coalesce(sel.np, $widest) AS nprobe, s.recall_ppm
         |FROM sel JOIN sweep s ON s.nprobe = coalesce(sel.np, $widest)""".stripMargin
    },
    "s20_pq_distortion" ->
      // exact sims of the brute top-10, PQ ADC sims for the SAME pairs via
      // the shared codebook CTEs, per-pair ppb floor, integer mean
      s"""WITH $oracleEmbCte,
         |$oraclePqCtes,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |bscored AS (SELECT query_id, e2.vec_id AS neighbor_id,
         |                   ${oracleCos("q.qv", "e2.v")} AS esim
         |            FROM q, e e2 WHERE e2.vec_id <> q.query_id),
         |btop AS (SELECT query_id, neighbor_id, esim FROM (
         |           SELECT query_id, neighbor_id, esim, row_number() OVER (PARTITION BY query_id
         |             ORDER BY esim DESC, neighbor_id ASC) AS rn FROM bscored)
         |         WHERE rn <= 10),
         |${oraclePqScored(
            "q JOIN btop b ON b.query_id = q.query_id JOIN e nb ON nb.vec_id = b.neighbor_id")},
         |err AS (SELECT s.query_id,
         |               CAST(floor(abs(b.esim - s.sim) * 1000000000) AS BIGINT) AS err_ppb
         |        FROM scored s JOIN btop b
         |          ON b.query_id = s.query_id AND b.neighbor_id = s.neighbor_id)
         |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(err_ppb) // count(*) AS BIGINT) AS mean_abs_err_ppb
         |FROM err GROUP BY 1""".stripMargin,
    "s22_cross_knn" ->
      // s18's bucket-candidate CTEs with a per-query rank tail instead of
      // the threshold screen
      s"""WITH $oracleEmbCte,
         |bt AS (SELECT vec_id, ${oracleLshTableCols(4)} FROM e),
         |te AS (SELECT * FROM bt WHERE vec_id % 10 < 2),
         |tr AS (SELECT * FROM bt WHERE vec_id % 10 >= 2),
         |cand AS (SELECT DISTINCT te.vec_id AS query_id, tr.vec_id AS neighbor_id
         |         FROM te JOIN tr ON (te.b0 = tr.b0 OR te.b1 = tr.b1
         |                             OR te.b2 = tr.b2 OR te.b3 = tr.b3)),
         |sc AS (SELECT c.query_id, c.neighbor_id, ${oracleCos("et.v", "ev.v")} AS sim
         |       FROM cand c
         |       JOIN e et ON et.vec_id = c.query_id
         |       JOIN e ev ON ev.vec_id = c.neighbor_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM sc)
         |WHERE rank <= 3""".stripMargin,
    "s21_vector_health" ->
      // same fold order for the norm (list_dot_product ≡ the codegen'd
      // dot), sqrt + floor ppb integer-exact
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |                  CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null
        |           FROM embeddings),
        |n AS (SELECT CAST(len(v) AS BIGINT) AS dim, is_null,
        |             CASE WHEN is_null = 1 THEN NULL
        |                  WHEN isnan(list_dot_product(v, v)) OR isinf(list_dot_product(v, v))
        |                    THEN -1
        |                  ELSE CAST(floor(sqrt(list_dot_product(v, v)) * 1000000000) AS BIGINT)
        |             END AS norm_ppb
        |      FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        |       CAST(count(DISTINCT dim) AS BIGINT) AS n_distinct_dims,
        |       CAST(max(dim) AS BIGINT) AS dim,
        |       CAST(sum(is_null) AS BIGINT) AS n_null,
        |       CAST(sum(CASE WHEN norm_ppb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
        |       CAST(sum(CASE WHEN norm_ppb = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_non_finite,
        |       CAST(min(CASE WHEN norm_ppb > 0 THEN norm_ppb END) AS BIGINT) AS min_norm_ppb,
        |       CAST(max(norm_ppb) AS BIGINT) AS max_norm_ppb
        |FROM n""".stripMargin,
    "s3_ann_lsh" -> oracleLsh,
    "s4_ann_ivf_multiprobe" -> oracleIvfMultiProbeAt(nprobe = 8, k = 5),
    "s5_ann_lsh_multitable" -> oracleLshMulti,
    "s6_ann_ivf_twolevel" -> oracleIvfTwoLevel,
    "s7_ann_filtered" ->
      s"""WITH $oracleEmbCte,
         |qual AS (SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |       CAST(len(list_filter(string_split(text, ' '),
         |              s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT) AS n_stop,
         |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |         / len(string_split(text, ' ')) AS mtl
         |     FROM documents),
         |allowed AS (SELECT doc_id AS vec_id FROM qual
         |            WHERE n_tokens >= 32 AND mtl >= 2.0 AND mtl <= 12.0 AND n_stop > 0),
         |ec AS (SELECT e.* FROM e JOIN allowed USING (vec_id)),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |scored AS (SELECT query_id, ec.vec_id AS neighbor_id, ${oracleCos("q.qv", "ec.v")} AS sim
         |           FROM q, ec WHERE ec.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 10""".stripMargin
  )
}
