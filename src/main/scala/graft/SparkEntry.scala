package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

import graft.binlog.{BinlogEvents, DailyCounts, Ingest, TransactionStats}
import graft.ops.{Dedup, TextOps, Vectors, Vocab}

/** Driver contract (SURVEY.md §7): the complete query surface of the engine,
  * each entry paired with equivalent ANSI SQL for the DuckDB oracle.
  *
  * Naming convention: `b*` = binlog-parity surface (reference operators,
  * SURVEY.md §2), `t*` = generic relational operators over the TPC-H-ish
  * tables, `d*` = dedup, `s*` = similarity search, `x*` = text analysis.
  *
  * Oracle determinism rules used throughout (SURVEY.md §5, FIXTURES.md §4):
  * every aggregate is either integer-exact (counts, sums of longs, money in
  * cents via `round(x*100)`) or an identically-ordered double expression;
  * every top-k has a total-order tie-break; timestamps are truncated to
  * seconds before subtraction (CH DateTime parity) and written as
  * TIMESTAMP_NTZ (see Verify) so both sides compare wall-clock UTC values.
  */
object SparkEntry {

  /** Binlog-shaped view of `events` — FIXTURES.md §1 role mapping. */
  private def binlog(s: SparkSession, dir: String): DataFrame =
    BinlogEvents.load(s, dir)

  /** The shared mapping CTE for binlog-surface oracles. */
  private val oracleBinlogCte: String =
    """WITH b AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS execute_time,
      |         CAST(user_id AS VARCHAR) AS gtid,
      |         event_type,
      |         event_id AS pos,
      |         CAST(floor(value) AS BIGINT) AS size_bytes,
      |         (event_id % 10) + 1 AS affected_rows
      |  FROM events)""".stripMargin

  private val oracleTxnAggCte: String =
    oracleBinlogCte + """,
      |agg AS (
      |  SELECT time_bucket(INTERVAL '5 minutes', execute_time) + INTERVAL '5 minutes' AS end_time,
      |         '5min' AS "interval", gtid,
      |         CAST(epoch(date_trunc('second', max(execute_time)))
      |              - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
      |         max(pos) - min(pos) + max_by(size_bytes, pos) AS transaction_size,
      |         CAST(sum(affected_rows) AS BIGINT) AS transaction_affected_rows
      |  FROM b GROUP BY 1, 3)""".stripMargin

  private def oracleTop1PerWindow(metric: String): String =
    oracleTxnAggCte + s"""
      |SELECT end_time, "interval", gtid, transaction_spend_time,
      |       transaction_size, transaction_affected_rows
      |FROM (SELECT *, row_number() OVER (PARTITION BY end_time
      |        ORDER BY $metric DESC, gtid DESC) AS rn FROM agg)
      |WHERE rn = 1""".stripMargin

  // Instant-based (NOT Timestamp.valueOf, which reads the JVM default
  // timezone): the oracle's TIMESTAMP literals are naive UTC
  private val rangeStart = Timestamp.from(java.time.Instant.parse("2024-01-05T00:00:00Z"))
  private val rangeEnd = Timestamp.from(java.time.Instant.parse("2024-01-06T00:00:00Z"))

  /** Fixture event-type names (play the 16-value canal enum, P2). */
  private val fixtureTypes = Seq("view", "click", "purchase", "signup", "error")

  // ---- oracle CTEs for the token-id surface (Vocab parity in SQL) ----
  // token_id mirrors graft TokenHash: a code-point polynomial fold
  // h ← (h·131 + cp) mod (2³¹−1). The `if c <> ''` guard matches Spark's
  // zero-iteration fold on the empty token (DuckDB's string_split('','')
  // yields [''] and unicode('') is −1).
  private val oracleTokCtes: String =
    """tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS token
      |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
      |        UNNEST(range(1, len(toks) + 1)) AS r(i)),
      |tid AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |               list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                 [CAST(unicode(c) AS BIGINT) for c in string_split(token, '') if c <> '']),
      |                 (a, c) -> (a * 131 + c) % 2147483647) AS token_id
      |        FROM tok)""".stripMargin

  /** The x37 CDC chunker as a standalone SELECT producing (doc_id,
    * chunk_idx, start_pos, chunk_len, chunk_md5) — shared by x37 and the
    * d31 storage-dedup rollup.
    */
  private val oracleCdcChunksSql: String = {
    val p = graft.ops.Dedup.minhashPrime
    // the identical lead-chain fold, unrolled textually
    val acc = (0 until 3).foldLeft("CAST(0 AS BIGINT)") { (a, i) =>
      val c = if (i == 0) "cp" else s"lead(cp, $i) OVER w"
      s"(($a * 37 + $c + 1) % $p)"
    }
    s"""WITH ch AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, CAST(unicode(cs[i]) AS BIGINT) AS cp
       |            FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents
       |                  WHERE text IS NOT NULL AND length(text) > 0) t,
       |            UNNEST(range(1, len(cs) + 1)) AS r(i)
       |            WHERE cs[i] <> ''),
       |h AS (SELECT doc_id, pos, $acc AS acc FROM ch
       |      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |b AS (SELECT doc_id, pos,
       |             CASE WHEN acc IS NOT NULL AND acc % 64 = 0 THEN 1 ELSE 0 END AS bnd
       |      FROM h),
       |ci AS (SELECT doc_id, pos,
       |              CAST(coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
       |       FROM b),
       |sp AS (SELECT doc_id, chunk_idx, min(pos) AS start_pos,
       |              CAST(count(*) AS BIGINT) AS chunk_len
       |       FROM ci GROUP BY 1, 2)
       |SELECT s.doc_id, s.chunk_idx, s.start_pos, s.chunk_len,
       |       md5(substring(d.text, CAST(s.start_pos AS INT), CAST(s.chunk_len AS INT))) AS chunk_md5
       |FROM sp s JOIN documents d USING (doc_id)""".stripMargin
  }

  private val oracleMinhashSigs: String = {
    val exprs = graft.ops.Dedup.minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"CAST(min((token_id * $a + $b) % ${graft.ops.Dedup.minhashPrime}) AS BIGINT) AS sig_$i"
    }.mkString(",\n       ")
    s"""WITH $oracleTokCtes,
       |dt AS (SELECT DISTINCT doc_id, token_id FROM tid)
       |SELECT doc_id,
       |       $exprs
       |FROM dt GROUP BY doc_id""".stripMargin
  }

  private val oracleSimhash: String = {
    val g = "((token_id * 2654435761 + 2538058380) % 65536)"
    val sums = (0 until 16)
      .map(b => s"sum(CASE WHEN ($g >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_$b")
      .mkString(",\n       ")
    val hash = (0 until 16).map(b => s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH $oracleTokCtes,
       |sums AS (SELECT doc_id,
       |       $sums
       |FROM tid GROUP BY doc_id)
       |SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM sums""".stripMargin
  }

  /** Language-ID oracle: per-language marker-hit scores; the predicted
    * language is the first (in [[TextOps.langMarkers]] order) to reach the
    * max score — the SQL rendering of the strictly-greater fold.
    */
  private val oracleLangid: String = {
    val scoreExprs = TextOps.langMarkers.map { case (lang, markers) =>
      val list = markers.map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), s -> list_contains([$list], s))) AS BIGINT) AS score_$lang"
    }.mkString(",\n       ")
    val langs = TextOps.langMarkers.map(_._1)
    val maxExpr = s"GREATEST(${langs.map(l => s"score_$l").mkString(", ")})"
    val predCase = langs.map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang AS labeled_lang,
       |       $scoreExprs
       |FROM documents),
       |tm AS (SELECT *, $maxExpr AS m FROM t)
       |SELECT doc_id, labeled_lang, ${langs.map(l => s"score_$l").mkString(", ")},
       |       CASE $predCase END AS pred_lang,
       |       m AS pred_score
       |FROM tm""".stripMargin
  }

  /** Shingle-id Jaccard pairs — same shingle-id CTEs as the MinHash oracle,
    * then the inverted-index self-join on the long ids.
    */
  /** Shared CTE chain ending in `jpairs` (the thresholded Jaccard pairs) —
    * consumed by both the d2 pair query and the d7 grouping query.
    */
  private val oracleJaccardCtes: String = oracleJaccardCtesAt(0.5)

  /** The df-capped candidate/verify tail over ANY `sh(doc_id, shingle_id)`
    * relation — the identical cap [[graft.ops.Dedup.jaccardPairsFromShingles]]
    * applies (candidates must share a feature with 1 < df ≤ cap; scores
    * are exact over the full sets). Shared by the token-5-gram front-end
    * (d2/d7/d9) and the frame-fingerprint front-end (m8).
    */
  private def oracleJaccardTail(threshold: Double): String = {
    val cap = graft.ops.Dedup.defaultMaxDf
    s"""sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |rare AS (SELECT shingle_id FROM (SELECT shingle_id, count(*) AS c FROM sh GROUP BY 1)
       |         WHERE c > 1 AND c <= $cap),
       |idx AS (SELECT sh.* FROM sh JOIN rare USING (shingle_id)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM idx x JOIN idx y ON x.shingle_id = y.shingle_id AND x.doc_id < y.doc_id),
       |inter AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_common
       |          FROM cand
       |          JOIN sh a ON a.doc_id = doc_a
       |          JOIN sh b ON b.doc_id = doc_b AND b.shingle_id = a.shingle_id
       |          GROUP BY 1, 2),
       |jpairs AS (SELECT doc_a, doc_b, n_common,
       |       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= $threshold)""".stripMargin
  }

  private def oracleJaccardCtesAt(threshold: Double): String = {
    val p = graft.ops.Dedup.minhashPrime
    s"""$oracleTokCtes,
       |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
       |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
       |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
       |                                     (a, t) -> (a * 37 + t + 1) % $p)
       |                         for i in range(1, len(ids) - 3)]) AS sid
       |  FROM ids)),
       |${oracleJaccardTail(threshold)}""".stripMargin
  }

  private val oracleJaccardPairs: String =
    s"""WITH $oracleJaccardCtes
       |SELECT doc_a, doc_b, n_common, jaccard FROM jpairs""".stripMargin

  /** d7: connected components of the pair graph by transitive closure —
    * components are algorithm-independent, so the recursive walk attests
    * Spark's iterative label propagation exactly.
    */
  private val oracleDedupGroups: String =
    s"""WITH RECURSIVE $oracleJaccardCtes,
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
       |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |walk AS (SELECT DISTINCT a AS doc_id, a AS reach FROM edges
       |         UNION
       |         SELECT w.doc_id, e.b FROM walk w JOIN edges e ON e.a = w.reach)
       |SELECT doc_id, min(reach) AS group_id FROM walk GROUP BY doc_id""".stripMargin

  /** MMR oracle: greedy diversified selection unrolled as one CTE pair per
    * round (pick, then accumulate) — kept textually parallel to
    * [[graft.ops.Vectors.mmrRerank]]'s loop.
    */
  // lazy: refers to oracleEmbCte, which is declared further down the object
  private lazy val oracleMmr: String = {
    val (k, shortlist, lam) = (5, 20, 0.5)
    val base =
      s"""WITH $oracleEmbCte,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |sc AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("q.qv", "e.v")} AS sim, e.v AS ev
         |       FROM q, e WHERE e.vec_id <> q.query_id),
         |short AS (SELECT query_id, neighbor_id, sim, ev FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sc) WHERE rn <= $shortlist),
         |pairs AS (SELECT x.query_id, x.neighbor_id AS a, y.neighbor_id AS b,
         |                 ${oracleCos("x.ev", "y.ev")} AS sim_ab
         |          FROM short x JOIN short y ON x.query_id = y.query_id
         |           AND x.neighbor_id <> y.neighbor_id),
         |selu1 AS (SELECT query_id, neighbor_id, CAST(1 AS BIGINT) AS mmr_rank FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rn FROM short) WHERE rn = 1)""".stripMargin
    val rounds = (2 to k).map { i =>
      s"""sel$i AS (SELECT query_id, neighbor_id, CAST($i AS BIGINT) AS mmr_rank FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |           row_number() OVER (PARTITION BY s.query_id
         |             ORDER BY ($lam * s.sim - ${1.0 - lam} * p.pen) DESC, s.neighbor_id ASC) AS rn
         |    FROM short s
         |    JOIN (SELECT pr.query_id, pr.a, max(pr.sim_ab) AS pen
         |          FROM pairs pr JOIN selu${i - 1} t
         |            ON t.query_id = pr.query_id AND t.neighbor_id = pr.b
         |          GROUP BY 1, 2) p
         |      ON p.query_id = s.query_id AND p.a = s.neighbor_id
         |    WHERE NOT EXISTS (SELECT 1 FROM selu${i - 1} t2
         |      WHERE t2.query_id = s.query_id AND t2.neighbor_id = s.neighbor_id)
         |  ) WHERE rn = 1),
         |selu$i AS (SELECT * FROM selu${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT query_id, neighbor_id, mmr_rank FROM selu$k"
  }

  /** Hand-authored label propagation for the t52 oracle (the t42/t55
    * discipline): synchronous rounds, but the per-node argmax is expressed
    * as TWO plain aggregations — max neighbor-label count, then min label
    * among the tied — instead of the single encoded
    * `max(cnt·K + (K−1−label)) % K` the Spark side and
    * [[graft.operators.Graph.labelPropagationSql]] share. An encoding
    * mistake (overflow, wrong tie direction) in the shared formulation
    * cannot pass this oracle. `edgesCte` must produce (src, dst).
    */
  private def oracleLpaRounds(edgesCte: String, rounds: Int): String = {
    val base =
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ($edgesCte) WHERE src <> dst),
         |sym AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM sym)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT s.dst AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
         |        FROM sym s JOIN l${i - 1} l ON l.node = s.src GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT node, max(cnt) AS mc FROM c$i GROUP BY node),
         |l$i AS MATERIALIZED (SELECT c.node, min(c.label) AS label
         |        FROM c$i c JOIN m$i m ON m.node = c.node AND c.cnt = m.mc
         |        GROUP BY c.node)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT node, CAST(label AS BIGINT) AS label FROM l$rounds"
  }

  /** Hand-authored k-core peel for the t42 oracle (round-5 verdict #4) —
    * independently expressed, structurally unlike the symmetrized
    * self-join formulation the Spark side iterates: the edge list stays UNDIRECTED
    * (`src < dst`, never duplicated into both directions) and each round's
    * surviving-node set counts a node's degree as its appearances across
    * BOTH endpoint columns via UNION ALL; edges survive when both
    * endpoints survive. `edgesCte` must produce DISTINCT (src, dst) with
    * src < dst.
    */
  private def oracleKcorePeel(edgesCte: String, k: Int, rounds: Int): String = {
    val base = s"e0 AS MATERIALIZED (SELECT src, dst FROM ($edgesCte) WHERE src <> dst)"
    val peels = (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (SELECT node FROM (
         |    SELECT node, count(*) AS deg FROM (
         |      SELECT src AS node FROM e${i - 1}
         |      UNION ALL SELECT dst AS node FROM e${i - 1}) GROUP BY node)
         |  WHERE deg >= $k),
         |e$i AS MATERIALIZED (SELECT t.src, t.dst FROM e${i - 1} t
         |  JOIN n$i a ON t.src = a.node JOIN n$i b ON t.dst = b.node)""".stripMargin
    }
    s"WITH " + (base +: peels).mkString(",\n") +
      s"""\nSELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
         |  SELECT src AS node FROM e$rounds
         |  UNION ALL SELECT dst AS node FROM e$rounds) GROUP BY node""".stripMargin
  }

  /** Shared base CTEs for the beam-search family (s24/s26): normalized
    * embeddings, spaced-centroid assignment, the kNN graph (s14's CTE),
    * the query batch, and the centroid entry set.
    */
  // lazy: refers to oracleEmbCte/oracleSpacedAssigned, declared further down
  /** Shared by x33 (recompute form) and x58 (served from the persisted
    * postings index): the served path is layout-independent, so ONE SQL
    * attests both — the same contract as s24/s33's `oracleBeam`.
    */
  private val oracleBm25: String =
    """WITH q(query_id, term) AS (VALUES
      |  (0, 'hash'), (0, 'join'), (0, 'batch'),
      |  (1, 'vector'), (1, 'scan'), (1, 'filter'),
      |  (2, 'window'), (2, 'agg'), (2, 'order')),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |p AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |l AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len FROM p GROUP BY 1),
      |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len) AS avglen FROM l)
      |SELECT query_id, doc_id, score_ppm, CAST(rank AS BIGINT) AS rank FROM (
      |  SELECT query_id, doc_id, score_ppm,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY score_ppm DESC, doc_id ASC) AS rank
      |  FROM (
      |    SELECT CAST(q.query_id AS BIGINT) AS query_id, p.doc_id,
      |           CAST(round(1e6 * sum(ln((st.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
      |             (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * l.len / st.avglen))))
      |             AS BIGINT) AS score_ppm
      |    FROM p JOIN q ON p.term = q.term JOIN d ON d.term = p.term
      |      JOIN l ON l.doc_id = p.doc_id CROSS JOIN st
      |    GROUP BY 1, 2))
      |WHERE rank <= 10""".stripMargin

  private lazy val oracleBeamBase: String = {
    // the navGraph operating point (round-6 rebuild): every vector joins
    // its top-3 IVF buckets (multi-assignment stitches adjacent cells into
    // one navigable fabric) and keeps its 24 best in-pool neighbors —
    // mirrors Vectors.navGraph(k = 24, nAssign = 3); pairs colliding in
    // several shared buckets dedupe via DISTINCT on the deterministic
    // scored row, exactly as the Spark side does
    val (graphK, nAssign) = (24, 3)
    s"""$oracleEmbCte,
       |$oracleSpacedAssigned,
       |masg AS (SELECT vec_id, centroid_id AS bucket FROM (
       |    SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cs DESC, centroid_id ASC) AS rn FROM sc)
       |    WHERE rn <= $nAssign),
       |mav AS (SELECT m.vec_id, m.bucket, e.v FROM masg m JOIN e ON e.vec_id = m.vec_id),
       |g AS (SELECT src_id, neighbor_id FROM (
       |    SELECT src_id, neighbor_id, row_number() OVER (PARTITION BY src_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rn
       |    FROM (SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS neighbor_id,
       |                 ${oracleCos("a.v", "b.v")} AS sim
       |          FROM mav a JOIN mav b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id))
       |    WHERE rn <= $graphK),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |ent AS (SELECT centroid_id AS node FROM cent)""".stripMargin
  }

  /** The unrolled expand/score/prune rounds for one beam width, CTE names
    * prefixed so several widths coexist in one query (s26). Kept
    * textually parallel to [[graft.ops.Vectors.beamSearch]]'s loop.
    */
  private def oracleBeamRounds(p: String, beam: Int, rounds: Int): String = {
    val init =
      s"""${p}0 AS (SELECT query_id, node, sim FROM (
         |    SELECT x.*, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, node ASC) AS rn FROM (
         |      SELECT q.query_id, ent.node, ${oracleCos("q.qv", "e.v")} AS sim
         |      FROM q CROSS JOIN ent JOIN e ON e.vec_id = ent.node
         |      WHERE ent.node <> q.query_id) x)
         |    WHERE rn <= $beam)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""${p}c$i AS (SELECT DISTINCT query_id, node FROM (
         |    SELECT s.query_id, g.neighbor_id AS node
         |    FROM ${p}${i - 1} s JOIN g ON g.src_id = s.node
         |    UNION ALL SELECT query_id, node FROM ${p}${i - 1})),
         |${p}$i AS (SELECT query_id, node, sim FROM (
         |    SELECT x.*, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, node ASC) AS rn FROM (
         |      SELECT c.query_id, c.node, ${oracleCos("q.qv", "e.v")} AS sim
         |      FROM ${p}c$i c JOIN q ON q.query_id = c.query_id
         |      JOIN e ON e.vec_id = c.node
         |      WHERE c.node <> c.query_id) x)
         |    WHERE rn <= $beam)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** s24 beam-search oracle. */
  private lazy val oracleBeam: String = {
    val (k, beam, rounds) = (5, 32, 4)
    s"""WITH $oracleBeamBase,
       |${oracleBeamRounds("b", beam, rounds)}
       |SELECT query_id, node AS neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT query_id, node, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, node ASC) AS rn FROM b$rounds)
       |WHERE rn <= $k""".stripMargin
  }

  /** s26 beam-width sweep oracle: all widths share the base CTEs (one
    * graph), each contributes its own unrolled rounds and a hit count
    * against the brute-force truth.
    */
  private lazy val oracleBeamSweep: String = {
    val (k, rounds) = (5, 4)
    val beams = Seq(4, 8, 16, 32)
    val nQueries = 8
    val truth =
      s"""tsc AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("q.qv", "e.v")} AS sim
         |        FROM q, e WHERE e.vec_id <> q.query_id),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rn FROM tsc)
         |    WHERE rn <= $k)""".stripMargin
    val perBeam = beams.map(b => oracleBeamRounds(s"w${b}_", b, rounds))
    val finals = beams.map { b =>
      s"""SELECT CAST($b AS BIGINT) AS beam, n_hits,
         |       n_hits * 1000000 // ${k.toLong * nQueries} AS recall_ppm FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hits FROM (
         |    SELECT query_id, node FROM (
         |      SELECT query_id, node, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, node ASC) AS rn FROM w${b}_$rounds)
         |      WHERE rn <= $k) f
         |  JOIN truth t ON t.query_id = f.query_id AND t.neighbor_id = f.node)""".stripMargin
    }
    s"WITH $oracleBeamBase,\n$truth,\n" + perBeam.mkString(",\n") + "\n" +
      finals.mkString("\nUNION ALL\n")
  }

  /** LSH oracle: the plane literals are generated from the same arithmetic
    * as [[Vectors.lshPlanes]], so both engines bucket identically.
    */
  // lazy: refers to oracleEmbCte, which is declared further down the object
  /** Multi-probe LSH oracle (s3's shipped default): each query probes its
    * own sign-bucket plus every Hamming-1 bucket (one plane's sign bit
    * flipped — `xor(bucket, 1<<j)`), mirroring
    * [[graft.ops.Vectors.lshTopKMultiProbe]] bucket-for-bucket.
    */
  private lazy val oracleLsh: String = {
    val planes = graft.ops.Vectors.lshPlanes(8, 64)
    val planeSql = planes.map(p => "[" + p.mkString(", ") + "]")
    val bucketExpr = planeSql.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product(v, $p) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val probeList = ("bucket" +: (0 until 8).map(j => s"xor(bucket, ${1L << j})")).mkString(", ")
    s"""WITH $oracleEmbCte,
       |b AS (SELECT vec_id, v, CAST($bucketExpr AS BIGINT) AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, unnest([$probeList]) AS bucket, v AS qv
       |      FROM b WHERE vec_id < 8),
       |scored AS (SELECT q.query_id, b.vec_id AS neighbor_id, ${oracleCos("q.qv", "b.v")} AS sim
       |           FROM q JOIN b ON b.bucket = q.bucket AND b.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  /** LSH band pairs over the 8-hash MinHash signature of *shingle* ids
    * (5-gram rolling polynomial over token ids): 4 bands × 2 rows — matches
    * [[Dedup.minhashCandidatePairs]] with bands = 4, shingleK = 5. The
    * shingle fold is `list_reduce` with an explicit 0 seed, mirroring
    * Spark's `aggregate(slice(ids, i, 5), 0, (a,t) -> (a*37 + t + 1) % p)`.
    */
  /** Band-collision predicate over the 8-sig table aliases x/y (4 bands ×
    * 2 rows — matches [[Dedup.candidatePairsFromSignatures]] with bands=4).
    */
  private val oracleBandEq: String = (0 until 4)
    .map(bi => s"(x.sig_${2 * bi} = y.sig_${2 * bi} AND x.sig_${2 * bi + 1} = y.sig_${2 * bi + 1})")
    .mkString(" OR ")

  /** CTE chain ending in `sigs` (doc_id, sig_0…sig_7): MinHash over 5-gram
    * shingle ids. The shingle fold is `list_reduce` with an explicit 0 seed,
    * mirroring Spark's `(acc·37 + t + 1) mod p` rolling polynomial.
    */
  private val oracleSigCtes: String = {
    val p = graft.ops.Dedup.minhashPrime
    val coeffExprs = graft.ops.Dedup.minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"CAST(min((shingle_id * $a + $b) % $p) AS BIGINT) AS sig_$i"
    }.mkString(", ")
    s"""$oracleTokCtes,
       |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
       |sids AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
       |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
       |                                     (a, t) -> (a * 37 + t + 1) % $p)
       |                         for i in range(1, len(ids) - 3)]) AS sid
       |  FROM ids)),
       |sigs AS (SELECT doc_id, $coeffExprs FROM sids GROUP BY doc_id)""".stripMargin
  }

  /** One row per (doc, band): the 4-band × 2-row explosion of the `sigs`
    * CTE — the SQL twin of [[Dedup]]'s banded table (d4, d14).
    */
  private val oracleBandRows: String = (0 until 4)
    .map(bi => s"SELECT doc_id, $bi AS band, sig_${2 * bi} AS r0, sig_${2 * bi + 1} AS r1 FROM sigs")
    .mkString("\n  UNION ALL ")

  private val oracleMinhashPairs: String = {
    // band-key membership cap — the identical cap
    // [[Dedup.candidatePairsFromSignatures]] applies (keys claimed by more
    // than `cap` documents are dropped from pair enumeration)
    val cap = graft.ops.Dedup.defaultMaxDf
    s"""WITH $oracleSigCtes,
       |bnd AS (
       |  $oracleBandRows),
       |cool AS (SELECT band, r0, r1 FROM (SELECT band, r0, r1, count(*) AS c
       |                                   FROM bnd GROUP BY 1, 2, 3)
       |         WHERE c <= $cap),
       |bok AS (SELECT bnd.* FROM bnd JOIN cool USING (band, r0, r1))
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |FROM bok x JOIN bok y
       |ON x.band = y.band AND x.r0 = y.r0 AND x.r1 = y.r1 AND x.doc_id < y.doc_id""".stripMargin
  }

  /** [[oracleMinhashPairs]] generalized to any band count dividing the
    * 8-hash signature (bands = 2 → 4-row keys, 8 → 1-row keys), with the
    * identical membership cap — the d36 sweep's per-config candidates.
    */
  private def oracleMinhashPairsFor(bands: Int): String = {
    val rows = 8 / bands
    val cap = graft.ops.Dedup.defaultMaxDf
    val bandRows = (0 until bands).map { bi =>
      val keyCols = (0 until rows).map(j => s"sig_${rows * bi + j} AS k$j").mkString(", ")
      s"SELECT doc_id, $bi AS band, $keyCols FROM sigs"
    }.mkString("\n  UNION ALL ")
    val keyList = (0 until rows).map(j => s"k$j").mkString(", ")
    val keyEq = (0 until rows).map(j => s"x.k$j = y.k$j").mkString(" AND ")
    val groupBy = (1 to rows + 1).mkString(", ")
    s"""WITH $oracleSigCtes,
       |bnd AS (
       |  $bandRows),
       |cool AS (SELECT band, $keyList FROM (SELECT band, $keyList, count(*) AS c
       |                                     FROM bnd GROUP BY $groupBy)
       |         WHERE c <= $cap),
       |bok AS (SELECT bnd.* FROM bnd JOIN cool USING (band, $keyList))
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |FROM bok x JOIN bok y
       |ON x.band = y.band AND $keyEq AND x.doc_id < y.doc_id""".stripMargin
  }

  /** d10: ingest-order near-dup filter — keep a doc iff no smaller doc_id
    * claims any of its band signatures (the batch twin of
    * [[Dedup.streamingNearDup]]'s key-collision rule).
    */
  private val oracleNearDupKeepFirst: String =
    s"""WITH $oracleSigCtes
       |SELECT d.doc_id FROM documents d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM sigs x JOIN sigs y
       |  ON x.doc_id < y.doc_id AND ($oracleBandEq)
       |  WHERE y.doc_id = d.doc_id)""".stripMargin

  /** Multi-probe IVF oracle (s2's shipped default at nprobe = 4, s4's
    * recall-knob demo at nprobe = 8): the query's `nprobe` nearest spaced
    * centroids, searched over the same ⌈√N⌉-bucket assignment as d6.
    */
  private def oracleIvfMultiProbeAt(nprobe: Int, k: Int): String =
    s"""WITH $oracleEmbCte,
       |$oracleSpacedAssigned,
       |qp AS (SELECT query_id, bucket FROM (
       |         SELECT vec_id AS query_id, centroid_id AS bucket,
       |                row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY cs DESC, centroid_id ASC) AS rn
       |         FROM sc WHERE vec_id < 8)
       |       WHERE rn <= $nprobe),
       |q AS (SELECT qp.query_id, qp.bucket, e.v AS qv
       |      FROM qp JOIN e ON e.vec_id = qp.query_id),
       |scored AS (SELECT q.query_id, av.vec_id AS neighbor_id, ${oracleCos("q.qv", "av.v")} AS sim
       |           FROM q JOIN av ON av.bucket = q.bucket AND av.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
       |WHERE rank <= $k""".stripMargin

  /** Multi-table LSH oracle (s5): candidate iff the query and vector share
    * a bucket in ANY of the 4 tables (the OR form — the Spark side uses the
    * equivalent explode + equi-join, which scales; the oracle favors
    * simplicity). Plane literals mirror [[graft.ops.Vectors.lshPlanes]]
    * with per-table offsets.
    */
  /** Per-table sign-bucket column SQL (b0…b{n−1}) — mirrors
    * [[graft.ops.Vectors]]' shared bucketing expression; used by the
    * multi-table ANN (s5) and the keep-first dedup (d12) oracles.
    */
  private def oracleLshTableCols(nTables: Int): String =
    (0 until nTables).map { t =>
      val planes = graft.ops.Vectors.lshPlanes(8, 64, start = t * 8)
      val expr = planes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN list_dot_product(v, [${p.mkString(", ")}]) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"CAST($expr AS BIGINT) AS b$t"
    }.mkString(",\n       ")

  private lazy val oracleLshMulti: String = {
    val nTables = 4
    val bCols = oracleLshTableCols(nTables)
    val anyMatch = (0 until nTables).map(t => s"q.b$t = c.b$t").mkString(" OR ")
    s"""WITH $oracleEmbCte,
       |bt AS (SELECT vec_id, v, $bCols FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, b0, b1, b2, b3 FROM bt WHERE vec_id < 8),
       |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id, ${oracleCos("q.qv", "c.v")} AS sim
       |           FROM q JOIN bt c ON c.vec_id <> q.query_id AND ($anyMatch))
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  /** d12: ingest-order embedding dedup — keep a vector iff no smaller
    * vec_id claims any of its 4 sign-hash buckets (the batch twin of
    * [[graft.ops.Vectors.streamingLshNearDup]]'s key-collision rule).
    */
  private lazy val oracleVectorKeepFirst: String = {
    val anyMatch = (0 until 4).map(t => s"x.b$t = b.b$t").mkString(" OR ")
    s"""WITH $oracleEmbCte,
       |bt AS (SELECT vec_id, ${oracleLshTableCols(4)} FROM e)
       |SELECT b.vec_id FROM bt b
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM bt x WHERE x.vec_id < b.vec_id AND ($anyMatch))""".stripMargin
  }

  /** Two-level IVF oracle (s6): coarse = ⌈√C⌉ spaced subset of the fine
    * seeds; fine centroids route to their nearest coarse parent; vectors
    * route coarse-first then to the nearest fine child of that parent —
    * mirrors [[graft.ops.Vectors.ivfAssignTwoLevel]] tie-for-tie. The
    * SEARCH side is multi-probe (round-5 default): each query probes its 4
    * nearest fine centroids scored DIRECTLY (the query side is |Q| rows —
    * hierarchical routing there saves nothing and costs recall), mirroring
    * [[graft.ops.Vectors.ivfTopKTwoLevelMultiProbe]].
    */
  private lazy val oracleIvfTwoLevel: String =
    s"""WITH $oracleEmbCte,
       |params AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS n_cent,
       |                  GREATEST(1, count(*) // CAST(ceil(sqrt(count(*))) AS BIGINT)) AS step
       |           FROM e),
       |p2 AS (SELECT n_cent, step,
       |              CAST(ceil(sqrt(n_cent)) AS BIGINT) AS c2,
       |              GREATEST(1, n_cent // CAST(ceil(sqrt(n_cent)) AS BIGINT)) AS cstep
       |       FROM params),
       |fine AS (SELECT vec_id AS fine_id, v AS fv FROM e, params
       |         WHERE vec_id % step = 0 AND vec_id < n_cent * step),
       |coarse AS (SELECT vec_id AS coarse_id, v AS cv FROM e, p2
       |           WHERE vec_id % (cstep * step) = 0 AND vec_id < c2 * cstep * step),
       |fp AS (SELECT fine_id, fv, coarse_id AS parent FROM (
       |         SELECT f.fine_id, f.fv, c.coarse_id,
       |                row_number() OVER (PARTITION BY f.fine_id
       |                  ORDER BY ${oracleCos("f.fv", "c.cv")} DESC, c.coarse_id ASC) AS rn
       |         FROM fine f, coarse c) WHERE rn = 1),
       |vc AS (SELECT vec_id, v, coarse_id AS parent FROM (
       |         SELECT e.vec_id, e.v, c.coarse_id,
       |                row_number() OVER (PARTITION BY e.vec_id
       |                  ORDER BY ${oracleCos("e.v", "c.cv")} DESC, c.coarse_id ASC) AS rn
       |         FROM e, coarse c) WHERE rn = 1),
       |av AS (SELECT vec_id, bucket, v FROM (
       |         SELECT vc.vec_id, vc.v, fp.fine_id AS bucket,
       |                row_number() OVER (PARTITION BY vc.vec_id
       |                  ORDER BY ${oracleCos("vc.v", "fp.fv")} DESC, fp.fine_id ASC) AS rn
       |         FROM vc JOIN fp ON fp.parent = vc.parent) WHERE rn = 1),
       |qp AS (SELECT query_id, bucket FROM (
       |         SELECT e.vec_id AS query_id, f.fine_id AS bucket,
       |                row_number() OVER (PARTITION BY e.vec_id
       |                  ORDER BY ${oracleCos("e.v", "f.fv")} DESC, f.fine_id ASC) AS rn
       |         FROM e, fine f WHERE e.vec_id < 8)
       |       WHERE rn <= 4),
       |q AS (SELECT qp.query_id, qp.bucket, e.v AS qv
       |      FROM qp JOIN e ON e.vec_id = qp.query_id),
       |scored AS (SELECT q.query_id, av.vec_id AS neighbor_id, ${oracleCos("q.qv", "av.v")} AS sim
       |           FROM q JOIN av ON av.bucket = q.bucket AND av.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** Fused multi-probe recall-sweep CTE chain ending in
    * `sweep(nprobe, n_hits, n_truth, recall_ppm)` — one multiprobe block
    * per config over the SHARED centroid ranking (qp), each contributing
    * one row. The s23 sweep table and the s28 tuning decision both read
    * from it (mirrors [[graft.ops.Vectors.probeSweep]]).
    */
  private def oracleProbeSweepCtes(k: Int, qn: Int, cfg: Seq[Int]): String = {
    val blocks = cfg.map { np =>
      s"""iq_$np AS (SELECT qp.query_id, qp.bucket, e.v AS qv
         |          FROM qp JOIN e ON e.vec_id = qp.query_id WHERE qp.rn <= $np),
         |isc_$np AS (SELECT q.query_id, av.vec_id AS neighbor_id, ${oracleCos("q.qv", "av.v")} AS sim
         |          FROM iq_$np q JOIN av ON av.bucket = q.bucket AND av.vec_id <> q.query_id),
         |itop_$np AS (SELECT query_id, neighbor_id FROM (
         |            SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |              ORDER BY sim DESC, neighbor_id ASC) AS rn FROM isc_$np)
         |          WHERE rn <= $k)""".stripMargin
    }.mkString(",\n")
    val rows = cfg.map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |       (SELECT CAST(count(*) AS BIGINT) FROM btop b
         |        JOIN itop_$np i ON i.query_id = b.query_id
         |         AND i.neighbor_id = b.neighbor_id) AS n_hits""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $oracleEmbCte,
       |$oracleSpacedAssigned,
       |bq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $qn),
       |bscored AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("bq.qv", "e.v")} AS sim
       |            FROM bq, e WHERE e.vec_id <> bq.query_id),
       |btop AS (SELECT query_id, neighbor_id FROM (
       |           SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM bscored)
       |         WHERE rn <= $k),
       |qp AS (SELECT vec_id AS query_id, centroid_id AS bucket, rn FROM (
       |         SELECT vec_id, centroid_id,
       |                row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY cs DESC, centroid_id ASC) AS rn
       |         FROM sc WHERE vec_id < $qn)),
       |$blocks,
       |sweep AS (SELECT nprobe, n_hits, CAST(${qn * k} AS BIGINT) AS n_truth,
       |                 (1000000 * n_hits) // ${qn * k} AS recall_ppm
       |          FROM ($rows))""".stripMargin
  }

  /** The s32 SQ8 compressed-grid margin-mining oracle — shared verbatim
    * by s38_margin_gated, whose gate resolves to the scan branch on the
    * measured-isotropic fixture: s8's stats/codes/dec CTEs (quantization
    * grid spans test ∪ train = e), per-side top-8 shortlists ranked on
    * the COMPRESSED scores, exact re-rank of the shortlisted pairs only,
    * then s31's margin tail (rank-ordered folds, ppm rounding before the
    * threshold) over those candidates.
    */
  private lazy val oracleMarginScan: String =
    s"""WITH $oracleEmbCte,
         |ex AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x FROM e),
         |stats AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i),
         |codes AS (SELECT vec_id, i, mn, mx,
         |            CASE WHEN mx > mn THEN least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
         |                 ELSE 0.0 END AS c
         |          FROM ex JOIN stats USING (i)),
         |dec AS (SELECT vec_id, list(mn + c * ((mx - mn) / 255.0) ORDER BY i) AS dv
         |        FROM codes GROUP BY vec_id),
         |t AS (SELECT vec_id AS test_id, dv AS tq FROM dec WHERE vec_id % 10 < 2),
         |r AS (SELECT vec_id AS train_id, dv AS rq FROM dec WHERE vec_id % 10 >= 2),
         |qs AS (SELECT test_id, train_id, list_dot_product(tq, rq) AS qsim FROM t, r),
         |fsl AS (SELECT test_id, train_id FROM (
         |    SELECT test_id, train_id, row_number() OVER (PARTITION BY test_id
         |      ORDER BY qsim DESC, train_id ASC) AS rn FROM qs) WHERE rn <= 8),
         |bsl AS (SELECT test_id, train_id FROM (
         |    SELECT test_id, train_id, row_number() OVER (PARTITION BY train_id
         |      ORDER BY qsim DESC, test_id ASC) AS rn FROM qs) WHERE rn <= 8),
         |cand AS (SELECT DISTINCT test_id, train_id FROM (
         |    SELECT * FROM fsl UNION ALL SELECT * FROM bsl)),
         |sc AS (SELECT c.test_id, c.train_id, ${oracleCos("te.v", "tr.v")} AS sim
         |       FROM cand c JOIN e te ON te.vec_id = c.test_id
         |       JOIN e tr ON tr.vec_id = c.train_id),
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
         |WHERE CAST(round(2000000 * sim / (f_avg + b_avg)) AS BIGINT) >= 1200000""".stripMargin

  /** Brute-force exact top-k for queries 0..qn−1 with the constant
    * `serve_ok` column — the oracle side of the s36/s37 trained-artifact
    * checked queries (the Spark side folds the recall-floor assert; the
    * deterministic columns are exactly this truth set).
    */
  private def oracleBruteChecked(k: Int, qn: Int): String =
    s"""WITH $oracleEmbCte,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $qn),
       |sc AS (SELECT query_id, e.vec_id AS neighbor_id, ${oracleCos("q.qv", "e.v")} AS sim
       |       FROM q, e WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, TRUE AS serve_ok
       |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM sc)
       |WHERE rank <= $k""".stripMargin

  /** Doubles-widened embedding CTE + IVF assignment (centroids = vec_id<32,
    * nearest by cosine, ties to the smaller centroid id).
    */
  private val oracleEmbCte: String =
    """e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |e AS (SELECT vec_id, [x / sqrt(list_dot_product(v0, v0)) for x in v0] AS v FROM e0)""".stripMargin

  // vectors are pre-normalized in the CTE above, so cosine ≡ dot — mirrors
  // Vectors.withUnit on the Spark side (normalize once, dot everywhere)
  private def oracleCos(x: String, y: String): String =
    s"list_dot_product($x, $y)"

  /** Spaced ⌈√N⌉-centroid assignment — mirrors
    * [[graft.ops.Vectors.spacedCentroidIds]]: C = ceil(sqrt(N)), step = N
    * div C, seeds = multiples of step below C·step.
    */
  private val oracleSpacedAssigned: String =
    s"""params AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS n_cent,
       |                  GREATEST(1, count(*) // CAST(ceil(sqrt(count(*))) AS BIGINT)) AS step
       |           FROM e),
       |cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e, params
       |         WHERE vec_id % step = 0 AND vec_id < n_cent * step),
       |sc AS (SELECT e.vec_id, cent.centroid_id, ${oracleCos("e.v", "cent.cv")} AS cs FROM e, cent),
       |assigned AS (SELECT vec_id, centroid_id AS bucket
       |             FROM (SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id
       |                     ORDER BY cs DESC, centroid_id ASC) AS rn FROM sc)
       |             WHERE rn = 1),
       |av AS (SELECT a.vec_id, a.bucket, e.v FROM assigned a JOIN e ON e.vec_id = a.vec_id)""".stripMargin

  /** PQ code CTEs over the normalized `e` frame (m=8 subspaces of 8 dims,
    * ks=16 spaced centroids — mirrors [[graft.ops.Vectors.spacedPqCodebook]]
    * + [[org.apache.spark.sql.graft.PqEncode]]): squared distances fold
    * left-to-right from 0.0 and argmin keeps the earliest index on ties,
    * the exact accumulation/tie order of the codegen expressions. Yields
    * `pcent` (cidx, cv) and `pcodes` (vec_id, s, code).
    */
  /** [[oraclePqCtes]] generalized to any (m subspaces, ks centroids) over
    * d = 64 dims — sub-dim = 64/m; the round-5 s9/s11 defaults run at
    * m = 16, ks = 64 (4-dim subspaces, 16 bytes/vector) while s12/s20 keep
    * the m = 8, ks = 16 small-code point.
    */
  private def oraclePqCtesFor(m: Int, ks: Int): String = {
    val sub = 64 / m
    s"""pqp AS (SELECT GREATEST(1, count(*) // $ks) AS stepk FROM e),
       |pcent AS (SELECT CAST(vec_id // stepk AS BIGINT) AS cidx, v AS cv FROM e, pqp
       |         WHERE vec_id % stepk = 0 AND vec_id < $ks * stepk),
       |sdist AS (SELECT e.vec_id, t.s, c.cidx,
       |            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |              [(e.v[t.s*$sub+j] - c.cv[t.s*$sub+j]) * (e.v[t.s*$sub+j] - c.cv[t.s*$sub+j])
       |               for j in range(1, ${sub + 1})]),
       |              (a, d) -> a + d) AS dist
       |          FROM e, range(0, $m) t(s), pcent c),
       |pcodes AS (SELECT vec_id, s, cidx AS code FROM (
       |            SELECT vec_id, s, cidx,
       |                   row_number() OVER (PARTITION BY vec_id, s
       |                     ORDER BY dist ASC, cidx ASC) AS rn
       |            FROM sdist) WHERE rn = 1)""".stripMargin
  }

  private val oraclePqCtes: String = oraclePqCtesFor(8, 16)

  /** ADC scoring + ranking tail shared by the PQ oracles: per-subspace dots
    * fold sequentially, the m partials add in subspace order (list ORDER BY
    * s), ranks tie to the smaller neighbor id.
    */
  private def oraclePqScoredFor(m: Int)(candidates: String): String = {
    val sub = 64 / m
    s"""parts AS (SELECT q.query_id, nb.vec_id AS neighbor_id, cd.s,
       |            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |              [q.qv[cd.s*$sub+j] * c.cv[cd.s*$sub+j] for j in range(1, ${sub + 1})]),
       |              (a, d) -> a + d) AS part
       |          FROM $candidates
       |          JOIN pcodes cd ON cd.vec_id = nb.vec_id
       |          JOIN pcent c ON c.cidx = cd.code),
       |scored AS (SELECT query_id, neighbor_id,
       |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(part ORDER BY s)),
       |               (a, b) -> a + b) AS sim
       |           FROM parts GROUP BY query_id, neighbor_id)""".stripMargin
  }

  private def oraclePqScored(candidates: String): String = oraclePqScoredFor(8)(candidates)

  private def oraclePqRankFor(m: Int)(candidates: String, k: Int): String =
    s"""${oraclePqScoredFor(m)(candidates)}
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM scored)
       |WHERE rank <= $k""".stripMargin

  private def oraclePqRank(candidates: String, k: Int): String =
    oraclePqRankFor(8)(candidates, k)

  /** Flagship (driver smoke-checks rows > 0 on sf0.001): all-windows top-1
    * transaction by size — the reference's headline query
    * (`compute_transaction_info.py:53-66`) in its batch-backfill form.
    */
  def entry(spark: SparkSession): DataFrame =
    TransactionStats.top1PerWindow(binlog(spark, "/root/testdata/sf0.001"), "transaction_size")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binlog-parity surface (SURVEY.md §2) ----
    "b1_txn_stats" -> ((s, dir) =>
      // loadRange pushes the range onto the raw ns column (row-group skip);
      // forRange re-applies it on execute_time (same rows, belt+braces)
      TransactionStats.forRange(
        BinlogEvents.loadRange(s, dir, rangeStart, rangeEnd), rangeStart, rangeEnd, "1day")),
    "b2_top1_size" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_size")),
    "b3_top1_rows" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_affected_rows")),
    "b4_top1_time" -> ((s, dir) =>
      TransactionStats.top1PerWindow(binlog(s, dir), "transaction_spend_time")),
    "b15_binary_decode" -> ((s, dir) => {
      // real D1: fixture columns → protobuf-lite wire bytes → codegen'd
      // decode; the oracle projects the same fields directly, so a decode
      // bug (or a dropped row) breaks the hash match
      val env = binlog(s, dir).select(
        org.apache.spark.sql.graft.EncodeEnvelope.column(
          BinlogEvents.pos, unix_millis(col("execute_time")), col("gtid"),
          col("event_type"), BinlogEvents.sizeBytes,
          col("single_statement_affected_rows")).as("envelope"))
      Ingest.decodeBinaryEnvelope(env, "envelope")
    }),
    "b5_mv_daily_counts" -> ((s, dir) =>
      DailyCounts.dailyEventCounts(
        Tables.events(s, dir).withColumnRenamed("ts", "execute_time"))),
    "b6_mv_daily_table_counts" -> ((s, dir) =>
      DailyCounts.dailyTableEventCounts(
        Tables.events(s, dir)
          .withColumnRenamed("ts", "execute_time")
          .withColumn("schema", concat(lit("db"), pmod(col("user_id"), lit(4))))
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        "schema", "table")),
    "t49_share_rollup" -> ((s, dir) =>
      // percent-of-parent at two levels: table-in-schema and schema-in-day
      // ppm shares on one metadata-sized count frame
      DailyCounts.shareRollup(
        Tables.events(s, dir)
          .withColumnRenamed("ts", "execute_time")
          .withColumn("schema", concat(lit("db"), pmod(col("user_id"), lit(4))))
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        "schema", "table")),
    "b27_dml_mix" -> ((s, dir) =>
      // the database portrait in ratio form: per (day, table) DML-type
      // shares in ppm — a doubled UPDATE share stands out at any volume
      DailyCounts.dmlMix(
        Tables.events(s, dir)
          .withColumnRenamed("ts", "execute_time")
          .withColumn("schema", concat(lit("db"), pmod(col("user_id"), lit(4))))
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        "schema", "table")),
    "b7_ingest_flatten" -> ((s, dir) =>
      Ingest.projectRow(
        Ingest.dropTransactionBegin(
          Ingest.decodeAndFlatten(Tables.events(s, dir), Ingest.jsonPropsDecoder, "props"),
          beginValue = "error"))
        .drop("ctime")),
    "b8_mv_resum" -> ((s, dir) => {
      // partial aggregates (as a micro-batched MV target would hold), then
      // the A9 read-time re-sum — result ≡ the direct daily counts
      val partials = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"),
          pmod(col("user_id"), lit(4)).as("bucket"))
        .agg(count(lit(1)).as("event_count"))
      DailyCounts.resum(partials, Seq("day", "event_type"))
    }),
    "b30_histogram_mv" -> ((s, dir) => {
      // mergeable-QUANTILE MV (b8's re-sum discipline applied to
      // percentiles): the MV holds daily value-histograms — the one
      // quantile "sketch" that merges EXACTLY (counts add) — and the read
      // side re-sums them across days into exact p50/p95 per type
      // (Percentiles.discreteFromHistogram); result ≡ the direct
      // percentile over raw rows, which is what the oracle computes
      val partials = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"),
          round(col("value") * 100).cast("long").as("v_c"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Percentiles.discreteFromHistogram(
        partials, "event_type", "v_c", "cnt", Seq(0.5, 0.95), "pct_cents")
    }),

    // ---- generic relational surface (TPC-H-ish) ----
    "t1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_c"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
            .as("sum_disc_c"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")) * 100).cast("long")).as("sum_charge_c"),
          count(lit(1)).as("n_rows"))),
    "t2_join_topn" -> ((s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-06-01"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > lit("1998-06-01"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
          .as("revenue_c"))
        .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue_c"))
        .orderBy(col("revenue_c").desc, col("l_orderkey").asc)
        .limit(10)),
    "t3_broadcast_agg" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(F.broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(F.broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_c"))),
    "t4_window_topn" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("rank").cast("long").as("rank"))
    }),
    "t5_anti_join" -> ((s, dir) =>
      // customers with no large order — anti join against a filtered build side
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))),
    "t6_distinct_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))),

    "t7_semi_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))),
    "t8_set_ops" -> ((s, dir) => {
      val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val bigSpenders = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
        .select(col("o_custkey").as("custkey"))
      val building = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      rich.intersect(bigSpenders).except(building)
    }),
    "t9_rollup" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(F.broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(F.broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_c"))),
    "t27_unpivot" -> ((s, dir) =>
      // wide→long reshaping (melt): the per-language report card unpivoted
      // to (lang, metric, value) rows — the Expand-based generator shape,
      // metadata-sized input after the first aggregation
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          max(col("n_chars")).as("max_chars"))
        .unpivot(Array(col("lang")),
          Array(col("n_docs"), col("total_chars"), col("max_chars")),
          "metric", "value")),
    "t28_sql_simhash" -> ((s, dir) => {
      // the round-4 codegen expression on the registered-extension SQL
      // surface (t21 pattern): plain spark.sql produces bit-identical
      // fingerprints to the DataFrame path — same oracle as d5
      Tables.documents(s, dir).createOrReplaceTempView("documents_sql2")
      s.sql("""
        SELECT doc_id,
               simhash_bits(token_hash_array(split(text, ' ')), 16) AS simhash
        FROM documents_sql2""")
    }),
    "t26_outer_join" -> ((s, dir) =>
      // LEFT OUTER with the filter INSIDE the join condition (the planner
      // case where pushing it to WHERE would wrongly drop unmatched left
      // rows): regions keep a row even with zero A-named nations, and the
      // null-aware count(col) makes the zero visible
      Tables.region(s, dir)
        .join(Tables.nation(s, dir).filter(col("n_name").startsWith("A")),
          col("r_regionkey") === col("n_regionkey"), "left")
        .groupBy(col("r_name"))
        .agg(count(col("n_name")).as("n_a_nations"))),
    "t24_grouping_sets" -> ((s, dir) =>
      // two independent one-column breakdowns in ONE pass — the
      // grouping-sets shape neither rollup (t9) nor cube (t15) expresses;
      // Expand multiplies rows map-side, then one partial-agg'd shuffle
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))),
    "t10_in_subquery" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir).filter(col("c_acctbal") > 9000),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))),

    "t11_cast_order_topk" -> ((s, dir) =>
      // O4: sort keyed on CAST(binlog_pos AS BIGINT) — the reference's
      // ORDER BY toUInt32(binlog_pos) (mon_mysql_dml.py:279). The top-100
      // SET differs under lexicographic order ('1','10','100',…), so the
      // oracle attests the cast ordering; orderBy+limit plans as
      // TakeOrderedAndProject (distributed top-k, no full sort)
      binlog(s, dir)
        .select(col("binlog_pos"), BinlogEvents.pos.as("pos_num"), col("gtid"))
        .orderBy(BinlogEvents.pos.asc, col("gtid").asc)
        .limit(100)),

    "t12_asof_join" -> ((s, dir) => {
      // as-of: each event picks the user's most recent order on or before
      // the event time (ties by largest orderkey)
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.operators.AsOfJoin
        .asOf(ev, ord, Seq("user_id"), "ts", "o_orderdate", "o_orderkey", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("asof_o_orderkey").as("last_orderkey"))
    }),

    "t39_asof_tolerance" -> ((s, dir) => {
      // tolerance-bounded as-of (click→view attribution): each click takes
      // the same user's most recent view ONLY if it happened within 6 h —
      // staler matches go NULL instead of attributing to the distant past
      // (feature-freshness semantics; one projection over the t12 scan)
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
      graft.operators.AsOfJoin
        .asOfWithin(clicks, views, Seq("user_id"), "ts", "vts", "view_id",
          Seq("view_id"), toleranceSec = 6L * 3600L)
        .select(col("event_id"), col("user_id"),
          col("asof_view_id").as("attributed_view"))
    }),
    "t45_asof_nearest" -> ((s, dir) => {
      // merge_asof(direction='nearest'): each event takes the user's order
      // closest in time EITHER direction (equal distances → backward);
      // same union-and-scan as t12, two running frames, zero extra joins
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      graft.operators.AsOfJoin
        .asOfNearest(ev, ord, Seq("user_id"), "ts", "o_orderdate",
          "o_orderkey", Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderkey").as("nearest_orderkey"))
    }),

    "t18_band_join" -> ((s, dir) => {
      // keyless range join via time-axis binning (one day's clicks ×
      // views within ±1 h) — a cross join with a range filter would be
      // O(n²) and keyless; binning restores an equi-join key
      val d = Tables.events(s, dir)
        .filter(to_date(col("ts")) === lit(java.sql.Date.valueOf("2024-01-05")))
      val a = d.filter(col("event_type") === "click")
        .select(col("event_id").as("a_id"), col("ts").as("a_ts"))
      val b = d.filter(col("event_type") === "view")
        .select(col("event_id").as("b_id"), col("ts").as("b_ts"))
      graft.operators.RangeJoin.band(a, b, "a_ts", "b_ts", tolSec = 3600L)
        .select(col("a_id"), col("b_id"))
    }),

    "t13_having" -> ((s, dir) =>
      // HAVING: only nations with enough customers
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long")).as("acctbal_c"))
        .filter(col("n_customers") >= 20)),
    "t14_case_pivot" -> ((s, dir) =>
      // manual pivot: per-priority order-status counts in one pass
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast("long").as("n_p"))),
    "t15_cube" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(F.broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))),
    "t38_grouping_sets" -> ((s, dir) =>
      // arbitrary grouping-set lattice — the general form t9's ROLLUP and
      // t15's CUBE are shorthands of: per-(status, priority), per-status,
      // and grand-total slices in ONE pass (Catalyst Expand: each input
      // row fans out once per set, then a single hash aggregate — no
      // re-scan per slice, partial aggs map-side as usual)
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")) * 100).cast("long").as("total_cents"))),
    "t16_above_avg" -> ((s, dir) => {
      // customers above their nation's mean balance — integer-exact form:
      // cents*count > sum(cents) avoids cross-engine double averaging
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c_nationkey"))
      Tables.customer(s, dir)
        .withColumn("acctbal_c", round(col("c_acctbal") * 100).cast("long"))
        .withColumn("_sum", sum(col("acctbal_c")).over(w))
        .withColumn("_cnt", count(lit(1)).over(w))
        .filter(col("acctbal_c") * col("_cnt") > col("_sum"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_above"))
    }),
    "t17_salted_agg" -> ((s, dir) =>
      // skew-safe two-phase aggregation ≡ direct groupBy().count()
      graft.operators.Skew.saltedCount(
        Tables.events(s, dir), Seq("event_type"), salts = 32, countCol = "n_events")),
    "t20_salted_join" -> ((s, dir) => {
      // manual skew join: events (skewed fact) × customer-keyed dim via
      // (key, salt) — result ≡ the plain inner join (the oracle); a hot
      // user's rows spread over `salts` reducers instead of stalling one
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))
      val users = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(ev, users, "user_id", salts = 8)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value_cents")).as("cents"))
    }),
    "t21_sql_surface" -> ((s, dir) => {
      // the registered-extension SQL surface: the same engine functions
      // (token_hash / token_hash_array / shingle_hash) driven from plain
      // spark.sql over a temp view — what a SQL-first user of the library
      // writes; results hash-match the DataFrame path's oracle arithmetic
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql(s"""
        SELECT doc_id,
               token_hash(text) AS text_id,
               CAST(size(shingle_hash(token_hash_array(split(text, ' ')), 5)) AS BIGINT)
                 AS n_shingles
        FROM documents_v""")
    }),
    "t22_event_gaps" -> ((s, dir) =>
      // LAG over a per-user total order (ts, event_id), aggregated per
      // event_type in integer microseconds — the cadence/latency dashboard
      // query; one shuffle for the window, map-side-combined agg after
      graft.operators.Windows.interEventGaps(Tables.events(s, dir))),
    "t19_percentiles" -> ((s, dir) => {
      // exact discrete percentiles (p50/p90/p99 of value-cents per type) in
      // the histogram-compressed form: pre-aggregate counts per (group,
      // value) — map-side combinable, collapses duplicate values — then one
      // cumulative window over the compressed histogram, not the raw rows.
      // At 100 TB the histogram is bounded by the value domain (distinct
      // cents), so the window input is orders of magnitude below row count;
      // the percentile is the smallest value whose running count reaches
      // ⌈p·n⌉ (no float interpolation — cross-engine exact).
      graft.operators.Percentiles.discrete(Tables.events(s, dir), "event_type",
        round(col("value") * 100).cast("long"), Seq(0.5, 0.9, 0.99), "pct_cents")
    }),
    "t48_ltv_deciles" -> ((s, dir) =>
      // scale-correct ntile: exact decile thresholds from the compressed
      // spend histogram, 9 unrolled codegen comparisons assign buckets —
      // no global sort anywhere
      graft.operators.Percentiles.decileReport(
        Tables.orders(s, dir).groupBy(col("o_custkey"))
          // cast per-order cents to long BEFORE summing: a double sum's
          // accumulation order is engine-dependent at the ulp
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend_c")),
        col("spend_c"))),
    "t44_mad" -> ((s, dir) => {
      // robust dispersion: exact lower-median of |x − median| per type,
      // both medians over value-domain-compressed histograms (t19 ×2)
      graft.operators.Percentiles.mad(Tables.events(s, dir), "event_type",
        round(col("value") * 100).cast("long"), "mad_cents")
    }),
    "x27_length_percentiles" -> ((s, dir) =>
      // per-language document-length distribution (p50/p90/p99 chars) —
      // the curation question x16's min/max can't answer; same
      // histogram-compressed exact-percentile machinery as t19
      graft.operators.Percentiles.discrete(Tables.documents(s, dir), "lang",
        col("n_chars").cast("long"), Seq(0.5, 0.9, 0.99), "pct_chars")),

    // ---- more binlog surface ----
    "b9_retention_window" -> ((s, dir) => {
      // scalar-subquery retention probe: keep only the trailing 7 days
      // relative to the corpus max — the read-side shape of the K4 TTL job
      val ev = Tables.events(s, dir)
      val maxTs = ev.agg(max(col("ts")).as("max_ts"))
      ev.crossJoin(F.broadcast(maxTs))
        .filter(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
    }),
    "b10_enum_roundtrip" -> ((s, dir) => {
      val idByName = fixtureTypes.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
      val nameById = idByName.map(_.swap)
      Tables.events(s, dir).select(
        col("event_id"),
        col("event_type"),
        element_at(typedlit(idByName), col("event_type")).as("type_id"),
        element_at(typedlit(nameById),
          element_at(typedlit(idByName), col("event_type"))).as("type_name"),
        // P10: formatting parity (strftime in the oracle)
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_time_str"))
    }),

    "b11_sliding_counts" -> ((s, dir) =>
      graft.operators.Windows.slidingCounts(Tables.events(s, dir))),
    "t50_sliding_distinct" -> ((s, dir) =>
      // unique users per 15-min window refreshed every 5: the distinct
      // twin of b11 — Expand + two-phase agg, partial dedup before shuffle
      graft.operators.Windows.slidingDistinct(Tables.events(s, dir))),
    "b12_session_windows" -> ((s, dir) =>
      graft.operators.Windows.sessions(Tables.events(s, dir), keyCol = "user_id")),
    "b17_table_trends" -> ((s, dir) =>
      // the reference's per-table daily MV (b6), taken to its reporting
      // conclusion: cumulative / moving-average / delta per table — the
      // "which table's write rate changed?" DBA dashboard; windows run over
      // the (day × table) frame only
      graft.operators.Windows.dailyTrends(
        Tables.events(s, dir)
          .withColumn("table", concat(lit("t"), pmod(col("event_id"), lit(8)))),
        keyCol = "table")),
    "t29_range_frames" -> ((s, dir) => {
      // the RANGE-framed twin of t23's ROWS windows: a calendar-correct
      // trailing-7-day sum (value-range frame over day numbers — skips
      // in the date series shrink the window, where a ROWS frame would
      // silently reach further back); days_observed exposes the width
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("day_num",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      val cal = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day_num"))
        .rangeBetween(-6, 0)
      daily.select(col("event_type"), col("day"), col("n_events"),
        sum(col("n_events")).over(cal).as("sum7_cal"),
        count(lit(1)).over(cal).cast("long").as("days_observed"))
    }),
    "t30_bloom_semi" -> ((s, dir) => {
      // runtime Bloom-filter pruning: lineitem ⋉ (brand-filtered part).
      // The bitmap is one bounded-size aggregation over the small side,
      // broadcast as a literal and probed with codegen'd built-ins INSIDE
      // the lineitem scan — at 100 TB only the ~selectivity fraction of
      // lineitem reaches the exact semi join's shuffle. Result is exactly
      // the plain IN-subquery (the oracle).
      val smallParts = Tables.part(s, dir).filter(col("p_brand") === "Brand#13")
      graft.operators.BloomFilter
        .semiJoin(Tables.lineitem(s, dir), smallParts, "l_partkey", "p_partkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"))
    }),
    "t31_zorder_key" -> ((s, dir) => {
      // Morton-interleaved clustering key (K7/O3 taken to two dimensions):
      // sorting by z bounds BOTH p_size and the hash dimension per file,
      // so min/max skipping prunes on either predicate — a single-column
      // sort only ever prunes its leading column. The key arithmetic is
      // pure built-in bit ops (one WSCG span) and oracle-attested
      val p = Tables.part(s, dir).select(col("p_partkey"),
        col("p_size").cast("long").as("x"), (col("p_partkey") % 4096).as("y"))
      p.select(col("p_partkey"), col("x"), col("y"),
          graft.operators.ZOrder.zValue(col("x"), col("y")).as("z"))
        .orderBy(col("z"), col("p_partkey"))
        .limit(100)
    }),
    "t32_pagerank" -> ((s, dir) => {
      // PageRank over the part↔supplier co-occurrence graph (bipartite,
      // node ids disambiguated by parity). Fixed 5 rounds of join+agg;
      // adjacency persists once, only the node-sized rank frame iterates —
      // the weighted companion of the d7/d9 component machinery
      val edges = Tables.lineitem(s, dir).select(
        (col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      // ranks are order-dependent float sums (not bit-stable across
      // engines); parts-per-billion rounding makes the compare integer-
      // exact — FP noise is ~1e-15 relative, 5 orders below the quantum
      graft.operators.Graph.pageRank(edges, iterations = 5)
        .select(col("node"), round(col("rank") * lit(1e9)).cast("long").as("rank_ppb"))
    }),
    "t40_triangles" -> ((s, dir) => {
      // per-node triangle counts over the part co-purchase graph (parts
      // sharing an order). Degree-ordered orientation bounds wedge work by
      // the oriented out-degree (O(arboricity) per node): a part in every
      // order generates zero wedges because all its edges point into it —
      // the skew armor the hot-shingle df cap gives the dedup surface,
      // applied to graph enumeration. One ship-year window: co-purchase
      // projections densify quadratically with basket overlap, so the
      // analysis window — not the operator — is what bounds graph density
      // (full-history edges at sf0.1 already cost 40M wedges; 100 TB of
      // them would be the graph the orientation alone can't save)
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      graft.operators.Graph.triangleCounts(edges)
    }),
    "t42_kcore" -> ((s, dir) => {
      // the 3-core of the same ship-year co-purchase graph: where cohesive
      // part clusters live after peeling the long tail. Fixed 8 peel
      // rounds — deterministic and attestable whether or not converged
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      graft.operators.Graph.kCore(edges, k = 3, rounds = 8)
    }),
    "t52_label_prop" -> ((s, dir) => {
      // community detection on the ship-year co-purchase graph — the
      // missing member of the graph suite (CC: membership, PageRank:
      // centrality, k-core: cohesion, LPA: dense regions). Synchronous
      // label propagation, 4 fixed rounds; the per-node argmax is the
      // integer encoding max(cnt·K + (K−1−label)), so ties break to the
      // smallest label identically on both engines — no max_by bet
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      graft.operators.Graph.labelPropagation(edges, rounds = 4)
    }),
    "t55_sssp" -> ((s, dir) => {
      // weighted blast radius (Bellman–Ford, fixed 4 rounds): hop cost =
      // 10⁶ div shared-order-count, so strong co-purchase ties are cheap
      // corridors — t53 counts hops, this weighs them; integer weights
      // keep every distance cross-engine exact
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .groupBy(col("pk").as("src"), col("pk2").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"), expr("1000000 div cnt").as("w"))
      val seeds = Tables.part(s, dir).filter(col("p_size") === 50)
        .select(col("p_partkey").as("node"))
      graft.operators.Graph.ssspDistances(edges, seeds, rounds = 4)
    }),
    "t54_decayed_trend" -> ((s, dir) =>
      // "trending now": per-type activity with yesterday worth half of
      // today — integer 2^-age weights (a right shift, no float pow), so
      // the score is cross-engine exact; counts reduce per (type, day)
      // before any weighting touches them
      graft.operators.Windows.decayedTrend(Tables.events(s, dir))),
    "t53_bfs_reach" -> ((s, dir) => {
      // blast radius: exact hop distance (≤ 4) from the size-50 parts
      // through the ship-year co-purchase graph — multi-source BFS with a
      // fixed horizon; monotone min-relaxation makes extra rounds
      // idempotent, so the fixed count is safe, not merely attestable
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("src"), col("pk2").as("dst"))
      val seeds = Tables.part(s, dir).filter(col("p_size") === 50)
        .select(col("p_partkey").as("node"))
      graft.operators.Graph.bfsDistances(edges, seeds, rounds = 4)
    }),
    "t56_components" -> ((s, dir) => {
      // connected components over the same relational co-purchase graph —
      // the dedup-group CC machinery applied to the graph suite, checked
      // against an INDEPENDENTLY authored recursive-CTE transitive closure
      // (like t53's hand oracle); group = min part key in the component.
      // STAR directly, not dedupGroupsAuto (round-7 verdict #2): a
      // co-purchase graph is the opposite geometry of near-dup clusters —
      // one giant component whose diameter far exceeds the 4-round
      // propagation cap, so auto always burned 4 wasted rounds before
      // restarting on star (profiled at sf0.1: auto 11.3 s vs star 3.5 s
      // for the same 17k-node output; the hash is algorithm-independent)
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("doc_a"), col("pk2").as("doc_b"))
      Dedup.dedupGroupsStar(edges)
        .select(col("doc_id").as("node"), col("group_id"))
    }),
    "t43_tree_paths" -> ((s, dir) => {
      // hierarchy flattening by pointer doubling: every part resolves to
      // its root and depth in the synthetic decimal-digit forest
      // (parent = key/10) in 4 doubling rounds — ⌈log₂ depth⌉ shuffle
      // stages, not depth sequential joins
      val pf = Tables.part(s, dir).select(col("p_partkey").as("node"),
        when(col("p_partkey") >= 10, expr("p_partkey DIV 10")).as("parent"))
      graft.operators.Graph.treePaths(pf, rounds = 4)
    }),
    "m4_dup_frames" -> ((s, dir) =>
      // duplicate frames shared across distinct documents (digest-keyed,
      // payload never shuffled) — the multimodal twin of d8 exact dedup
      graft.ops.Multimodal.duplicateFrames(Tables.documents(s, dir), frameChars = 100)),
    "m8_frame_jaccard" -> ((s, dir) =>
      // video-style near-dup: exact Jaccard over per-document frame-
      // fingerprint SETS through the shared df-capped candidate/verify
      // machinery — m4 asks "which frames repeat", this asks "which
      // documents overlap"; a viral intro frame is capped at the index
      Dedup.jaccardPairsFromShingles(
        graft.ops.Multimodal.frameSignatures(Tables.documents(s, dir), frameChars = 100),
        threshold = 0.5)),
    "t37_approx_pct_checked" -> ((s, dir) =>
      // the b13 discipline for quantile sketches: percentile_approx runs
      // next to the exact histogram percentiles and RAISES outside the
      // exact ±0.001 quantile window; only deterministic columns return
      graft.operators.Percentiles.discreteChecked(
        Tables.events(s, dir)
          .select(col("event_type"), round(col("value") * 100).cast("long").as("v_c")),
        "event_type", col("v_c"), Seq(0.5, 0.95), "pct_cents")),
    "x33_bm25_search" -> ((s, dir) =>
      // lexical retrieval next to the ANN surface: BM25 top-10 per query
      // over the inverted index; query terms broadcast, scoring touches
      // only their postings; ppm scores keep ranking cross-engine-exact
      TextOps.bm25Search(Tables.documents(s, dir), Seq(
        (0L, "hash join batch"), (1L, "vector scan filter"),
        (2L, "window agg order")), k = 10)),
    "x58_bm25_served" -> ((s, dir) => {
      // the lexical index's build-once/serve-many path (the s29/s33
      // artifact lifecycle brought to BM25): the postings persist
      // term-bucketed with lengths denormalized on, the serve filters by
      // a literal term IN-list (parquet row-group skip), and the result
      // is layout-independent — the hash must equal x33's
      val t = "postings_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      TextOps.materializedPostings(Tables.documents(s, dir), t)
      TextOps.bm25SearchFromIndex(s, t, Seq(
        (0L, "hash join batch"), (1L, "vector scan filter"),
        (2L, "window agg order")), k = 10)
    }),
    "x55_hybrid_rrf" -> ((s, dir) => {
      // hybrid search: the x33 BM25 list and the exact-cosine list for the
      // same three queries (doc_id ≡ vec_id — the x50 alignment), fused by
      // reciprocal-rank fusion with integer ⌊10⁹/(60+rank)⌋ points — the
      // calibration-free baseline every lexical+vector stack ships
      val queries = Seq((0L, "hash join batch"), (1L, "vector scan filter"),
        (2L, "window agg order"))
      TextOps.hybridRrf(Tables.documents(s, dir), queries,
        Vectors.bruteForceTopK(Tables.embeddings(s, dir), queries.map(_._1), 10))
    }),
    "x56_dsir_weights" -> ((s, dir) =>
      // DSIR importance weights against the English subset as the target
      // domain: positive micro-bits = looks like the target; the
      // deterministic top-k selection a quality-targeted sample keeps
      TextOps.dsirWeights(Tables.documents(s, dir),
        org.apache.spark.sql.functions.col("lang") === "en")),
    "x57_ppl_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail split per language on the x31 char-LM
      // score — exact-integer tertiles over the (score, doc_id) total
      // order, ranks decomposed into bounded score-band windows
      TextOps.pplBuckets(Tables.documents(s, dir))),
    "x59_quality_length_corr" -> ((s, dir) =>
      // is the quality signal just length in a costume? Per-source
      // Spearman between the stopword-ppm proxy and n_chars, both ranks
      // via the banded two-level decomposition, ρ in ppm
      TextOps.qualityLengthCorr(Tables.documents(s, dir))),
    "x60_retrieval_eval" -> ((s, dir) =>
      // known-item QA: at which BM25 rank does each query doc's
      // most-Jaccard-similar neighbor (d38 truth) come back? rank 0 =
      // missed the top-10 — every miss is a row, not a silent drop
      TextOps.retrievalAgreement(Tables.documents(s, dir),
        queryPred = col("doc_id") % 7 === 0)),
    "x61_budget_waterfill" -> ((s, dir) =>
      // max–min fair token allocation across sources under a 20k budget:
      // the waterfilling level caps big sources at a common level, small
      // sources keep everything — the mixture plan x15/x26 then execute
      TextOps.budgetWaterfill(Tables.documents(s, dir), budget = 20000L)),
    "x32_heavy_hitters_checked" -> ((s, dir) =>
      // freqItems sketch next to exact counts: raises if the sketch drops
      // a true heavy hitter (its no-false-negative guarantee); emits the
      // deterministic exact heavy hitters, never the sketch contents
      TextOps.heavyHittersChecked(Tables.documents(s, dir), support = 0.001)),
    "b19_window_funnel" -> ((s, dir) =>
      // windowFunnel parity (the reference engine's flagship product-
      // analytics function): view→click→purchase within 7 days of the
      // first view, strictly ordered; staged per-user-frame aggregation,
      // never a per-user event collection
      graft.operators.Windows.funnel(Tables.events(s, dir),
        Seq("view", "click", "purchase"), windowSec = 604800L)),
    "t46_funnel_latency" -> ((s, dir) =>
      // the question b19's level counts stop short of: exact p50/p90/p99
      // time-to-convert for completed funnels, t19 histogram discipline
      graft.operators.Windows.funnelLatency(Tables.events(s, dir),
        Seq("view", "click", "purchase"), windowSec = 604800L)),
    "t51_attribution" -> ((s, dir) =>
      // first-/last-touch revenue attribution: both touches from ONE
      // per-user RANGE-framed window pass — no events×events lookback join
      graft.operators.Windows.attribution(Tables.events(s, dir))),
    "b28_write_anomalies" -> ((s, dir) =>
      // daily count vs trailing-7-day mean ± 3σ, the z-test cross-
      // multiplied into exact integers — windows over the (day × type)
      // frame only
      graft.operators.Windows.writeAnomalies(Tables.events(s, dir))),
    "b29_id_gaps" -> ((s, dir) =>
      // replication completeness: missing-id count/gap profile per day —
      // the one-task-per-day lag window decomposed over id buckets +
      // a metadata-sized boundary pass
      graft.operators.Windows.idGapReport(Tables.events(s, dir))),
    "b20_cohort_retention" -> ((s, dir) =>
      // cohort × week-offset retention matrix: two event-log aggregations
      // joined on the user-sized frame
      graft.operators.Windows.cohortRetention(Tables.events(s, dir))),
    "b22_peak_concurrency" -> ((s, dir) =>
      // sweep-line over b12's session intervals: ±1 boundary deltas netted
      // per timestamp, running sum via the bounded three-level prefix scan
      // (never a global-ORDER-BY window), per-day max = peak concurrency
      graft.operators.Windows.peakConcurrency(Tables.events(s, dir))),
    "b23_transition_matrix" -> ((s, dir) =>
      // first-order Markov behavioral counts: per-user next-event pairs →
      // (from, to) counts with conditional ppm over the metadata-sized
      // type×type frame
      graft.operators.Windows.transitionMatrix(Tables.events(s, dir))),
    "b24_new_users" -> ((s, dir) =>
      // DAU dashboard: active/new/cumulative users per day; cumulative
      // window over the day-count-sized frame only
      graft.operators.Windows.newUsersDaily(Tables.events(s, dir))),
    "t47_session_paths" -> ((s, dir) =>
      // top-20 within-session event trigrams: two windows on one per-user
      // sort, metadata-sized trigram count, TakeOrdered
      graft.operators.Windows.sessionPaths(Tables.events(s, dir))),
    "b25_hourly_profile" -> ((s, dir) =>
      // load seasonality: peak hour (ties earlier) + totals per type from
      // a ≤24·|types| metadata frame
      graft.operators.Windows.hourlyProfile(Tables.events(s, dir))),
    "b26_props_stats" -> ((s, dir) =>
      // query the JSON you landed: per-type stats of props.$.k straight
      // from the string column, malformed/missing counted not crashed
      graft.operators.Windows.propsFieldStats(Tables.events(s, dir))),
    "t35_correlated_scalar" -> ((s, dir) => {
      // correlated scalar subquery — Catalyst decorrelates it into an
      // aggregate + left outer join (no per-row re-execution; the t21
      // pattern: plain spark.sql on registered views). Nations with no
      // customer keep a NULL max (coalesced to -1 for the compare)
      Tables.nation(s, dir).createOrReplaceTempView("nation_t35")
      Tables.customer(s, dir).createOrReplaceTempView("customer_t35")
      s.sql("""
        SELECT n_nationkey, n_name,
               coalesce((SELECT CAST(round(max(c_acctbal) * 100) AS BIGINT)
                         FROM customer_t35 WHERE c_nationkey = n_nationkey), -1)
                 AS max_bal_c
        FROM nation_t35""")
    }),
    "t36_offset_windows" -> ((s, dir) => {
      // the offset-window family (lag/lead/first/nth) over each user's
      // event sequence: previous/next event type, session start, second
      // event — one window, one shuffle on user_id, total order by (ts,
      // event_id) so every offset is deterministic
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("event_type")).over(w).as("first_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
    }),
    "t33_full_outer" -> ((s, dir) => {
      // FULL OUTER completes the join-type surface (inner/left/semi/anti
      // already attested): hourly purchases vs errors — sparse enough that
      // both sides contribute unmatched hours, kept with zero-coalesced
      // counts. Both inputs aggregate BEFORE the join (hour-sized frames)
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_purchases"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_errors"))
      purchases.join(errors, Seq("hour"), "full")
        .select(col("hour"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"))
    }),
    "t34_rank_family" -> ((s, dir) => {
      // the rank-normalization window family over customers within each
      // nation: percent_rank / cume_dist are single exact int divisions
      // (bit-stable), ntile buckets are ints; total order via custkey
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),
    "x31_char_lm_score" -> ((s, dir) =>
      // corpus-trained char-bigram LM cross-entropy per doc (bits/char ×
      // 1e6) — the perplexity-style quality gate; model is vocab²-sized
      // and broadcast, the corpus never shuffles
      TextOps.charLmScore(Tables.documents(s, dir))),
    "x30_char_entropy" -> ((s, dir) =>
      // compression-style quality gate: per-doc char-histogram Shannon
      // entropy in micro-bits (degenerate repetition ≈ 0, mojibake high)
      TextOps.charEntropy(Tables.documents(s, dir))),
    "x37_cdc_chunks" -> ((s, dir) =>
      // content-defined chunk boundaries (rolling hash ≡ 0 mod 64): the
      // insertion-resilient chunking the storage-dedup stack (chunk md5 →
      // d8 exact dedup) needs where fixed tiles (m4/x24) lose every tile
      // after one inserted byte
      TextOps.cdcChunks(Tables.documents(s, dir))),
    "d31_cdc_dedup" -> ((s, dir) =>
      // what chunk-level dedup buys per source: x37's digests rolled up to
      // (chunks, distinct chunks, chars before/after, saved ppm) — two
      // metadata-collapsing aggs, chunk text never shuffles
      TextOps.cdcDedupReport(Tables.documents(s, dir))),
    "d32_dup_spans" -> ((s, dir) =>
      // exact duplicated-substring spans (Lee et al. 2022 ExactSubstr):
      // positional 5-grams shared by ≥2 docs, merged into maximal spans —
      // WHERE the duplication sits, not just that docs are similar; no
      // pair join anywhere (semi-join screen + per-doc windows)
      Dedup.dupSpans(Tables.documents(s, dir))),
    "d33_span_excision" -> ((s, dir) =>
      // the excision the span report exists for: corpus rewritten with
      // every duplicated span cut; untouched docs pass through verbatim,
      // exact copies come back empty (one giant span)
      Dedup.excisedCorpus(Tables.documents(s, dir))),
    "x38_contamination_score" -> ((s, dir) => {
      // d13's binary flag as a spectrum: per-doc benchmark-overlap ppm for
      // the WHOLE corpus (zero-hit docs score 0) — bench set broadcast,
      // one pass, one doc_id agg
      val docs = Tables.documents(s, dir)
      Dedup.contaminationScore(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"))
    }),
    "x39_gate_ablation" -> ((s, dir) =>
      // which quality gate bites? per-component fail and UNIQUE-fail
      // counts (drop-the-gate admittance) in one codegen'd flag pass
      TextOps.gateAblation(Tables.documents(s, dir))),
    "x40_vocab_coverage" -> ((s, dir) =>
      // tokenizer OOV diagnostic: top-1000 vocab (count desc, token asc),
      // per-source OOV ppm — vocab broadcasts, corpus never shuffles
      TextOps.vocabCoverage(Tables.documents(s, dir))),
    "x41_dedup_savings" -> ((s, dir) =>
      // the pre-pipeline budget question: per-source tokens raw vs after
      // exact dedup (keep-min rep), saving in ppm
      TextOps.dedupSavings(Tables.documents(s, dir))),
    "x42_packing_efficiency" -> ((s, dir) =>
      // was the token budget well spent? per-seq fills rolled up to one
      // metadata row (mean fill ppm, straddle overshoot at fill_max)
      TextOps.packingEfficiency(Tables.documents(s, dir))),
    "x47_pipeline_waterfall" -> ((s, dir) =>
      // the curation cost story: docs/tokens surviving raw → exact dedup
      // → quality → quota sample, four metadata rows
      TextOps.pipelineWaterfall(Tables.documents(s, dir))),
    "x43_source_drift" -> ((s, dir) =>
      // domain-shift screen: per-source L1 ppm distance from the corpus
      // token distribution over the deterministic top-1000 vocab
      TextOps.sourceDrift(Tables.documents(s, dir))),
    "x45_curriculum" -> ((s, dir) =>
      // short-to-long curriculum: exact length-decile bands, hash-mixed
      // within band, dense positions via the bounded prefix count
      TextOps.curriculumOrder(Tables.documents(s, dir))),
    "x36_pareto_frontier" -> ((s, dir) => {
      // the efficient edge of the length/naturalness trade-off: docs no
      // other doc beats on BOTH n_chars and stopword ppm — what any
      // scalarized quality weighting could ever select. Dominance runs in
      // the value domain of n_chars (distinct-x window), not over rows
      val toks = TextOps.tokens(col("text"))
      val nTok = size(toks).cast("long")
      val nStop = size(filter(toks, t =>
        array_contains(typedlit(TextOps.stopwords), t))).cast("long")
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"),
        round(lit(1e6) * nStop / nTok).cast("long").as("stopword_ppm"))
      TextOps.paretoFront(scored, "n_chars", "stopword_ppm")
    }),
    "x29_collocations" -> ((s, dir) =>
      // corpus collocations ranked by lift (monotone with PMI — no
      // cross-engine ln in the compare); zip-slice bigrams, vocab-sized
      // marginals broadcast back, TakeOrdered top-k
      TextOps.collocations(Tables.documents(s, dir))),
    "t23_daily_trends" -> ((s, dir) =>
      // cumulative / 7-day moving average / day-over-day delta per type —
      // windows run over the aggregated (day × type) frame, never raw rows
      graft.operators.Windows.dailyTrends(Tables.events(s, dir))),
    "t41_gap_fill" -> ((s, dir) =>
      // dense key × day grid with LOCF: missing days carry the previous
      // close; the LOCF window runs over the spine (keys × days), never
      // over raw events
      graft.operators.Windows.gapFillLocf(Tables.events(s, dir))),
    "b13_approx_distinct" -> ((s, dir) =>
      // checked variant: the query RAISES if any group's HLL estimate is
      // off by > 3·rsd vs exact. Only cross-engine-deterministic columns are
      // returned (sketch_ok still forces the assert through its rel_err
      // dependency), so the oracle hash-verifies the row set while the
      // assert bounds the engine-specific estimate
      graft.operators.Windows.approxDailyDistinctChecked(Tables.events(s, dir))
        .select(col("day"), col("event_type"), col("exact_users"),
          col("n_events"), col("sketch_ok"))),
    "b31_countmin_checked" -> ((s, dir) =>
      // the 4th checked sketch (HLL=b13, percentiles=t37, freqItems=x32):
      // count-min per-user frequency estimates next to exact counts — the
      // no-undercount guarantee asserted per key; fixed literal hash
      // constants make the whole sketch integer-exact on both engines
      graft.operators.Sketches.countMinChecked(Tables.events(s, dir))),
    "b14_txn_assembly" -> ((s, dir) => {
      // batch twin of the flatMapGroupsWithState assembler (gap = 1 day on
      // the fixture's user-level gtids); one exchange for window + agg.
      // P7 cast-backs: the reference stores pos/size as strings
      val b = binlog(s, dir).select(
        col("gtid"), col("execute_time"),
        BinlogEvents.pos.as("pos"),
        BinlogEvents.sizeBytes.as("size_bytes"),
        col("single_statement_affected_rows").as("affected_rows"))
      graft.streaming.TransactionAssembler.assembleBatch(b, gapSec = 86400L)
    }),

    "b21_state_replay" -> ((s, dir) =>
      // what does each row look like NOW: latest-op-per-key compaction
      // with tombstones (last op = 'error' removes the key) — one
      // map-side-combinable hash agg riding the unique position, no sort
      // window; n_ops carries the compaction ratio
      graft.binlog.StateReplay.currentState(binlog(s, dir))),
    "b18_ordering_integrity" -> ((s, dir) => {
      // replication-integrity check: within each gtid's (execute_time,
      // pos) order, how often does the binlog position run BACKWARD?
      // Nonzero counts mean out-of-order apply or position reuse — the
      // first thing a DBA audits when downstream counts drift. One window
      // per gtid (per-stream partitions, never one task) + one map-side-
      // combined aggregation
      val b = binlog(s, dir).select(
        col("gtid"), col("execute_time"), BinlogEvents.pos.as("pos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("gtid")).orderBy(col("execute_time"), col("pos"))
      b.withColumn("prev", lag(col("pos"), 1).over(w))
        .groupBy(col("gtid"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("prev").isNotNull && col("pos") < col("prev"), 1L)
            .otherwise(0L)).as("n_violations"))
    }),
    "b16_txn_duration_histogram" -> ((s, dir) => {
      // the reporting layer over b14's assembly: how long do transactions
      // run, and how much work rides in each duration class? The histogram
      // domain is seconds-valued spend times — value-domain compressed
      // (t19 pattern), so the second agg is metadata-sized
      val b = binlog(s, dir).select(
        col("gtid"), col("execute_time"),
        BinlogEvents.pos.as("pos"),
        BinlogEvents.sizeBytes.as("size_bytes"),
        col("single_statement_affected_rows").as("affected_rows"))
      graft.streaming.TransactionAssembler.assembleBatch(b, gapSec = 86400L)
        .groupBy(col("transaction_spend_time"))
        .agg(count(lit(1)).as("n_transactions"),
          sum(col("n_events")).as("total_events"),
          sum(col("transaction_affected_rows")).as("total_affected_rows"))
    }),

    // ---- dedup surface ----
    "d1_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    "d8_dedup_exact_digest" -> ((s, dir) =>
      // digest-first form: same output as d1 (shared oracle), but only
      // duplicate-suspect buckets ever shuffle the document text
      Dedup.exactByDigest(Tables.documents(s, dir))),
    "d2_jaccard_pairs" -> ((s, dir) => {
      // hash token ids are a pure projection (no vocabulary build / join),
      // then the inverted shingle-id index
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir))
      Dedup.jaccardPairsFromShingles(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.5)
    }),
    "d7_dedup_groups" -> ((s, dir) => {
      // the step after pair generation: connected components over the
      // near-dup graph (keep-min canonical representative per group).
      // Auto form: min-label rounds for the tight-cluster common case,
      // star-contraction fallback if a long chain keeps it from converging
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir))
      Dedup.dedupGroupsAuto(
        Dedup.jaccardPairsFromShingles(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.5))
    }),
    "d23_dup_cluster_profile" -> ((s, dir) => {
      // the governance histogram over d7's components: how many duplicate
      // clusters of each size, how many docs (and how many deletable) they
      // bind — the "how much would dedup save?" report; both aggs after
      // the CC are cluster- then size-count-sized (metadata). Reads the
      // MATERIALIZED groups artifact (round-5): the CC chain runs once per
      // corpus and d16/d23/d27 share it instead of re-deriving it 3×
      Dedup.materializedGroupsFor(Tables.documents(s, dir), dir)
        .groupBy(col("group_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("cluster_size")).as("n_docs"),
          (count(lit(1)) * (col("cluster_size") - 1)).as("n_deletable"))
    }),
    "d9_dedup_groups_star" -> ((s, dir) => {
      // same pair graph as d7, grouped by the O(log² n) large-star /
      // small-star contraction — the variant adversarially long chains need
      // (min-label propagation is diameter-bound); same output contract,
      // same recursive-CTE oracle
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir))
      Dedup.dedupGroupsStar(
        Dedup.jaccardPairsFromShingles(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.5))
    }),
    "d3_minhash_sigs" -> ((s, dir) =>
      // all k signatures as ONE codegen projection over the token-id array
      // (no explode, no aggregate, no exchange — min is duplicate-
      // insensitive, so the exploded+distinct form it replaced is identical)
      Dedup.minhashSignaturesFromIdArrays(
        Vocab.hashTokenIdArrays(Tables.documents(s, dir)))),
    "d4_minhash_pairs" -> ((s, dir) =>
      Dedup.candidatePairsFromSignatures(
        Dedup.minhashShingleSignaturesFromArrays(
          Vocab.hashTokenIdArrays(Tables.documents(s, dir)), 5), bands = 4)),
    "d26_winnow_overlap" -> ((s, dir) =>
      // plagiarism-style overlap: pairs sharing >= 3 winnowed fingerprints
      // under the df cap — the sparse-index pair join winnowing exists for
      Dedup.winnowOverlapPairs(Tables.documents(s, dir))),
    "d25_snapshot_diff" -> ((s, dir) => {
      // rev-over-rev governance: docs <400 play the old rev, docs ≥100
      // the new (every-7th modified) — added/removed/changed/same counts
      // from fixed-width digest rows, text never shuffles
      val docs = Tables.documents(s, dir)
      Dedup.snapshotDiff(
        docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 100)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text"))))
    }),
    "d24_threshold_sweep" -> ((s, dir) => {
      // the threshold-tuning report: every capped candidate pair scored
      // once (threshold 0), histogrammed by score decile — one pass
      // answers "what would each cutoff keep?" instead of re-running d2
      // per candidate threshold
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir))
      Dedup.jaccardPairsFromShingles(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.0)
        .groupBy(floor(col("jaccard") * 10).cast("long").as("score_band"))
        .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
    }),
    "d21_minhash_estimate" -> ((s, dir) =>
      // the LSH candidates scored by the signature-slot-match estimator
      // itself (no shingle re-read per pair — candidate scoring touches
      // only k-long signature rows, metadata-sized at any document length)
      Dedup.minhashEstimatedPairs(
        Dedup.minhashShingleSignaturesFromArrays(
          Vocab.hashTokenIdArrays(Tables.documents(s, dir)), 5), bands = 4)),
    "d30_idf_cosine" -> ((s, dir) =>
      // IR-weighted near-dup scoring: sparse cosine over 5-gram shingle
      // features with quantized ⌊10⁶/df⌋ weights — rare shared shingles
      // dominate the score (weighted resemblance), where d2's Jaccard
      // counts all shingles equally. Integer partial sums keep norms/dots
      // exact and aggregation-order-free; candidates from the df-capped
      // rare-feature index, verified over full feature sets. Unigram
      // features would be vacuous here: the corpus has 31 distinct tokens,
      // every one hot — shingles are where rarity lives (as d2 relies on)
      Dedup.idfCosinePairs(
        Dedup.shingleIdsFromArrays(
          Vocab.hashTokenIdArrays(Tables.documents(s, dir)), 5)
          .withColumnRenamed("shingle_id", "token_id"),
        threshold = 0.5)),
    "d36_band_sweep" -> ((s, dir) => {
      // d29 swept across configurations: precision/recall of 2/4/8-band
      // LSH vs the same exact-Jaccard truth — the (bands, rows) tuning
      // table read BEFORE committing a 100 TB banding pass. One shared
      // signature table; each config adds only its band-key join
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir)).persist()
      val sh = Dedup.shingleIdsFromArrays(ids, 5)
      val sigs = Dedup.minhashSignaturesFromShingles(sh).persist()
      val truth = Dedup.jaccardPairsFromShingles(sh, threshold = 0.5).persist()
      Seq(2, 4, 8).map { b =>
        Dedup.sketchConfusion(truth, Dedup.candidatePairsFromSignatures(sigs, b))
          .withColumn("bands", lit(b.toLong))
      }.reduce(_ unionByName _)
    }),
    "d29_lsh_confusion" -> ((s, dir) => {
      // the checked-sketch report for the banding itself: exact-Jaccard
      // truth (d2) vs LSH candidates (d4) → tp/fp/fn + ppm precision and
      // recall in one metadata row — the numbers that tune (bands, rows)
      // before a 100 TB pass. One shared token front-end; both pair sets
      // are df/bucket-capped, the outer join is pair-set-sized
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir)).persist()
      Dedup.sketchConfusion(
        Dedup.jaccardPairsFromShingles(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.5),
        Dedup.candidatePairsFromSignatures(
          Dedup.minhashShingleSignaturesFromArrays(ids, 5), bands = 4))
    }),
    "d5_simhash" -> ((s, dir) =>
      // the codegen projection form — identical to the ±1-sum aggregation
      // for every document with ≥ 1 token (SimHashBitsSpec)
      Dedup.simhashFromArrays(Vocab.hashTokenIdArrays(Tables.documents(s, dir)))),
    "d22_simhash_pairs" -> ((s, dir) =>
      // the fingerprints put to their dedup use: 60-bit simhash (one
      // codegen projection pass — no explode, no 60-wide agg), 4×15-bit
      // band keys (pigeonhole covers hamming ≤ 3), df-capped buckets, one
      // XOR popcount per candidate — no shingle re-read, no float
      Dedup.simhashPairsFromArrays(Vocab.hashTokenIdArrays(Tables.documents(s, dir)))),
    "d10_neardup_keep_first" -> ((s, dir) =>
      // ingest-order near-dup filter (batch twin of streamingNearDup):
      // keep a doc iff no smaller doc_id claims any of its band signatures
      Dedup.nearDupKeepFirst(Tables.documents(s, dir))),
    "d12_vector_keep_first" -> ((s, dir) =>
      // ingest-order embedding dedup (batch twin of streamingLshNearDup):
      // keep a vector iff no smaller vec_id claims any of its 4 sign-hash
      // buckets — the dedup-at-ingest screen for an embedding stream
      Vectors.lshKeepFirst(Tables.embeddings(s, dir))),
    "d11_char_ngram_jaccard" -> ((s, dir) =>
      // character 3-gram Jaccard (tokenization-free near-dup) with the
      // df-capped index: hot trigrams never enter the candidate self-join;
      // verification recomputes exact intersections over the full sets
      Dedup.jaccardPairsBlocked(
        Dedup.shingleIdsFromArrays(Dedup.charIds(Tables.documents(s, dir)), 3),
        threshold = 0.5, maxDf = 20L)),
    "d14_incremental_dedup" -> ((s, dir) => {
      // ingestion-time screen for a growing corpus: which docs of the
      // incoming batch (src0/src1 play the new arrivals) are already
      // represented — verbatim (digest-join + exact confirm) or as a
      // near-dup (MinHash-LSH band-key collision against the corpus index)
      val docs = Tables.documents(s, dir)
      val isNew = col("source").isin("src0", "src1")
      Dedup.incrementalDedup(docs.filter(isNew), docs.filter(!isNew))
    }),
    "d35_bloom_incremental" -> ((s, dir) => {
      // d14's exact screen with the corpus digest set compressed into a
      // FIXED 2 KiB Bloom bitmap: batch probes in-scan, only survivors
      // join — the bounded-memory ingest screen; verdict ≡ the join form
      val docs = Tables.documents(s, dir)
      val isNew = col("source").isin("src0", "src1")
      Dedup.incrementalExactBloom(docs.filter(isNew), docs.filter(!isNew))
    }),
    "d16_dedup_keep_longest" -> ((s, dir) => {
      // the step after grouping: keep the LONGEST doc per near-dup group
      // (ties to the smaller id) + every ungrouped doc — the keep set a
      // curation pipeline actually materializes. Groups come from the
      // shared materialized artifact (one CC run per corpus, round-5)
      val docs = Tables.documents(s, dir)
      Dedup.keepBest(docs, Dedup.materializedGroupsFor(docs, dir))
    }),
    "d27_dedup_keep_quality" -> ((s, dir) => {
      // quality-aware representative: per near-dup group keep the doc with
      // the highest stopword-naturalness ppm (ties → smaller id), not the
      // longest — the FineWeb-style pick; same groups (the shared
      // materialized artifact), different argmax
      val docs = Tables.documents(s, dir)
      val groups = Dedup.materializedGroupsFor(docs, dir)
      val toks = TextOps.tokens(col("text"))
      val nTok = size(toks).cast("long")
      val nStop = size(filter(toks, t =>
        array_contains(typedlit(TextOps.stopwords), t))).cast("long")
      val scored = docs.select(col("doc_id"),
        round(lit(1e6) * nStop / nTok).cast("long").as("score"))
      Dedup.keepBestScored(docs, groups, scored)
    }),
    "d15_block_dedup" -> ((s, dir) =>
      // sub-document (line/block) exact dedup: 16-token blocks, global
      // keep-first, documents reassembled from surviving blocks — the
      // CCNet-style boilerplate scrub document-level screens can't express
      Dedup.blockDedup(Tables.documents(s, dir))),
    "d20_boilerplate_ratio" -> ((s, dir) =>
      // document-level readout of the d15 block index: fraction of each
      // doc's 16-token blocks shared with ANY other document — the routing
      // signal for block-scrub vs keep (window-min/max per block content,
      // no self-join)
      Dedup.boilerplateRatio(Tables.documents(s, dir))),
    "d13_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: src0 plays the eval suite; corpus docs
      // sharing any 5-gram shingle with it are flagged (broadcast bench set)
      val docs = Tables.documents(s, dir)
      Dedup.decontaminate(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"))
    }),
    "d6_cosine_neardup" -> ((s, dir) => {
      // ⌈√N⌉ spaced centroids: pair work stays O(N^1.5) and bucket
      // parallelism grows with the corpus (count() is metadata, not data)
      val emb = Tables.embeddings(s, dir)
      Vectors.cosineNearDupPairs(emb, Vectors.spacedCentroidIds(emb.count()), threshold = 0.4)
    }),
    "d28_semantic_dedup" -> ((s, dir) =>
      // SemDeDup end-to-end (pipeline + rationale in
      // Vectors.semanticDedupKeep's scaladoc): bucketed cosine pairs →
      // star-contraction CC → least-centroid-similar exemplar per group
      Vectors.semanticDedupKeep(Tables.embeddings(s, dir))),

    "d19_cross_source_dups" -> ((s, dir) => {
      // governance view: which source pairs re-serve each other's content —
      // the d2 near-dup pair graph rolled up to canonical source pairs
      val docs = Tables.documents(s, dir)
      val ids = Vocab.hashTokenIdArrays(docs)
      Dedup.crossSourceDupMatrix(
        Dedup.jaccardPairsFromShingles(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.5),
        docs)
    }),
    "d37_source_overlap" -> ((s, dir) =>
      // corpus cartography: exact shingle-set Jaccard between every source
      // pair — content-level overlap whether or not any document pair
      // crosses the near-dup threshold; no self-join (per-shingle source
      // sets are |sources|-bounded)
      Dedup.sourceOverlapMatrix(Tables.documents(s, dir))),
    "d38_similar_docs" -> ((s, dir) => {
      // lexical more-like-this: for each query doc (doc_id % 7 = 0), the
      // top-3 most-Jaccard-similar corpus docs through the df-capped
      // index — the point-query twin of d2's all-pairs sweep (and of the
      // ANN point lookups s1/s22 on the vector side). Integer-ppm scores
      // keep the per-query ranking cross-engine exact
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir))
      Dedup.similarDocsTopK(Dedup.shingleIdsFromArrays(ids, 5),
        queryPred = col("doc_id") % 7 === 0, k = 3)
    }),
    "d18_containment_pairs" -> ((s, dir) => {
      // asymmetric near-dup: excerpt/quote detection — containment
      // |∩|/min(|A|,|B|) catches a short doc embedded in a long one where
      // Jaccard ≈ |A|/|B| stays under any threshold
      val ids = Vocab.hashTokenIdArrays(Tables.documents(s, dir))
      Dedup.containmentPairs(Dedup.shingleIdsFromArrays(ids, 5), threshold = 0.8)
    }),
    "d17_incremental_vector_dedup" -> ((s, dir) => {
      // d14's embedding analog: new vectors (vec_id % 10 < 2 plays the
      // incoming batch) flagged iff any sign-hash bucket is already
      // claimed by the corpus side
      val emb = Tables.embeddings(s, dir)
      Vectors.incrementalLshDedup(
        emb.filter(col("vec_id") % 10 < 2), emb.filter(col("vec_id") % 10 >= 2))
    }),

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
    "x50_mixture_shift" -> ((s, dir) =>
      // what cluster balancing DOES to the source mixture: per-source
      // corpus share vs sampled share (ppm, integer div) — the report a
      // pipeline reads before committing mixture weights; vec_id ≡ doc_id
      Vectors.mixtureShiftReport(Tables.embeddings(s, dir),
        Tables.documents(s, dir).select(col("doc_id").as("vec_id"), col("source")))),
    "s31_margin_mining" -> ((s, dir) => {
      // aligned-pair mining with the margin criterion: forward-top-1
      // cross-corpus matches whose cosine stands out vs BOTH sides'
      // neighborhoods — the hub-resistant bitext/parallel-data step
      val emb = Tables.embeddings(s, dir)
      Vectors.marginPairs(
        emb.filter(col("vec_id") % 10 < 2),
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
      val emb = Tables.embeddings(s, dir)
      Vectors.marginPairsScan(
        emb.filter(col("vec_id") % 10 < 2),
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
      val emb = Tables.embeddings(s, dir)
      Vectors.marginPairsGated(
        emb.filter(col("vec_id") % 10 < 2),
        emb.filter(col("vec_id") % 10 >= 2))
    }),
    "s30_cluster_balanced_sample" -> ((s, dir) =>
      // topic-balanced subset: ⌈√N⌉ IVF clusters as label-free topic
      // proxies, ≤5 members each in deterministic hash order — the
      // DoReMi-style mixture-balance step on semantic buckets
      Vectors.clusterBalancedSample(Tables.embeddings(s, dir), quota = 5)),
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

    // ---- text analysis ----
    "x1_token_stats" -> ((s, dir) => TextOps.tokenStats(Tables.documents(s, dir))),
    "x2_quality" -> ((s, dir) => TextOps.qualityScore(Tables.documents(s, dir))),
    "x3_langid" -> ((s, dir) => TextOps.languageId(Tables.documents(s, dir))),
    "x4_fingerprint" -> ((s, dir) =>
      TextOps.fingerprint(Vocab.hashTokenIds(Tables.documents(s, dir)))),
    "x34_winnowing" -> ((s, dir) =>
      // MOSS-style winnowing: per-w-window min over positional k-gram
      // hashes, distinct — one codegen'd expression, shuffle-free until
      // the per-doc summary agg
      TextOps.winnowFingerprints(Tables.documents(s, dir), k = 5, w = 4)),
    "x5_regex_tokens" -> ((s, dir) =>
      TextOps.regexTokenStats(Tables.documents(s, dir))),
    "x6_curation" -> ((s, dir) =>
      // the composed pass: exact-dedup representative + quality gate
      TextOps.curate(Tables.documents(s, dir))),
    "x7_top_terms" -> ((s, dir) =>
      // TF-IDF-shaped keyword extraction on integer-deterministic ordering
      TextOps.topTerms(Tables.documents(s, dir))),
    "x9_normalize" -> ((s, dir) =>
      // canonicalization upstream of exact dedup: case/punct/spacing-folded
      TextOps.normalize(Tables.documents(s, dir))),
    "x10_curation_pipeline" -> ((s, dir) =>
      // the composed end-to-end pass: normalize → dedup on normalized text
      // → quality gate → language-balanced quota sample
      TextOps.curationPipeline(Tables.documents(s, dir), quota = 50)),
    "x8_stratified_sample" -> ((s, dir) =>
      // language-balancing quota sample on a deterministic hash shuffle key
      // (two-phase exact top-quota — no single-task-per-stratum window)
      TextOps.stratifiedSample(Tables.documents(s, dir), quota = 50)),
    "x11_pack_sequences" -> ((s, dir) =>
      // training-sequence packing via two-level distributed prefix sum;
      // groupSize=8 (vs the 32768 default) so the test corpus actually
      // exercises group, super-group, and top-level prefix stages
      TextOps.packSequences(Tables.documents(s, dir), budget = 2048L, groupSize = 8L)),
    "x12_global_shuffle" -> ((s, dir) =>
      // deterministic corpus shuffle: explicit position in hash order via
      // the same bucketed prefix machinery — no global-ORDER-BY window
      TextOps.globalShuffle(Tables.documents(s, dir))),
    "x13_repetition" -> ((s, dir) =>
      // intra-doc k-gram repetition ratio (Gopher-style quality signal) —
      // a pure codegen projection: shingle-array size vs token arithmetic
      TextOps.repetitionStats(Tables.documents(s, dir))),
    "x14_pii_redaction" -> ((s, dir) => {
      // the corpus is synthetic words, so the query seeds one deterministic
      // email/IP/phone per document before scrubbing — the redaction itself
      // (and the cross-engine regex semantics) is what the oracle attests
      val docs = Tables.documents(s, dir)
      val seeded = docs.select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact u"), col("doc_id"), lit("@"), col("source"), lit(".net"),
          lit(" ip 10.0."), col("doc_id") % 256, lit(".7"),
          lit(" tel 555-123-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")
        ).as("text"))
      TextOps.redactPii(seeded)
    }),
    "x15_temperature_sample" -> ((s, dir) =>
      // multilingual data mixing: α=0.5 temperature rebalancing with a
      // deterministic hash-threshold keep decision — zero corpus shuffle
      TextOps.temperatureSample(Tables.documents(s, dir))),
    "x48_pps_sample" -> ((s, dir) =>
      // systematic probability-proportional-to-size sampling: exactly 500
      // picks at every total/500-th character of cumulative weight; exact
      // integer arithmetic end-to-end, prefix via the bounded 3-level scan
      TextOps.ppsSample(Tables.documents(s, dir))),
    "x49_vocab_growth" -> ((s, dir) =>
      // Heaps-law curve: types vs tokens at corpus quarters — one vocab-
      // sized shuffle, integer quarter tests shared with the oracle
      TextOps.vocabGrowth(Tables.documents(s, dir))),
    "x17_upsample" -> ((s, dir) =>
      // low-resource upsampling: α=0.5 repetition factors (capped at 4
      // epochs), emitted as one row per (doc, epoch) — the mixture a
      // training run actually reads; zero corpus shuffle
      TextOps.upsample(Tables.documents(s, dir))),
    "x18_token_zipf" -> ((s, dir) =>
      // Zipf profile: distinct-token count per occurrence count — the
      // tokenization sanity check; second agg is vocabulary-sized
      TextOps.tokenFreqOfFreq(Vocab.hashTokenIds(Tables.documents(s, dir)))),
    "x28_token_novelty" -> ((s, dir) =>
      // vocabulary growth (Heaps'-law check): per-doc count of tokens
      // first seen in that doc — one window-min over the token index,
      // no pair join
      Dedup.tokenNovelty(Vocab.hashTokenIds(Tables.documents(s, dir)))),
    "x19_ngram_novelty" -> ((s, dir) =>
      // ingest-order novelty: fraction of each doc's distinct 5-gram
      // shingles FIRST seen in that doc — the O(corpus-shingles) "is this
      // batch mostly dupes?" screen (one window-min, no pair join)
      Dedup.ngramNovelty(Tables.documents(s, dir))),
    "x20_shard_layout" -> ((s, dir) =>
      // x12's deterministic shuffle cut into training shards: (shard,
      // pos_in_shard) = (pos div 100, pos mod 100) — the file/offset
      // addressing a data loader reads; pure arithmetic over the bounded
      // prefix scan
      TextOps.shardLayout(Tables.documents(s, dir), shardSize = 100L)),
    "x24_chunking" -> ((s, dir) =>
      // RAG/long-context chunker: 64-token windows every 48 tokens —
      // offsets only (the loader slices); projection + generator, no
      // shuffle anywhere
      TextOps.chunkDocs(Tables.documents(s, dir))),
    "x25_source_quality" -> ((s, dir) =>
      // feed-level health dashboard: volumes + stopword / type-token
      // ratios per source, one map-side-combined pass
      TextOps.sourceQualityReport(Tables.documents(s, dir))),
    "x23_quarantined_split" -> ((s, dir) => {
      // the split a training run actually materializes: x22's growth-
      // stable assignment with d13's benchmark-contaminated docs forced
      // into a quarantine slice — overlap with the eval suite (src0) must
      // never reach ANY split, train least of all
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("source") =!= "src0")
      val flagged = Dedup.decontaminate(corpus, docs.filter(col("source") === "src0"))
        .select(col("doc_id"), lit(true).as("contaminated"))
      TextOps.assignSplits(corpus)
        .join(F.broadcast(flagged), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          when(col("contaminated"), lit("quarantine")).otherwise(col("split")).as("split"))
    }),
    "x46_vector_quarantined_split" -> ((s, dir) => {
      // x23's quarantine with EMBEDDING-level evidence: docs whose vector
      // leaks against the benchmark split (s18's screen) are forced out of
      // every training slice — token overlap (d13) catches verbatim
      // copies, this catches paraphrases the embedding still recognizes
      val emb = Tables.embeddings(s, dir)
      val leaked = Vectors.crossCorpusLeakage(
          emb.filter(col("vec_id") % 10 < 2),
          emb.filter(col("vec_id") % 10 >= 2), threshold = 0.4)
        .select(col("test_id").as("doc_id"), lit(true).as("leaked"))
      TextOps.assignSplits(
          Tables.documents(s, dir).filter(col("doc_id") % 10 < 2))
        .join(F.broadcast(leaked), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          when(col("leaked"), lit("quarantine")).otherwise(col("split")).as("split"))
    }),
    "x26_budget_sample" -> ((s, dir) =>
      // "a ~5000-token random subset": hash-order prefix token sums via
      // the shared three-level scan, keep while the running total fits
      TextOps.sampleUnderTokenBudget(Tables.documents(s, dir), tokenBudget = 5000L)),
    "x22_split_assignment" -> ((s, dir) =>
      // deterministic 90/5/5 split: pure doc_id-hash projection — stable
      // under corpus growth, so held-out data never bleeds into training
      TextOps.assignSplits(Tables.documents(s, dir))),
    "x54_training_manifest" -> ((s, dir) =>
      // the dataloader's pre-run validation artifact: per-shard volumes,
      // position span, and an order-pinned content checksum — a partially
      // landed shard fails the md5 instead of silently skewing training
      TextOps.trainingManifest(Tables.documents(s, dir))),
    "x52_nested_subsets" -> ((s, dir) =>
      // scaling-law ⊂-chain: 1/8 ⊂ 1/4 ⊂ 1/2 ⊂ all by construction (one
      // hash comparison per tier) — curves differ only by quantity
      TextOps.nestedSubsets(Tables.documents(s, dir))),
    "x53_min_token_sweep" -> ((s, dir) =>
      // the quality gate's main knob swept: docs/tokens surviving each
      // cutoff, retained shares in exact integer ppm
      TextOps.minTokenSweep(Tables.documents(s, dir))),
    "x21_corpus_top_terms" -> ((s, dir) =>
      // exact corpus-wide heavy hitters: vocabulary-sized partial-agg
      // frame, TakeOrdered top-k — never a global sort
      TextOps.corpusTopTerms(Tables.documents(s, dir))),
    "x16_corpus_stats" -> ((s, dir) =>
      // the corpus report card: per-language volume/coverage in one
      // map-side-combined pass (integer aggregates only — deterministic)
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          countDistinct(col("source")).as("n_sources"))),

    // ---- multimodal plumbing ----
    "m1_binary_meta" -> ((s, dir) =>
      graft.ops.Multimodal.decodeExpr(Tables.documents(s, dir))),
    "m2_frame_sample" -> ((s, dir) =>
      graft.ops.Multimodal.sampleFrames(Tables.documents(s, dir))),
    "m3_modality_stats" -> ((s, dir) =>
      // modality routing report: tag in the decode pass, one map-side-
      // combined agg — the multimodal twin of x16's language report card
      graft.ops.Multimodal.modalityStats(Tables.documents(s, dir))),
    "m5_interleave" -> ((s, dir) =>
      // training-batch assembly after routing: round-robin positions
      // across modalities via the per-modality bounded prefix count
      graft.ops.Multimodal.interleaveByModality(Tables.documents(s, dir))),
    "m6_size_percentiles" -> ((s, dir) =>
      // storage planning per modality: exact byte-size percentiles over
      // the compressed histogram (t19 machinery)
      graft.ops.Multimodal.sizePercentiles(Tables.documents(s, dir))),
    "m7_alignment_report" -> ((s, dir) =>
      // referential integrity before any cross-modal join: docs without
      // an embedding drop out of every vector-side operator; orphan
      // embeddings pollute the index with unreachable hits. One
      // full-outer hash join carrying only the id columns. The doc side
      // is the post-curation corpus (doc_id % 10 = 3 deleted upstream),
      // so the orphan-vector path is attested, not just possible
      graft.ops.Vectors.alignmentReport(
        Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 3),
        Tables.embeddings(s, dir))),
    "s22_cross_knn" -> ((s, dir) => {
      // the embedding-match join: every test vector's top-3 train
      // neighbors among its bucket candidates — s14 across two corpora
      val emb = Tables.embeddings(s, dir)
      Vectors.crossCorpusTopK(
        emb.filter(col("vec_id") % 10 < 2),
        emb.filter(col("vec_id") % 10 >= 2), k = 3)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "b1_txn_stats" ->
      (oracleBinlogCte + """
        |SELECT TIMESTAMP '2024-01-06 00:00:00' AS end_time,
        |       '1day' AS "interval", gtid,
        |       CAST(epoch(date_trunc('second', max(execute_time)))
        |            - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
        |       max(pos) - min(pos) + max_by(size_bytes, pos) AS transaction_size,
        |       CAST(sum(affected_rows) AS BIGINT) AS transaction_affected_rows
        |FROM b
        |WHERE execute_time >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND execute_time < TIMESTAMP '2024-01-06 00:00:00'
        |GROUP BY gtid""".stripMargin),
    "b2_top1_size" -> oracleTop1PerWindow("transaction_size"),
    "b3_top1_rows" -> oracleTop1PerWindow("transaction_affected_rows"),
    "b4_top1_time" -> oracleTop1PerWindow("transaction_spend_time"),
    "b14_txn_assembly" ->
      (oracleBinlogCte + """,
        |m AS (SELECT *, epoch_us(execute_time) AS t_us FROM b),
        |g AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |                          OR t_us - lag(t_us) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_s
        |      FROM m WINDOW w AS (PARTITION BY gtid ORDER BY t_us, pos)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY gtid ORDER BY t_us, pos
        |                                 ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
        |SELECT gtid, min(execute_time) AS start_time, max(execute_time) AS end_time,
        |       CAST(epoch(date_trunc('second', max(execute_time)))
        |            - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
        |       max(pos) - min(pos) + max_by(size_bytes, pos) AS transaction_size,
        |       CAST(sum(affected_rows) AS BIGINT) AS transaction_affected_rows,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY gtid, session_id""".stripMargin),
    "b21_state_replay" ->
      // latest per key via the unique position: max(pos) then join back —
      // the two-step the struct-max resolves in one agg
      (oracleBinlogCte + """,
        |mx AS (SELECT gtid, CAST(count(*) AS BIGINT) AS n_ops, max(pos) AS last_pos
        |       FROM b GROUP BY gtid)
        |SELECT m.gtid, m.n_ops, m.last_pos, b.event_type AS last_op,
        |       b.size_bytes AS last_size
        |FROM mx m JOIN b ON b.gtid = m.gtid AND b.pos = m.last_pos
        |WHERE b.event_type <> 'error'""".stripMargin),
    "b18_ordering_integrity" ->
      (oracleBinlogCte + """,
        |m AS (SELECT gtid, pos,
        |             lag(pos) OVER (PARTITION BY gtid ORDER BY execute_time, pos) AS prev
        |      FROM b)
        |SELECT gtid, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN prev IS NOT NULL AND pos < prev THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_violations
        |FROM m GROUP BY 1""".stripMargin),
    "b16_txn_duration_histogram" ->
      (oracleBinlogCte + """,
        |m AS (SELECT *, epoch_us(execute_time) AS t_us FROM b),
        |g AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |                          OR t_us - lag(t_us) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_s
        |      FROM m WINDOW w AS (PARTITION BY gtid ORDER BY t_us, pos)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY gtid ORDER BY t_us, pos
        |                                 ROWS UNBOUNDED PRECEDING) AS session_id FROM g),
        |txn AS (SELECT CAST(epoch(date_trunc('second', max(execute_time)))
        |               - epoch(date_trunc('second', min(execute_time))) AS BIGINT) AS transaction_spend_time,
        |               CAST(count(*) AS BIGINT) AS n_events,
        |               CAST(sum(affected_rows) AS BIGINT) AS affected
        |        FROM s GROUP BY gtid, session_id)
        |SELECT transaction_spend_time,
        |       CAST(count(*) AS BIGINT) AS n_transactions,
        |       CAST(sum(n_events) AS BIGINT) AS total_events,
        |       CAST(sum(affected) AS BIGINT) AS total_affected_rows
        |FROM txn GROUP BY 1""".stripMargin),
    "b15_binary_decode" ->
      """SELECT event_id AS binlog_pos,
        |       epoch_ms(CAST(ts AS TIMESTAMP)) AS execute_ms,
        |       CAST(user_id AS VARCHAR) AS gtid,
        |       event_type,
        |       CAST(floor(value) AS BIGINT) AS size_bytes,
        |       (event_id % 10) + 1 AS affected_rows
        |FROM events""".stripMargin,
    "b5_mv_daily_counts" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS event_count
        |FROM events GROUP BY 1, 2""".stripMargin,
    "b6_mv_daily_table_counts" ->
      """SELECT CAST(ts AS DATE) AS day,
        |       'db' || (user_id % 4) AS "schema",
        |       't' || (event_id % 8) AS "table",
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS event_count
        |FROM events GROUP BY 1, 2, 3, 4""".stripMargin,
    "t49_share_rollup" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day,
        |                  'db' || (user_id % 4) AS "schema",
        |                  't' || (event_id % 8) AS "table",
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2, 3)
        |SELECT day, "schema", "table", n_events,
        |       CAST((1000000 * n_events)
        |              // sum(n_events) OVER (PARTITION BY day, "schema") AS BIGINT)
        |         AS table_share_ppm,
        |       CAST((1000000 * sum(n_events) OVER (PARTITION BY day, "schema"))
        |              // sum(n_events) OVER (PARTITION BY day) AS BIGINT)
        |         AS schema_share_ppm
        |FROM c""".stripMargin,
    "b27_dml_mix" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day,
        |                  'db' || (user_id % 4) AS "schema",
        |                  't' || (event_id % 8) AS "table",
        |                  event_type,
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2, 3, 4)
        |SELECT day, "schema", "table", event_type, n_events,
        |       CAST((1000000 * n_events)
        |              // sum(n_events) OVER (PARTITION BY day, "schema", "table")
        |            AS BIGINT) AS share_ppm
        |FROM c""".stripMargin,
    "b7_ingest_flatten" ->
      """SELECT CAST(event_id AS VARCHAR) AS binlog_pos,
        |       event_type,
        |       CASE WHEN CAST(props->>'k' AS INTEGER) > 50 THEN 1 ELSE 0 END AS is_ddl,
        |       date_trunc('second', CAST(ts AS TIMESTAMP)) AS execute_time_sec,
        |       CAST(ts AS TIMESTAMP) AS execute_time,
        |       CAST(user_id AS VARCHAR) AS gtid,
        |       CAST(1 AS BIGINT) AS single_statement_affected_rows,
        |       CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS single_statement_size,
        |       CAST(props->>'k' AS INTEGER) AS k
        |FROM events WHERE event_type <> 'error'""".stripMargin,
    "b8_mv_resum" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS event_count
        |FROM events GROUP BY 1, 2""".stripMargin,
    "b30_histogram_mv" ->
      // the DIRECT percentile over raw rows — the MV's daily partials must
      // re-sum to exactly this (mergeable-histogram claim); t19's oracle
      // idiom at p50/p95
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.event_type, p, min(v) AS pct_cents, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.event_type = cum.event_type
        |JOIN (VALUES (0.5), (0.95)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "t1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,
    "t2_join_topn" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_c DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "t3_broadcast_agg" ->
      """SELECT r_name, n_name,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "t4_window_topn" ->
      """SELECT c_nationkey, c_custkey,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
        |       CAST(rank AS BIGINT) AS rank
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |             row_number() OVER (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
        |      FROM customer)
        |WHERE rank <= 3""".stripMargin,
    "t5_anti_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1""".stripMargin,
    "t6_distinct_agg" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "t7_semi_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,
    "t8_set_ops" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "t9_rollup" ->
      """SELECT r_name, n_name,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "t27_unpivot" ->
      """WITH w AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |                  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |                  CAST(max(n_chars) AS BIGINT) AS max_chars
        |           FROM documents GROUP BY lang)
        |SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
        |UNION ALL SELECT lang, 'total_chars', total_chars FROM w
        |UNION ALL SELECT lang, 'max_chars', max_chars FROM w""".stripMargin,
    "t26_outer_join" ->
      """SELECT r_name, CAST(count(n_name) AS BIGINT) AS n_a_nations
        |FROM region
        |LEFT JOIN (SELECT * FROM nation WHERE n_name LIKE 'A%') n
        |  ON r_regionkey = n_regionkey
        |GROUP BY r_name""".stripMargin,
    "t24_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin,
    "t10_in_subquery" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY 1""".stripMargin,
    "t13_having" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer GROUP BY 1 HAVING count(*) >= 20""".stripMargin,
    "t14_case_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    "t15_cube" ->
      """SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin,
    "t38_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "t16_above_avg" ->
      """WITH c AS (SELECT c_nationkey,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
        |           FROM customer),
        |n AS (SELECT c_nationkey, sum(acctbal_c) AS s, count(*) AS cnt
        |      FROM c GROUP BY 1)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_above
        |FROM c JOIN n ON c.c_nationkey = n.c_nationkey
        |WHERE c.acctbal_c * n.cnt > n.s
        |GROUP BY 1""".stripMargin,
    "t17_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "t22_event_gaps" ->
      // ns→µs truncation (CAST ts AS TIMESTAMP) matches Tables.events'
      // `ts div 1000`; (us, event_id) is the same total order both engines
      // lag over, and all aggregates are integer µs
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |                epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (SELECT event_type,
        |             us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |      FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
        |       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
        |FROM g WHERE gap_us IS NOT NULL GROUP BY event_type""".stripMargin,
    // the salted (key, salt) join is result-identical to the plain inner
    // join — the oracle is the unsalted formulation
    "t20_salted_join" ->
      """SELECT c.c_mktsegment, e.event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(e.value_cents) AS BIGINT) AS cents
        |FROM (SELECT user_id, event_type,
        |             CAST(round(value * 100) AS BIGINT) AS value_cents
        |      FROM events) e
        |JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2""".stripMargin,
    "t21_sql_surface" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1)
         |SELECT d.doc_id,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         [CAST(unicode(c) AS BIGINT) for c in string_split(d.text, '') if c <> '']),
         |         (a, c) -> (a * 131 + c) % 2147483647) AS text_id,
         |       coalesce(cnt.n, CAST(0 AS BIGINT)) AS n_shingles
         |FROM documents d LEFT JOIN cnt ON cnt.doc_id = d.doc_id""".stripMargin
    },
    "t19_percentiles" ->
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.event_type, p, min(v) AS pct_cents, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.event_type = cum.event_type
        |JOIN (VALUES (0.5), (0.9), (0.99)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "t48_ltv_deciles" ->
      // identical bounds (lower-percentile thresholds at .1….9 over the
      // spend histogram), identical strictly-greater bucket rule
      """WITH sp AS (SELECT o_custkey,
        |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |            FROM orders GROUP BY 1),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM sp GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h),
        |bnd AS (SELECT p, min(v) AS b
        |        FROM cum, t,
        |             (VALUES (0.1), (0.2), (0.3), (0.4), (0.5),
        |                     (0.6), (0.7), (0.8), (0.9)) ps(p)
        |        WHERE cum >= ceil(p * n) GROUP BY p)
        |SELECT CAST(1 + (SELECT count(*) FROM bnd WHERE sp.v > bnd.b) AS BIGINT) AS decile,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(v) AS BIGINT) AS sum_v
        |FROM sp GROUP BY 1""".stripMargin,
    "x45_curriculum" ->
      // same decile thresholds over token counts, same multiplicative
      // hash, positions = dense rank over (band·2³² + hash, doc_id)
      """WITH tkn AS (SELECT doc_id,
        |               CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |h AS (SELECT n AS v, CAST(count(*) AS BIGINT) AS c FROM tkn GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h),
        |bnd AS (SELECT p, min(v) AS b
        |        FROM cum, t,
        |             (VALUES (0.1), (0.2), (0.3), (0.4), (0.5),
        |                     (0.6), (0.7), (0.8), (0.9)) ps(p)
        |        WHERE cum >= ceil(p * n) GROUP BY p),
        |banded AS (SELECT doc_id,
        |                  1 + (SELECT count(*) FROM bnd WHERE tkn.n > bnd.b) AS band
        |           FROM tkn),
        |keyed AS (SELECT doc_id, band,
        |                 band * 4294967296 +
        |                   ((doc_id % 2147483647) * (2654435761 % 2147483647)) % 2147483647 AS k
        |          FROM banded)
        |SELECT doc_id, CAST(band AS BIGINT) AS band,
        |       CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS curriculum_pos
        |FROM keyed""".stripMargin,
    "t44_mad" ->
      // two lower-median passes over integer histograms (t19's machinery
      // applied to values, then to |x − median|)
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h),
        |med AS (SELECT cum.event_type, min(v) AS med
        |        FROM cum JOIN t ON t.event_type = cum.event_type
        |        WHERE cum >= ceil(0.5 * n) GROUP BY 1),
        |d AS (SELECT v.event_type, med, abs(v.v - med) AS d
        |      FROM v JOIN med ON med.event_type = v.event_type),
        |hd AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
        |td AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM hd GROUP BY 1),
        |cumd AS (SELECT event_type, d,
        |                CAST(sum(c) OVER (PARTITION BY event_type ORDER BY d
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |         FROM hd)
        |SELECT cumd.event_type, min(med.med) AS median, min(d) AS mad_cents,
        |       CAST(min(n) AS BIGINT) AS n_rows
        |FROM cumd
        |JOIN td ON td.event_type = cumd.event_type
        |JOIN med ON med.event_type = cumd.event_type
        |WHERE cum >= ceil(0.5 * n)
        |GROUP BY 1""".stripMargin,
    "x27_length_percentiles" ->
      """WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT lang, v,
        |               CAST(sum(c) OVER (PARTITION BY lang ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.lang, p, min(v) AS pct_chars, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.lang = cum.lang
        |JOIN (VALUES (0.5), (0.9), (0.99)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "t11_cast_order_topk" ->
      """SELECT CAST(event_id AS VARCHAR) AS binlog_pos,
        |       event_id AS pos_num,
        |       CAST(user_id AS VARCHAR) AS gtid
        |FROM events
        |ORDER BY event_id ASC, CAST(user_id AS VARCHAR) ASC
        |LIMIT 100""".stripMargin,
    "t12_asof_join" ->
      """SELECT event_id, user_id,
        |       (SELECT o_orderkey FROM orders
        |        WHERE o_custkey = e.user_id AND o_orderdate <= CAST(e.ts AS TIMESTAMP)
        |        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) AS last_orderkey
        |FROM events e""".stripMargin,
    "t45_asof_nearest" ->
      // nearest by |Δt|; equal distances prefer backward; backward ties →
      // larger orderkey (the asOf contract), forward ties → smaller
      """SELECT event_id, user_id,
        |       (SELECT o_orderkey FROM orders o
        |        WHERE o.o_custkey = e.user_id
        |        ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(CAST(e.ts AS TIMESTAMP))) ASC,
        |                 CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP) THEN 0 ELSE 1 END ASC,
        |                 CASE WHEN o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        |                      THEN -o_orderkey ELSE o_orderkey END ASC
        |        LIMIT 1) AS nearest_orderkey
        |FROM events e""".stripMargin,
    "t39_asof_tolerance" ->
      // the within-window most-recent IS the unbounded most-recent when it
      // clears the window (any other row is older) — both forms agree
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vt
        |      FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id,
        |       (SELECT view_id FROM v
        |        WHERE v.user_id = c.user_id AND v.vt <= c.t
        |          AND v.vt >= c.t - INTERVAL 6 HOUR
        |        ORDER BY v.vt DESC, view_id DESC LIMIT 1) AS attributed_view
        |FROM c""".stripMargin,
    "t18_band_join" ->
      // the oracle takes the brute form (DuckDB's IEJoin handles the range
      // predicate); Spark takes the binned equi-join — same pair set
      """WITH d AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS t, event_type FROM events
        |           WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-05'),
        |a AS (SELECT event_id AS a_id, t AS a_t FROM d WHERE event_type = 'click'),
        |b AS (SELECT event_id AS b_id, t AS b_t FROM d WHERE event_type = 'view')
        |SELECT a_id, b_id FROM a, b
        |WHERE abs(epoch_us(a_t) - epoch_us(b_t)) <= 3600000000""".stripMargin,
    "b9_retention_window" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >=
        |      (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAY
        |GROUP BY 1""".stripMargin,
    "b10_enum_roundtrip" ->
      """SELECT event_id, event_type,
        |       CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 WHEN 'error' THEN 5 END AS type_id,
        |       event_type AS type_name,
        |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS event_time_str
        |FROM events""".stripMargin,
    "b11_sliding_counts" ->
      """SELECT make_timestamp(CAST(s AS BIGINT) * 1000000) AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT unnest([CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT),
        |                     CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 - 300 AS BIGINT)]) AS s,
        |             event_type
        |      FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "t50_sliding_distinct" ->
      """SELECT make_timestamp(s * 1000000) AS window_start,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT unnest([f, f - 300, f - 600]) AS s, user_id
        |      FROM (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 AS BIGINT) AS f,
        |                   user_id
        |            FROM events))
        |GROUP BY 1""".stripMargin,
    "t29_range_frames" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |                      CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num FROM daily)
        |SELECT event_type, day, n_events,
        |       CAST(sum(n_events) OVER w AS BIGINT) AS sum7_cal,
        |       CAST(count(*) OVER w AS BIGINT) AS days_observed
        |FROM d2
        |WINDOW w AS (PARTITION BY event_type ORDER BY day_num
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "t31_zorder_key" ->
      s"""SELECT p_partkey, x, y,
         |       ${graft.operators.ZOrder.zValueSql("x", "y")} AS z
         |FROM (SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
         |             p_partkey % 4096 AS y FROM part)
         |ORDER BY z, p_partkey LIMIT 100""".stripMargin,
    "t32_pagerank" ->
      s"""SELECT node, CAST(round(rank * 1e9) AS BIGINT) AS rank_ppb FROM (
         |${graft.operators.Graph.pageRankSql(
             "SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem",
             iterations = 5)})""".stripMargin,
    // HAND-INDEPENDENT oracle, algorithm-independent of
    // Graph.triangleCounts: the Spark side orients edges by (degree, id)
    // and closes wedges from the low-degree endpoint; this SQL never
    // computes a degree — it enumerates each triangle exactly once as
    // x < y < z via the naive ordered 3-way self-join over the distinct
    // undirected edge set (e1=(x,y), e2=(y,z), e3=(x,z)). An orientation
    // bug on the Spark side (wrong tie-break, wedge double-count) cannot
    // reproduce here.
    "t40_triangles" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_shipdate >= DATE '1995-01-01'
        |              AND l_shipdate < DATE '1996-01-01'),
        |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1
        |        JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT x AS node FROM tri
        |            UNION ALL SELECT y FROM tri
        |            UNION ALL SELECT z FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |FROM corners GROUP BY node""".stripMargin,
    "t42_kcore" ->
      // HAND-INDEPENDENT oracle (round-5 verdict #4, the t53/t56
      // discipline): peeling authored directly here, NOT Graph.kCoreSql's
      // generated unroll — and structurally different: the edge list stays
      // UNDIRECTED (src < dst, never symmetrized) and degrees count both
      // endpoints via UNION ALL, where the Spark side duplicates edges in
      // both directions and counts per src. An algorithmic
      // misunderstanding in the shared formulation cannot pass both sides.
      oracleKcorePeel(
        """SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          |FROM (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') a
          |JOIN (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') b
          |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin,
        k = 3, rounds = 8),
    "t52_label_prop" ->
      // HAND-INDEPENDENT oracle (see oracleLpaRounds): two-step
      // max-count / min-label argmax instead of the shared integer
      // encoding
      oracleLpaRounds(
        """SELECT a.l_partkey AS src, b.l_partkey AS dst
          |FROM (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') a
          |JOIN (SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
          |        AND l_shipdate < DATE '1996-01-01') b
          |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin,
        rounds = 4),
    "t55_sssp" ->
      // HAND-INDEPENDENT oracle (round-5 verdict #4): a recursive CTE with
      // min-aggregation authored directly here — NOT Graph.ssspDistancesSql's
      // unrolled Bellman–Ford. The recursive member enumerates weighted
      // walks of ≤ 4 edges under UNION (set) dedup of (node, dist, hops)
      // states; min(dist) per node over all enumerated walks ≡ 4 relaxation
      // rounds, by the ≤-r-edge-walk characterization of Bellman–Ford —
      // the same result through a different algorithmic expression
      """WITH RECURSIVE yr AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'),
        |wedges AS (
        |  SELECT src, dst, 1000000 // cnt AS w FROM (
        |    SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS BIGINT) AS cnt
        |    FROM yr a JOIN yr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |    GROUP BY 1, 2)),
        |sym AS (SELECT src, dst, w FROM wedges UNION SELECT dst, src, w FROM wedges),
        |walk(node, dist, hops) AS (
        |  SELECT p_partkey, CAST(0 AS BIGINT), 0 FROM part WHERE p_size = 50
        |  UNION
        |  SELECT s.dst, wk.dist + s.w, wk.hops + 1
        |  FROM walk wk JOIN sym s ON s.src = wk.node
        |  WHERE wk.hops < 4)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node""".stripMargin,
    "t53_bfs_reach" ->
      // HAND-INDEPENDENT oracle (round-4 verdict #4): a recursive CTE
      // authored directly here — NOT generated by Graph.scala's unrolled
      // SQL — so the BFS result is checked against an independently
      // expressed algorithm, not a same-module translation. The recursive
      // member uses UNION (set) semantics, so the working set per step is
      // the newly discovered (node, dist) pairs — each node appears at
      // most once per level (≤ 5 rows/node total), never one row per path
      """WITH RECURSIVE yr AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'),
        |edges AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM yr a JOIN yr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |walk(node, dist) AS (
        |  SELECT p_partkey, 0 FROM part WHERE p_size = 50
        |  UNION
        |  SELECT s.dst, w.dist + 1
        |  FROM walk w JOIN sym s ON s.src = w.node
        |  WHERE w.dist < 4)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node""".stripMargin,
    "t43_tree_paths" ->
      // HAND-INDEPENDENT oracle (the t53/t55/t42 discipline, taken
      // further): for THIS forest (parent = key div 10) root and depth
      // have a CLOSED FORM — root is the leading decimal digit, depth is
      // digits−1 — so the pointer-doubling walk is checked against pure
      // digit algebra, sharing no algorithmic structure at all with
      // either the Spark side or Graph.treePathsSql's recursive chase
      // `//` against a DOUBLE divisor is plain double division in DuckDB —
      // the power must become a BIGINT before the floor-div or 150//100.0
      // reads 1.5 and the cast rounds it to 2
      """SELECT p_partkey AS node,
        |       p_partkey // CAST(power(10, length(CAST(p_partkey AS VARCHAR)) - 1)
        |         AS BIGINT) AS root_key,
        |       CAST(length(CAST(p_partkey AS VARCHAR)) - 1 AS BIGINT) AS depth
        |FROM part""".stripMargin,
    "m8_frame_jaccard" ->
      // the frame-set front-end + the shared df-capped Jaccard tail —
      // mirrors Multimodal.frameSignatures → Dedup.jaccardPairsFromShingles
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id,
         |         md5(substring(text, CAST(i * 100 + 1 AS INT), 100)) AS shingle_id
         |  FROM documents, UNNEST(range(0, (length(text) - 1) // 100 + 1)) AS r(i)
         |  WHERE text IS NOT NULL AND length(text) > 0),
         |${oracleJaccardTail(0.5)}
         |SELECT doc_a, doc_b, n_common, jaccard FROM jpairs""".stripMargin,
    "m4_dup_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         md5(substring(text, CAST(i * 100 + 1 AS INT), 100)) AS frame_md5
        |  FROM documents, UNNEST(range(0, (length(text) - 1) // 100 + 1)) AS r(i)
        |  WHERE text IS NOT NULL AND length(text) > 0)
        |SELECT frame_md5, CAST(count(*) AS BIGINT) AS n_copies,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       min(doc_id) AS first_doc
        |FROM f GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "t37_approx_pct_checked" ->
      """WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.event_type, p, min(v) AS pct_cents, CAST(min(n) AS BIGINT) AS n_rows,
        |       TRUE AS sketch_ok
        |FROM cum
        |JOIN t ON t.event_type = cum.event_type
        |JOIN (VALUES (0.5), (0.95)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "x33_bm25_search" -> oracleBm25,
    "x58_bm25_served" -> oracleBm25,
    "x55_hybrid_rrf" ->
      // x33's BM25 CTEs verbatim for the lexical list, the s1-style
      // normalized-cosine window for the vector list, then ALL-INTEGER
      // fusion: ⌊10⁹/(60+rank)⌋ points per list, summed, ties to the
      // smaller doc_id — no float enters the fusion on either engine
      s"""WITH q(query_id, term) AS (VALUES
         |  (0, 'hash'), (0, 'join'), (0, 'batch'),
         |  (1, 'vector'), (1, 'scan'), (1, 'filter'),
         |  (2, 'window'), (2, 'agg'), (2, 'order')),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |p AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
         |l AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len FROM p GROUP BY 1),
         |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len) AS avglen FROM l),
         |lex AS (SELECT query_id, doc_id, rank FROM (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY score_ppm DESC, doc_id ASC) AS rank
         |  FROM (
         |    SELECT CAST(q.query_id AS BIGINT) AS query_id, p.doc_id,
         |           CAST(round(1e6 * sum(ln((st.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
         |             (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * l.len / st.avglen))))
         |             AS BIGINT) AS score_ppm
         |    FROM p JOIN q ON p.term = q.term JOIN d ON d.term = p.term
         |      JOIN l ON l.doc_id = p.doc_id CROSS JOIN st
         |    GROUP BY 1, 2))
         |  WHERE rank <= 10),
         |$oracleEmbCte,
         |qv AS (SELECT vec_id AS query_id, v AS qvec FROM e WHERE vec_id < 3),
         |vec AS (SELECT query_id, doc_id, rank FROM (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY sim DESC, doc_id ASC) AS rank
         |  FROM (SELECT qv.query_id, e.vec_id AS doc_id,
         |               ${oracleCos("qv.qvec", "e.v")} AS sim
         |        FROM qv, e WHERE e.vec_id <> qv.query_id))
         |  WHERE rank <= 10),
         |u AS (SELECT query_id, doc_id, 1000000000 // (60 + rank) AS pts FROM lex
         |      UNION ALL
         |      SELECT query_id, doc_id, 1000000000 // (60 + rank) FROM vec),
         |f AS (SELECT query_id, doc_id, CAST(sum(pts) AS BIGINT) AS rrf_score
         |      FROM u WHERE doc_id <> query_id GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf_score, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT query_id, doc_id, rrf_score,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY rrf_score DESC, doc_id ASC) AS rank
         |  FROM f)
         |WHERE rank <= 5""".stripMargin,
    "x56_dsir_weights" ->
      // the feature key is the null-free (in_v, token-or-'') pair; the
      // per-token weight is ONE log2 of a ratio of exact-integer products
      // (< 2^53 — exact in double on both engines), micro-bit rounded
      """WITH tok AS (SELECT d.doc_id,
        |                    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_t,
        |                    unnest(string_split(d.text, ' ')) AS token
        |             FROM documents d),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |v AS (SELECT token FROM c ORDER BY c DESC, token ASC LIMIT 1000),
        |m AS (SELECT tok.doc_id, tok.is_t,
        |             CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS in_v,
        |             CASE WHEN v.token IS NULL THEN '' ELSE tok.token END AS ftok
        |      FROM tok LEFT JOIN v ON v.token = tok.token),
        |model AS (SELECT in_v, ftok, CAST(sum(is_t) AS BIGINT) AS ct,
        |                 CAST(count(*) AS BIGINT) AS cr
        |          FROM m GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
        |               CAST(sum(cr) AS BIGINT) AS tr FROM model)
        |SELECT m.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(round(1e6 * sum(log2(((model.ct + 1) * (tot.tr + 1001)) /
        |              CAST((model.cr + 1) * (tot.tt + 1001) AS DOUBLE))) / count(*))
        |            AS BIGINT) AS dsir_ubits
        |FROM m JOIN model USING (in_v, ftok) CROSS JOIN tot
        |GROUP BY m.doc_id""".stripMargin,
    "x57_ppl_buckets" ->
      // the NAIVE per-lang row_number form — the Spark side's two-level
      // band decomposition must reproduce these ranks exactly (the b29
      // discipline: the naive form IS the oracle)
      """WITH cs AS (SELECT doc_id, string_split(text, '') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS c1, unnest(t[2:len(t)]) AS c2
        |       FROM cs WHERE len(t) >= 2),
        |bgf AS (SELECT * FROM bg WHERE c1 <> '' AND c2 <> ''),
        |pair AS (SELECT c1, c2, CAST(count(*) AS BIGINT) AS c12 FROM bgf GROUP BY 1, 2),
        |uni AS (SELECT c1, CAST(sum(c12) AS BIGINT) AS c1n FROM pair GROUP BY 1),
        |scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |                  CAST(round(1e6 * sum(-log2(c12 / c1n)) / count(*)) AS BIGINT) AS xent_ubits
        |           FROM bgf JOIN pair USING (c1, c2) JOIN uni USING (c1)
        |           GROUP BY doc_id),
        |r AS (SELECT d.lang, s.n_bigrams, s.xent_ubits,
        |             row_number() OVER (PARTITION BY d.lang
        |               ORDER BY s.xent_ubits, s.doc_id) AS rn,
        |             count(*) OVER (PARTITION BY d.lang) AS n
        |      FROM scored s JOIN documents d USING (doc_id))
        |SELECT lang, CAST((3 * (rn - 1)) // n AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
        |       CAST(min(xent_ubits) AS BIGINT) AS lo_ubits,
        |       CAST(max(xent_ubits) AS BIGINT) AS hi_ubits
        |FROM r GROUP BY 1, 2""".stripMargin,
    "x59_quality_length_corr" ->
      // the NAIVE per-source window form (the b29/x57 discipline: the
      // naive form IS the oracle, so the banded decomposition is attested
      // rank-exact); ρ is one float expression over exact integer ranks
      """WITH t AS (SELECT doc_id, source, n_chars,
        |                  (1000000 * CAST(len(list_filter(string_split(text, ' '),
        |                     s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT))
        |                    // len(string_split(text, ' ')) AS q_ppm
        |           FROM documents),
        |r AS (SELECT source,
        |             row_number() OVER (PARTITION BY source ORDER BY q_ppm, doc_id) AS rq,
        |             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rl,
        |             count(*) OVER (PARTITION BY source) AS n
        |      FROM t)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |       CAST(sum((rq - rl) * (rq - rl)) AS BIGINT) AS sum_d2,
        |       CAST(round(1e6 * (1 - 6.0 * sum((rq - rl) * (rq - rl)) /
        |            (CAST(n AS DOUBLE) * (n * n - 1)))) AS BIGINT) AS spearman_ppm
        |FROM r WHERE n >= 2 GROUP BY source, n""".stripMargin,
    "x60_retrieval_eval" ->
      // d38's truth chain (top-1 by the shared integer-ppm Jaccard) LEFT
      // JOINed to the x33 BM25 ranking with the query doc's own distinct
      // tokens as the query and self excluded; BM25 CTEs renamed (btok/bp/
      // bl/bd/bst) to dodge the jaccard chain's names
      s"""WITH $oracleJaccardCtes,
         |qi AS (SELECT doc_id AS query_id, shingle_id FROM idx WHERE doc_id % 7 = 0),
         |dcand AS (SELECT DISTINCT qi.query_id, idx.doc_id AS neighbor_id
         |          FROM qi JOIN idx ON idx.shingle_id = qi.shingle_id
         |           AND idx.doc_id <> qi.query_id),
         |dint AS (SELECT query_id, neighbor_id, CAST(count(*) AS BIGINT) AS n_common
         |         FROM dcand
         |         JOIN sh a ON a.doc_id = query_id
         |         JOIN sh b ON b.doc_id = neighbor_id AND b.shingle_id = a.shingle_id
         |         GROUP BY 1, 2),
         |dsc AS (SELECT query_id, neighbor_id, n_common,
         |               CAST((n_common * 1000000) // (sa.n + sb.n - n_common) AS BIGINT) AS sim_ppm
         |        FROM dint JOIN sizes sa ON sa.doc_id = query_id
         |                  JOIN sizes sb ON sb.doc_id = neighbor_id),
         |truth AS (SELECT query_id, neighbor_id AS truth_id, sim_ppm AS truth_sim_ppm
         |          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |                  ORDER BY sim_ppm DESC, neighbor_id ASC) AS rn FROM dsc)
         |          WHERE rn = 1),
         |btok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |bp AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM btok GROUP BY 1, 2),
         |bl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len FROM bp GROUP BY 1),
         |bd AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bp GROUP BY 1),
         |bst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len) AS avglen FROM bl),
         |q AS (SELECT DISTINCT query_id, term FROM (
         |        SELECT doc_id AS query_id, unnest(string_split(text, ' ')) AS term
         |        FROM documents WHERE doc_id % 7 = 0)),
         |sc AS (SELECT q.query_id, bp.doc_id,
         |              CAST(round(1e6 * sum(ln((bst.n_docs - bd.df + 0.5) / (bd.df + 0.5) + 1.0) *
         |                (bp.tf * 2.2) / (bp.tf + 1.2 * (0.25 + 0.75 * bl.len / bst.avglen))))
         |                AS BIGINT) AS score_ppm
         |       FROM bp JOIN q ON bp.term = q.term JOIN bd ON bd.term = bp.term
         |         JOIN bl ON bl.doc_id = bp.doc_id CROSS JOIN bst
         |       WHERE bp.doc_id <> q.query_id
         |       GROUP BY 1, 2),
         |rk AS (SELECT query_id, doc_id, rn FROM (
         |         SELECT query_id, doc_id,
         |                row_number() OVER (PARTITION BY query_id
         |                  ORDER BY score_ppm DESC, doc_id ASC) AS rn
         |         FROM sc)
         |       WHERE rn <= 10)
         |SELECT t.query_id, t.truth_id, t.truth_sim_ppm,
         |       CAST(coalesce(rk.rn, 0) AS BIGINT) AS bm25_rank
         |FROM truth t LEFT JOIN rk
         |  ON rk.query_id = t.query_id AND rk.doc_id = t.truth_id""".stripMargin,
    "x61_budget_waterfill" ->
      // the same piecewise-linear solve: max over valid segment
      // candidates = the waterfilling level (rows past the crossing
      // always produce smaller candidates — see the op's scaladoc proof
      // sketch); spill goes to the r largest capped sources
      """WITH ps AS (SELECT source,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |            FROM documents GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ps),
        |seg AS (SELECT source, n_tokens,
        |               CAST(coalesce(sum(n_tokens) OVER w, 0) AS BIGINT) AS prefix_below,
        |               CAST(count(*) OVER w AS BIGINT) AS k
        |        FROM ps WINDOW w AS (ORDER BY n_tokens ASC, source ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |lv AS (SELECT max((20000 - prefix_below) // (mm.m - k)) AS level
        |       FROM seg CROSS JOIN mm
        |       WHERE (20000 - prefix_below) // (mm.m - k) < n_tokens),
        |al AS (SELECT ps.source, ps.n_tokens, lv.level AS lvl,
        |              least(ps.n_tokens,
        |                coalesce(lv.level, 9223372036854775807)) AS base
        |       FROM ps CROSS JOIN lv),
        |sp AS (SELECT 20000 - sum(base) AS r FROM al),
        |rk AS (SELECT al.*, row_number() OVER (ORDER BY n_tokens DESC, source ASC) AS rk
        |       FROM al)
        |SELECT rk.source, rk.n_tokens, CAST(rk.lvl AS BIGINT) AS level,
        |       CAST(rk.base + CASE WHEN rk.n_tokens >
        |              coalesce(rk.lvl, 9223372036854775807)
        |             AND rk.rk <= greatest(least(sp.r, mm.m), 0)
        |            THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
        |FROM rk CROSS JOIN sp CROSS JOIN mm""".stripMargin,
    "x32_heavy_hitters_checked" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT term, n, TRUE AS sketch_ok
        |FROM c, t WHERE n > 0.001 * total""".stripMargin,
    "b19_window_funnel" ->
      """WITH s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |            FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(s1.t1) AS t1, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |         AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 604800 SECOND
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(s2.t1) AS t1, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |         AND CAST(e.ts AS TIMESTAMP) <= s2.t1 + INTERVAL 604800 SECOND
        |       GROUP BY 1),
        |lv AS (SELECT user_id, 1 AS level FROM s1
        |       UNION ALL SELECT user_id, 2 FROM s2
        |       UNION ALL SELECT user_id, 3 FROM s3)
        |SELECT CAST(level AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_users
        |FROM (SELECT user_id, max(level) AS level FROM lv GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "b20_cohort_retention" ->
      """WITH fs AS (SELECT user_id,
        |              min(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
        |            FROM events GROUP BY 1),
        |aw AS (SELECT DISTINCT user_id,
        |              date_trunc('week', CAST(ts AS TIMESTAMP)) AS active_week
        |       FROM events)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
        |       CAST(datediff('day', cohort_week, active_week) // 7 AS BIGINT) AS week_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM aw JOIN fs USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "b22_peak_concurrency" ->
      // b12's sessions → ±1 boundary deltas netted per timestamp (half-open
      // [start, end): concurrency AT t is prev + net) → running sum →
      // per-day max; the oracle's global window is our three-level scan
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT user_id, t,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |sess AS (SELECT user_id, min(t) AS st, max(t) + INTERVAL 30 MINUTE AS en
        |         FROM s GROUP BY user_id, sid),
        |pts AS (SELECT st AS t, 1 AS delta FROM sess
        |        UNION ALL SELECT en, -1 FROM sess),
        |byts AS (SELECT t, sum(delta) AS net,
        |                sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS starts,
        |                sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS ends
        |         FROM pts GROUP BY t),
        |run AS (SELECT t, starts, ends,
        |               sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS open_after
        |        FROM byts)
        |SELECT CAST(t AS DATE) AS day,
        |       CAST(max(open_after) AS BIGINT) AS peak_concurrent,
        |       CAST(sum(starts) AS BIGINT) AS sessions_started,
        |       CAST(sum(ends) AS BIGINT) AS sessions_ended
        |FROM run GROUP BY 1""".stripMargin,
    "b23_transition_matrix" ->
      """WITH p AS (SELECT event_type AS from_type,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |           FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
        |       CAST((1000000 * n) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
        |FROM c""".stripMargin,
    "t47_session_paths" ->
      // lag-based sessionization (the b12 split rule), trigrams via two
      // leads on the same in-session order, deterministic top-20
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |                       OR t - lag(t) OVER w >= INTERVAL 30 MINUTE
        |                     THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |tri AS (SELECT event_type AS step1,
        |               lead(event_type, 1) OVER w2 AS step2,
        |               lead(event_type, 2) OVER w2 AS step3
        |        FROM s WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY t, event_id))
        |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
        |FROM tri WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
        |LIMIT 20""".stripMargin,
    "b25_hourly_profile" ->
      """WITH h AS (SELECT event_type,
        |                  CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, hour, n_events,
        |             row_number() OVER (PARTITION BY event_type
        |               ORDER BY n_events DESC, hour ASC) AS rn,
        |             sum(n_events) OVER (PARTITION BY event_type) AS total
        |      FROM h)
        |SELECT event_type, hour AS peak_hour, n_events AS peak_events,
        |       CAST(total AS BIGINT) AS total_events
        |FROM r WHERE rn = 1""".stripMargin,
    "b24_new_users" ->
      """WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
        |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM fs GROUP BY 1),
        |ac AS (SELECT CAST(ts AS DATE) AS day,
        |              CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |       FROM events GROUP BY 1)
        |SELECT ac.day, active_users, coalesce(new_users, 0) AS new_users,
        |       CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY ac.day
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM ac LEFT JOIN nu ON nu.day = ac.day""".stripMargin,
    "b26_props_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |       CAST(sum(v) AS BIGINT) AS sum_v,
        |       CAST(min(v) AS BIGINT) AS min_v,
        |       CAST(max(v) AS BIGINT) AS max_v
        |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS v FROM events)
        |GROUP BY 1""".stripMargin,
    "t35_correlated_scalar" ->
      """SELECT n_nationkey, n_name,
        |       coalesce((SELECT CAST(round(max(c_acctbal) * 100) AS BIGINT)
        |                 FROM customer WHERE c_nationkey = n_nationkey), -1) AS max_bal_c
        |FROM nation""".stripMargin,
    "t36_offset_windows" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       lag(event_type, 1) OVER w AS prev_type,
        |       lead(event_type, 1) OVER w AS next_type,
        |       first_value(event_type) OVER w AS first_type,
        |       nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)""".stripMargin,
    "t33_full_outer" ->
      """WITH p AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |                  CAST(count(*) AS BIGINT) AS n_purchases
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |             CAST(count(*) AS BIGINT) AS n_errors
        |      FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT coalesce(p.hour, e.hour) AS hour,
        |       coalesce(n_purchases, 0) AS n_purchases,
        |       coalesce(n_errors, 0) AS n_errors
        |FROM p FULL OUTER JOIN e ON p.hour = e.hour""".stripMargin,
    "t34_rank_family" ->
      """SELECT c_custkey, c_nationkey,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin,
    "x31_char_lm_score" ->
      """WITH cs AS (SELECT doc_id, string_split(text, '') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS c1, unnest(t[2:len(t)]) AS c2
        |       FROM cs WHERE len(t) >= 2),
        |bgf AS (SELECT * FROM bg WHERE c1 <> '' AND c2 <> ''),
        |pair AS (SELECT c1, c2, CAST(count(*) AS BIGINT) AS c12 FROM bgf GROUP BY 1, 2),
        |uni AS (SELECT c1, CAST(sum(c12) AS BIGINT) AS c1n FROM pair GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(round(1e6 * sum(-log2(c12 / c1n)) / count(*)) AS BIGINT) AS xent_ubits
        |FROM bgf JOIN pair USING (c1, c2) JOIN uni USING (c1)
        |GROUP BY doc_id""".stripMargin,
    "x30_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |       FROM ch WHERE ch <> '' GROUP BY 1, 2),
        |e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        |             CAST(count(*) AS BIGINT) AS n_distinct,
        |             sum(c * log2(c)) AS s
        |      FROM cc GROUP BY 1)
        |SELECT doc_id, n_chars, n_distinct,
        |       CAST(round(1e6 * (log2(n_chars) - s / n_chars)) AS BIGINT) AS entropy_ubits
        |FROM e""".stripMargin,
    "x37_cdc_chunks" -> oracleCdcChunksSql,
    "d31_cdc_dedup" ->
      // same chunk frame, rolled up per source; same-digest chunks have
      // equal length, so max(chunk_len) per digest is exact
      s"""WITH c AS (SELECT * FROM ($oracleCdcChunksSql)),
         |j AS (SELECT c.chunk_md5, c.chunk_len, d.source
         |      FROM c JOIN documents d USING (doc_id)),
         |pd AS (SELECT source, chunk_md5, count(*) AS n_copies,
         |              max(chunk_len) AS chunk_len
         |       FROM j GROUP BY 1, 2)
         |SELECT source,
         |       CAST(sum(n_copies) AS BIGINT) AS n_chunks,
         |       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
         |       CAST(sum(chunk_len * n_copies) AS BIGINT) AS chars_total,
         |       CAST(sum(chunk_len) AS BIGINT) AS chars_distinct,
         |       CAST(round(1e6 * (sum(chunk_len * n_copies) - sum(chunk_len))
         |                  / sum(chunk_len * n_copies)) AS BIGINT) AS saved_ppm
         |FROM pd GROUP BY 1""".stripMargin,
    "d32_dup_spans" ->
      // same positional 5-gram fold as d26's psh CTE; duplicated = ≥2
      // distinct docs; islands via cummax interval merge (identical window
      // semantics both engines); ppm by integer division
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |psh AS (SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens, i - 1 AS p,
         |               list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                           (a, t) -> (a * 37 + t + 1) % 2147483647) AS sid
         |        FROM ids, UNNEST(range(1, len(ids) - 3)) AS r(i)
         |        WHERE len(ids) >= 5),
         |dup AS (SELECT sid FROM psh GROUP BY sid HAVING count(DISTINCT doc_id) >= 2),
         |hit AS (SELECT doc_id, n_tokens, p, p + 4 AS e FROM psh
         |        WHERE sid IN (SELECT sid FROM dup)),
         |fl AS (SELECT doc_id, n_tokens, p, e,
         |              max(e) OVER (PARTITION BY doc_id ORDER BY p
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
         |       FROM hit),
         |sp AS (SELECT doc_id, n_tokens, p, e,
         |              sum(CASE WHEN prev_e IS NULL OR p > prev_e + 1 THEN 1 ELSE 0 END)
         |                OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS span_id
         |       FROM fl),
         |spans AS (SELECT doc_id, n_tokens, span_id, min(p) AS s, max(e) AS e
         |          FROM sp GROUP BY doc_id, n_tokens, span_id)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |       CAST(max(e - s + 1) AS BIGINT) AS max_span_tokens,
         |       CAST((1000000 * sum(e - s + 1)) // n_tokens AS BIGINT) AS dup_token_ppm
         |FROM spans GROUP BY doc_id, n_tokens""".stripMargin,
    "d33_span_excision" ->
      // same span derivation as d32, then: covered positions unnest from
      // the disjoint merged intervals, kept tokens reassemble in order,
      // span-free docs pass through verbatim, fully-covered docs → ''
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |psh AS (SELECT doc_id, i - 1 AS p,
         |               list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                           (a, t) -> (a * 37 + t + 1) % 2147483647) AS sid
         |        FROM ids, UNNEST(range(1, len(ids) - 3)) AS r(i)
         |        WHERE len(ids) >= 5),
         |dup AS (SELECT sid FROM psh GROUP BY sid HAVING count(DISTINCT doc_id) >= 2),
         |hit AS (SELECT doc_id, p, p + 4 AS e FROM psh
         |        WHERE sid IN (SELECT sid FROM dup)),
         |fl AS (SELECT doc_id, p, e,
         |              max(e) OVER (PARTITION BY doc_id ORDER BY p
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
         |       FROM hit),
         |sp AS (SELECT doc_id, p, e,
         |              sum(CASE WHEN prev_e IS NULL OR p > prev_e + 1 THEN 1 ELSE 0 END)
         |                OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS span_id
         |       FROM fl),
         |spans AS (SELECT doc_id, span_id, min(p) AS s, max(e) AS e
         |          FROM sp GROUP BY doc_id, span_id),
         |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans),
         |sdocs AS (SELECT DISTINCT doc_id FROM spans),
         |kept AS (SELECT t.doc_id, t.pos, t.token FROM tok t
         |         JOIN sdocs USING (doc_id)
         |         WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                           WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
         |reb AS (SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
         |               CAST(count(*) AS BIGINT) AS n_tokens_kept
         |        FROM kept GROUP BY doc_id)
         |SELECT s.doc_id, coalesce(r.clean_text, '') AS clean_text,
         |       CAST(coalesce(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
         |FROM sdocs s LEFT JOIN reb r USING (doc_id)
         |UNION ALL
         |SELECT d.doc_id, d.text AS clean_text,
         |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens_kept
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM sdocs)""".stripMargin,
    "x36_pareto_frontier" ->
      // same value-domain dominance: max y per distinct x, running
      // strict-prior max over x DESC, admit y = ymax AND y > prior
      """WITH scored AS (
        |  SELECT doc_id, n_chars,
        |         CAST(round(1e6 * CAST(len(list_filter(string_split(text, ' '),
        |                s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT)
        |              / len(string_split(text, ' '))) AS BIGINT) AS stopword_ppm
        |  FROM documents),
        |perx AS (SELECT n_chars, max(stopword_ppm) AS ymax FROM scored GROUP BY n_chars),
        |fr AS (SELECT n_chars, ymax AS stopword_ppm FROM (
        |         SELECT n_chars, ymax,
        |                max(ymax) OVER (ORDER BY n_chars DESC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        |         FROM perx)
        |       WHERE prior IS NULL OR ymax > prior)
        |SELECT s.doc_id, s.n_chars, s.stopword_ppm
        |FROM scored s JOIN fr USING (n_chars, stopword_ppm)""".stripMargin,
    "x29_collocations" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |       FROM tok WHERE len(t) >= 2),
        |cab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2),
        |ca AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
        |cb AS (SELECT w2, CAST(sum(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY 1),
        |n AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM cab)
        |SELECT w1, w2, c_ab,
        |       CAST(round(1e6 * (SELECT n FROM n) * c_ab / (c_a * c_b)) AS BIGINT) AS lift_ppm
        |FROM cab JOIN ca USING (w1) JOIN cb USING (w2)
        |WHERE c_ab >= 5
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 100""".stripMargin,
    "t30_bloom_semi" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')
        |GROUP BY 1""".stripMargin,
    "b17_table_trends" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |                      't' || (event_id % 8) AS "table",
        |                      CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1, 2)
        |SELECT "table", day, n_events,
        |       CAST(sum(n_events) OVER (PARTITION BY "table" ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
        |       CAST(sum(n_events) OVER w7 AS DOUBLE) / count(*) OVER w7 AS ma7,
        |       CAST(n_events - coalesce(lag(n_events) OVER (PARTITION BY "table" ORDER BY day), 0)
        |            AS BIGINT) AS delta
        |FROM daily
        |WINDOW w7 AS (PARTITION BY "table" ORDER BY day
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "t41_gap_fill" ->
      // daily close = max(v) at the day's max ts (the same two-step the
      // struct-max resolves); spine via end-exclusive range over [d0, d1+1)
      """WITH d0 AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, ts,
        |                   CAST(round(value * 100) AS BIGINT) AS v
        |            FROM events),
        |mx AS (SELECT event_type, day, max(ts) AS mt FROM d0 GROUP BY 1, 2),
        |daily AS (SELECT d.event_type, d.day, max(d.v) AS close_c
        |          FROM d0 d JOIN mx ON mx.event_type = d.event_type
        |                            AND mx.day = d.day AND d.ts = mx.mt
        |          GROUP BY 1, 2),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT k.event_type, CAST(g.day AS DATE) AS day
        |          FROM (SELECT DISTINCT event_type FROM daily) k,
        |               (SELECT unnest(range(lo, hi + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS day
        |                FROM span) g)
        |SELECT s.event_type, s.day,
        |       last_value(d.close_c IGNORE NULLS) OVER (
        |         PARTITION BY s.event_type ORDER BY s.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
        |       CAST(d.close_c IS NOT NULL AS INT) AS observed
        |FROM spine s LEFT JOIN daily d
        |  ON d.event_type = s.event_type AND d.day = s.day""".stripMargin,
    "t23_daily_trends" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |                      CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |       CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
        |       CAST(sum(n_events) OVER w7 AS DOUBLE) / count(*) OVER w7 AS ma7,
        |       CAST(n_events - coalesce(lag(n_events) OVER (PARTITION BY event_type ORDER BY day), 0)
        |            AS BIGINT) AS delta
        |FROM daily
        |WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "b12_session_windows" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |                    OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT user_id, t,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(t) AS session_start,
        |       max(t) + INTERVAL 30 MINUTE AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "b13_approx_distinct" ->
      // only the deterministic columns: the engine-specific HLL estimate
      // stays inside the query's assert_true bound (sketch_ok ≡ the assert
      // passed on every group — the oracle's literal true matches iff the
      // Spark side didn't raise)
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       true AS sketch_ok
        |FROM events GROUP BY 1, 2""".stripMargin,
    "b31_countmin_checked" ->
      // the count-min sketch is pure integer arithmetic over literal hash
      // constants, so — unlike b13's HLL — the ESTIMATE itself is
      // oracle-hashable: both engines build the identical 4×256 sketch
      """WITH h(r, a, b) AS (VALUES
        |  (0, 1299709, 104729), (1, 15485863, 32452843),
        |  (2, 982451653, 715225739), (3, 179424673, 373587883)),
        |cells AS (SELECT h.r, ((e.user_id * h.a + h.b) % 2147483647) % 256 AS bucket
        |          FROM events e CROSS JOIN h),
        |s AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
        |      FROM cells GROUP BY 1, 2),
        |k AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events
        |      FROM events GROUP BY 1),
        |est AS (SELECT k.key, k.n_events, CAST(min(s.c) AS BIGINT) AS cm_est
        |        FROM k CROSS JOIN h
        |        JOIN s ON s.r = h.r
        |         AND s.bucket = ((k.key * h.a + h.b) % 2147483647) % 256
        |        GROUP BY 1, 2)
        |SELECT key AS user_id, n_events, cm_est,
        |       cm_est - n_events AS overcount, TRUE AS sketch_ok
        |FROM est ORDER BY n_events DESC, user_id ASC LIMIT 20""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id,
        |       CAST(count(*) AS BIGINT) AS n_copies,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents GROUP BY text""".stripMargin,
    // d8 is the digest-first rendering of the SAME semantics — one oracle
    "d8_dedup_exact_digest" ->
      """SELECT min(doc_id) AS keep_doc_id,
        |       CAST(count(*) AS BIGINT) AS n_copies,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents GROUP BY text""".stripMargin,
    "d2_jaccard_pairs" -> oracleJaccardPairs,
    "d7_dedup_groups" -> oracleDedupGroups,
    "d23_dup_cluster_profile" ->
      s"""WITH RECURSIVE $oracleJaccardCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |walk AS (SELECT DISTINCT a AS doc_id, a AS reach FROM edges
         |         UNION
         |         SELECT w.doc_id, e.b FROM walk w JOIN edges e ON e.a = w.reach),
         |g AS (SELECT doc_id, min(reach) AS group_id FROM walk GROUP BY doc_id),
         |cl AS (SELECT group_id, CAST(count(*) AS BIGINT) AS cluster_size FROM g GROUP BY 1)
         |SELECT cluster_size,
         |       CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(count(*) * cluster_size AS BIGINT) AS n_docs,
         |       CAST(count(*) * (cluster_size - 1) AS BIGINT) AS n_deletable
         |FROM cl GROUP BY cluster_size""".stripMargin,
    // components are a property of the graph, not the algorithm: the star
    // contraction shares d7's transitive-closure oracle
    "d9_dedup_groups_star" -> oracleDedupGroups,
    "d3_minhash_sigs" -> oracleMinhashSigs,
    "d4_minhash_pairs" -> oracleMinhashPairs,
    "d26_winnow_overlap" ->
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |psh AS (SELECT doc_id, i - 1 AS p, len(ids) - 4 AS m,
         |               list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                           (a, t) -> (a * 37 + t + 1) % 2147483647) AS sid
         |        FROM ids, UNNEST(range(1, len(ids) - 3)) AS r(i)
         |        WHERE len(ids) >= 5),
         |wmin AS (SELECT doc_id, p, m,
         |                min(sid) OVER (PARTITION BY doc_id ORDER BY p
         |                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |         FROM psh),
         |sel AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE p <= m - 4),
         |rare AS (SELECT fp FROM sel GROUP BY fp
         |         HAVING count(*) > 1 AND count(*) <= ${graft.ops.Dedup.defaultMaxDf}),
         |idx AS (SELECT sel.* FROM sel JOIN rare USING (fp))
         |SELECT doc_a, doc_b, n_shared FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |WHERE n_shared >= 3""".stripMargin,
    "d25_snapshot_diff" ->
      // the oracle classifies on text equality; Spark on xxhash64 digests —
      // identical up to a 2⁻⁶⁴ collision (the d8/d14 digest contract)
      """WITH oldr AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |newr AS (SELECT doc_id,
        |                CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
        |         FROM documents WHERE doc_id >= 100),
        |j AS (SELECT o.text AS ot, n.text AS nt
        |      FROM oldr o FULL OUTER JOIN newr n ON o.doc_id = n.doc_id)
        |SELECT CASE WHEN ot IS NULL THEN 'added' WHEN nt IS NULL THEN 'removed'
        |            WHEN ot = nt THEN 'same' ELSE 'changed' END AS status,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY 1""".stripMargin,
    "d24_threshold_sweep" ->
      s"""WITH ${oracleJaccardCtesAt(0.0)}
         |SELECT CAST(floor(jaccard * 10) AS BIGINT) AS score_band,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       max(jaccard) AS max_jaccard
         |FROM jpairs GROUP BY 1""".stripMargin,
    "d21_minhash_estimate" -> {
      val cap = graft.ops.Dedup.defaultMaxDf
      val k = graft.ops.Dedup.minhashCoeffs.size
      val matchSum = (0 until k)
        .map(i => s"CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $oracleSigCtes,
         |bnd AS (
         |  $oracleBandRows),
         |cool AS (SELECT band, r0, r1 FROM (SELECT band, r0, r1, count(*) AS c
         |                                   FROM bnd GROUP BY 1, 2, 3)
         |         WHERE c <= $cap),
         |bok AS (SELECT bnd.* FROM bnd JOIN cool USING (band, r0, r1)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bok x JOIN bok y
         |         ON x.band = y.band AND x.r0 = y.r0 AND x.r1 = y.r1 AND x.doc_id < y.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |       CAST($matchSum AS DOUBLE) / $k AS est_jaccard
         |FROM cand c
         |JOIN sigs sa ON sa.doc_id = c.doc_a
         |JOIN sigs sb ON sb.doc_id = c.doc_b""".stripMargin
    },
    "d30_idf_cosine" -> {
      val cap = graft.ops.Dedup.defaultMaxDf
      s"""WITH $oracleSigCtes,
         |terms AS (SELECT doc_id, shingle_id AS token_id FROM sids),
         |w AS (SELECT token_id, CAST(floor(1000000 / count(*)) AS BIGINT) AS w
         |      FROM terms GROUP BY token_id),
         |tw AS (SELECT t.doc_id, t.token_id, w.w FROM terms t JOIN w USING (token_id)),
         |norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nsq FROM tw GROUP BY doc_id),
         |idx AS (SELECT doc_id, token_id FROM terms
         |        JOIN (SELECT token_id FROM terms GROUP BY token_id
         |              HAVING count(*) > 1 AND count(*) <= $cap) USING (token_id)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM idx x JOIN idx y
         |           ON x.token_id = y.token_id AND x.doc_id < y.doc_id),
         |dots AS (SELECT c.doc_a, c.doc_b, CAST(sum(a.w * a.w) AS BIGINT) AS dw
         |         FROM cand c
         |         JOIN tw a ON a.doc_id = c.doc_a
         |         JOIN tw b ON b.doc_id = c.doc_b AND b.token_id = a.token_id
         |         GROUP BY c.doc_a, c.doc_b),
         |scored AS (SELECT d.doc_a, d.doc_b, d.dw,
         |                  CAST(d.dw AS DOUBLE) /
         |                    (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
         |           FROM dots d
         |           JOIN norms na ON na.doc_id = d.doc_a
         |           JOIN norms nb ON nb.doc_id = d.doc_b)
         |SELECT doc_a, doc_b, dw,
         |       CAST(floor(1e6 * cosine) AS BIGINT) AS cos_ppm
         |FROM scored WHERE cosine >= 0.5""".stripMargin
    },
    "d36_band_sweep" -> {
      def confSel(b: Int): String =
        s"""SELECT CAST($b AS BIGINT) AS bands, true_pos, false_pos, false_neg,
           |       CAST(floor(1e6 * true_pos / (true_pos + false_pos)) AS BIGINT) AS precision_ppm,
           |       CAST(floor(1e6 * true_pos / (true_pos + false_neg)) AS BIGINT) AS recall_ppm
           |FROM (SELECT
           |  CAST(sum(CASE WHEN ta IS NOT NULL AND ca IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS true_pos,
           |  CAST(sum(CASE WHEN ta IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
           |  CAST(sum(CASE WHEN ca IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_neg
           |  FROM (SELECT t.doc_a AS ta, c.doc_a AS ca
           |        FROM tru t FULL OUTER JOIN c$b c
           |          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b))""".stripMargin
      s"""WITH tru AS (SELECT doc_a, doc_b FROM ($oracleJaccardPairs)),
         |c2 AS (SELECT doc_a, doc_b FROM (${oracleMinhashPairsFor(2)})),
         |c4 AS (SELECT doc_a, doc_b FROM (${oracleMinhashPairsFor(4)})),
         |c8 AS (SELECT doc_a, doc_b FROM (${oracleMinhashPairsFor(8)}))
         |${confSel(2)}
         |UNION ALL
         |${confSel(4)}
         |UNION ALL
         |${confSel(8)}""".stripMargin
    },
    "d29_lsh_confusion" ->
      // truth (d2's exact capped Jaccard) vs candidates (d4's capped
      // banding), each as its own scoped WITH subquery; ppm ratios use
      // floor (round() ties break differently across engines)
      s"""WITH tru AS (SELECT doc_a, doc_b FROM ($oracleJaccardPairs)),
         |cnd AS (SELECT doc_a, doc_b FROM ($oracleMinhashPairs)),
         |j AS (SELECT t.doc_a AS ta, c.doc_a AS ca
         |      FROM tru t FULL OUTER JOIN cnd c
         |        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
         |k AS (SELECT
         |  CAST(sum(CASE WHEN ta IS NOT NULL AND ca IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS true_pos,
         |  CAST(sum(CASE WHEN ta IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
         |  CAST(sum(CASE WHEN ca IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_neg
         |  FROM j)
         |SELECT true_pos, false_pos, false_neg,
         |       CAST(floor(1e6 * true_pos / (true_pos + false_pos)) AS BIGINT) AS precision_ppm,
         |       CAST(floor(1e6 * true_pos / (true_pos + false_neg)) AS BIGINT) AS recall_ppm
         |FROM k""".stripMargin,
    "d5_simhash" -> oracleSimhash,
    "t28_sql_simhash" -> oracleSimhash,
    "d22_simhash_pairs" -> {
      val bits = 60; val chunks = 4; val cw = bits / chunks
      val cap = graft.ops.Dedup.defaultMaxDf
      val g = s"((token_id * 2654435761 + 2538058380) % ${1L << bits})"
      val sums = (0 until bits)
        .map(b => s"sum(CASE WHEN ($g >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_$b")
        .mkString(",\n       ")
      val hash = (0 until bits)
        .map(b => s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""WITH $oracleTokCtes,
         |sums AS (SELECT doc_id,
         |       $sums
         |FROM tid GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM sums),
         |ck AS (SELECT doc_id, simhash, t.band,
         |         (simhash >> (t.band * $cw)) & ${(1L << cw) - 1} AS key
         |       FROM sh, range(0, $chunks) t(band)),
         |cool AS (SELECT band, key FROM (SELECT band, key, count(*) AS c
         |                                FROM ck GROUP BY 1, 2) WHERE c <= $cap),
         |ok AS (SELECT ck.* FROM ck JOIN cool USING (band, key)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.simhash AS ha, y.simhash AS hb
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin
    },
    "d10_neardup_keep_first" -> oracleNearDupKeepFirst,
    "d12_vector_keep_first" -> oracleVectorKeepFirst,
    "d19_cross_source_dups" ->
      s"""WITH $oracleJaccardCtes,
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT least(sa.source, sb.source) AS source_a,
         |       greatest(sa.source, sb.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM jpairs
         |JOIN src sa ON sa.doc_id = doc_a
         |JOIN src sb ON sb.doc_id = doc_b
         |GROUP BY 1, 2""".stripMargin,
    "d38_similar_docs" ->
      // same sh/sizes/idx chain as d2; per-query top-3 by the identical
      // integer-ppm score, ties to the smaller neighbor_id
      s"""WITH $oracleJaccardCtes,
         |qi AS (SELECT doc_id AS query_id, shingle_id FROM idx WHERE doc_id % 7 = 0),
         |dcand AS (SELECT DISTINCT qi.query_id, idx.doc_id AS neighbor_id
         |          FROM qi JOIN idx ON idx.shingle_id = qi.shingle_id
         |           AND idx.doc_id <> qi.query_id),
         |dint AS (SELECT query_id, neighbor_id, CAST(count(*) AS BIGINT) AS n_common
         |         FROM dcand
         |         JOIN sh a ON a.doc_id = query_id
         |         JOIN sh b ON b.doc_id = neighbor_id AND b.shingle_id = a.shingle_id
         |         GROUP BY 1, 2),
         |dsc AS (SELECT query_id, neighbor_id, n_common,
         |               CAST((n_common * 1000000) // (sa.n + sb.n - n_common) AS BIGINT) AS sim_ppm
         |        FROM dint JOIN sizes sa ON sa.doc_id = query_id
         |                  JOIN sizes sb ON sb.doc_id = neighbor_id)
         |SELECT query_id, neighbor_id, n_common, sim_ppm, CAST(rn AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim_ppm DESC, neighbor_id ASC) AS rn FROM dsc)
         |WHERE rn <= 3""".stripMargin,
    "d37_source_overlap" ->
      s"""WITH $oracleJaccardCtes,
         |ss AS (SELECT DISTINCT d.source, s.shingle_id
         |       FROM sh s JOIN documents d USING (doc_id)),
         |szs AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY 1),
         |com AS (SELECT a.source AS source_a, b.source AS source_b,
         |               CAST(count(*) AS BIGINT) AS n_common
         |        FROM ss a JOIN ss b
         |          ON a.shingle_id = b.shingle_id AND a.source < b.source
         |        GROUP BY 1, 2)
         |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_common,
         |       (1000000 * n_common) // (sa.n + sb.n - n_common) AS jaccard_ppm
         |FROM com
         |JOIN szs sa ON sa.source = source_a
         |JOIN szs sb ON sb.source = source_b""".stripMargin,
    "d18_containment_pairs" -> {
      val p = graft.ops.Dedup.minhashPrime
      val cap = graft.ops.Dedup.defaultMaxDf
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |rare AS (SELECT shingle_id FROM (SELECT shingle_id, count(*) AS c FROM sh GROUP BY 1)
         |         WHERE c > 1 AND c <= $cap),
         |idx AS (SELECT sh.* FROM sh JOIN rare USING (shingle_id)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM idx x JOIN idx y ON x.shingle_id = y.shingle_id AND x.doc_id < y.doc_id),
         |inter AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_common
         |          FROM cand
         |          JOIN sh a ON a.doc_id = doc_a
         |          JOIN sh b ON b.doc_id = doc_b AND b.shingle_id = a.shingle_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common,
         |       CAST(n_common AS DOUBLE) / least(sa.n, sb.n) AS containment
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(n_common AS DOUBLE) / least(sa.n, sb.n) >= 0.8""".stripMargin
    },
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
    "d17_incremental_vector_dedup" -> {
      val anyMatch = (0 until 4).map(t => s"c.b$t = n.b$t").mkString(" OR ")
      s"""WITH $oracleEmbCte,
         |bt AS (SELECT vec_id, ${oracleLshTableCols(4)} FROM e),
         |n AS (SELECT * FROM bt WHERE vec_id % 10 < 2),
         |c AS (SELECT * FROM bt WHERE vec_id % 10 >= 2)
         |SELECT n.vec_id,
         |       CAST(CASE WHEN EXISTS (SELECT 1 FROM c WHERE $anyMatch)
         |            THEN 1 ELSE 0 END AS BIGINT) AS dup_near
         |FROM n""".stripMargin
    },
    "d13_decontaminate" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |src AS (SELECT doc_id, source FROM documents),
         |bench AS (SELECT DISTINCT shingle_id FROM sh JOIN src USING (doc_id)
         |          WHERE source = 'src0')
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM sh s JOIN src USING (doc_id) JOIN bench USING (shingle_id)
         |WHERE source <> 'src0'
         |GROUP BY 1
         |HAVING count(*) >= 1""".stripMargin
    },
    "x38_contamination_score" -> {
      val p = graft.ops.Dedup.minhashPrime
      // d13's shingle frame, LEFT-joined so every shingled corpus doc
      // scores (zero-hit docs at 0 ppm)
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |src AS (SELECT doc_id, source FROM documents),
         |bench AS (SELECT DISTINCT shingle_id FROM sh JOIN src USING (doc_id)
         |          WHERE source = 'src0')
         |SELECT s.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(count(b.shingle_id) AS BIGINT) AS n_hits,
         |       CAST(round(1e6 * count(b.shingle_id) / count(*)) AS BIGINT)
         |         AS contamination_ppm
         |FROM sh s JOIN src USING (doc_id)
         |     LEFT JOIN bench b USING (shingle_id)
         |WHERE source <> 'src0'
         |GROUP BY 1""".stripMargin
    },
    "d16_dedup_keep_longest" ->
      // groups via the same transitive-closure walk as d7/d9, then one
      // longest-doc representative per group + all ungrouped docs
      s"""WITH RECURSIVE $oracleJaccardCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |walk AS (SELECT DISTINCT a AS doc_id, a AS reach FROM edges
         |         UNION
         |         SELECT w.doc_id, e.b FROM walk w JOIN edges e ON e.a = w.reach),
         |grp AS (SELECT doc_id, min(reach) AS group_id FROM walk GROUP BY doc_id),
         |reps AS (SELECT doc_id FROM (
         |           SELECT g.doc_id,
         |                  row_number() OVER (PARTITION BY g.group_id
         |                    ORDER BY length(d.text) DESC, g.doc_id ASC) AS rn
         |           FROM grp g JOIN documents d ON d.doc_id = g.doc_id)
         |         WHERE rn = 1)
         |SELECT doc_id FROM reps
         |UNION ALL
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM grp)""".stripMargin,
    "d27_dedup_keep_quality" ->
      // d16's walk with the quality argmax: stopword ppm DESC, doc_id ASC
      s"""WITH RECURSIVE $oracleJaccardCtes,
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
         |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |walk AS (SELECT DISTINCT a AS doc_id, a AS reach FROM edges
         |         UNION
         |         SELECT w.doc_id, e.b FROM walk w JOIN edges e ON e.a = w.reach),
         |grp AS (SELECT doc_id, min(reach) AS group_id FROM walk GROUP BY doc_id),
         |q AS (SELECT doc_id,
         |             CAST(round(1e6 * CAST(len(list_filter(string_split(text, ' '),
         |                    s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT)
         |                  / len(string_split(text, ' '))) AS BIGINT) AS score
         |      FROM documents),
         |reps AS (SELECT doc_id FROM (
         |           SELECT g.doc_id,
         |                  row_number() OVER (PARTITION BY g.group_id
         |                    ORDER BY q.score DESC, g.doc_id ASC) AS rn
         |           FROM grp g JOIN q ON q.doc_id = g.doc_id)
         |         WHERE rn = 1)
         |SELECT doc_id FROM reps
         |UNION ALL
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM grp)""".stripMargin,
    "d15_block_dedup" ->
      """WITH tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS token
        |             FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
        |             UNNEST(range(1, len(toks) + 1)) AS r(i)),
        |blk AS (SELECT doc_id, pos // 16 AS idx, string_agg(token, ' ' ORDER BY pos) AS block
        |        FROM tok GROUP BY doc_id, pos // 16),
        |keep AS (SELECT doc_id, idx, block,
        |                row_number() OVER (PARTITION BY block ORDER BY doc_id, idx) AS rn
        |         FROM blk),
        |cln AS (SELECT doc_id, string_agg(block, ' ' ORDER BY idx) AS clean_text,
        |               CAST(count(*) AS BIGINT) AS n_kept
        |        FROM keep WHERE rn = 1 GROUP BY doc_id),
        |nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks FROM blk GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(cln.clean_text, '') AS clean_text,
        |       nb.n_blocks, coalesce(cln.n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM documents d
        |LEFT JOIN nb ON nb.doc_id = d.doc_id
        |LEFT JOIN cln ON cln.doc_id = d.doc_id""".stripMargin,
    "d20_boilerplate_ratio" ->
      // shared ⟺ the block content's claimant set spans ≥2 docs ⟺
      // min ≠ max over the content partition (same screen as the Spark side)
      """WITH tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS token
        |             FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
        |             UNNEST(range(1, len(toks) + 1)) AS r(i)),
        |blk AS (SELECT doc_id, pos // 16 AS idx, string_agg(token, ' ' ORDER BY pos) AS block
        |        FROM tok GROUP BY doc_id, pos // 16),
        |sh AS (SELECT doc_id,
        |              CASE WHEN min(doc_id) OVER (PARTITION BY block)
        |                        <> max(doc_id) OVER (PARTITION BY block)
        |                   THEN 1 ELSE 0 END AS shared
        |       FROM blk)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |       CAST(sum(shared) AS BIGINT) AS n_shared,
        |       CAST(sum(shared) AS DOUBLE) / count(*) AS boilerplate_ratio
        |FROM sh GROUP BY doc_id""".stripMargin,
    "d14_incremental_dedup" -> {
      // exact screen: the digest equi-join reduces to text equality in SQL
      // (the digest is an implementation detail — collisions are re-confirmed
      // on the text, so digest-join ≡ text-join semantically); near screen:
      // band-key semi-join of new-batch band rows against corpus band rows
      s"""WITH $oracleSigCtes,
         |src AS (SELECT doc_id, source FROM documents),
         |nb AS (SELECT doc_id, text FROM documents WHERE source IN ('src0', 'src1')),
         |corp AS (SELECT text FROM documents WHERE source NOT IN ('src0', 'src1')),
         |ex AS (SELECT DISTINCT nb.doc_id FROM nb JOIN corp ON nb.text = corp.text),
         |bnd AS (
         |  $oracleBandRows),
         |nbb AS (SELECT bnd.* FROM bnd JOIN src USING (doc_id)
         |        WHERE source IN ('src0', 'src1')),
         |cb AS (SELECT DISTINCT band, r0, r1 FROM bnd JOIN src USING (doc_id)
         |       WHERE source NOT IN ('src0', 'src1')),
         |nr AS (SELECT DISTINCT nbb.doc_id FROM nbb JOIN cb USING (band, r0, r1))
         |SELECT nb.doc_id,
         |       CAST(CASE WHEN ex.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dup_exact,
         |       CAST(CASE WHEN nr.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dup_near
         |FROM nb
         |LEFT JOIN ex ON ex.doc_id = nb.doc_id
         |LEFT JOIN nr ON nr.doc_id = nb.doc_id""".stripMargin
    },
    "d35_bloom_incremental" ->
      // the Bloom bitmap is an implementation detail (prefilter + exact
      // confirm ≡ the exact join): the oracle is d14's exact screen alone
      """WITH nb AS (SELECT doc_id, text FROM documents WHERE source IN ('src0', 'src1')),
        |corp AS (SELECT text FROM documents WHERE source NOT IN ('src0', 'src1')),
        |ex AS (SELECT DISTINCT nb.doc_id FROM nb JOIN corp ON nb.text = corp.text)
        |SELECT nb.doc_id,
        |       CAST(CASE WHEN ex.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dup_exact
        |FROM nb LEFT JOIN ex ON ex.doc_id = nb.doc_id""".stripMargin,
    "d11_char_ngram_jaccard" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH ch AS (SELECT doc_id, i AS pos, CAST(unicode(cs[i]) AS BIGINT) AS cp
         |            FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents) t,
         |            UNNEST(range(1, len(cs) + 1)) AS r(i)
         |            WHERE cs[i] <> ''),
         |ids AS (SELECT doc_id, list(cp ORDER BY pos) AS ids FROM ch GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+2]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 1)]) AS sid
         |  FROM ids)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |rare AS (SELECT shingle_id FROM (SELECT shingle_id, count(*) AS c FROM sh GROUP BY 1)
         |         WHERE c > 1 AND c <= 20),
         |idx AS (SELECT sh.* FROM sh JOIN rare USING (shingle_id)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM idx x JOIN idx y ON x.shingle_id = y.shingle_id AND x.doc_id < y.doc_id),
         |inter AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_common
         |          FROM cand
         |          JOIN sh a ON a.doc_id = doc_a
         |          JOIN sh b ON b.doc_id = doc_b AND b.shingle_id = a.shingle_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common,
         |       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5""".stripMargin
    },
    "d6_cosine_neardup" ->
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |FROM av x JOIN av y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE ${oracleCos("x.v", "y.v")} >= 0.4""".stripMargin,
    "d28_semantic_dedup" ->
      // transitive closure over the 0.35-pair graph, then per-group argmin
      // of the assigned-centroid affinity (aff ASC, vec_id ASC) — the
      // affinity is sc.cs of the winning assignment row, identical operands
      // and fold order to the Spark dot
      s"""WITH RECURSIVE $oracleEmbCte,
         |$oracleSpacedAssigned,
         |aff AS (SELECT sc.vec_id, sc.cs AS aff
         |        FROM sc JOIN assigned a
         |          ON a.vec_id = sc.vec_id AND a.bucket = sc.centroid_id),
         |pairs AS (SELECT x.vec_id AS a, y.vec_id AS b
         |          FROM av x JOIN av y
         |            ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |          WHERE ${oracleCos("x.v", "y.v")} >= 0.4),
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |walk AS (SELECT DISTINCT a AS vec_id, a AS reach FROM edges
         |         UNION
         |         SELECT w.vec_id, g.b FROM walk w JOIN edges g ON g.a = w.reach),
         |grp AS (SELECT vec_id, min(reach) AS group_id FROM walk GROUP BY vec_id),
         |reps AS (SELECT vec_id FROM (
         |           SELECT g.vec_id,
         |                  row_number() OVER (PARTITION BY g.group_id
         |                    ORDER BY f.aff ASC, g.vec_id ASC) AS rn
         |           FROM grp g JOIN aff f ON f.vec_id = g.vec_id)
         |         WHERE rn = 1)
         |SELECT vec_id FROM reps
         |UNION ALL
         |SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT vec_id FROM grp)""".stripMargin,
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
    "x50_mixture_shift" ->
      // s30's sampler as a CTE + the documents source dimension; shares in
      // exact integer ppm (div, not float division)
      s"""WITH $oracleEmbCte,
         |$oracleSpacedAssigned,
         |keyed AS (SELECT vec_id, bucket,
         |            ((vec_id % 2147483647) * ${2654435761L % 2147483647L}) % 2147483647 AS skey
         |          FROM av),
         |picks AS (SELECT vec_id FROM (
         |            SELECT vec_id, row_number() OVER (PARTITION BY bucket
         |              ORDER BY skey ASC, vec_id ASC) AS rn FROM keyed)
         |          WHERE rn <= 5),
         |docs AS (SELECT doc_id AS vec_id, source FROM documents),
         |corpus AS (SELECT source, CAST(count(*) AS BIGINT) AS n_corpus
         |           FROM e JOIN docs USING (vec_id) GROUP BY source),
         |sampled AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sampled
         |            FROM picks JOIN docs USING (vec_id) GROUP BY source),
         |joined AS (SELECT c.source, c.n_corpus, coalesce(s.n_sampled, 0) AS n_sampled
         |           FROM corpus c LEFT JOIN sampled s ON s.source = c.source),
         |totals AS (SELECT sum(n_corpus) AS tot_c, sum(n_sampled) AS tot_s FROM joined)
         |SELECT source, n_corpus, n_sampled,
         |       CAST((1000000 * n_corpus) // tot_c AS BIGINT) AS share_before_ppm,
         |       CAST((1000000 * n_sampled) // tot_s AS BIGINT) AS share_after_ppm
         |FROM joined, totals""".stripMargin,
    "s31_margin_mining" ->
      // per-side top-4 sims fold in RANK order (list ORDER BY rn +
      // list_reduce — the pinned-fold discipline), margin rounds to ppm
      // BEFORE the threshold so the cut is boundary-stable
      s"""WITH $oracleEmbCte,
         |t AS (SELECT vec_id AS test_id, v AS tv FROM e WHERE vec_id % 10 < 2),
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
    "t56_components" ->
      // hand-authored transitive closure (the t53 discipline): symmetrized
      // edges, reachability walk with UNION-set dedup, component id = min
      // reachable node — algorithm-independent of the Spark CC iteration
      """WITH RECURSIVE yr AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'),
        |e0 AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM yr a JOIN yr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT src AS a, dst AS b FROM e0
        |          UNION ALL SELECT dst, src FROM e0),
        |walk AS (SELECT DISTINCT a AS node, a AS reach FROM edges
        |         UNION
        |         SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach)
        |SELECT node, min(reach) AS group_id FROM walk GROUP BY node""".stripMargin,
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
    "m7_alignment_report" ->
      """SELECT status, CAST(count(*) AS BIGINT) AS n_rows FROM (
        |  SELECT CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL THEN 'aligned'
        |              WHEN e.vec_id IS NULL THEN 'doc_only'
        |              ELSE 'vec_only' END AS status
        |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 3) d
        |  FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id)
        |GROUP BY 1""".stripMargin,
    "t54_decayed_trend" ->
      // the identical integer shift: 10^6 // 2^min(age, 62); counts reduce
      // per (type, day) first on both engines
      """WITH daily AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |                      CAST(count(*) AS BIGINT) AS n
        |               FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS max_day FROM daily),
        |wtd AS (SELECT event_type, n,
        |               1000000 // (CAST(1 AS BIGINT) << least(
        |                 date_diff('day', day, (SELECT max_day FROM mx)), 62)) AS w
        |        FROM daily)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
        |       CAST(sum(n * w) AS BIGINT) AS trend_ppm
        |FROM wtd GROUP BY 1""".stripMargin,
    "m6_size_percentiles" ->
      """WITH meta AS (SELECT doc_id,
        |                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |              FROM documents),
        |v AS (SELECT ['audio', 'image', 'video'][CAST(n_bytes % 3 AS INTEGER) + 1] AS modality,
        |             n_bytes AS v
        |      FROM meta),
        |h AS (SELECT modality, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT modality, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT modality, v,
        |               CAST(sum(c) OVER (PARTITION BY modality ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.modality, p, min(v) AS pct_bytes, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.modality = cum.modality
        |JOIN (VALUES (0.5), (0.9), (0.99)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
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
    "m2_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(i * 1000 AS BIGINT) AS byte_offset,
        |       CAST((n - i * 1000) % 256 AS BIGINT) AS frame_checksum
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n,
        |             unnest(range(0, octet_length(encode(text)) // 1000 + 1)) AS i
        |      FROM documents)""".stripMargin,
    "x1_token_stats" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS mean_token_len,
        |       CAST(len(list_filter(string_split(text, ' '),
        |              t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS n_stopwords
        |FROM documents""".stripMargin,
    "x2_quality" ->
      """WITH t AS (SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_filter(string_split(text, ' '),
        |              s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT) AS n_stop,
        |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS mean_token_len
        |     FROM documents)
        |SELECT doc_id, n_tokens,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
        |       mean_token_len,
        |       CASE WHEN n_tokens >= 32 AND mean_token_len >= 2.0
        |                 AND mean_token_len <= 12.0 AND n_stop > 0
        |            THEN 1 ELSE 0 END AS quality_pass
        |FROM t""".stripMargin,
    "x39_gate_ablation" ->
      // identical gate expressions to x2; unique-fail = fails this gate
      // and no other; 3 literal rows from one aggregate
      """WITH t AS (SELECT
        |       CASE WHEN len(string_split(text, ' ')) < 32 THEN 1 ELSE 0 END AS f_len,
        |       CASE WHEN NOT (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |                        / len(string_split(text, ' ')) >= 2.0
        |                      AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |                        / len(string_split(text, ' ')) <= 12.0)
        |            THEN 1 ELSE 0 END AS f_shape,
        |       CASE WHEN NOT (len(list_filter(string_split(text, ' '),
        |              s -> list_contains(['the','a','of','and','to','in'], s))) > 0)
        |            THEN 1 ELSE 0 END AS f_stop
        |     FROM documents),
        |a AS (SELECT count(*) AS n_docs,
        |             sum((1 - f_len) * (1 - f_shape) * (1 - f_stop)) AS n_pass,
        |             sum(f_len) AS len_fail,
        |             sum(f_len * (1 - f_shape) * (1 - f_stop)) AS len_unique,
        |             sum(f_shape) AS shape_fail,
        |             sum(f_shape * (1 - f_len) * (1 - f_stop)) AS shape_unique,
        |             sum(f_stop) AS stop_fail,
        |             sum(f_stop * (1 - f_len) * (1 - f_shape)) AS stop_unique
        |      FROM t)
        |SELECT 'min_tokens' AS gate, CAST(len_fail AS BIGINT) AS n_fail,
        |       CAST(len_unique AS BIGINT) AS n_unique_fail,
        |       CAST(n_docs AS BIGINT) AS n_docs, CAST(n_pass AS BIGINT) AS n_pass FROM a
        |UNION ALL
        |SELECT 'mean_token_len', CAST(shape_fail AS BIGINT),
        |       CAST(shape_unique AS BIGINT), CAST(n_docs AS BIGINT),
        |       CAST(n_pass AS BIGINT) FROM a
        |UNION ALL
        |SELECT 'has_stopword', CAST(stop_fail AS BIGINT),
        |       CAST(stop_unique AS BIGINT), CAST(n_docs AS BIGINT),
        |       CAST(n_pass AS BIGINT) FROM a""".stripMargin,
    "x40_vocab_coverage" ->
      // identical vocab selection: count desc, token asc, top 1000
      """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |vc AS (SELECT token FROM (
        |         SELECT token, row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
        |         FROM tk GROUP BY token)
        |       WHERE rn <= 1000)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN vc.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
        |       CAST((1000000 * sum(CASE WHEN vc.token IS NULL THEN 1 ELSE 0 END))
        |              // count(*) AS BIGINT) AS oov_ppm
        |FROM tk LEFT JOIN vc ON vc.token = tk.token
        |GROUP BY 1""".stripMargin,
    "x6_curation" ->
      """WITH reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |t AS (SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_filter(string_split(text, ' '),
        |              s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT) AS n_stop,
        |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS mean_token_len
        |     FROM documents JOIN reps USING (doc_id))
        |SELECT doc_id, n_tokens,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
        |       mean_token_len,
        |       CASE WHEN n_tokens >= 32 AND mean_token_len >= 2.0
        |                 AND mean_token_len <= 12.0 AND n_stop > 0
        |            THEN 1 ELSE 0 END AS quality_pass
        |FROM t
        |WHERE n_tokens >= 32 AND mean_token_len >= 2.0
        |  AND mean_token_len <= 12.0 AND n_stop > 0""".stripMargin,
    "x7_top_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
        |  FROM tf JOIN df USING (term))
        |WHERE rank <= 5""".stripMargin,
    "x11_pack_sequences" ->
      // the packing prefix-sum is engine-shape-free: one global window
      // attests Spark's two-level distributed form exactly
      """WITH t AS (SELECT doc_id,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |          FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |      CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |      FROM t)
        |SELECT doc_id, n_tokens, cum // 2048 AS seq_id, cum % 2048 AS seq_offset
        |FROM c""".stripMargin,
    "x42_packing_efficiency" ->
      """WITH t AS (SELECT doc_id,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |          FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |      CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |      FROM t),
        |f AS (SELECT cum // 2048 AS seq_id, sum(n_tokens) AS fill FROM c GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_seqs,
        |       CAST(sum(fill) AS BIGINT) AS total_tokens,
        |       CAST(min(fill) AS BIGINT) AS fill_min,
        |       CAST(max(fill) AS BIGINT) AS fill_max,
        |       CAST((1000000 * sum(fill)) // (count(*) * 2048) AS BIGINT) AS fill_avg_ppm
        |FROM f""".stripMargin,
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
         |WHERE rank <= 10""".stripMargin,
    "x13_repetition" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+2]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 1)]) AS sid
         |  FROM ids)),
         |dc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd FROM sh GROUP BY 1),
         |tot AS (SELECT doc_id,
         |        GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT) - 2, 0) AS n_grams
         |        FROM documents)
         |SELECT t.doc_id, n_grams,
         |       COALESCE(nd, 0) AS n_distinct_grams,
         |       CASE WHEN n_grams > 0
         |            THEN 1 - CAST(COALESCE(nd, 0) AS DOUBLE) / n_grams
         |            ELSE 0.0 END AS rep_ratio
         |FROM tot t LEFT JOIN dc USING (doc_id)""".stripMargin
    },
    "x14_pii_redaction" ->
      s"""WITH seeded AS (SELECT doc_id,
         |  text || ' contact u' || CAST(doc_id AS VARCHAR) || '@' || source || '.net'
         |       || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         |       || ' tel 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextOps.emailRe}', '<EMAIL>', 'g'),
         |    '${TextOps.ipv4Re}', '<IP>', 'g'),
         |    '${TextOps.phoneRe}', '<PHONE>', 'g') AS clean_text,
         |  CAST(len(regexp_extract_all(text, '${TextOps.emailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${TextOps.ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${TextOps.phoneRe}')) AS BIGINT) AS n_phones
         |FROM seeded""".stripMargin,
    "x15_temperature_sample" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |m AS (SELECT min(n) AS nmin FROM c),
         |r AS (SELECT lang, CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000.0) AS BIGINT)
         |        AS keep_ppm FROM c, m)
         |SELECT d.doc_id, d.lang, r.keep_ppm
         |FROM documents d JOIN r USING (lang)
         |WHERE (((d.doc_id % ${TextOps.fingerprintMod})
         |        * (2654435761 % ${TextOps.fingerprintMod}))
         |        % ${TextOps.fingerprintMod}) % 1000000 < r.keep_ppm""".stripMargin,
    "x49_vocab_growth" ->
      s"""WITH $oracleTokCtes,
         |m AS (SELECT max(doc_id) AS max_id FROM documents),
         |fd AS (SELECT token_id, min(doc_id) AS first_doc FROM tid GROUP BY 1),
         |qs AS (SELECT unnest([1, 2, 3, 4]) AS q)
         |SELECT CAST(q * 25 AS BIGINT) AS pct,
         |       (SELECT CAST(count(*) AS BIGINT) FROM documents, m
         |        WHERE doc_id * 4 < (max_id + 1) * q) AS n_docs,
         |       (SELECT CAST(count(*) AS BIGINT) FROM tid, m
         |        WHERE doc_id * 4 < (max_id + 1) * q) AS n_tokens,
         |       (SELECT CAST(count(*) AS BIGINT) FROM fd, m
         |        WHERE first_doc * 4 < (max_id + 1) * q) AS n_types
         |FROM qs""".stripMargin,
    "x48_pps_sample" ->
      """WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot FROM documents),
        |p AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        |             CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
        |      FROM documents)
        |SELECT doc_id, source, n_chars,
        |       CAST(((pre + n_chars) * 500) // tot - (pre * 500) // tot AS BIGINT) AS n_hits
        |FROM p, t
        |WHERE ((pre + n_chars) * 500) // tot - (pre * 500) // tot > 0""".stripMargin,
    "x17_upsample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT max(n) AS nmax FROM c),
        |r AS (SELECT lang, LEAST(4, CAST(ceil(sqrt(CAST(nmax AS DOUBLE) / n)) AS BIGINT)) AS reps
        |      FROM c, m)
        |SELECT d.doc_id, d.lang, CAST(u.e AS BIGINT) AS epoch
        |FROM documents d JOIN r USING (lang), UNNEST(range(1, r.reps + 1)) AS u(e)""".stripMargin,
    "x18_token_zipf" ->
      s"""WITH $oracleTokCtes,
         |o AS (SELECT token_id, CAST(count(*) AS BIGINT) AS occurrences FROM tid GROUP BY 1)
         |SELECT occurrences, CAST(count(*) AS BIGINT) AS n_tokens FROM o GROUP BY 1""".stripMargin,
    "x24_chunking" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |             CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END AS n_chunks
        |      FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |       CAST(i * 48 AS BIGINT) AS start_token,
        |       CAST(LEAST(64, n - i * 48) AS BIGINT) AS n_chunk_tokens
        |FROM (SELECT doc_id, n, unnest(range(0, n_chunks)) AS i FROM c)""".stripMargin,
    "x25_source_quality" ->
      """WITH t AS (SELECT doc_id, source,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(len(list_filter(string_split(text, ' '),
        |              t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS n_stopwords
        |FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(n_stopwords) AS DOUBLE) / sum(n_tokens) AS stopword_ratio,
        |       CAST(sum(n_distinct_tokens) AS DOUBLE) / sum(n_tokens) AS type_token_ratio
        |FROM t GROUP BY source""".stripMargin,
    "x23_quarantined_split" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |src AS (SELECT doc_id, source, lang FROM documents),
         |bench AS (SELECT DISTINCT shingle_id FROM sh JOIN src USING (doc_id)
         |          WHERE source = 'src0'),
         |bad AS (SELECT DISTINCT s.doc_id
         |        FROM sh s JOIN src USING (doc_id) JOIN bench USING (shingle_id)
         |        WHERE source <> 'src0')
         |SELECT d.doc_id, d.lang,
         |       CASE WHEN bad.doc_id IS NOT NULL THEN 'quarantine'
         |            WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |             (((doc_id % ${TextOps.fingerprintMod})
         |               * (2654435761 % ${TextOps.fingerprintMod}))
         |               % ${TextOps.fingerprintMod}) % 100 AS h
         |      FROM documents WHERE source <> 'src0') d
         |LEFT JOIN bad ON bad.doc_id = d.doc_id""".stripMargin
    },
    "x46_vector_quarantined_split" ->
      // x22's split formula over the test subset; quarantine = s18's leak
      // screen (bucket candidates + exact cosine ≥ 0.4)
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
         |e AS (SELECT vec_id, [x / sqrt(list_dot_product(v0, v0)) for x in v0] AS v FROM e0),
         |bt AS (SELECT vec_id, ${oracleLshTableCols(4)} FROM e),
         |te AS (SELECT * FROM bt WHERE vec_id % 10 < 2),
         |tr AS (SELECT * FROM bt WHERE vec_id % 10 >= 2),
         |cand AS (SELECT DISTINCT te.vec_id AS test_id, tr.vec_id AS train_id
         |         FROM te JOIN tr ON (te.b0 = tr.b0 OR te.b1 = tr.b1
         |                             OR te.b2 = tr.b2 OR te.b3 = tr.b3)),
         |leaked AS (SELECT DISTINCT c.test_id AS doc_id
         |           FROM cand c
         |           JOIN e et ON et.vec_id = c.test_id
         |           JOIN e ev ON ev.vec_id = c.train_id
         |           WHERE list_dot_product(et.v, ev.v) >= 0.4)
         |SELECT d.doc_id, d.lang,
         |       CASE WHEN l.doc_id IS NOT NULL THEN 'quarantine'
         |            WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |             (((doc_id % ${TextOps.fingerprintMod})
         |               * (2654435761 % ${TextOps.fingerprintMod}))
         |               % ${TextOps.fingerprintMod}) % 100 AS h
         |      FROM documents WHERE doc_id % 10 < 2) d
         |LEFT JOIN leaked l ON l.doc_id = d.doc_id""".stripMargin,
    "x26_budget_sample" ->
      s"""WITH t AS (SELECT doc_id,
         |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |                  ((doc_id % ${TextOps.fingerprintMod})
         |                   * (2654435761 % ${TextOps.fingerprintMod}))
         |                   % ${TextOps.fingerprintMod} AS skey
         |           FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |             CAST(coalesce(sum(n_tokens) OVER (ORDER BY skey, doc_id
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |               AS cum_tokens_before
         |      FROM t)
         |SELECT doc_id, n_tokens, cum_tokens_before
         |FROM p WHERE cum_tokens_before < 5000""".stripMargin,
    "x22_split_assignment" ->
      s"""SELECT doc_id, lang,
         |       CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |             (((doc_id % ${TextOps.fingerprintMod})
         |               * (2654435761 % ${TextOps.fingerprintMod}))
         |               % ${TextOps.fingerprintMod}) % 100 AS h
         |      FROM documents)""".stripMargin,
    "x54_training_manifest" ->
      // x20's layout as a CTE, then per-shard aggregates with the checksum
      // over the ORDER BY pos_in_shard doc_id sequence — both engines join
      // the same comma string before hashing
      s"""WITH k AS (SELECT doc_id,
         |       ((doc_id % ${TextOps.fingerprintMod}) * (2654435761 % ${TextOps.fingerprintMod}))
         |         % ${TextOps.fingerprintMod} AS shuffle_key
         |     FROM documents),
         |pos AS (SELECT doc_id, row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS p FROM k),
         |laid AS (SELECT doc_id, CAST(p // 100 AS BIGINT) AS shard,
         |                CAST(p % 100 AS BIGINT) AS pos_in_shard
         |         FROM pos),
         |toks AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |         FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |       min(pos_in_shard) AS first_pos, max(pos_in_shard) AS last_pos,
         |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos_in_shard))
         |         AS content_md5
         |FROM laid JOIN toks USING (doc_id)
         |GROUP BY shard""".stripMargin,
    "x52_nested_subsets" ->
      // tier thresholds are the same floor-divided literals both engines
      // compare against the shared multiplicative-hash key
      s"""SELECT doc_id,
         |       CAST(h < ${TextOps.fingerprintMod / 8} AS INT) AS in_eighth,
         |       CAST(h < ${TextOps.fingerprintMod / 4} AS INT) AS in_quarter,
         |       CAST(h < ${TextOps.fingerprintMod / 2} AS INT) AS in_half
         |FROM (SELECT doc_id,
         |             ((doc_id % ${TextOps.fingerprintMod})
         |               * (2654435761 % ${TextOps.fingerprintMod}))
         |               % ${TextOps.fingerprintMod} AS h
         |      FROM documents)""".stripMargin,
    "x53_min_token_sweep" ->
      """WITH perdoc AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |               FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS tot_docs,
        |               CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM perdoc),
        |cuts AS (SELECT unnest([16, 32, 64, 128]) AS min_tokens),
        |per AS (SELECT c.min_tokens,
        |               CAST(count(p.n_tokens) AS BIGINT) AS n_docs,
        |               CAST(coalesce(sum(p.n_tokens), 0) AS BIGINT) AS kept_tokens
        |        FROM cuts c LEFT JOIN perdoc p ON p.n_tokens >= c.min_tokens
        |        GROUP BY c.min_tokens)
        |SELECT CAST(min_tokens AS BIGINT) AS min_tokens, n_docs, kept_tokens,
        |       CAST((1000000 * n_docs) // tot_docs AS BIGINT) AS docs_retained_ppm,
        |       CAST((1000000 * kept_tokens) // tot_tokens AS BIGINT) AS tokens_retained_ppm
        |FROM per, tot""".stripMargin,
    "x21_corpus_top_terms" ->
      """SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term
        |ORDER BY n_occurrences DESC, term ASC
        |LIMIT 25""".stripMargin,
    "x16_corpus_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(min(n_chars) AS BIGINT) AS min_chars,
        |       CAST(max(n_chars) AS BIGINT) AS max_chars,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY 1""".stripMargin,
    "x28_token_novelty" ->
      s"""WITH $oracleTokCtes,
         |dt AS (SELECT DISTINCT doc_id, token_id FROM tid),
         |ft AS (SELECT token_id, min(doc_id) AS first_id FROM dt GROUP BY 1)
         |SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         |       CAST(sum(CASE WHEN ft.first_id = dt.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_new_tokens
         |FROM dt JOIN ft USING (token_id) GROUP BY 1""".stripMargin,
    "x19_ngram_novelty" -> {
      val p = graft.ops.Dedup.minhashPrime
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |sh AS (SELECT DISTINCT doc_id, sid AS shingle_id FROM (
         |  SELECT doc_id, unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                                     (a, t) -> (a * 37 + t + 1) % $p)
         |                         for i in range(1, len(ids) - 3)]) AS sid
         |  FROM ids)),
         |fs AS (SELECT shingle_id, min(doc_id) AS first_id FROM sh GROUP BY 1)
         |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(sum(CASE WHEN fs.first_id = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       CAST(sum(CASE WHEN fs.first_id = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS novelty
         |FROM sh JOIN fs USING (shingle_id) GROUP BY sh.doc_id""".stripMargin
    },
    "x20_shard_layout" ->
      // same global row_number as the x12 oracle, then shard arithmetic
      s"""WITH k AS (SELECT doc_id,
         |       ((doc_id % ${TextOps.fingerprintMod}) * (2654435761 % ${TextOps.fingerprintMod}))
         |         % ${TextOps.fingerprintMod} AS shuffle_key
         |     FROM documents),
         |pos AS (SELECT doc_id, row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS p FROM k)
         |SELECT doc_id, CAST(p // 100 AS BIGINT) AS shard,
         |       CAST(p % 100 AS BIGINT) AS pos_in_shard
         |FROM pos""".stripMargin,
    "x12_global_shuffle" ->
      // one global row_number attests the bucketed prefix-count exactly
      s"""WITH k AS (SELECT doc_id,
         |       ((doc_id % ${TextOps.fingerprintMod}) * (2654435761 % ${TextOps.fingerprintMod}))
         |         % ${TextOps.fingerprintMod} AS shuffle_key
         |     FROM documents)
         |SELECT doc_id,
         |       CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS shuffle_pos
         |FROM k""".stripMargin,
    "x9_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                           ' +', ' ', 'g')) AS norm_text,
        |       CAST(length(text) AS BIGINT) AS n_chars_raw,
        |       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                                       ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
        |FROM documents""".stripMargin,
    "x10_curation_pipeline" ->
      // quality BEFORE the representative choice (rep = min doc_id among
      // the group's quality-PASSING members — gating after the rep pick
      // would lose a whole dup group when only its rep fails quality)
      s"""WITH q AS (SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |       CAST(len(list_filter(string_split(text, ' '),
         |              s -> list_contains(['the','a','of','and','to','in'], s))) AS BIGINT) AS n_stop,
         |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |         / len(string_split(text, ' ')) AS mean_token_len
         |     FROM documents),
         |base AS (SELECT d.doc_id, d.lang,
         |            trim(regexp_replace(regexp_replace(lower(d.text), '[^a-z0-9 ]', '', 'g'),
         |                                ' +', ' ', 'g')) AS nt
         |         FROM documents d JOIN q USING (doc_id)
         |         WHERE q.n_tokens >= 32 AND q.mean_token_len >= 2.0
         |           AND q.mean_token_len <= 12.0 AND q.n_stop > 0),
         |reps AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY nt),
         |surv AS (SELECT b.doc_id, b.lang FROM base b JOIN reps USING (doc_id))
         |SELECT doc_id, lang AS stratum, CAST(rank AS BIGINT) AS sample_rank FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY (doc_id % 2147483647) * ${2654435761L % 2147483647L} % 2147483647 ASC,
         |             doc_id ASC) AS rank
         |  FROM surv)
         |WHERE rank <= 50""".stripMargin,
    "x8_stratified_sample" ->
      // the oracle states the NAIVE single-window form; Spark's two-phase
      // plan must produce the identical sample
      s"""SELECT doc_id, lang AS stratum, CAST(rank AS BIGINT) AS sample_rank FROM (
         |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY (doc_id % 2147483647) * ${2654435761L % 2147483647L} % 2147483647 ASC,
         |             doc_id ASC) AS rank
         |  FROM documents)
         |WHERE rank <= 50""".stripMargin,
    "x3_langid" -> oracleLangid,
    "x4_fingerprint" ->
      // per-term mod keeps every term < 2^31 so the sum stays in int64 —
      // mirrors TextOps.fingerprint exactly (see its scaladoc)
      s"""WITH $oracleTokCtes
         |SELECT doc_id,
         |       CAST(CAST(sum(((token_id + 1) % 2147483647) * ((pos + 1) % 2147483647) % 2147483647) AS BIGINT)
         |            % 2147483647 AS BIGINT) AS fingerprint,
         |       CAST(count(*) AS BIGINT) AS n_tokens
         |FROM tid GROUP BY doc_id""".stripMargin,
    "x34_winnowing" ->
      // positional k=5 gram hashes (same fold as the d2 oracle, pre-
      // DISTINCT), min per complete w=4 window, distinct per doc; docs
      // without a complete window emit no row
      s"""WITH $oracleTokCtes,
         |ids AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids FROM tid GROUP BY doc_id),
         |psh AS (SELECT doc_id, i - 1 AS p, len(ids) - 4 AS m,
         |               list_reduce(list_prepend(CAST(0 AS BIGINT), ids[i:i+4]),
         |                           (a, t) -> (a * 37 + t + 1) % 2147483647) AS sid
         |        FROM ids, UNNEST(range(1, len(ids) - 3)) AS r(i)
         |        WHERE len(ids) >= 5),
         |wmin AS (SELECT doc_id, p, m,
         |                min(sid) OVER (PARTITION BY doc_id ORDER BY p
         |                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |         FROM psh),
         |sel AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE p <= m - 4)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
         |       CAST(sum(fp) % 2147483647 AS BIGINT) AS fp_checksum
         |FROM sel GROUP BY doc_id""".stripMargin,
    "x5_regex_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
        |       CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS n_distinct_alpha,
        |       CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha_chars
        |FROM documents""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |       CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        |       CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    "m3_modality_stats" ->
      """WITH meta AS (SELECT doc_id,
        |                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |                     CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |                     CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        |                     CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
        |              FROM documents)
        |SELECT ['audio', 'image', 'video'][CAST(n_bytes % 3 AS INTEGER) + 1] AS modality,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(n_frames) AS BIGINT) AS total_frames,
        |       CAST(max(width) AS BIGINT) AS max_width,
        |       CAST(max(height) AS BIGINT) AS max_height
        |FROM meta GROUP BY 1""".stripMargin,
    "m5_interleave" ->
      // same modality tag; within-modality rank ordered by doc_id, global
      // position = rank × |modalities| + modality index
      """WITH meta AS (SELECT doc_id,
        |                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |              FROM documents),
        |tag AS (SELECT doc_id,
        |               ['audio', 'image', 'video'][CAST(n_bytes % 3 AS INTEGER) + 1] AS modality
        |        FROM meta)
        |SELECT doc_id, modality,
        |       CAST((row_number() OVER (PARTITION BY modality ORDER BY doc_id) - 1) * 3
        |            + CASE modality WHEN 'audio' THEN 0 WHEN 'image' THEN 1 ELSE 2 END
        |            AS BIGINT) AS interleave_pos
        |FROM tag""".stripMargin,
    "b29_id_gaps" ->
      // the naive single-window form IS the oracle; the engine's bucket
      // decomposition must reproduce it exactly
      """WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_id FROM events),
        |g AS (SELECT day, event_id,
        |             event_id - lag(event_id) OVER (PARTITION BY day ORDER BY event_id) - 1 AS gp
        |      FROM e)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(min(event_id) AS BIGINT) AS min_id,
        |       CAST(max(event_id) AS BIGINT) AS max_id,
        |       CAST(coalesce(sum(CASE WHEN gp > 0 THEN gp END), 0) AS BIGINT) AS n_missing,
        |       CAST(coalesce(sum(CASE WHEN gp > 0 THEN 1 END), 0) AS BIGINT) AS n_gaps,
        |       CAST(coalesce(max(CASE WHEN gp > 0 THEN gp END), 0) AS BIGINT) AS max_gap
        |FROM g GROUP BY day""".stripMargin,
    "b28_write_anomalies" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |                  CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT *,
        |        CAST(count(n_events) OVER w AS BIGINT) AS trail_n,
        |        CAST(sum(n_events) OVER w AS BIGINT) AS trail_sum,
        |        CAST(sum(n_events * n_events) OVER w AS BIGINT) AS trail_sumsq
        |      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |x AS (SELECT *, 7 * n_events - trail_sum AS dev FROM t WHERE trail_n = 7)
        |SELECT day, event_type, n_events, trail_sum,
        |       CASE WHEN dev * dev > 9 * (7 * trail_sumsq - trail_sum * trail_sum)
        |            THEN CASE WHEN dev > 0 THEN 'high' ELSE 'low' END
        |            ELSE 'normal' END AS direction
        |FROM x""".stripMargin,
    "t51_attribution" ->
      // the same struct-min/max-over-RANGE-frame pass; struct comparison
      // is lexicographic (tus, event_id, ch) on both engines
      """WITH e AS (SELECT user_id, event_type, value, event_id,
        |                  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS tus
        |           FROM events),
        |t AS (SELECT *,
        |  min(CASE WHEN event_type IN ('view', 'click', 'signup')
        |        THEN {'tus': tus, 'event_id': event_id, 'ch': event_type} END)
        |    OVER w AS ft,
        |  max(CASE WHEN event_type IN ('view', 'click', 'signup')
        |        THEN {'tus': tus, 'event_id': event_id, 'ch': event_type} END)
        |    OVER w AS lt
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |               RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)),
        |c AS (SELECT value, coalesce(ft['ch'], 'direct') AS first_ch,
        |             coalesce(lt['ch'], 'direct') AS last_ch
        |      FROM t WHERE event_type = 'purchase'),
        |u AS (SELECT 'first' AS kind, first_ch AS channel, value FROM c
        |      UNION ALL SELECT 'last', last_ch, value FROM c)
        |SELECT channel, kind, CAST(count(*) AS BIGINT) AS n_conversions,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM u GROUP BY 1, 2""".stripMargin,
    "t46_funnel_latency" ->
      // b19's staged CTEs, then the t19 percentile machinery over whole-
      // second elapsed times of completed funnels
      """WITH s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        |            FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(s1.t1) AS t1, min(CAST(e.ts AS TIMESTAMP)) AS t2
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        |         AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 604800 SECOND
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(s2.t1) AS t1, min(CAST(e.ts AS TIMESTAMP)) AS t3
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        |         AND CAST(e.ts AS TIMESTAMP) <= s2.t1 + INTERVAL 604800 SECOND
        |       GROUP BY 1),
        |v AS (SELECT 'all' AS funnel,
        |             (epoch_us(t3) - epoch_us(t1)) // 1000000 AS v FROM s3),
        |h AS (SELECT funnel, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |t AS (SELECT funnel, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT funnel, v,
        |               CAST(sum(c) OVER (PARTITION BY funnel ORDER BY v
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |        FROM h)
        |SELECT cum.funnel, p, min(v) AS pct_sec, CAST(min(n) AS BIGINT) AS n_rows
        |FROM cum
        |JOIN t ON t.funnel = cum.funnel
        |JOIN (VALUES (0.5), (0.9), (0.99)) ps(p) ON cum >= ceil(p * n)
        |GROUP BY 1, 2""".stripMargin,
    "x43_source_drift" ->
      // same vocab rule as x40; vocab tokens absent from a source
      // contribute their full corpus mass via the grid LEFT join
      """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS n FROM tk),
        |vc AS (SELECT token, CAST((1000000 * c) // (SELECT n FROM tot) AS BIGINT) AS corpus_ppm
        |       FROM (SELECT token, count(*) AS c,
        |                    row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
        |             FROM tk GROUP BY token)
        |       WHERE rn <= 1000),
        |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY 1),
        |sc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cs
        |       FROM tk JOIN vc USING (token) GROUP BY 1, 2),
        |grid AS (SELECT st.source, st.n_tokens, vc.token, vc.corpus_ppm,
        |                CAST((1000000 * coalesce(sc.cs, 0)) // st.n_tokens AS BIGINT) AS src_ppm
        |         FROM st CROSS JOIN vc
        |         LEFT JOIN sc ON sc.source = st.source AND sc.token = vc.token)
        |SELECT source, CAST(min(n_tokens) AS BIGINT) AS n_tokens,
        |       CAST(sum(abs(src_ppm - corpus_ppm)) AS BIGINT) AS drift_ppm_l1
        |FROM grid GROUP BY 1""".stripMargin,
    "x47_pipeline_waterfall" ->
      // the same stage rules as x6/x8/x10: exact rep = min doc per text,
      // x2's quality predicate, the multiplicative-hash quota sample
      s"""WITH tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
         |reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |ex AS (SELECT d.* FROM documents d JOIN reps USING (doc_id)),
         |q AS (SELECT * FROM ex
         |      WHERE len(string_split(text, ' ')) >= 32
         |        AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |              / len(string_split(text, ' ')) >= 2.0
         |        AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |              / len(string_split(text, ' ')) <= 12.0
         |        AND len(list_filter(string_split(text, ' '),
         |              s -> list_contains(['the','a','of','and','to','in'], s))) > 0),
         |samp AS (SELECT doc_id FROM (
         |           SELECT doc_id, row_number() OVER (PARTITION BY lang
         |             ORDER BY ((doc_id % ${TextOps.fingerprintMod})
         |                       * (2654435761 % ${TextOps.fingerprintMod}))
         |                       % ${TextOps.fingerprintMod} ASC, doc_id ASC) AS rn
         |           FROM q) WHERE rn <= 50),
         |sq AS (SELECT q.* FROM q JOIN samp USING (doc_id))
         |SELECT CAST(1 AS BIGINT) AS stage_ord, 'raw' AS stage,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens
         |FROM documents JOIN tk USING (doc_id)
         |UNION ALL
         |SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT),
         |       CAST(coalesce(sum(n), 0) AS BIGINT)
         |FROM ex JOIN tk USING (doc_id)
         |UNION ALL
         |SELECT 3, 'quality_gate', CAST(count(*) AS BIGINT),
         |       CAST(coalesce(sum(n), 0) AS BIGINT)
         |FROM q JOIN tk USING (doc_id)
         |UNION ALL
         |SELECT 4, 'lang_quota_sample', CAST(count(*) AS BIGINT),
         |       CAST(coalesce(sum(n), 0) AS BIGINT)
         |FROM sq JOIN tk USING (doc_id)""".stripMargin,
    "x41_dedup_savings" ->
      """WITH reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |tk AS (SELECT d.doc_id, d.source,
        |              CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |              CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS keep
        |       FROM documents d LEFT JOIN reps r ON r.doc_id = d.doc_id)
        |SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tokens_raw,
        |       CAST(sum(keep * n_tokens) AS BIGINT) AS tokens_kept,
        |       CAST((1000000 * (sum(n_tokens) - sum(keep * n_tokens)))
        |              // sum(n_tokens) AS BIGINT) AS saved_ppm
        |FROM tk GROUP BY 1""".stripMargin
  )
}
