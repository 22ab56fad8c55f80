package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, EqualTo, Expression, In, InSet}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.{logical => logical}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Fleet-wide scale-hazard sweep over physical plans (round-9 verdict #2):
  * x53's corpus-sized BroadcastNestedLoopJoin build hid for three rounds
  * because every plan assertion looked at ONE query — this bans the CLASS.
  *
  * The hazard: a BroadcastNestedLoopJoin whose BUILD side — or a
  * CartesianProduct whose EITHER side — descends from a corpus-scale scan
  * with nothing bounding its cardinality on the way up. At 100 TB that
  * side materializes on every executor (BNLJ build) or re-streams per
  * partition of the other side (cartesian): an OOM or an N² pass, not a
  * slowdown. The STREAMED side of an inner/cross BNLJ against a
  * metadata-sized build is the legitimate sweep-as-column shape
  * (x53-fixed, d24, x39) and stays allowed.
  *
  * Round 10 adds the SINGLE-PARTITION FUNNEL class: a shuffle whose
  * output partitioning has one partition (Window-without-partitionBy,
  * `repartition(1)`, orderBy-into-single-partition shapes) or a
  * `coalesce(1)`, over a corpus-unbounded child, serializes the whole
  * corpus through ONE task — at 100 TB that is one executor thread doing
  * all the work, an OOM-or-never-finishes, not a slowdown. Global
  * aggregates and global limits also plan a SinglePartition exchange, but
  * their exchange child is a partial aggregate / local limit — bounded,
  * so they stay allowed.
  *
  * "Corpus-unbounded" here is a deliberately conservative static check:
  * walking down from the side's root, a subtree is bounded only when it
  * passes through
  *   - an aggregate whose keys are metadata-cardinality (totals rows,
  *     per-source/per-lang reports). Since round 11 an aggregate keyed
  *     on a corpus-id/vocabulary column ([[isCorpusIdName]]: doc_id,
  *     term, …) does NOT bound — it is one row per document / vocabulary
  *     entry, i.e. corpus-sized — in EITHER layer: the hint guard
  *     (a hint forces the build at every scale) and this physical walk
  *     (a BNLJ/cartesian has no safe shape for the planner to fall back
  *     to, so stats cannot self-correct it at scale),
  *   - a global limit / top-k (LocalLimit bounds only the funnel walk —
  *     see [[corpusLeaf]]),
  *   - a literal IN/INSET filter on a key column (the bounded query-id
  *     idiom: `vec_id isin(queryIds)` — |literals| rows of a unique key),
  * before reaching a file scan. Everything else that reads parquet —
  * including persisted frames (descended through their cached plan) and
  * checkpoint leaves (`RDDScanExec`, cardinality unknowable statically, so
  * treated as corpus-scale) — counts as corpus-derived. False positives
  * are possible by construction (that is the conservative direction); the
  * fleet is green under this rule, so any future violation is either a
  * real hazard or a new idiom worth a deliberate exemption here.
  */
object PlanGuard {

  /** Human-readable violation per offending join in `plan`; empty = clean. */
  def corpusProductViolations(plan: SparkPlan): Seq[String] = {
    val joins = scala.collection.mutable.ArrayBuffer[String]()
    foreachNode(plan) {
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildLeft  => j.left
          case BuildRight => j.right
        }
        corpusLeaf(build).foreach { leaf =>
          joins += s"BroadcastNestedLoopJoin(${j.joinType}, build=${j.buildSide}) " +
            s"builds a corpus-unbounded side: $leaf\n    build subtree:\n" +
            build.treeString.linesIterator.take(10).map("      " + _).mkString("\n")
        }
      case c: CartesianProductExec =>
        val offending = Seq("left" -> c.left, "right" -> c.right)
          .flatMap { case (name, side) => corpusLeaf(side).map(name -> _) }
        // a cartesian of two bounded frames (config × config) is fine;
        // corpus × anything is the N² pass this guard exists to ban
        offending.foreach { case (name, leaf) =>
          joins += s"CartesianProduct $name side is corpus-unbounded: $leaf"
        }
      // ---- the single-partition funnel class (round 10): a shuffle to
      //      ONE partition, or coalesce(1), over a corpus-unbounded child
      //      serializes the whole corpus through one task — the
      //      Window-without-partitionBy / repartition(1) hazard. Global
      //      aggregates and global limits funnel too, but their exchange
      //      child is a partial aggregate / local limit, i.e. bounded. ----
      case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
        corpusLeaf(e.child, localLimitBounds = true).foreach { leaf =>
          joins += s"SinglePartition shuffle funnels a corpus-unbounded child: $leaf" +
            s"\n    child subtree:\n" +
            e.child.treeString.linesIterator.take(10).map("      " + _).mkString("\n")
        }
      case c: CoalesceExec if c.numPartitions == 1 =>
        corpusLeaf(c.child, localLimitBounds = true).foreach { leaf =>
          joins += s"coalesce(1) funnels a corpus-unbounded child: $leaf"
        }
      case _ => ()
    }
    joins.toSeq
  }

  /** Throws with every violation listed — the form Verify and the PlanSpec
    * sweep share, so the sbt-test gate and a manual full-fleet run report
    * identically. Checks both layers: physical products/funnels and
    * logical hinted broadcasts.
    */
  def assertNoCorpusProducts(name: String, df: DataFrame): Unit = {
    val v = corpusProductViolations(df.queryExecution.executedPlan) ++
      hintedBroadcastViolations(df.queryExecution.analyzed)
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"[planguard] $name: ${v.size} corpus-product hazard(s):\n  " +
          v.mkString("\n  "))
  }

  /** [[org.apache.spark.sql.Dataset.localCheckpoint]] behind the guard
    * (round-11 verdict #2): a localCheckpoint truncates the plan to a
    * `LogicalRDD` leaf, so every plan BEHIND one was invisible to the
    * per-query gate and the fleet sweep — exactly where margin mining's
    * train-corpus-sized forced broadcast hid for three rounds, found only
    * by hand review. This asserts the PRE-checkpoint plan clean (both
    * layers: physical products/funnels and logical hinted broadcasts),
    * then checkpoints eagerly. Every checkpoint site in `ops/` and
    * `operators/` goes through here — PlanSpec bans raw `.localCheckpoint(`
    * in those sources — so re-introducing a hazard behind a checkpoint
    * fails the sf0.01 gate and the sbt-test sweep, not just review. Cost:
    * the walk reuses the SAME `QueryExecution` the checkpoint execution
    * uses, so no extra planning happens; the walked plans stay flat
    * because iterative loops checkpoint per round.
    */
  def guardedCheckpoint(name: String, df: DataFrame): DataFrame = {
    assertNoCorpusProducts(name, df)
    df.localCheckpoint(true)
  }

  /** [[guardedCheckpoint]] with LAZY materialization (round-13
    * optimization): same guard walk over the same pre-checkpoint plan,
    * but the checkpoint RDD is computed by the CALLER'S next action
    * instead of an extra eager job — one job per loop round instead of
    * two. Sound at exactly TWO site shapes (round-14 ADVICE: name both —
    * the loops below use (b), not (a)):
    *   (a) an action over the full frame follows IMMEDIATELY (a
    *       checksum/collect/next-round eager checkpoint), or
    *   (b) a fully-lazy round chain whose SINGLE consumer job
    *       materializes the persist-backed blocks in round order — each
    *       round's blocks are stored at first compute, so the 2-3
    *       references per round read stored blocks (block-store
    *       getOrElseUpdate), never the lineage.
    * A lazy checkpoint matching NEITHER shape — referenced by several
    * separate jobs before any materializes it — recomputes its lineage
    * per reference: the exact blowup the eager form exists to prevent.
    * Every call site states which shape it is.
    */
  def guardedCheckpointLazy(name: String, df: DataFrame): DataFrame = {
    assertNoCorpusProducts(name, df)
    df.localCheckpoint(false)
  }

  /** Round ledger for the fixed-round lazy-checkpoint loops (round-14
    * verdict #2/#6): lazy checkpoints collapse the per-round jobs, but
    * they also mean no round's blocks can be RELEASED inside the loop —
    * unpersisting a local checkpoint invalidates it, and a lazy round is
    * only safe to drop once a LATER materialization has truncated every
    * lineage that could re-read it. Without release, every superseded
    * round's corpus-scale blocks squat in the block manager until GC +
    * ContextCleaner notice (the round-13 verdict's `Block rdd_* already
    * exists` accumulation; at 100 TB they evict working storage).
    *
    * `step` checkpoints a round lazily and remembers it; every
    * `barrierEvery`-th step — and always at [[last]] — the round is
    * checkpointed EAGERLY instead: the barrier's one job materializes the
    * whole pending chain in round order, after which every remembered
    * predecessor is superseded (its lineage truncated away) and its
    * blocks are released. This simultaneously caps
    *   - block residency: ≤ `barrierEvery` rounds' blocks live at once,
    *     and after [[last]] only the RETURNED frame's blocks remain;
    *   - recompute exposure on executor loss (round-13 verdict #3): a
    *     lost block forces recompute through at most `barrierEvery`
    *     rounds, not the whole loop (the eager form bounded this to one
    *     round at one job PER round; the barrier pays one job per K).
    * Default K=5: the fleet's seed+4-round chains pay exactly ONE eager
    * barrier (the final, releasing one) and kCore's seed+8 chain gets a
    * single mid-loop barrier.
    */
  final class CheckpointChain(barrierEvery: Int = 5) {
    private val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private var sinceBarrier = 0
    def step(name: String, df: DataFrame): DataFrame = {
      sinceBarrier += 1
      if (sinceBarrier >= barrierEvery) barrier(name, df)
      else {
        val out = guardedCheckpointLazy(name, df)
        pending += out
        out
      }
    }
    /** The loop's FINAL round: eager barrier, so every earlier round's
      * blocks are released and the caller's consumer reads only the
      * returned frame's stored blocks.
      */
    def last(name: String, df: DataFrame): DataFrame = barrier(name, df)
    private def barrier(name: String, df: DataFrame): DataFrame = {
      val out = guardedCheckpoint(name, df) // eager: materializes the chain
      pending.foreach(org.apache.spark.sql.graft.CheckpointRelease.release)
      pending.clear()
      pending += out // superseded once the NEXT barrier materializes
      sinceBarrier = 0
      out
    }
  }

  /** `.guardedCheckpoint("site")` as chainable syntax for
    * [[guardedCheckpoint]] — keeps the 25 converted call sites one-line
    * diffs instead of wrap-the-whole-chain rewrites.
    */
  implicit class GuardedCheckpointOps(private val df: DataFrame) {
    def guardedCheckpoint(name: String): DataFrame =
      PlanGuard.guardedCheckpoint(name, df)
    def guardedCheckpointLazy(name: String): DataFrame =
      PlanGuard.guardedCheckpointLazy(name, df)
  }

  /** Hinted-broadcast guard at the LOGICAL layer (round 10): a
    * stats-driven broadcast self-corrects at scale — the planner
    * re-decides from size estimates, so the same query that broadcasts a
    * small side at fixture scale plans a shuffled join at 100 TB. An
    * explicit `broadcast()` hint removes that safety: it FORCES the
    * build-side at every scale, so a hint is only sound on a frame whose
    * cardinality is bounded BY CONSTRUCTION. This walks the ANALYZED plan
    * (hints are erased before the physical plan, so the physical sweep
    * cannot see them) and flags every broadcast hint whose subtree
    * reaches a corpus-scale relation with no bound on the way — the same
    * bounds as [[corpusProductViolations]] plus their pre-optimizer forms
    * (Distinct/Deduplicate are aggregates the optimizer has not rewritten
    * yet), EXCEPT that an aggregate keyed on a corpus-id / vocabulary
    * column ([[isCorpusIdName]]) is distrusted and the walk continues
    * through it (round-10 verdict #2: `broadcast(postings.groupBy(doc_id)
    * .agg(...))` is one row per DOCUMENT — corpus-sized — and sailed
    * through the round-10 guard). Scans of the schema-fixed dimension
    * tables (nation: 25 rows, region: 5 — cardinalities set by the data
    * model, independent of scale factor) are bounded leaves: broadcasting
    * a dimension is the canonical correct use of the hint.
    */
  def hintedBroadcastViolations(plan: logical.LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    plan.foreach {
      case h: logical.ResolvedHint if h.hints.strategy.contains(logical.BROADCAST) =>
        logicalCorpusLeaf(h.child).foreach { leaf =>
          out += s"broadcast hint forces a corpus-unbounded build at every scale: $leaf" +
            s"\n    hinted subtree:\n" +
            h.child.treeString.linesIterator.take(8).map("      " + _).mkString("\n")
        }
      case _ => ()
    }
    out.toSeq
  }

  /** Schema-fixed dimension cardinality: true when every root path of the
    * scan names one of the constant-size dimension tables — EXACT table
    * stem match (round-11 ADVICE: `startsWith("nation")` silently exempted
    * any corpus table whose directory merely began with the word, e.g.
    * `national_docs/`).
    */
  private def isDimensionScan(paths: Seq[String]): Boolean =
    paths.nonEmpty && paths.forall { p =>
      val last = p.stripSuffix("/").split('/').last.toLowerCase
      val stem = last.stripSuffix(".parquet")
      stem == "nation" || stem == "region"
    }

  /** The top-k-per-group filter shape: a comparison of a rank-like window
    * column (row_number / rank / dense_rank) against a foldable bound,
    * with the defining Window node reachable through unary operators.
    */
  private def isTopKFilter(f: logical.Filter): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def rankIds(p: logical.LogicalPlan): Set[Long] = p match {
      case w: logical.Window =>
        w.windowExpressions.collect {
          case a: Alias if a.child.exists {
              case we: WindowExpression => we.windowFunction match {
                case _: RowNumber | _: Rank | _: DenseRank => true
                case _ => false
              }
              case _ => false
            } => a.exprId.id
        }.toSet ++ rankIds(w.child)
      case u if u.children.size == 1 => rankIds(u.children.head)
      case _ => Set.empty
    }
    val ids = rankIds(f.child)
    def refsRank(e: Expression): Boolean = e match {
      case a: AttributeReference => ids.contains(a.exprId.id)
      case c: Cast => refsRank(c.child)
      case _ => false
    }
    // Only the KEEP-TOP directions bound cardinality (round-11 ADVICE:
    // `rank >= 2` keeps all BUT the top rows per group — corpus-unbounded
    // — yet matched the old any-direction rule): rank ≤ k / rank < k /
    // rank = k with the rank on the smaller side, or the mirrored
    // k ≥ rank / k > rank with the rank on the right.
    ids.nonEmpty && f.condition.exists {
      case LessThan(l, r) => refsRank(l) && r.foldable
      case LessThanOrEqual(l, r) => refsRank(l) && r.foldable
      case EqualTo(l, r) =>
        (refsRank(l) && r.foldable) || (refsRank(r) && l.foldable)
      case GreaterThan(l, r) => l.foldable && refsRank(r)
      case GreaterThanOrEqual(l, r) => l.foldable && refsRank(r)
      case _ => false
    }
  }

  /** Column names that carry corpus-cardinality identity: the row-per-
    * entity keys (doc_id, vec_id, …), vocabulary keys (term, token,
    * shingle), and content keys (sig, digest). An Aggregate grouped on
    * one of these is itself corpus-sized — `postings.groupBy(doc_id)` has
    * one row per DOCUMENT, `tokens.groupBy(term)` one row per vocabulary
    * entry (Heaps-law growth: unbounded over an open corpus) — so it must
    * not launder a corpus scan into a "bounded" hint target (round-10
    * verdict #2: exactly this blind-spot shape let x60's hint survive
    * nine rounds of by-hand audits).
    *
    * Since round 12 the surface-name match is backed by PROVENANCE at the
    * logical layer ([[originDistrust]]): a grouping key is also
    * distrusted when its lineage — traced through Project/Alias/Aggregate
    * rebindings — reaches (a) a corpus scan column whose ORIGIN name is
    * id-like (so `col("doc_id").as("d")` can no longer launder), or (b) a
    * generator VALUE output (explode/posexplode) whose input descends
    * from a corpus scan: an exploded token IS a vocabulary key whatever
    * it is named — the x29 w1/w2 shape that dodged the round-11 name
    * list. posexplode's POSITION output is exempt (bounded by the array
    * width — the d-row dimension-stats idiom).
    *
    * Since round 13 SCALAR-COMPOSITE keys are CLASSIFIED, not
    * blanket-accepted (round-12 verdict #1 — the last known laundering
    * hole): a composite grouping expression is trusted only when it is
    * bounded BY CONSTRUCTION ([[boundedKeyClass]]: pmod/%-by-literal,
    * bitmask-by-literal, calendar bucketing, width_bucket, and any
    * deterministic composition of those) — its value domain is capped by
    * literals or the calendar regardless of input cardinality. Any OTHER
    * scalar derivation whose references reach a distrusted origin —
    * `floor(doc_id / 1000)` is corpus/1000-sized, `substr(digest, …)` is
    * content-cardinality — inherits the distrust, at both layers and
    * through Project/Aggregate alias laundering.
    */
  private def isCorpusIdName(name: String): Boolean = {
    val n = name.toLowerCase
    n == "id" || n.endsWith("_id") || n == "term" || n == "token" ||
      n == "shingle" || n == "sig" || n == "digest" || n == "node"
  }

  /** Is a scalar key expression bounded BY CONSTRUCTION — its value
    * domain capped by literals or calendar structure, independent of
    * input cardinality (round-13, closing the scalar-composite gap)?
    *   - `pmod(x, lit)` / `x % lit` / `x & litMask`: ≤ |modulus| values —
    *     the fleet's hash/bucket/band grouping idiom,
    *   - calendar bucketing (`date_trunc`, `to_date`, `year`…`second`):
    *     calendar-cardinality — days/hours over the data's time range,
    *     the day-partitioning idiom,
    *   - `width_bucket(…, lit)`: ≤ lit+2 buckets,
    *   - `if`/`case` whose branch VALUES are all bounded, and any
    *     deterministic composition of bounded pieces (`pmod(a,16)*100 +
    *     pmod(b,16)` has ≤ 256 values).
    * Everything else — `floor(id/1000)`, `substr(digest,…)`, a bare
    * hash — tracks input cardinality and must NOT launder a distrusted
    * origin into a "bounded" key.
    */
  private def boundedKeyClass(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case a: Alias => boundedKeyClass(a.child)
      case c: Cast => boundedKeyClass(c.child)
      case l: Literal => l.foldable
      case Pmod(_, r, _) => r.foldable
      case Remainder(_, r, _) => r.foldable
      case BitwiseAnd(l, r) => l.foldable || r.foldable
      case _: TruncDate | _: TruncTimestamp => true
      case _: Year | _: Quarter | _: Month | _: DayOfMonth | _: DayOfWeek |
          _: DayOfYear | _: WeekOfYear | _: Hour | _: Minute | _: Second => true
      case _: ParseToDate => true
      case w: WidthBucket => w.numBucket.foldable
      case i: If => boundedKeyClass(i.trueValue) && boundedKeyClass(i.falseValue)
      case cw: CaseWhen =>
        cw.branches.forall { case (_, v) => boundedKeyClass(v) } &&
          cw.elseValue.forall(boundedKeyClass)
      // a deterministic composition of bounded pieces has at most the
      // product of its pieces' cardinalities — still literal-bounded
      case other if other.children.nonEmpty && other.deterministic =>
        other.children.forall(boundedKeyClass)
      case _ => false
    }
  }

  /** Do the ELEMENTS of this array expression come from a bounded value
    * domain, so that exploding it yields a bounded key even though the
    * array itself is built from corpus content (round 13)?
    *   - `split(x, '')` (empty separator): elements are single
    *     CHARACTERS — ≤ 0x110000 values by construction, the char-LM
    *     model's domain (x31/x57: a charset² bigram model is
    *     metadata-sized however much text feeds it),
    *   - `array(...)` of bounded-class expressions: the count-min idiom
    *     (explode of per-hash-row structs whose bucket is %-by-literal),
    *   - `slice`/`arrays_zip`/struct-of-bounded compositions of the above.
    * A `split(text, ' ')` (word tokens) stays UNBOUNDED — vocabulary
    * grows by Heaps' law, the round-11/12 distrust this rule must not
    * reopen.
    */
  private def boundedElements(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case a: Alias => boundedElements(a.child)
      case c: Cast => boundedElements(c.child)
      case StringSplit(_, Literal(sep, _), _) =>
        sep != null && sep.toString.isEmpty
      case s: Slice => boundedElements(s.first)
      case az: ArraysZip => az.children.forall(boundedElements)
      case ca: CreateArray => ca.children.forall(c =>
        boundedKeyClass(c) || boundedElements(c))
      case ns: CreateNamedStruct => ns.valExprs.forall(v =>
        boundedKeyClass(v) || boundedElements(v))
      case _ => boundedKeyClass(e)
    }
  }

  /** References of `e` that sit OUTSIDE any bounded-class subexpression —
    * the references that actually contribute cardinality. `band * 2³² +
    * ((doc_id % p) * c) % p` (the curriculum order key) must not be
    * distrusted for the doc_id buried inside its mod-by-literal hash
    * term: that term's value domain is capped by p whatever feeds it.
    */
  private def unboundedRefs(e: Expression): Seq[AttributeReference] =
    if (boundedKeyClass(e)) Seq.empty
    else e match {
      case a: AttributeReference => Seq(a)
      case other => other.children.flatMap(unboundedRefs)
    }

  /** The composite-key arm of the distrust checks: a non-attribute key is
    * distrusted when it is NOT bounded-class and any of its
    * cardinality-contributing references ([[unboundedRefs]]) is id-like
    * by name or (when a plan is supplied via `origin`) traces to a
    * distrusted origin.
    */
  private def compositeDistrust(e: Expression,
      origin: org.apache.spark.sql.catalyst.expressions.Attribute => Boolean): Boolean =
    unboundedRefs(e).exists(r => isCorpusIdName(r.name) || origin(r))

  private def stripKey(e: Expression): Expression = {
    val noAlias = e match {
      case a: Alias => a.child
      case x => x
    }
    noAlias match {
      case c: Cast => c.child
      case x => x
    }
  }

  /** Surface-name distrust — the fast first check at both layers; each
    * layer backs it with its own origin tracing ([[idKeyedLogical]] /
    * [[idKeyedPhysical]]).
    */
  private def idKeyed(exprs: Seq[Expression]): Boolean = exprs.exists { e =>
    stripKey(e) match {
      case a: AttributeReference => isCorpusIdName(a.name)
      case other => compositeDistrust(other, _ => false)
    }
  }

  /** Name OR provenance distrust for the logical walk (round-11 verdict
    * #4): `child` is the plan the grouping keys bind over.
    */
  private def idKeyedLogical(exprs: Seq[Expression],
      child: logical.LogicalPlan): Boolean = exprs.exists { e =>
    stripKey(e) match {
      case a: AttributeReference =>
        isCorpusIdName(a.name) || originDistrust(a.exprId.id, child)
      case other =>
        compositeDistrust(other, r => originDistrust(r.exprId.id, child))
    }
  }

  /** Does the attribute with this exprId trace — through pure renames
    * (Project/Alias/Cast, Aggregate grouping-key rebinding, join sides,
    * union branches) — to a distrusted origin: an id-like-NAMED column of
    * a corpus scan (catches renames), or a generator VALUE output fed
    * from a corpus scan (catches exploded-token vocabulary keys,
    * whatever their alias)? Scalar-computed aliases return false here —
    * that is the documented composite-expression gap, pinned by its
    * PlanSpec control. Checkpoint leaves (`LogicalRDD`) fall back to the
    * name list — their pre-checkpoint lineage is gone, but since round 12
    * every checkpoint site runs the gate on its OWN pre-checkpoint plan
    * ([[guardedCheckpoint]]), so nothing upstream of a leaf goes unwalked.
    */
  private def originDistrust(id: Long, plan: logical.LogicalPlan): Boolean = plan match {
    case p: logical.Project =>
      p.projectList.find(_.exprId.id == id) match {
        case Some(al: Alias) => stripKey(al) match {
          case ar: AttributeReference => originDistrust(ar.exprId.id, p.child)
          case other =>
            // scalar-composite derivation (round 13): bounded-class
            // bucketing stays trusted; any other scalar over a distrusted
            // origin inherits the distrust — closes the
            // `floor(doc_id/1000).as("blk")` projection-laundering arm
            compositeDistrust(other, r => originDistrust(r.exprId.id, p.child))
        }
        case _ => originDistrust(id, p.child)
      }
    case g: logical.Generate =>
      if (g.generatorOutput.exists(_.exprId.id == id)) {
        import org.apache.spark.sql.catalyst.expressions.{ExplodeBase, PosExplode}
        val isPosOutput = g.generator.isInstanceOf[PosExplode] &&
          g.generatorOutput.headOption.exists(_.exprId.id == id)
        // a generator whose ELEMENT domain is bounded by construction
        // (chars from split-by-'', literal-bounded struct arrays) emits a
        // bounded key whatever corpus content feeds it (round 13)
        val boundedGen = g.generator match {
          case eb: ExplodeBase => boundedElements(eb.child)
          case _ => false
        }
        !isPosOutput && !boundedGen &&
          g.generator.references.exists(r => corpusDescendedRef(r.exprId.id, g.child))
      } else originDistrust(id, g.child)
    case a: logical.Aggregate =>
      a.aggregateExpressions.find(_.exprId.id == id) match {
        case Some(al: Alias) => stripKey(al) match {
          case ar: AttributeReference => originDistrust(ar.exprId.id, a.child)
          case other
              if other.exists(_.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]) =>
            false // an aggregate-function VALUE, not a key lineage
          case other =>
            // a grouping-key composite re-emitted through the aggregate
            // output: same round-13 classification as the Project arm
            compositeDistrust(other, r => originDistrust(r.exprId.id, a.child))
        }
        case _ => originDistrust(id, a.child)
      }
    case j: logical.Join =>
      if (j.left.outputSet.exists(_.exprId.id == id)) originDistrust(id, j.left)
      else if (j.right.outputSet.exists(_.exprId.id == id)) originDistrust(id, j.right)
      else false
    case u: logical.Union =>
      val idx = u.output.indexWhere(_.exprId.id == id)
      idx >= 0 && u.children.exists { c =>
        idx < c.output.size && originDistrust(c.output(idx).exprId.id, c)
      }
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      val paths = r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
      !isDimensionScan(paths) &&
        r.output.find(_.exprId.id == id).exists(a => isCorpusIdName(a.name))
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.output.find(_.exprId.id == id).exists(a => isCorpusIdName(a.name))
    // a key emerging through a GLOBAL limit has at most `limit` distinct
    // values whatever its deeper lineage — the top-K-vocabulary idiom
    // (x56: the model keys on the limit(vocabSize) frame's own token
    // column, which is bounded BY the limit) (round 13)
    case gl: logical.GlobalLimit if gl.limitExpr.foldable => false
    case _: logical.LocalRelation | _: logical.OneRowRelation | _: logical.Range =>
      false
    case other if other.children.nonEmpty =>
      other.children.find(_.outputSet.exists(_.exprId.id == id)) match {
        case Some(c) => originDistrust(id, c)
        case None => false
      }
    case _ => false
  }

  /** [[idKeyedLogical]]'s physical twin (round 12): the FORCED-broadcast
    * class must pass the logical layer, but a stats-chosen BNLJ or
    * cartesian build is decided in the PHYSICAL plan, where a renamed id
    * or an exploded-token alias would dodge the surface-name check just
    * as it dodged the logical one. Same two distrusted origins, traced
    * over SparkPlan nodes.
    */
  private def idKeyedPhysical(exprs: Seq[Expression], child: SparkPlan): Boolean =
    exprs.exists { e =>
      stripKey(e) match {
        case a: AttributeReference => originDistrustPhys(a.exprId.id, child)
        case other =>
          compositeDistrust(other, r => originDistrustPhys(r.exprId.id, child))
      }
    }

  private def originDistrustPhys(id: Long, plan: SparkPlan): Boolean = plan match {
    case p: ProjectExec =>
      p.projectList.find(_.exprId.id == id) match {
        case Some(al: Alias) => stripKey(al) match {
          case ar: AttributeReference => originDistrustPhys(ar.exprId.id, p.child)
          case other =>
            // round-13 composite classification — the physical twin of the
            // logical Project arm
            compositeDistrust(other, r => originDistrustPhys(r.exprId.id, p.child))
        }
        case _ => originDistrustPhys(id, p.child)
      }
    case g: GenerateExec =>
      if (g.generatorOutput.exists(_.exprId.id == id)) {
        import org.apache.spark.sql.catalyst.expressions.{ExplodeBase, PosExplode}
        val isPosOutput = g.generator.isInstanceOf[PosExplode] &&
          g.generatorOutput.headOption.exists(_.exprId.id == id)
        val boundedGen = g.generator match {
          case eb: ExplodeBase => boundedElements(eb.child)
          case _ => false
        }
        !isPosOutput && !boundedGen &&
          g.generator.references.exists(r => corpusDescendedRefPhys(r.exprId.id, g.child))
      } else originDistrustPhys(id, g.child)
    case a: BaseAggregateExec =>
      // a composite grouping key's defining Alias lives in
      // groupingExpressions (PhysicalAggregation pulls complex keys into
      // the aggregate itself), while resultExpressions only re-emit its
      // AttributeReference — search both, aliases first (round 13)
      val defining = a.groupingExpressions
        .collectFirst { case al: Alias if al.exprId.id == id => al }
        .orElse(a.resultExpressions.find(_.exprId.id == id))
      defining match {
        case Some(al: Alias) => stripKey(al) match {
          case ar: AttributeReference => originDistrustPhys(ar.exprId.id, a.child)
          case other
              if other.exists(_.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]) =>
            false // an aggregate-function VALUE
          case other =>
            compositeDistrust(other, r => originDistrustPhys(r.exprId.id, a.child))
        }
        case _ => originDistrustPhys(id, a.child)
      }
    case s: FileSourceScanExec =>
      !isDimensionScan(s.relation.location.rootPaths.map(_.toString)) &&
        s.output.find(_.exprId.id == id).exists(a => isCorpusIdName(a.name))
    case r: RDDScanExec =>
      r.output.find(_.exprId.id == id).exists(a => isCorpusIdName(a.name))
    // the GlobalLimit trust boundary's physical forms — see originDistrust
    case _: GlobalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => false
    case _: LocalTableScanExec => false
    // exprId-REMAPPING wrappers: continue by POSITION into the wrapped plan
    case im: InMemoryTableScanExec =>
      // index via the RELATION's full output, not the scan's: im.output is
      // the pruned/reordered requested subset, while relation.output is
      // positionally aligned with cachedPlan.output (round-12 review
      // finding — a two-column cache pruned to the second column traced
      // the wrong lineage under the scan-positional form)
      val idx = im.relation.output.indexWhere(_.exprId.id == id)
      idx >= 0 && idx < im.relation.cachedPlan.output.size &&
        originDistrustPhys(im.relation.cachedPlan.output(idx).exprId.id,
          im.relation.cachedPlan)
    case r: ReusedExchangeExec =>
      val idx = r.output.indexWhere(_.exprId.id == id)
      idx >= 0 && idx < r.child.output.size &&
        originDistrustPhys(r.child.output(idx).exprId.id, r.child)
    case u: UnionExec =>
      val idx = u.output.indexWhere(_.exprId.id == id)
      idx >= 0 && u.children.exists { c =>
        idx < c.output.size && originDistrustPhys(c.output(idx).exprId.id, c)
      }
    case aq: AdaptiveSparkPlanExec => originDistrustPhys(id, aq.executedPlan)
    case q: QueryStageExec => originDistrustPhys(id, q.plan)
    case other if other.children.nonEmpty =>
      other.children.find(_.outputSet.exists(_.exprId.id == id)) match {
        case Some(c) => originDistrustPhys(id, c)
        case None => false
      }
    case _ => false
  }

  private def corpusDescendedRefPhys(id: Long, plan: SparkPlan): Boolean = plan match {
    case p: ProjectExec =>
      p.projectList.find(_.exprId.id == id) match {
        case Some(al: Alias) =>
          al.child.references.exists(r => corpusDescendedRefPhys(r.exprId.id, p.child))
        case _ => corpusDescendedRefPhys(id, p.child)
      }
    case g: GenerateExec =>
      if (g.generatorOutput.exists(_.exprId.id == id))
        g.generator.references.exists(r => corpusDescendedRefPhys(r.exprId.id, g.child))
      else corpusDescendedRefPhys(id, g.child)
    case a: BaseAggregateExec =>
      // groupingExpressions aliases first — see originDistrustPhys
      a.groupingExpressions
        .collectFirst { case al: Alias if al.exprId.id == id => al }
        .orElse(a.resultExpressions.find(_.exprId.id == id)) match {
        case Some(al: Alias) =>
          al.child.references.exists(r => corpusDescendedRefPhys(r.exprId.id, a.child))
        case _ => corpusDescendedRefPhys(id, a.child)
      }
    case s: FileSourceScanExec =>
      !isDimensionScan(s.relation.location.rootPaths.map(_.toString))
    case _: RDDScanExec => true
    case _: LocalTableScanExec => false
    case im: InMemoryTableScanExec =>
      // relation.output, not im.output — see originDistrustPhys
      val idx = im.relation.output.indexWhere(_.exprId.id == id)
      idx >= 0 && idx < im.relation.cachedPlan.output.size &&
        corpusDescendedRefPhys(im.relation.cachedPlan.output(idx).exprId.id,
          im.relation.cachedPlan)
    case r: ReusedExchangeExec =>
      val idx = r.output.indexWhere(_.exprId.id == id)
      idx >= 0 && idx < r.child.output.size &&
        corpusDescendedRefPhys(r.child.output(idx).exprId.id, r.child)
    case u: UnionExec =>
      val idx = u.output.indexWhere(_.exprId.id == id)
      idx >= 0 && u.children.exists { c =>
        idx < c.output.size && corpusDescendedRefPhys(c.output(idx).exprId.id, c)
      }
    case aq: AdaptiveSparkPlanExec => corpusDescendedRefPhys(id, aq.executedPlan)
    case q: QueryStageExec => corpusDescendedRefPhys(id, q.plan)
    case other if other.children.nonEmpty =>
      other.children.find(_.outputSet.exists(_.exprId.id == id)) match {
        case Some(c) => corpusDescendedRefPhys(id, c)
        case None => false
      }
    case _ => false
  }

  /** Does the attribute descend — through ANY chain, renames or
    * computations — from a corpus-scale relation? The generator-input
    * test for [[originDistrust]]: `explode(split(text))` distrusts
    * because `text` reaches the documents scan, while exploding an array
    * literal or a LocalRelation column stays trusted.
    */
  private def corpusDescendedRef(id: Long, plan: logical.LogicalPlan): Boolean = plan match {
    case p: logical.Project =>
      p.projectList.find(_.exprId.id == id) match {
        case Some(al: Alias) =>
          al.child.references.exists(r => corpusDescendedRef(r.exprId.id, p.child))
        case _ => corpusDescendedRef(id, p.child)
      }
    case g: logical.Generate =>
      if (g.generatorOutput.exists(_.exprId.id == id))
        g.generator.references.exists(r => corpusDescendedRef(r.exprId.id, g.child))
      else corpusDescendedRef(id, g.child)
    case a: logical.Aggregate =>
      a.aggregateExpressions.find(_.exprId.id == id) match {
        case Some(al: Alias) =>
          al.child.references.exists(r => corpusDescendedRef(r.exprId.id, a.child))
        case _ => corpusDescendedRef(id, a.child)
      }
    case j: logical.Join =>
      if (j.left.outputSet.exists(_.exprId.id == id)) corpusDescendedRef(id, j.left)
      else if (j.right.outputSet.exists(_.exprId.id == id)) corpusDescendedRef(id, j.right)
      else false
    case u: logical.Union =>
      val idx = u.output.indexWhere(_.exprId.id == id)
      idx >= 0 && u.children.exists { c =>
        idx < c.output.size && corpusDescendedRef(c.output(idx).exprId.id, c)
      }
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      val paths = r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
      !isDimensionScan(paths)
    case _: org.apache.spark.sql.execution.LogicalRDD => true
    case _: logical.LocalRelation | _: logical.OneRowRelation | _: logical.Range =>
      false
    case other if other.children.nonEmpty =>
      other.children.find(_.outputSet.exists(_.exprId.id == id)) match {
        case Some(c) => corpusDescendedRef(id, c)
        case None => false
      }
    case _ => false
  }

  /** Is `side` of join `j` unique per its equi-join keys — i.e. an
    * Aggregate/Distinct/Deduplicate keyed on (a subset of) the join keys,
    * reachable through attribute-only wrappers? Then the join emits at
    * most one row from this side per key value, so |output| ≤ |other
    * side|: the join as a whole is bounded whenever the other side is.
    * This is what keeps the legitimate x33 shape — per-term df frame
    * (grouped on term, corpus-derived) inner-joined to a LITERAL query's
    * distinct terms — a valid hint target after the aggregate distrust.
    */
  private def uniqueOnJoinKeys(j: logical.Join, checkLeft: Boolean): Boolean = {
    val side = if (checkLeft) j.left else j.right
    val sideOut = side.outputSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    val keys = j.condition.toSeq.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (sideOut.contains(a)) Some(a.exprId.id)
        else if (sideOut.contains(b)) Some(b.exprId.id)
        else None
      case _ => None
    }.toSet
    @scala.annotation.tailrec
    def unique(p: logical.LogicalPlan): Boolean = p match {
      case h: logical.ResolvedHint => unique(h.child)
      case s: logical.SubqueryAlias => unique(s.child)
      case pr: logical.Project
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        unique(pr.child)
      case a: logical.Aggregate =>
        a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
          case ar: AttributeReference => keys.contains(ar.exprId.id)
          case _ => false
        }
      case d: logical.Distinct =>
        d.output.forall(at => keys.contains(at.exprId.id))
      case dd: logical.Deduplicate =>
        dd.keys.forall(at => keys.contains(at.exprId.id))
      case _ => false
    }
    keys.nonEmpty && unique(side)
  }

  private def logicalCorpusLeaf(p: logical.LogicalPlan): Option[String] = p match {
    // ---- cardinality bounds (pre-optimizer forms included) ----
    // An aggregate bounds cardinality ONLY when its keys are metadata-
    // cardinality (round-10 verdict #2 closed): grouped on a corpus-id /
    // vocabulary key it is itself corpus-sized, so the distrusted form
    // recurses — the subtree stays allowed if a REAL bound (literal
    // IN-list, limit, local relation, bounded join) sits below.
    case a: logical.Aggregate =>
      if (idKeyedLogical(a.groupingExpressions, a.child)) logicalCorpusLeaf(a.child)
      else None
    case d: logical.Distinct =>
      if (d.output.exists(at =>
          isCorpusIdName(at.name) || originDistrust(at.exprId.id, d.child)))
        logicalCorpusLeaf(d.child)
      else None
    case dd: logical.Deduplicate =>
      if (dd.keys.exists(at =>
          isCorpusIdName(at.name) || originDistrust(at.exprId.id, dd.child)))
        logicalCorpusLeaf(dd.child)
      else None
    case _: logical.GlobalLimit | _: logical.LocalLimit => None
    // top-k-per-group (the repo's window-rank ≤ literal idiom): |groups|·k
    // rows — bounded under the same metadata-cardinality-groups assumption
    // the Aggregate bound already makes
    case f: logical.Filter if hasLiteralInList(f.condition) || isTopKFilter(f) => None
    // ---- joins that bound their own output ----
    // semi/anti emit a subset of the LEFT side — the right side's
    // cardinality never reaches the output
    case j: logical.Join if j.joinType == LeftSemi || j.joinType == LeftAnti =>
      logicalCorpusLeaf(j.left)
    // an inner equi-join with one side bounded and the other unique per
    // join key emits ≤ |bounded side| rows
    case j: logical.Join if j.joinType == Inner && j.condition.isDefined =>
      val lLeaf = logicalCorpusLeaf(j.left)
      val rLeaf = logicalCorpusLeaf(j.right)
      (lLeaf, rLeaf) match {
        case (None, None) => None
        case (None, Some(_)) if uniqueOnJoinKeys(j, checkLeft = false) => None
        case (Some(_), None) if uniqueOnJoinKeys(j, checkLeft = true) => None
        case _ => lLeaf.orElse(rLeaf)
      }
    // ---- bounded leaves ----
    case _: logical.LocalRelation | _: logical.OneRowRelation |
        _: logical.Range => None
    // ---- corpus-scale leaves ----
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      val paths = r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
      if (isDimensionScan(paths)) None
      else Some(s"file relation ${paths.take(1).mkString}")
    case r: org.apache.spark.sql.execution.LogicalRDD =>
      Some(s"checkpoint/RDD leaf ${r.nodeName}")
    // ---- anything else: leaves are bounded, inner nodes ask children ----
    case leaf if leaf.children.isEmpty => None
    case other => other.children.view.flatMap(logicalCorpusLeaf).headOption
  }

  /** First corpus-scale leaf reachable from `p` without passing a
    * cardinality bound, as a description — None = side is bounded.
    *
    * `localLimitBounds` (round-11 ADVICE): a bare `LocalLimitExec(n)`
    * carries n × numPartitions rows — that grows with corpus partition
    * count, so it is NOT metadata-sized for a join build side. It IS the
    * right bound for the single-partition-funnel walk, whose subject is a
    * global limit's lower half (the exchange child): the rows entering
    * the one task are ≤ n per upstream partition and the global limit
    * above discards all but n. Join walks pass false (GlobalLimit /
    * CollectLimit / TakeOrdered — which every API-built limit plans above
    * its LocalLimit — still bound them); funnel walks pass true.
    */
  private def corpusLeaf(p: SparkPlan,
      localLimitBounds: Boolean = false): Option[String] = p match {
    // ---- cardinality bounds: stop, subtree is metadata-sized ----
    // The id-keyed distrust applies here too (round 11): a per-doc or
    // per-term aggregate is corpus-sized, and unlike a stats-chosen
    // broadcast-hash join — which re-plans as a shuffle at scale — a
    // BNLJ/cartesian has NO safe shape for the planner to fall back to,
    // so an id-keyed aggregate feeding one is a hazard at every scale.
    case a: BaseAggregateExec =>
      if (idKeyed(a.groupingExpressions) ||
          idKeyedPhysical(a.groupingExpressions, a.child))
        corpusLeaf(a.child, localLimitBounds)
      else None
    case _: GlobalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => None
    case _: LocalLimitExec if localLimitBounds => None
    case f: FilterExec if hasLiteralInList(f.condition) => None
    // ---- corpus-scale leaves ----
    case s: FileSourceScanExec =>
      Some(s"file scan ${s.tableIdentifier.map(_.toString)
        .getOrElse(s.relation.location.rootPaths.take(1).mkString)}")
    case r: RDDScanExec => Some(s"checkpoint/RDD leaf ${r.nodeName}")
    // ---- transparent wrappers ----
    case a: AdaptiveSparkPlanExec => corpusLeaf(a.executedPlan, localLimitBounds)
    case q: QueryStageExec => corpusLeaf(q.plan, localLimitBounds)
    case im: InMemoryTableScanExec => corpusLeaf(im.relation.cachedPlan, localLimitBounds)
    case r: ReusedExchangeExec => corpusLeaf(r.child, localLimitBounds)
    // ---- anything else: a leaf is bounded, an inner node passes the
    //      question to its children (joins/unions/projections/windows
    //      never bound cardinality) ----
    case leaf if leaf.children.isEmpty => None
    case other => other.children.view.flatMap(corpusLeaf(_, localLimitBounds)).headOption
  }

  /** Does the predicate contain a literal IN-list (In with literal values,
    * or the optimizer's InSet form)? The bounded-key filter idiom.
    */
  private def hasLiteralInList(cond: Expression): Boolean = cond.exists {
    case In(_, values) =>
      values.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal])
    case _: InSet => true
    case _ => false
  }

  /** Pre-order walk that also descends through AQE wrappers, cached
    * relations, and reused exchanges — `SparkPlan.foreach` stops at leaf
    * nodes like InMemoryTableScan, which is exactly where persisted
    * corpus frames hide.
    */
  private def foreachNode(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    kids.foreach(foreachNode(_)(f))
  }
}
