package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, In, InSet}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
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
  *   - an aggregate (totals rows, distinct vocabularies, per-key reports —
  *     every broadcast-fed aggregate in this codebase groups on
  *     metadata-cardinality keys),
  *   - a global limit / top-k / local limit (a bare LocalLimit is the
  *     lower half of a global limit's two-phase plan — the shuffled rows
  *     are ≤ n per upstream partition),
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
        corpusLeaf(e.child).foreach { leaf =>
          joins += s"SinglePartition shuffle funnels a corpus-unbounded child: $leaf" +
            s"\n    child subtree:\n" +
            e.child.treeString.linesIterator.take(10).map("      " + _).mkString("\n")
        }
      case c: CoalesceExec if c.numPartitions == 1 =>
        corpusLeaf(c.child).foreach { leaf =>
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
    * yet). Scans of the schema-fixed dimension tables (nation: 25 rows,
    * region: 5 — cardinalities set by the data model, independent of
    * scale factor) are bounded leaves: broadcasting a dimension is the
    * canonical correct use of the hint.
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
    * scan names one of the constant-size dimension tables.
    */
  private def isDimensionScan(paths: Seq[String]): Boolean =
    paths.nonEmpty && paths.forall { p =>
      val last = p.stripSuffix("/").split('/').last.toLowerCase
      last.startsWith("nation") || last.startsWith("region")
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
    ids.nonEmpty && f.condition.exists {
      case cmp: BinaryComparison =>
        (refsRank(cmp.left) && cmp.right.foldable) ||
          (refsRank(cmp.right) && cmp.left.foldable)
      case _ => false
    }
  }

  private def logicalCorpusLeaf(p: logical.LogicalPlan): Option[String] = p match {
    // ---- cardinality bounds (pre-optimizer forms included) ----
    case _: logical.Aggregate | _: logical.Distinct | _: logical.Deduplicate => None
    case _: logical.GlobalLimit | _: logical.LocalLimit => None
    // top-k-per-group (the repo's window-rank ≤ literal idiom): |groups|·k
    // rows — bounded under the same metadata-cardinality-groups assumption
    // the Aggregate bound already makes
    case f: logical.Filter if hasLiteralInList(f.condition) || isTopKFilter(f) => None
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
    */
  private def corpusLeaf(p: SparkPlan): Option[String] = p match {
    // ---- cardinality bounds: stop, subtree is metadata-sized ----
    case _: BaseAggregateExec => None
    case _: GlobalLimitExec | _: CollectLimitExec | _: LocalLimitExec |
        _: TakeOrderedAndProjectExec => None
    case f: FilterExec if hasLiteralInList(f.condition) => None
    // ---- corpus-scale leaves ----
    case s: FileSourceScanExec =>
      Some(s"file scan ${s.tableIdentifier.map(_.toString)
        .getOrElse(s.relation.location.rootPaths.take(1).mkString)}")
    case r: RDDScanExec => Some(s"checkpoint/RDD leaf ${r.nodeName}")
    // ---- transparent wrappers ----
    case a: AdaptiveSparkPlanExec => corpusLeaf(a.executedPlan)
    case q: QueryStageExec => corpusLeaf(q.plan)
    case im: InMemoryTableScanExec => corpusLeaf(im.relation.cachedPlan)
    case r: ReusedExchangeExec => corpusLeaf(r.child)
    // ---- anything else: a leaf is bounded, an inner node passes the
    //      question to its children (joins/unions/projections/windows
    //      never bound cardinality) ----
    case leaf if leaf.children.isEmpty => None
    case other => other.children.view.flatMap(corpusLeaf).headOption
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
