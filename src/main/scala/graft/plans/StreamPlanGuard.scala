package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}
import org.apache.spark.sql.streaming.StreamingQuery

/** [[graft.plans.PlanGuard]] over STREAMING micro-batch plans (round-11
  * verdict #3): the per-query gate and the fleet sweep only ever walked
  * BATCH plans, so a hazard inside a streaming twin — `streamDupFlags`'
  * hinted stream-static corpus join in round 11 — was findable only by
  * hand review. This walks the LAST micro-batch's `IncrementalExecution`
  * through the same two guard layers (physical corpus products/funnels;
  * logical hinted broadcasts — hints survive analysis, so the analyzed
  * micro-batch plan still carries them). Every streaming twin's spec
  * asserts a drained query clean through here; the negative control (a
  * deliberately hinted stream-static corpus join) pins that the walk
  * actually sees through the micro-batch machinery.
  *
  * Lives in `org.apache.spark.sql.graft` (the [[CheckpointRelease]]
  * pattern) because `StreamingQueryWrapper` — the public handle's
  * concrete class, and the only path to `StreamExecution.lastExecution`
  * — is `private[sql]`.
  *
  * A query that has processed NO batch reports a violation rather than
  * silence: a spec asserting "guard-clean" on a never-run stream would
  * otherwise pass vacuously.
  */
object StreamPlanGuard {
  def violations(q: StreamingQuery): Seq[String] = {
    val exec: StreamExecution = q match {
      case w: StreamingQueryWrapper => w.streamingQuery
      case s: StreamExecution => s
      case other =>
        return Seq(s"unrecognized StreamingQuery implementation ${other.getClass.getName}")
    }
    Option(exec.lastExecution) match {
      case None =>
        Seq("no micro-batch has executed — nothing to walk (drain the " +
          "stream before asserting guard-clean)")
      case Some(le) =>
        graft.plans.PlanGuard.corpusProductViolations(le.executedPlan) ++
          graft.plans.PlanGuard.hintedBroadcastViolations(le.analyzed)
    }
  }

  /** Throws with every violation listed — the streaming analog of
    * [[graft.plans.PlanGuard.assertNoCorpusProducts]].
    */
  def assertClean(name: String, q: StreamingQuery): Unit = {
    val v = violations(q)
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"[planguard:stream] $name: ${v.size} hazard(s) in the last micro-batch plan:\n  " +
          v.mkString("\n  "))
  }
}
