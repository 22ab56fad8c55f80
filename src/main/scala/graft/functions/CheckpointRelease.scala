package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Deterministic release of an eagerly local-checkpointed frame's blocks.
  *
  * `Dataset.unpersist()` only evicts CacheManager entries; a
  * `localCheckpoint(true)` result is a `LogicalRDD` whose blocks live as
  * RDD-level persistence the CacheManager never sees, so the iterative
  * loops that checkpoint per round (BPE training state, the distributed
  * trainer's max-sim frame) would otherwise hold every superseded round's
  * corpus-sized block set until GC + ContextCleaner catch up — disk-fill
  * pressure the old persist/count/unpersist pattern released eagerly
  * (round-8 review finding). This reaches through the analyzed plan to the
  * checkpointed RDD and unpersists it directly.
  *
  * Unpersisting a locally-checkpointed RDD INVALIDATES it (Spark's
  * documented contract), so this must only ever run on a round's
  * superseded predecessor — never on a frame that will be read again.
  */
object CheckpointRelease {
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(blocking = false)
      ()
    case _ => () // not a checkpoint leaf (e.g. the loop's round-0 frame)
  }
}
