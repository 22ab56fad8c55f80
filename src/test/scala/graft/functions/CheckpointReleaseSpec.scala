package graft.functions

import graft.SparkSpec

class CheckpointReleaseSpec extends SparkSpec {
  import spark.implicits._

  test("release actually frees a localCheckpoint's RDD blocks (not a silent no-op)") {
    // the helper pattern-matches the analyzed plan for LogicalRDD; if a
    // Spark upgrade changed the checkpoint leaf's shape the match would
    // silently stop releasing — pin the observable effect: the persistent
    // RDD registered by the checkpoint disappears after release
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cp = (1L to 100L).toDF("x").localCheckpoint(true)
    assert(cp.count() === 100L)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint(true) registered no persistent RDD")
    org.apache.spark.sql.graft.CheckpointRelease.release(cp)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      s"release left checkpoint RDDs ${added.intersect(after)} persisted")
  }

  test("release is a safe no-op on a plain (non-checkpoint) frame") {
    val df = (1L to 10L).toDF("x")
    org.apache.spark.sql.graft.CheckpointRelease.release(df)
    assert(df.count() === 10L)
  }
}
