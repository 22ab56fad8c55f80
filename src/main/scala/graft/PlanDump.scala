package graft

import java.nio.file.{Files, Paths}

/** Plan-evidence dump (optimization rounds): writes `explain("formatted")`
  * for each registry query to `<outDir>/<name>.txt`, so before/after plan
  * claims in OPTIMIZATION_r*.md are checkable from committed files without
  * running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [prefixes]
  *   prefixes — comma-separated query-name prefixes (default: all).
  *
  * The dump is the ANALYZED-then-optimized initial physical plan (what
  * `df.explain("formatted")` prints before execution, i.e. with
  * `AdaptiveSparkPlan isFinalPlan=false` wrappers); it shows join strategy,
  * Exchange placement, PushedFilters and ReadSchema — the shapes the
  * optimization guide says to audit. Queries that build artifacts on first
  * touch still do so (plan construction may run side-effecting builds).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Seq.empty[String])
      case Array(s, o, f) => (s, o, f.split(',').toSeq.filter(_.nonEmpty))
      case _ =>
        System.err.println(
          "usage: runMain graft.PlanDump <sfDir> <outDir> [prefixes]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.session("graft-plandump", s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nOk = 0
    var nFail = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
          nOk += 1
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
            nFail += 1
        }
        spark.sqlContext.clearCache()
      }
    println(s"""{"metric":"plandump","out":"$outDir","n_ok":$nOk,"n_fail":$nFail}""")
    spark.stop()
  }
}
