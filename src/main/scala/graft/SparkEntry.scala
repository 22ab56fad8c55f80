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
  import RegistryLib.binlog

  /** Flagship (driver smoke-checks rows > 0 on sf0.001): all-windows top-1
    * transaction by size — the reference's headline query
    * (`compute_transaction_info.py:53-66`) in its batch-backfill form.
    */
  def entry(spark: SparkSession): DataFrame =
    TransactionStats.top1PerWindow(binlog(spark, "/root/testdata/sf0.001"), "transaction_size")

  /** The complete query surface: the per-domain registry slices merged
    * (split round 7 — verdict #7; each Registry* file stays well under
    * the 2 500-line hygiene bound and owns one query-name prefix).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RegistryB.queries ++ RegistryT.queries ++ RegistryD.queries ++
      RegistryS.queries ++ RegistryX.queries ++ RegistryM.queries

  /** DuckDB oracle SQL per query — same per-domain merge; column names
    * match the Spark side per the driver's sort-by-name hash contract.
    */
  def oracleSql: Map[String, String] =
    RegistryB.oracles ++ RegistryT.oracles ++ RegistryD.oracles ++
      RegistryS.oracles ++ RegistryX.oracles ++ RegistryM.oracles
}
