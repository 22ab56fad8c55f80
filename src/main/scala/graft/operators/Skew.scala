package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-phase salted aggregation for hot keys.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB a single pathological key (one chatty schema/table in
  * the binlog world, one boilerplate document in dedup) stalls the stage.
  * Salting splits each key into `salts` sub-groups aggregated in parallel,
  * then combines the partials — the manual form of what AQE's skew-join
  * handles for joins but not for aggregations.
  *
  * Only decomposable aggregates (sum/count/min/max) can be salted this way;
  * the combine expressions are the caller's responsibility via the
  * (partial, combine) pair.
  */
object Skew {

  /** Salted count: `groupBy(keys).count()` with a `salts`-way first phase.
    * Result is identical to the direct aggregation (the property the oracle
    * checks); the benefit is parallelism under key skew.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 32,
      countCol: String = "n"): DataFrame = {
    val keyCols = keys.map(col)
    // deterministic salt (hash of a stable row attribute would also do);
    // spark_partition_id is enough to spread a hot key across reducers
    val partials = df
      .withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_partial"))
    partials
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(countCol))
  }

  /** Salted sum of a long column, same contract as [[saltedCount]]. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, salts: Int = 32,
      sumCol: String = "total"): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(sumCol))
  }

  /** Salted equi-join — the manual skew-join for when the small side is too
    * big to broadcast and one key dominates the big side (the case AQE's
    * skew split handles only after a stage has already materialized the
    * skew): the BIG side gets a random-free deterministic salt (hash of its
    * whole row spread across `salts` buckets), the SMALL side is replicated
    * once per salt value, and the join key becomes (key, salt) — a hot key's
    * rows land on `salts` reducers instead of one. Result is exactly the
    * plain inner equi-join (oracle row t20); cost is `salts`× the small
    * side's shuffle volume — the standard replicate-vs-stall trade.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
