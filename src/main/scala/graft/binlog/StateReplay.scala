package graft.binlog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Final-state reconstruction from the DML stream — the query every binlog
  * consumer ultimately materializes (the reference ships the stream into
  * ClickHouse precisely so "what does the row look like NOW?" is answerable
  * next to "what happened?"; `README.md:99-118` keys the event table by
  * gtid/position for exactly this replay). Semantically this is Kafka
  * log compaction / a Delta-Hudi upsert merge: latest record per key wins,
  * a tombstone op removes the key.
  *
  * Scale shape: ONE aggregation — `max(struct(pos, …))` rides the unique
  * monotone position, so the "latest per key" needs no sort window and
  * partial-aggregates map-side before the only shuffle (the same
  * argmax-by-struct discipline as A1–A8's `max_by` rows; it plans as
  * SortAggregate because struct buffers aren't hash-aggregable — the
  * partial still runs before the exchange, which is the load-bearing
  * property, PlanSpec-pinned). A 100 TB replay compacts each partition to
  * |keys| rows before anything moves.
  */
object StateReplay {

  /** Latest-record-per-key compaction over the binlog-shaped frame
    * ([[BinlogEvents.shape]]): `gtid` plays the row key, `event_type` the
    * DML verb, and rows whose LAST op is `deleteOp` are tombstoned away.
    * `n_ops` counts the full history (deletes included) — the compaction
    * ratio |events| / |keys| falls out of it.
    *
    * Runs UNCHANGED as a Structured Streaming aggregation (Complete mode):
    * the struct-max is an incrementally-maintainable agg, so each
    * micro-batch updates only touched keys, and a tombstone arriving later
    * RETRACTS its key from the output — the continuously-maintained mirror
    * table a binlog consumer actually serves (spec-attested stream ≡
    * batch, the b14 twin discipline).
    */
  def currentState(binlog: DataFrame, deleteOp: String = "error"): DataFrame =
    binlog
      .select(col("gtid"), BinlogEvents.pos.as("pos"),
        col("event_type").as("op"), BinlogEvents.sizeBytes.as("size_bytes"))
      .groupBy(col("gtid"))
      .agg(count(lit(1)).as("n_ops"),
        max(struct(col("pos"), col("op"), col("size_bytes"))).as("m"))
      .filter(col("m.op") =!= deleteOp)
      .select(col("gtid"), col("n_ops"),
        col("m.pos").as("last_pos"), col("m.op").as("last_op"),
        col("m.size_bytes").as("last_size"))
}
