package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Windows.newUsersDaily]]'s first-seen
  * half (the b24 batch query): live "new signups today" — each user counts
  * exactly once, on the day of their FIRST event, no matter how many events
  * or micro-batches follow. `dropDuplicates("user_id")` keeps one state
  * record per user (the minimal dedup state — same class as the
  * transition twin's last-event record) and passes through only each key's
  * first arrival; the daily count then aggregates those firsts in Complete
  * mode (the b21 pattern — day counts are revised as batches land, which
  * is what a live dashboard wants).
  *
  * Ordering contract: per-user event-time order across micro-batches (the
  * same Kafka key-partitioned feed contract as [[StreamingTransitions]]);
  * within that contract the first arrival IS the min-ts event, so
  * streaming ≡ batch first-seen (spec-pinned over feed splits).
  *
  * At scale: state is one record per DISTINCT user ever seen — the same
  * cardinality the batch job's first-seen aggregation shuffles — and the
  * downstream count frame is day-sized metadata.
  */
object StreamingNewUsers {

  def newUsersDaily(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    events
      .select(col(keyCol), col(tsCol))
      .dropDuplicates(keyCol)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("new_users"))
}
