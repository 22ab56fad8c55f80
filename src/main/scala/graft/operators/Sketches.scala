package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) under the b13/t37/x32
  * checked-sketch discipline — the fourth sketch family next to HLL
  * distinct counts, approximate percentiles, and freqItems heavy hitters:
  * per-key FREQUENCY estimation in sub-linear state.
  *
  * d = 4 hash rows × `w` additive counters; a key's estimate is the MIN
  * over its d buckets. The sketch can only ever OVERcount (each bucket
  * holds the key's true count plus its colliders' — nothing ever
  * subtracts), and that no-undercount guarantee is the checkable
  * invariant: `assert_true(cm_est ≥ n_events)` folds into the plan per
  * key, so a broken sketch raises instead of shipping wrong estimates.
  *
  * Unlike the HLL/percentile checks — where the estimate itself is
  * engine-specific and only deterministic columns return — the count-min
  * sketch is PURE integer arithmetic over fixed literal hash constants
  * ((a·key + b) mod (2³¹−1) mod w), so both engines build the identical
  * sketch and every output column (estimate and overcount included) is
  * oracle-hashable. The check still earns its keep: it pins the
  * guarantee, not the arithmetic.
  *
  * Scale shape: the sketch is one map-side-combined aggregation into
  * d·w counters (1 024 rows at the default — broadcastable at ANY corpus
  * size, the d35 fixed-bitmap discipline applied to frequencies);
  * estimation joins the per-key exact counts to the broadcast sketch and
  * the top-k emit is a TakeOrdered, never a global sort. The exact
  * counts ride along because the CHECK needs them — a production
  * pipeline that trusts the sketch drops that side and keeps d·w state
  * total, which is the point of the structure.
  */
object Sketches {
  private val P = 2147483647L // 2³¹ − 1, Mersenne prime
  /** Fixed (a, b) per hash row — primes, literal on both engines. */
  private[graft] val hashRows: Seq[(Long, Long)] = Seq(
    (1299709L, 104729L), (15485863L, 32452843L),
    (982451653L, 715225739L), (179424673L, 373587883L))

  private def bucketExpr(a: Long, b: Long, w: Int) =
    (col("key") * lit(a) + lit(b)) % lit(P) % lit(w.toLong)

  private def withCells(keyed: DataFrame, w: Int): DataFrame =
    keyed.select(col("key"), explode(array(hashRows.zipWithIndex.map {
      case ((a, b), i) => struct(lit(i).as("r"), bucketExpr(a, b, w).as("bucket"))
    }: _*)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))

  /** One input slice's sketch counters — (r, bucket, c). Count-min STATES
    * merge by pure addition (each counter is a sum), so a sketch over any
    * union of slices is [[mergeSketch]] of their partials: the
    * AggregatingMergeTree-style MV contract, and what the streaming twin
    * ([[graft.streaming.StreamingMVs.countMinPartialsWriter]]) appends
    * per micro-batch.
    */
  def sketchPartials(events: DataFrame, keyCol: String = "user_id",
      w: Int = 256): DataFrame =
    withCells(events.select(col(keyCol).cast("long").as("key")), w)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Merge sketch partials by addition — exact, order-free. */
  def mergeSketch(partials: DataFrame): DataFrame =
    partials.groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))

  /** Per-key counts with checked count-min estimates: the top-`k` keys by
    * exact count (ties to the smaller key), each with its sketch estimate
    * and integer overcount. Raises if any estimate undercounts.
    */
  def countMinChecked(events: DataFrame, keyCol: String = "user_id",
      w: Int = 256, k: Int = 20): DataFrame = {
    val keyed = events.select(col(keyCol).cast("long").as("key"))
    val sketch = sketchPartials(events, keyCol, w)
    val exact = keyed.groupBy(col("key")).agg(count(lit(1)).as("n_events"))
    estimates(exact, sketch, w)
      .select(col("key").as("user_id"), col("n_events"), col("cm_est"),
        (col("cm_est") - col("n_events")).as("overcount"),
        when(assert_true(col("cm_est") >= col("n_events"),
          concat(lit("count-min undercounted key "), col("key"))).isNull,
          lit(true)).as("sketch_ok"))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(k)
  }

  /** Per-slice sketch partials — (slice, r, bucket, c): the shape a
    * streamed MV appends per micro-batch keyed by what produced it;
    * [[mergeSketch]] folds ANY union of slices into one sketch (counters
    * are sums — addition is exact and order-free).
    */
  def sketchPartialsBySlice(events: DataFrame, keyCol: String = "user_id",
      sliceCol: String = "event_type", w: Int = 256): DataFrame =
    events
      .select(col(sliceCol).as("slice"), col(keyCol).cast("long").as("key"))
      .select(col("slice"), explode(array(hashRows.zipWithIndex.map {
        case ((a, b), i) => struct(lit(i).as("r"), bucketExpr(a, b, w).as("bucket"))
      }: _*)).as("rb"))
      .select(col("slice"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .groupBy(col("slice"), col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Arbitrary-key reads against a MERGED sketch (b32) — the advertised
    * read side of a streamed count-min MV, oracle-attested end to end:
    * partials build per SLICE (`sliceCol` — the micro-batch shape the
    * streaming twin appends), merge by addition, and the probe set mixes
    * keys the build SAW (a deterministic 1-in-`mod` sample of the key
    * domain, exact counts riding along for the check) with keys the build
    * could NOT have seen (max(key) + 1 … + `absent`, exact count 0). The
    * [[estimates]] LEFT-join + coalesce-to-0 contract is what this query
    * pins: an absent key leaves some of its d cells untouched with
    * probability ≥ 1 − loadᵈ, the untouched cell reads 0, and the min
    * returns the true count — where the pre-fix inner join either dropped
    * the key or took the min over fewer cells. The one-sided guarantee
    * (`cm_est ≥ n_events`, here with n_events = 0 included) stays
    * assert_true'd in-plan.
    *
    * Scale shape: the merged sketch is d·w counters (broadcast at any
    * corpus size); the present-key sample is 1/`mod` of the key domain
    * with one map-side-combined count; the probe join is |probe|·d rows.
    */
  def countMinMergedProbe(events: DataFrame, keyCol: String = "user_id",
      sliceCol: String = "event_type", w: Int = 256, mod: Long = 97L,
      absent: Int = 5): DataFrame = {
    val keyed = events.select(col(keyCol).cast("long").as("key"))
    val merged = mergeSketch(sketchPartialsBySlice(events, keyCol, sliceCol, w))
    val present = keyed.filter(pmod(col("key"), lit(mod)) === 0)
      .groupBy(col("key")).agg(count(lit(1)).as("n_events"))
    val absentKeys = keyed.agg(max(col("key")).as("mx"))
      .select(explode(sequence(lit(1), lit(absent))).as("i"), col("mx"))
      .select((col("mx") + col("i")).as("key"), lit(0L).as("n_events"))
    estimates(present.unionByName(absentKeys), merged, w)
      .select(col("key").as("user_id"), col("n_events"), col("cm_est"),
        (col("cm_est") - col("n_events")).as("overcount"),
        when(assert_true(col("cm_est") >= col("n_events"),
          concat(lit("merged count-min undercounted key "), col("key"))).isNull,
          lit(true)).as("sketch_ok"))
      .orderBy(col("user_id"))
  }

  /** Per-key estimates from a (merged) sketch: input must carry a `key`
    * column; every input column rides along, plus `cm_est`.
    *
    * The sketch join is a LEFT join with absent cells coalesced to 0:
    * a (r, bucket) cell no event ever hashed into is simply a zero
    * counter, and count-min's estimate is the min over ALL d rows — an
    * inner join would silently take the min over fewer rows for any key
    * not present at sketch-build time (overstating it, or dropping the
    * key entirely when no cell matches), which breaks the advertised
    * arbitrary-key read side of a merged streamed sketch. For such a key
    * some cell is untouched with probability ≥ 1−(load)ᵈ, so the correct
    * answer — estimate 0 — falls out of the coalesce.
    */
  def estimates(keys: DataFrame, sketch: DataFrame, w: Int = 256): DataFrame = {
    val others = keys.columns.filterNot(_ == "key").map(col)
    withCells(keys, w)
      .join(keys, Seq("key"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy((col("key") +: others): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
  }
}
