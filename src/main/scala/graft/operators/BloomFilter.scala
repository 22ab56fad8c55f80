package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter pruning: collapse a huge probe side BEFORE its
  * shuffle using a metadata-sized bitmap built from the small side.
  *
  * The 100 TB shape this serves: `big ⋉ small` where `small` is filtered at
  * runtime (so static partition pruning can't help) and `big` is far too
  * large to shuffle in full. Spark's own runtime row-group filters cover
  * some of these shapes; this operator is the explicit, composable form —
  * build a fixed-size bit array (one `bit_or` aggregation over the small
  * side's key hashes, collected as `numBits / 64` longs — bounded metadata,
  * independent of data volume), broadcast it as a literal, and probe with
  * pure codegen'd built-ins (`xxhash64` / `pmod` / shifts / `element_at`).
  * False positives are harmless: an exact semi join over the survivors
  * restores exactness, but it now shuffles only the ~selectivity fraction
  * of `big` instead of all of it.
  *
  * No false negatives by construction (every true key set all of its own
  * bits), so `filter(mightContain)` never drops a real match — the property
  * BloomFilterSpec pins and the t30 oracle (a plain `IN` subquery) attests
  * end to end.
  */
object BloomFilter {

  /** Build the bitmap: k hash positions per key, OR'd into `numBits / 64`
    * words. One narrow aggregation over the build side; the collect is
    * bounded by `numBits` (default 2^17 bits = 2 KiB of longs), never by
    * row count.
    */
  def buildBits(keys: DataFrame, keyCol: String, numBits: Int = 1 << 17,
      numHashes: Int = 3): Array[Long] = {
    require(numBits > 0 && (numBits & 63) == 0, "numBits must be a multiple of 64")
    val words = keys
      .select(explode(array((0 until numHashes).map(i =>
        pmod(xxhash64(col(keyCol), lit(i)), lit(numBits.toLong))): _*)).as("bit"))
      .select(shiftright(col("bit"), 6).cast("int").as("word"),
        call_function("shiftleft", lit(1L),
          col("bit").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Probe predicate over the broadcast bitmap — all codegen'd built-ins,
    * so the filter runs inside the scan's WholeStageCodegen span.
    */
  def mightContain(bits: Array[Long], numHashes: Int = 3)(key: Column): Column = {
    val numBits = bits.length.toLong * 64
    val bitsCol = lit(bits)
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(numBits))
      val word = shiftright(pos, 6).cast("int")
      val mask = call_function("shiftleft", lit(1L),
        pos.bitwiseAND(lit(63L)).cast("int"))
      element_at(bitsCol, word + 1).bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Exact semi join with a Bloom prefilter on the big side: result is
    * identical to `big.join(smallKeys, ..., "left_semi")` (the oracle
    * property); the benefit is that only Bloom survivors reach the join.
    */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, numBits: Int = 1 << 17, numHashes: Int = 3): DataFrame = {
    val keys = small.select(col(smallKey)).distinct()
    val bits = buildBits(keys, smallKey, numBits, numHashes)
    big
      .filter(mightContain(bits, numHashes)(col(bigKey)))
      .join(keys, col(bigKey) === col(smallKey), "left_semi")
  }
}
