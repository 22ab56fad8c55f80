package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi join equals the plain semi join") {
    val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "payload")
    // build side: every 7th key up to 700, plus keys that do NOT exist in
    // big (semi join must ignore them), plus duplicates (distinct build)
    val small = ((7L to 700L by 7) ++ Seq(999999L, 999999L, -5L))
      .map(k => (k, "x")).toDF("sk", "junk")
    val viaBloom = BloomFilter.semiJoin(big, small, "k", "sk")
      .select("k").as[Long].collect().sorted
    val plain = big.join(small.select("sk").distinct(),
        $"k" === $"sk", "left_semi")
      .select("k").as[Long].collect().sorted
    assert(viaBloom.sameElements(plain))
    assert(viaBloom.length === 100)
  }

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (1L to 2000L).map(i => Tuple1(i * 31 + 7)).toDF("k")
    val bits = BloomFilter.buildBits(keys, "k", numBits = 1 << 12)
    // a deliberately small bitmap (4096 bits for 2000 keys) has false
    // positives — but zero false negatives is the structural guarantee
    val kept = keys.filter(BloomFilter.mightContain(bits)($"k")).count()
    assert(kept === 2000L)
  }

  test("bitmap size is bounded by numBits, not row count") {
    val keys = (1L to 10000L).map(Tuple1(_)).toDF("k")
    val bits = BloomFilter.buildBits(keys, "k", numBits = 1 << 10)
    assert(bits.length === (1 << 10) / 64)
  }

  test("prefilter passes a superset of true keys and a small fraction of misses") {
    val truth = (1L to 500L).map(Tuple1(_)).toDF("k")
    val bits = BloomFilter.buildBits(truth, "k")
    // probe 10k keys far outside the inserted range: with 2^17 bits for
    // 500 keys the false-positive rate is ~0, but assert only "not all
    // pass" so the test pins pruning without depending on hash details
    val misses = (1000000L to 1010000L).map(Tuple1(_)).toDF("k")
    val fp = misses.filter(BloomFilter.mightContain(bits)($"k")).count()
    assert(fp < 100, s"false-positive count unexpectedly high: $fp")
  }
}
