package graft.operators

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // driver-side twin of the sketch arithmetic — same literal constants
  private def driverCountMin(keys: Seq[Long], w: Long): Map[Long, Long] = {
    val p = 2147483647L
    val counts = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val buckets = Sketches.hashRows.zipWithIndex.map { case ((a, b), r) =>
      keys.groupBy(key => (key * a + b) % p % w).view.mapValues(_.size.toLong).toMap
    }
    counts.keys.map { key =>
      key -> Sketches.hashRows.zipWithIndex.map { case ((a, b), r) =>
        buckets(r)((key * a + b) % p % w)
      }.min
    }.toMap
  }

  test("countMinChecked: estimate ≡ driver-side sketch, never undercounts, collisions overcount") {
    // w = 4 forces collisions; keys with very different frequencies
    val keys: Seq[Long] = Seq.fill(40)(7L) ++ Seq.fill(25)(13L) ++
      Seq.fill(9)(101L) ++ (200L until 230L) // 30 singletons
    val df = keys.toDF("user_id")
    val r = Sketches.countMinChecked(df, w = 4, k = 50).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("cm_est"),
          x.getAs[Long]("overcount"), x.getAs[Boolean]("sketch_ok")))
      .toMap
    val twin = driverCountMin(keys, 4L)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    r.foreach { case (key, (n, est, over, ok)) =>
      assert(n === exact(key))
      assert(est === twin(key), s"key $key")
      assert(est >= n && over === est - n && ok)
    }
    // the fixture genuinely collides at w = 4: someone overcounts
    assert(r.values.exists(_._3 > 0L))
    // top-k ordering: counts descending, ties broken by smaller key
    val order = Sketches.countMinChecked(df, w = 4, k = 5).collect()
      .map(x => (x.getAs[Long]("n_events"), x.getAs[Long]("user_id")))
    assert(order.head === ((40L, 7L)))
    assert(order.sliding(2).forall { case Array((n1, k1), (n2, k2)) =>
      n1 > n2 || (n1 == n2 && k1 < k2) })
  }

  test("estimates: a key the sketch never saw reads 0 when a cell is empty, and never vanishes (ADVICE r6)") {
    import org.apache.spark.sql.functions.col
    // sketch built over keys 1..5 only; probe with an arbitrary-key read
    // side including keys absent at build time — the merged-streamed-sketch
    // contract. Inner-join semantics dropped such keys (no matching cell)
    // or overstated them (min over < d rows); left+coalesce reads the
    // true empty-cell 0.
    val sketch = Sketches.sketchPartials((1L to 5L).flatMap(k => Seq.fill(3)(k))
      .toDF("user_id"), w = 256)
    val probe = Seq(3L, 999983L, 424242L).toDF("key")
    val est = Sketches.estimates(probe, sketch, w = 256).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("cm_est")).toMap
    assert(est.keySet === Set(3L, 999983L, 424242L), "absent keys must not vanish")
    assert(est(3L) >= 3L) // present key: at least its true count
    // absent keys: in a 256-wide sketch holding 15 events, at least one of
    // the 4 cells is empty with near-certainty for these fixed constants —
    // count-min's answer is 0, not an overstated partial min
    assert(est(999983L) === 0L && est(424242L) === 0L)
    // and the estimate can never undercount: 0 ≤ true count (= 0) holds
  }

  test("countMinMergedProbe: slice-merged sketch ≡ single-pass sketch; absent keys read 0") {
    // two slices whose union is keys 1..6 ×3 — merging the per-slice
    // partials must reproduce the single-pass counters exactly (addition
    // is exact and order-free), and the probe's absent tail (max+1…max+5)
    // must come back as real rows with n_events = 0
    val events = (1L to 6L).flatMap(k => Seq.fill(3)((k, if (k <= 3) "a" else "b")))
      .toDF("user_id", "event_type")
    val merged = Sketches.mergeSketch(
      Sketches.sketchPartialsBySlice(events, "user_id", "event_type", w = 256))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("c")).toMap
    val single = Sketches.sketchPartials(events, "user_id", w = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("c")).toMap
    assert(merged === single)
    val probe = Sketches.countMinMergedProbe(events, mod = 2L).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("cm_est"))).toMap
    // present sample: even keys; absent tail: 7..11 with exact count 0
    assert(probe.keySet === Set(2L, 4L, 6L, 7L, 8L, 9L, 10L, 11L))
    Seq(2L, 4L, 6L).foreach { k => assert(probe(k)._1 === 3L && probe(k)._2 >= 3L) }
    (7L to 11L).foreach { k => assert(probe(k)._1 === 0L && probe(k)._2 >= 0L) }
  }

  test("countMinChecked: wide sketch on spread keys is exact (no colliders in some row)") {
    // 256 buckets, 10 distinct keys — collisions in ALL FOUR rows at once
    // are overwhelmingly unlikely for these fixed constants; pin that the
    // min over rows recovers every exact count
    val keys: Seq[Long] = (0L until 10L).flatMap(k => Seq.fill((k + 1).toInt)(k * 997L))
    val r = Sketches.countMinChecked(keys.toDF("user_id"), w = 256, k = 10)
      .collect().map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("overcount"))).toMap
    val twin = driverCountMin(keys, 256L)
    r.foreach { case (key, (n, over)) =>
      assert(twin(key) === n + over)
      assert(over === 0L, s"key $key overcounted in a 256-wide sketch")
    }
  }
}
