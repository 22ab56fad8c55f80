package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val data = (1L to 1000L).map(v => ("a", v)).toDF("g", "v")

  test("discrete percentiles: smallest value reaching the target rank") {
    val out = Percentiles.discrete(data, "g", $"v", Seq(0.5, 0.9), "pct")
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(out(0.5) === 500L)
    assert(out(0.9) === 900L)
  }

  test("checked variant passes with honest accuracy and reports exact values") {
    val out = Percentiles.discreteChecked(data, "g", $"v", Seq(0.5, 0.95), "pct")
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Boolean]("sketch_ok"))
      val p = r.getAs[Double]("p")
      assert(r.getAs[Long]("pct") === math.ceil(p * 1000).toLong)
    }
  }

  test("checked variant raises when the sketch cannot meet the window") {
    // adversarial shape for a low-accuracy sketch: the true median (rank
    // 5001) is the FIRST value after a 5000-deep duplicate run, so a rank
    // error of ±n/accuracy lands almost anywhere in [1, 1001] value-space
    // while the near-zero window demands exactly 2..3 — the assert fires
    val skewed = (Seq.fill(5000)(1L) ++ (2L to 5002L)).map(v => ("a", v))
      .toDF("g", "v")
    val ex = intercept[Throwable] {
      Percentiles.discreteChecked(skewed, "g", $"v", Seq(0.5), "pct",
        accuracy = 10, delta = 1e-9).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("percentile_approx outside")),
      ex.toString)
  }

  test("decileReport: value-defined buckets, ties never split, counts and sums partition") {
    // values 1..100: bounds at 10,20,…,90 → deciles of exactly 10 rows
    val df = (1L to 100L).toDF("v")
    val out = Percentiles.decileReport(df, $"v").collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_v"))).toMap
    assert(out.keySet === (1L to 10L).toSet)
    assert(out.values.map(_._1).sum === 100L)
    assert(out(1L) === ((10L, (1L to 10L).sum)))
    assert(out(10L) === ((10L, (91L to 100L).sum)))
    // heavy ties: one value dominating a boundary all lands in ONE decile
    val tied = (Seq.fill(95)(5L) ++ Seq(1L, 2L, 3L, 4L, 6L)).toDF("v")
    val t = Percentiles.decileReport(tied, $"v").collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("n_rows")).toMap
    assert(t.values.sum === 100L)
    assert(t.getOrElse(1L, 0L) >= 95L || t.exists(_._2 >= 95L)) // the run stays whole
  }

  test("mad: lower-median of absolute deviations, exact on asymmetric data") {
    // g=a: values 1,2,3,10 → lower median = 2 (cum 2 ≥ ⌈4/2⌉), deviations
    // |1-2|,|0|,|1|,|8| = 1,0,1,8 → sorted 0,1,1,8 → lower median = 1
    // g=b: values 5,5,5 → median 5, deviations 0,0,0 → mad 0
    val df = (Seq(1L, 2L, 3L, 10L).map(("a", _)) ++ Seq(5L, 5L, 5L).map(("b", _)))
      .toDF("g", "v")
    val out = Percentiles.mad(df, "g", $"v", "mad").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("median"), r.getAs[Long]("mad"), r.getAs[Long]("n_rows"))).toMap
    assert(out("a") === ((2L, 1L, 4L)))
    assert(out("b") === ((5L, 0L, 3L)))
  }
}
