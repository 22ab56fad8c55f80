package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("as-of picks the latest right row at or before each left row, per key") {
    val left = Seq(
      (1L, "k1", ts(100)),
      (2L, "k1", ts(200)),
      (3L, "k1", ts(50)),   // before every right row → null
      (4L, "k2", ts(100))   // key with no right rows → null
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", ts(100), 10L),  // equal timestamp: inclusive (<=)
      ("k1", ts(100), 11L),  // tie on ts → larger tie column wins
      ("k1", ts(150), 12L)
    ).toDF("key", "rt", "ref")

    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", "ref", Seq("ref"))
      .orderBy("id").collect()
    val got = out.map(r => r.getAs[Long]("id") ->
      Option(r.getAs[java.lang.Long]("asof_ref")).map(_.toLong)).toMap
    assert(got(1L) === Some(11L)) // t=100: inclusive, tie broken upward
    assert(got(2L) === Some(12L)) // t=200: latest right at 150
    assert(got(3L) === None)      // nothing at or before t=50
    assert(got(4L) === None)      // no rows for k2
  }

  test("tolerance-bounded as-of nulls stale matches; the boundary is inclusive") {
    val left = Seq(
      (1L, "k1", ts(200)),  // match at 150, 50 s old → inside tol=60
      (2L, "k1", ts(210)),  // match at 150, exactly 60 s old → inclusive
      (3L, "k1", ts(211)),  // match at 150, 61 s old → stale, NULL
      (4L, "k2", ts(100))   // no right rows at all → NULL
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", ts(100), 10L),
      ("k1", ts(150), 12L)
    ).toDF("key", "rt", "ref")

    val out = AsOfJoin.asOfWithin(left, right, Seq("key"), "t", "rt", "ref",
      Seq("ref"), toleranceSec = 60L).orderBy("id").collect()
    val got = out.map(r => r.getAs[Long]("id") ->
      Option(r.getAs[java.lang.Long]("asof_ref")).map(_.toLong)).toMap
    assert(got(1L) === Some(12L))
    assert(got(2L) === Some(12L)) // leftTs − rightTs == tol: kept
    // NOT 10L: the tolerance bounds the MOST RECENT match, it never
    // falls back to an even older row
    assert(got(3L) === None)
    assert(got(4L) === None)
  }

  test("nearest: min |Δt| either direction, equal distances prefer backward") {
    val left = Seq(
      (1L, "k1", ts(110)),  // back=100 (d10), fwd=150 (d40) → back 10
      (2L, "k1", ts(140)),  // back=100 (d40), fwd=150 (d10) → fwd 12
      (3L, "k1", ts(125)),  // equidistant (25/25) → backward wins
      (4L, "k1", ts(60)),   // before all rights → forward 10
      (5L, "k2", ts(100))   // no rights → null
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", ts(100), 10L),
      ("k1", ts(100), 11L), // backward ties → larger ref
      ("k1", ts(150), 12L),
      ("k1", ts(150), 13L)  // forward ties → smaller ref... but backward
    ).toDF("key", "rt", "ref")
    val out = AsOfJoin.asOfNearest(left, right, Seq("key"), "t", "rt", "ref", Seq("ref"))
      .orderBy("id").collect()
    val got = out.map(r => r.getAs[Long]("id") ->
      Option(r.getAs[java.lang.Long]("asof_ref")).map(_.toLong)).toMap
    assert(got(1L) === Some(11L)) // backward at 100, tie → 11
    assert(got(2L) === Some(12L)) // forward at 150, tie → smaller ref 12
    assert(got(3L) === Some(11L)) // equidistant → backward
    assert(got(4L) === Some(10L)) // nothing behind → earliest ahead, tie → smaller ref
    assert(got(5L) === None)
  }
}
