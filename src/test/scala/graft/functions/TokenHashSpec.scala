package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenHash

class TokenHashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fold, independent of the expression implementation. */
  private def ref(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  test("matches DuckDB's code-point fold on a known value") {
    // constant computed in DuckDB 1.0: list_reduce(list_prepend(0,
    //   [unicode(c) for c in string_split('héllo','')]), (a,c)->(a*131+c)%2147483647)
    val r = Seq("héllo").toDF("t")
      .select(TokenHash.column(col("t")).as("h")).collect().head.getLong(0)
    assert(r === 1088893576L)
    assert(ref("héllo") === 1088893576L)
  }

  test("empty string folds to 0; null propagates") {
    val rows = Seq((1L, ""), (2L, null)).toDF("id", "t")
      .select(col("id"), TokenHash.column(col("t")).as("h")).orderBy("id").collect()
    assert(rows(0).getLong(1) === 0L)
    assert(rows(1).isNullAt(1))
  }

  test("codegen path equals the reference fold on assorted tokens") {
    val toks = Seq("the", "a", "", "quick", "naïve", "x" * 300, "mixed3tok_en!")
    val out = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), TokenHash.column(col("t")).as("h")).orderBy("id")
      .collect().map(_.getLong(1))
    assert(out.toSeq === toks.map(ref))
  }

  test("SQL-callable via the session extension") {
    val r = spark.sql("SELECT token_hash('the') AS h").collect().head.getLong(0)
    assert(r === ref("the"))
  }

  test("token_hash_array equals elementwise token_hash; nulls preserved") {
    import org.apache.spark.sql.graft.TokenHashArray
    val toks = Seq("the", "", "naïve", "x" * 120)
    val arr = Seq(Tuple1(toks)).toDF("ts")
      .select(TokenHashArray.column(col("ts")).as("ids"))
      .collect().head.getSeq[Long](0)
    assert(arr.toSeq === toks.map(ref))
    // null element stays null (transform semantics); null array stays null
    val withNulls = spark.sql(
      "SELECT token_hash_array(array('a', CAST(NULL AS STRING))) AS ids, " +
        "token_hash_array(CAST(NULL AS ARRAY<STRING>)) AS nids")
      .collect().head
    val ids = withNulls.getSeq[Any](0)
    assert(ids(0) === ref("a") && ids(1) === null)
    assert(withNulls.isNullAt(1))
  }
}
