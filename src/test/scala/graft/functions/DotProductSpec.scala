package graft.functions

import graft.SparkSpec

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0), Array(1.0, 1.0))
  ).toDF("id", "a", "b")

  test("codegen and interpreted paths agree with the HOF formulation") {
    import org.apache.spark.sql.functions._
    val withAll = df.select(
      col("id"),
      VectorFunctions.dotProduct(col("a"), col("b")).as("expr_dot"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        .as("hof_dot"))
    val rows = withAll.orderBy("id").collect()
    assert(rows.map(_.getDouble(1)).toSeq === Seq(32.0, 0.0))
    assert(rows.map(r => r.getDouble(1) == r.getDouble(2)).forall(identity))
  }

  test("null input yields null; length mismatch folds the shorter prefix") {
    import org.apache.spark.sql.functions._
    val odd = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(10.0)),    // prefix: 1*10
      (2L, null.asInstanceOf[Array[Double]], Array(1.0))
    ).toDF("id", "a", "b")
    val rows = odd.select(col("id"), VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 10.0)
    assert(rows(1).isNullAt(1))
  }

  test("a null element propagates null (matches the HOF fold / list_dot_product)") {
    import org.apache.spark.sql.functions._
    val withNullElem = Seq(
      (1L, Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](4.0, 5.0, 6.0)),
      (2L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val rows = withNullElem
      .select(col("id"), VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getDouble(1) === 11.0)
  }

  test("non-nullable inputs (containsNull = false) compile and evaluate in codegen") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // a schema where both the columns and their elements are non-null makes
    // DotProduct.nullable = false — ev.isNull is then the literal `false`
    // and the generated code must not assign to it
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("b", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1.0, 2.0), Seq(3.0, 4.0)),
        Row(Seq(0.5, 0.5), Seq(2.0, 2.0))),
      schema)
    val out = df.select(VectorFunctions.dotProduct(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b")).as("d"))
    assert(!out.schema.head.nullable)
    assert(out.collect().map(_.getDouble(0)).sorted.toSeq === Seq(2.0, 11.0))
  }

  test("SQL surface matches the Column surface") {
    val a = spark.sql("SELECT dot_product(array(1.0d,2.0d), array(3.0d,4.0d))").collect().head.getDouble(0)
    assert(a === 11.0)
  }
}
