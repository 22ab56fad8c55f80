package graft

/** Dev smoke: runs the driver's `entry` contract exactly as the harness does
  * (sf0.001, rows > 0) and prints the result head.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("graft-smoke", "local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, false)
    spark.stop()
  }
}
