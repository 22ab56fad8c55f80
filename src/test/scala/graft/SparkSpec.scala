package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object TestSession {
  lazy val spark: SparkSession = {
    val s = Tables.session("graft-test", "local[4]", 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSession.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** The session is shared across every suite in the JVM, and many ops
    * `persist()` their self-join inputs: without this, CacheManager entries
    * (strong refs to in-memory relations) accumulate over the whole run
    * until the old gen fills and the suite GC-thrashes. Dropping the cache
    * when a suite finishes keeps the run's footprint one-suite-sized.
    */
  override protected def afterAll(): Unit = {
    spark.sqlContext.clearCache()
    super.afterAll()
  }
}
