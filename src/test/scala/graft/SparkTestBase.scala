package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One session for the whole forked test JVM — Spark local sessions are
  * expensive to start and getOrCreate() shares the context across suites.
  * Config mirrors graft.Verify (the driver's correctness gate) so tests
  * observe the same semantics the gate does.
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("4")
      // Unique warehouse per test JVM: managed tables (BucketingSpec)
      // never collide with a stale on-disk location, and nothing lands
      // in the repo tree.
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SharedSpark.spark
  /** Smallest driver-generated scale factor — smoke/correctness data. */
  val sf: String = "/root/testdata/sf0.001"
}
