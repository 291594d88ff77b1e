package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (one JVM-wide session — suites
  * run against the same config as production code via GraftSession).
  */
trait SparkSpecBase extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession =
    core.GraftSession.builder(master = "local[4]", appName = "graft-test",
      shufflePartitions = 4)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse")
      .getOrCreate()

  def sc = spark.sparkContext
}
