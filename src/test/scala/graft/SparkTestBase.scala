package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps the
  * test run fast). */
object SparkTestBase {
  lazy val spark: SparkSession = Sessions.local("graft-test", cores = 4)
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
