package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM-wide session; specs run
  * in one forked JVM per `Test / fork := true`).
  */
object GraftSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // view machinery only — NOT the umbrella GraftExtensions, whose
      // VectorKernelRule is A/B-tested per-spec via experimental
      .config("spark.sql.extensions", "graft.plans.GraftViewExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfTiny = "/root/testdata/sf0.001"
  val sfSmall = "/root/testdata/sf0.01"
}

abstract class GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSpec.spark
  def sfTiny: String = GraftSpec.sfTiny
  def sfSmall: String = GraftSpec.sfSmall
}
