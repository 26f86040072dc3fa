package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.GraftSession

/** Shared local SparkSession for all specs (one per test JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder(appName = "graft-test", master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark
}
