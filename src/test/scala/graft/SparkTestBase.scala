package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per JVM; sbt forks a single test JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.get("local[4]", shufflePartitions = 4)
}

trait SparkTestBase { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkTestBase.spark
}
