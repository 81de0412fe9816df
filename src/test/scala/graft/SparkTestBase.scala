package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM — per-suite
  * sessions would pay ~5s of SparkContext startup each. Never stopped;
  * the forked JVM exit tears it down.
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
