package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session; tests run
  * in a forked JVM per build.sbt).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.quiet(
      GraftSession.builder("graft-test", "local[4]", shufflePartitions = 4)
        .getOrCreate())
}
