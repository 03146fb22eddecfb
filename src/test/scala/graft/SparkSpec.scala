package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local SparkSession for all suites (getOrCreate → one JVM-wide
  * session; sbt forks the test JVM, which exits when the run ends).
  */
trait SparkSpec { this: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.build(4, "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
