package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + fixtures for all suites: one lazy local session per
  * JVM (suites fork once via sbt), sf0.001 as the standard fixture. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
  val sf: String = "/root/testdata/sf0.001"
}
