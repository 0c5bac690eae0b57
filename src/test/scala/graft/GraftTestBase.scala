package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session per suite (guide: one SparkSession per suite). */
trait GraftTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf001 = "/root/testdata/sf0.001"
}
