package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (spark guide: one lazy session, local mode). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 8, appName = getClass.getSimpleName)
  val sf0001 = "/root/testdata/sf0.001"
}
