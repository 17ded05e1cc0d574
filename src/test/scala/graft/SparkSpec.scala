package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite; small parallelism so
  * the whole suite stays fast).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  // getOrCreate shares one SparkContext across all suites in the forked
  // test JVM — deliberately NOT stopped per-suite (a stop() in afterAll
  // would kill the context under suites still running).
  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  val sf0001 = "/root/testdata/sf0.001"
}
