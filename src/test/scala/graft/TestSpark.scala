package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Sessions defaults = the same
  * semantics Verify/Bench run with). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4")
  val sf: String = "/root/testdata/sf0.001"
}
