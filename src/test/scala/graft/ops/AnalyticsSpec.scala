package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("an_approx_distinct: HLL estimate within 5% of exact per group at sf0.1") {
    // The query has no DuckDB oracle by design (the estimate is
    // engine-specific), so THIS is its correctness signal: Spark's HLL++
    // default rsd is 5%; assert the relative error per group at the largest
    // local fixture. A broken approx_count_distinct integration (wrong
    // column, wrong grouping, degenerate sketch) lands far outside this.
    val sf = "/root/testdata/sf0.1"
    val q = Analytics.defs.find(_.name == "an_approx_distinct").get
    val approx = q.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k).toDouble - n) / n
      assert(err <= 0.05, s"group $k: approx=${approx(k)} exact=$n relErr=$err")
    }
  }
}
