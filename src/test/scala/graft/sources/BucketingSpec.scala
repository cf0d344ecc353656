package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Proves the Layout.writeBucketed scale story: two tables bucketed on the
  * join key sort-merge-join with ZERO shuffle exchanges — the layout that
  * makes repeated 100 TB fact⋈fact joins exchange-free on both sides. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without any Exchange") {
    val sf = TestSpark.sf
    Layout.writeBucketed(graft.Tables.orders(spark, sf), "orders_bkt",
      "o_custkey", 8, sortCol = Some("o_custkey"))
    Layout.writeBucketed(graft.Tables.customer(spark, sf), "customer_bkt",
      "c_custkey", 8, sortCol = Some("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge path so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      j.count() // materialize so AQE finalizes the plan
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free bucketed join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
