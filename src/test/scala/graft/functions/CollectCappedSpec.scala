package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CollectCappedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def postings(n: Int, hotEvery: Int) = {
    import spark.implicits._
    // deterministic skewed postings: key "hot" collects every hotEvery-th
    // element, the rest spread over 97 cold keys; duplicate elements per
    // key included (i % 13) so sorting ties are exercised.
    (0 until n).map { i =>
      val k = if (i % hotEvery == 0) "hot" else s"k${i % 97}"
      (k, (i % 13).toLong, s"p$i")
    }.toDF("bk", "doc_id", "payload")
  }

  test("scalar elements: capped aggregate == two-pass HAVING form, bucket by bucket") {
    graft.functions.GraftFunctions.register(spark)
    val p = postings(5000, 3)
    val cap = 40
    val one = p.groupBy("bk")
      .agg(expr(s"collect_sorted_capped(doc_id, $cap)").as("ds"))
      .filter(col("ds").isNotNull)
    val two = p.groupBy("bk")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= cap)
    assert(one.exceptAll(two).isEmpty && two.exceptAll(one).isEmpty,
      "single-pass and two-pass bucket lists must agree exactly")
    // the hot key (5000/3 ≈ 1667 > cap) must be absent from BOTH
    assert(one.filter(col("bk") === "hot").count() == 0)
  }

  test("struct elements: ordering matches sort_array's field-by-field order") {
    graft.functions.GraftFunctions.register(spark)
    val p = postings(3000, 5)
      .select(col("bk"), struct(col("doc_id"), col("payload")).as("e"))
    val cap = 50
    val one = p.groupBy("bk")
      .agg(expr(s"collect_sorted_capped(e, $cap)").as("ds"))
      .filter(col("ds").isNotNull)
    val two = p.groupBy("bk")
      .agg(sort_array(collect_list(col("e"))).as("ds"))
      .filter(size(col("ds")) <= cap)
    assert(one.exceptAll(two).isEmpty && two.exceptAll(one).isEmpty,
      "struct buckets must agree (order included)")
  }

  test("cap boundary: == cap kept complete, cap+1 dropped; nulls skipped") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = (1 to 3).map(i => ("at", Some(i.toLong))) ++
      (1 to 4).map(i => ("over", Some(i.toLong))) ++
      Seq(("at", Option.empty[Long]))  // null input must not count toward the cap
    val df = rows.toDF("bk", "v")
    val got = df.groupBy("bk")
      .agg(expr("collect_sorted_capped(v, 3)").as("ds"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got("at").contains(Seq(1L, 2L, 3L)), s"exactly-cap bucket complete: $got")
    assert(got("over").isEmpty, s"cap+1 bucket must be NULL: $got")
  }

  test("sort-based fallback regime (>128 keys): equivalence holds past the hash-map threshold") {
    // ObjectHashAggregateExec falls back to sort-based aggregation once the
    // in-memory map passes spark.sql.objectHashAggregate.sortBased.
    // fallbackThreshold (default 128 keys) — the regime every real shingle/
    // band postings frame runs in. The fallback path drives update() on
    // key-sorted runs instead of map probes; the capped aggregate must not
    // care. 997 keys forces the fallback on every partition.
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val p = (0 until 60000).map { i =>
      val k = if (i % 40 == 0) "hot" else s"k${i % 997}"
      (k, (i % 7).toLong)
    }.toDF("bk", "doc_id")
    val cap = 45
    val one = p.groupBy("bk")
      .agg(expr(s"collect_sorted_capped(doc_id, $cap)").as("ds"))
      .filter(col("ds").isNotNull)
    val two = p.groupBy("bk")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= cap)
    assert(one.exceptAll(two).isEmpty && two.exceptAll(one).isEmpty,
      "fallback-regime bucket lists must agree exactly")
    assert(one.filter(col("bk") === "hot").count() == 0, "hot key dropped")
  }

  test("arity and cap validation are loud") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("bk", "v")
    intercept[Exception] {
      df.groupBy("bk").agg(expr("collect_sorted_capped(v)")).collect()
    }
    intercept[Exception] {
      df.groupBy("bk").agg(expr("collect_sorted_capped(v, 0)")).collect()
    }
    intercept[Exception] { // non-foldable cap
      df.groupBy("bk").agg(expr("collect_sorted_capped(v, CAST(v AS INT))")).collect()
    }
  }
}
