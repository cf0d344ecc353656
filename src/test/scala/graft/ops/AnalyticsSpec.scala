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

  test("an_approx_percentile: sketch within 1% of the exact percentile per group at sf0.1") {
    val sf = "/root/testdata/sf0.1"
    val q = Analytics.defs.find(_.name == "an_approx_percentile").get
    val approx = q.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("p"))
      .selectExpr("l_returnflag", "p[0] AS p50", "p[1] AS p95")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.01, s"$k p50: approx=$a50 exact=$p50")
      assert(math.abs(a95 - p95) / p95 <= 0.01, s"$k p95: approx=$a95 exact=$p95")
    }
  }

  test("an_balanced_sample: exactly 30 per stratum, deterministic, coarse-filter-consistent") {
    val sf = TestSpark.sf
    val q = Analytics.defs.find(_.name == "an_balanced_sample").get
    val rows = q.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val perLang = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang.nonEmpty && perLang.values.forall(_ == 30),
      s"every stratum must yield exactly its target count: $perLang")
    // determinism: a second run picks the identical rows (no RNG anywhere)
    val again = q.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("an_skew_report: top-5 via distributed TakeOrdered, shares consistent") {
    val sf = TestSpark.sf
    val q = Analytics.defs.find(_.name == "an_skew_report").get
    val df = q.fn(spark, sf)
    // the top-k must be a TakeOrdered, not a global single-partition window
    // ranking every key
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$plan")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    // descending by weight, and each share is n_rows/n_total in permille
    val weights = rows.map(_.getLong(2))
    assert(weights.sameElements(weights.sortBy(-_)))
    rows.foreach(r => assert(r.getLong(3) == 1000 * r.getLong(2) / r.getLong(5)))
  }

  test("an_balanced_sample: one giant stratum — global window input stays O(k·partitions)") {
    import spark.implicits._
    // 50k-row single-language stratum spread over 8 partitions: the naive
    // per-stratum window would sort all 50k rows in ONE task. Phase 1 must
    // cap its output at k rows per (lang, partition) — the bound the global
    // window then ranks — while still containing the true global top-k.
    val giant = spark.range(0, 50000).toDF("doc_id")
      .withColumn("lang", lit("xx")).repartition(8)
    val p1 = Analytics.balancedSamplePhase1(giant.select($"lang", $"doc_id"), 30)
    val survivors = p1.count()
    assert(survivors <= 30L * 8, s"phase 1 must emit <= k rows per partition: $survivors")
    // superset-safety: phase 1 survivors contain the exact global top-30,
    // so the two-phase pick equals the naive single-window pick.
    val naive = giant
      .withColumn("hkey", md5(col("doc_id").cast("string")))
      .orderBy($"hkey".asc, $"doc_id".asc).limit(30)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val picked = p1.orderBy($"hkey".asc, $"doc_id".asc).limit(30)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(picked == naive)
    // a stratum smaller than k yields ALL its rows (the contract the old
    // coarse-bucket prefilter silently broke on small strata)
    val tiny = Seq.tabulate(7)(i => ("yy", i.toLong)).toDF("lang", "doc_id")
    assert(Analytics.balancedSamplePhase1(tiny, 30).count() == 7)
  }
}
