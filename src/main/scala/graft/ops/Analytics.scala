package graft.ops

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Analytics breadth beyond the §2 micro-inventory: pivot, grouping sets,
  * percentiles, date arithmetic, lateral explode, union-by-name, range
  * frames, navigation windows, array aggregation, approximate distinct, and
  * a multi-join SQL demo — the surface an analytics user of the engine
  * reaches for next.
  */
object Analytics extends AnalyticsOlapQueries with AnalyticsGovernanceQueries {

  private[ops] def cents(c: String) = expr(graft.Tables.centsSql(c))

  /** The reproducible md5 hash-bucket bits every deterministic assignment
    * query derives from — an_hash_sample / an_train_split /
    * an_experiment_srm share the 15-hex (60-bit) form and an_fixed_sample
    * the 12-hex (48-bit) form. ONE definition per
    * engine ([[duckHashBits]] is the oracle twin) so the cross-query
    * "same bucket bits" reproducibility contract is enforced by
    * construction, not by keeping 5 hand-copied expressions in sync. */
  /** Total-variation drift of each `unit`'s `cell` distribution against
    * the corpus-wide mix — THE one drift pipeline (round 17: an_shard_drift
    * and tx_length_drift restated it near-verbatim; a TV-arithmetic fix
    * applied to one would silently desynchronize the two monitors that are
    * documented as the same mechanism). `rows` = one row per item with
    * (unit, cell) columns; output = (unit, <nOut> item count, tv_micro),
    * computed over the FULL unit×cell grid (absent cells coalesce to 0) in
    * integer micro-shares. The oracle SQL stays literal per query — the
    * per-round oracle hash gate is its tripwire (the normFp contract). */
  private[graft] def tvDriftByUnit(rows: org.apache.spark.sql.DataFrame,
      unit: String, cell: String, nOut: String): org.apache.spark.sql.DataFrame = {
    val sh = rows.groupBy(col(unit), col(cell)).agg(count(lit(1)).as("cnt"))
    val tot = sh.groupBy(col(unit)).agg(sum(col("cnt")).as("tot"))
    val g = sh.groupBy(col(cell)).agg(sum(col("cnt")).as("gcnt"))
    val gt = g.agg(sum(col("gcnt")).as("gtot"))
    tot.crossJoin(broadcast(g)).crossJoin(broadcast(gt))
      .join(sh, Seq(unit, cell), "left_outer")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("diff_micro",
        abs(expr("(1000000 * cnt) div tot - (1000000 * gcnt) div gtot")))
      .groupBy(col(unit))
      .agg(sum(col("cnt")).as(nOut), sum(col("diff_micro")).as("tv_micro"))
  }

  private[ops] def hashBits(idCol: String, hexDigits: Int): String =
    s"CAST(conv(substr(md5(CAST($idCol AS STRING)), 1, $hexDigits), 16, 10) AS BIGINT)"

  /** [[hashBits]]'s DuckDB twin. */
  private[ops] def duckHashBits(idCol: String, hexDigits: Int): String =
    s"CAST(('0x' || substr(md5(CAST($idCol AS VARCHAR)), 1, $hexDigits)) AS BIGINT)"

  /** The production one-pass HLL++ sketch path for distinct counting —
    * mergeable per-partition sketches, one shuffle of sketch state (not
    * rows). Formerly registered as `an_approx_distinct`; the raw estimate is
    * engine-specific (no DuckDB analog), so the registered, hash-checked form
    * is [[an_approx_distinct_bound]], which runs this same sketch alongside
    * the exact count and emits a portable bound verdict. Kept as a named
    * helper so AnalyticsSpec can bound the pure sketch plan (5% rsd at
    * sf0.1) without registering an un-oracled query. */
  def approxDistinctSketch(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")

  /** The production one-pass KLL/GK-style quantile sketch path
    * (`percentile_approx`) — mergeable sketches, no per-group row buffering.
    * Formerly registered as `an_approx_percentile`; the estimate is
    * engine-specific, so the registered form is
    * [[an_approx_percentile_bound]] (same sketch + exact nearest-rank check,
    * portable verdict). Spec-bounded against the exact percentile at sf0.1. */
  def approxPercentileSketch(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_extendedprice, array(0.5D, 0.95D), 10000)")
        .as("approx_p50_p95"))
      .selectExpr("l_returnflag",
        "approx_p50_p95[0] AS approx_p50", "approx_p50_p95[1] AS approx_p95")
      .orderBy("l_returnflag")

  /** Assembled from the two query-family traits (round-17 split along the
    * OLAP/governance seams; the Dedup/Similarity/TextStats splits are the
    * template). Lazy trait vals — their oracle strings interpolate
    * object-body vals. Order within `defs` is not load-bearing
    * (SparkEntry maps by name; DumpPlans sorts by name). */
  val defs: Seq[QueryDef] = olapDefs ++ governanceDefs

  /** Phase 1 of the two-phase balanced rank: rank rows by (md5(doc_id),
    * doc_id) within each (lang, input-partition) group and keep the top
    * `k`. The global per-lang top-k is a subset of the union of
    * per-partition top-ks (the standard top-k merge property), so phase 2's
    * per-lang window ranks at most k·numPartitions rows per stratum — no
    * task ever sorts O(stratum), whatever the skew. The result is invariant
    * to the physical partitioning (any superset of the global top-k yields
    * the same phase-2 pick), so task retries and repartitioned reruns
    * produce identical output even though `spark_partition_id` itself is
    * not stable. */
  private[ops] def balancedSamplePhase1(
      docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val wLocal = Window
      .partitionBy(col("lang"), col("pid"))
      .orderBy(col("hkey").asc, col("doc_id").asc)
    docs
      .withColumn("hkey", expr("md5(CAST(doc_id AS STRING))"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lpick", row_number().over(wLocal))
      .filter(col("lpick") <= k)
      .drop("pid", "lpick")
  }
}

