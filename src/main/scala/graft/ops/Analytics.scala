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
object Analytics {

  private def cents(c: String) = expr(graft.Tables.centsSql(c))

  /** The reproducible md5 hash-bucket bits every deterministic assignment
    * query derives from — an_hash_sample / an_train_split /
    * an_experiment_srm share the 15-hex (60-bit) form and an_fixed_sample
    * the 12-hex (48-bit) form. ONE definition per
    * engine ([[duckHashBits]] is the oracle twin) so the cross-query
    * "same bucket bits" reproducibility contract is enforced by
    * construction, not by keeping 5 hand-copied expressions in sync. */
  private def hashBits(idCol: String, hexDigits: Int): String =
    s"CAST(conv(substr(md5(CAST($idCol AS STRING)), 1, $hexDigits), 16, 10) AS BIGINT)"

  /** [[hashBits]]'s DuckDB twin. */
  private def duckHashBits(idCol: String, hexDigits: Int): String =
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

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "an_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |       COUNT(*) FILTER (o_orderstatus = 'F') AS F,
             |       COUNT(*) FILTER (o_orderstatus = 'O') AS O,
             |       COUNT(*) FILTER (o_orderstatus = 'P') AS P
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "an_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT COALESCE(l_returnflag, '_all_') AS rf,
                |       COALESCE(l_linestatus, '_all_') AS ls,
                |       CAST(grouping_id(l_returnflag, l_linestatus) AS INTEGER) AS gid,
                |       COUNT(*) AS n
                |FROM lineitem_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                |                        (l_returnflag, l_linestatus))
                |ORDER BY rf, ls, gid""".stripMargin)
      },
      Some("""SELECT COALESCE(l_returnflag, '_all_') AS rf,
             |       COALESCE(l_linestatus, '_all_') AS ls,
             |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
             |       COUNT(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
             |                        (l_returnflag, l_linestatus))
             |ORDER BY rf, ls, gid""".stripMargin)),

    QueryDef(
      "an_percentile",
      // one percentile buffer for both quantiles (array form) — halves the
      // value-map build vs two separate percentile() aggregates
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"))
        .select(col("l_returnflag"),
          expr("round(element_at(ps, 1), 4)").as("p50"),
          expr("round(element_at(ps, 2), 4)").as("p90"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QueryDef(
      "an_date_funcs",
      (s, d) => Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          trunc(col("o_orderdate").cast("date"), "month").as("month_start"),
          datediff(to_date(lit("1996-01-01")), col("o_orderdate").cast("date")).as("days_to_96"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       CAST(year(o_orderdate) AS INTEGER) AS y,
             |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
             |       CAST(o_orderdate AS DATE) + 30 AS plus30,
             |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS INTEGER) AS days_to_96
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "an_explode_tokens",
      (s, d) => Tables.part(s, d)
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("tok"))
        .orderBy("p_partkey", "tok"),
      Some("""SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok
             |FROM part WHERE p_partkey <= 200
             |ORDER BY p_partkey, tok""".stripMargin)),

    QueryDef(
      "an_union_by_name",
      (s, d) => {
        val a = Tables.customer(s, d)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_acctbal").as("bal"))
        val b = Tables.supplier(s, d)
          .select(col("s_name").as("name"), col("s_suppkey").as("id"))
        a.unionByName(b.withColumn("bal", lit(null).cast("double")), allowMissingColumns = true)
          .orderBy(col("id").asc, col("name").asc, col("bal").asc_nulls_first)
      },
      Some("""SELECT id, name, bal FROM (
             |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
             |  UNION ALL BY NAME
             |  SELECT s_name AS name, s_suppkey AS id, NULL::DOUBLE AS bal FROM supplier)
             |ORDER BY id ASC, name ASC, bal ASC NULLS FIRST""".stripMargin)),

    QueryDef(
      "an_window_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
          .rangeBetween(-1000000L, 0L)
        Tables.orders(s, d)
          .withColumn("cents", cents("o_totalprice"))
          .withColumn("n_within_10k", count(lit(1)).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("cents"), col("n_within_10k"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, cents,
             |       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY cents
             |            RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS n_within_10k
             |FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QueryDef(
      "an_window_nav",
      (s, d) => {
        val order = Window.partitionBy(col("o_custkey"))
          .orderBy(col("cents").asc, col("o_orderkey").asc)
        val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .withColumn("cents", cents("o_totalprice"))
          .withColumn("drank", dense_rank().over(order))
          .withColumn("ntile4", ntile(4).over(order))
          .withColumn("cheapest", first(col("o_orderkey")).over(full))
          .withColumn("dearest", last(col("o_orderkey")).over(full))
          .select(col("o_custkey"), col("o_orderkey"), col("drank"), col("ntile4"),
            col("cheapest"), col("dearest"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(dense_rank() OVER w AS INTEGER) AS drank,
             |       CAST(ntile(4) OVER w AS INTEGER) AS ntile4,
             |       first_value(o_orderkey) OVER wf AS cheapest,
             |       last_value(o_orderkey) OVER wf AS dearest
             |FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents ASC, o_orderkey ASC),
             |       wf AS (PARTITION BY o_custkey ORDER BY cents ASC, o_orderkey ASC
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QueryDef(
      "an_array_agg",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_custkey") <= 50)
        .groupBy(col("o_custkey"))
        // Serialized deterministically (sorted, comma-joined) so the result
        // is a flat string column both engines hash identically.
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("orderkeys"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
             |FROM orders WHERE o_custkey <= 50
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    /** Registered form of the HLL++ distinct-count sketch: the raw
      * [[approxDistinctSketch]] estimate has no DuckDB analog, but its
      * CONTRACT is portable. The default rsd=0.05 is a relative STANDARD
      * DEVIATION, not a hard bound — ~32% of estimates sit outside 1σ by
      * definition, so testing |approx − exact| ≤ rsd would flake at some
      * cardinality. The companion asserts the realistic envelope, 3σ = 15%
      * (≳99.7% of estimates; a violation indicates a broken sketch, not
      * routine estimator noise). The oracle emits the exact count plus
      * literal TRUE, so a bound violation hash-mismatches. The exact
      * count-distinct shuffle exists only in this verification query —
      * production code keeps the one-pass sketch, so this companion's
      * SCALING curve is the exact operator's, not the production path's. */
    QueryDef(
      "an_approx_distinct_bound",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx") - col("n_exact")) <= col("n_exact") * 0.15)
            .as("within_bound"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact,
             |       TRUE AS within_bound
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef(
      "an_regex_extract",
      (s, d) => Tables.customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    /** Conversion funnel: per user, first view and first subsequent
      * purchase; conversion lag in ms. Two grouped mins + a broadcastable
      * join — the sequence-analytics shape (no per-event state needed). */
    QueryDef(
      "an_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), expr("ts div 1000000").as("ms"))
        val firstView = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ms")).as("first_view_ms"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u2"), col("ms").as("pms"))
        firstView.join(purchases,
            firstView("user_id") === purchases("u2") &&
              col("pms") >= firstView("first_view_ms"), "left_outer")
          .groupBy(col("user_id"), col("first_view_ms"))
          .agg(min(col("pms")).as("first_purchase_ms"))
          .withColumn("lag_ms", col("first_purchase_ms") - col("first_view_ms"))
          .orderBy("user_id")
      },
      Some("""WITH fv AS (SELECT user_id, MIN(epoch_ms(ts)) AS first_view_ms
             |            FROM events WHERE event_type = 'view' GROUP BY user_id),
             |fp AS (SELECT fv.user_id, fv.first_view_ms, MIN(epoch_ms(e.ts)) AS first_purchase_ms
             |       FROM fv LEFT JOIN events e
             |         ON e.user_id = fv.user_id AND e.event_type = 'purchase'
             |        AND epoch_ms(e.ts) >= fv.first_view_ms
             |       GROUP BY fv.user_id, fv.first_view_ms)
             |SELECT user_id, first_view_ms, first_purchase_ms,
             |       first_purchase_ms - first_view_ms AS lag_ms
             |FROM fp ORDER BY user_id""".stripMargin)),

    /** Salted two-phase aggregation (graft.ops.Skew): identical result to
      * the plain group-by — the oracle IS the plain group-by — but hot keys
      * spread over 32 reducers in phase one. */
    QueryDef(
      "an_salted_agg",
      (s, d) => Skew.saltedSumCount(
          Tables.lineitem(s, d).withColumn("cents", cents("l_extendedprice")),
          key = "l_returnflag", saltSource = "l_orderkey",
          valueCol = col("cents"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_value,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    /** Salted equi-join (graft.ops.Skew.saltedJoin): hot fact keys spread
      * over 32 reducers by joining on (key, salt) against a replicated dim.
      * The oracle is the PLAIN join — salting must be result-invisible. */
    QueryDef(
      "an_salted_join",
      (s, d) => Skew.saltedJoin(
          Tables.lineitem(s, d)
            .select(col("l_partkey").as("k"), col("l_orderkey"), col("l_quantity")),
          Tables.part(s, d).select(col("p_partkey").as("k"), col("p_brand")),
          key = "k", saltSource = "l_orderkey")
        .groupBy(col("p_brand"))
        .agg(expr("CAST(sum(l_quantity) AS BIGINT)").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    /** MERGE/upsert semantics (SCD type-1) without a table format: snapshot
      * ⟕⟖ changes with coalesce — matched rows take the change's values,
      * unmatched changes insert. Here: customer balances upserted from each
      * customer's latest order total. One shuffle join on the key (broadcast
      * when the change set is small); at scale this is exactly the join
      * Delta/Iceberg MERGE plans under the hood. */
    QueryDef(
      "an_merge_upsert",
      (s, d) => {
        val base = Tables.customer(s, d)
          .select(col("c_custkey").as("k"), cents("c_acctbal").as("bal_cents"),
            col("c_mktsegment").as("seg"))
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        val changes = Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey").as("k2"), cents("o_totalprice").as("new_bal"))
        base.join(changes, base("k") === changes("k2"), "full_outer")
          .select(
            coalesce(col("k"), col("k2")).as("k"),
            coalesce(col("new_bal"), col("bal_cents")).as("bal_cents"),
            coalesce(col("seg"), lit("NEW")).as("seg"))
          .orderBy("k")
      },
      Some("""WITH base AS (SELECT c_custkey AS k,
             |                     CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
             |                     c_mktsegment AS seg
             |              FROM customer),
             |changes AS (SELECT o_custkey AS k,
             |                   CAST(round(o_totalprice * 100) AS BIGINT) AS new_bal
             |            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             |                          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |                  FROM orders) WHERE rn = 1)
             |SELECT COALESCE(base.k, changes.k) AS k,
             |       COALESCE(changes.new_bal, base.bal_cents) AS bal_cents,
             |       COALESCE(base.seg, 'NEW') AS seg
             |FROM base FULL JOIN changes ON base.k = changes.k
             |ORDER BY k""".stripMargin)),

    /** Registered form of the quantile sketch ([[approxPercentileSketch]]).
      * "Exact" is the NEAREST-RANK percentile over integer cents — rank
      * ceil(p·n) via integer arithmetic, no interpolation — because a
      * continuous (interpolated) percentile is a double whose last-ulp
      * depends on the engine's interpolation formula and would hash-
      * mismatch spuriously. The verdict tests percentile_approx's DOCUMENTED
      * contract, which is a RANK guarantee, not a value guarantee: the
      * returned element's rank is within ±n/accuracy of the target rank
      * (QuantileSummaries / Greenwald-Khanna, relative error 1/accuracy).
      * A value-percentage bound would silently depend on the data's local
      * density and on partition-count-sensitive merge order; instead the
      * verdict checks the estimate lies between the VALUES at ranks
      * target ± ceil(n/accuracy) — translation of the rank window through
      * the sorted data, valid under any partitioning (AnalyticsSpec).
      * Oracle mirrors the rank rule and emits TRUE. SCALING note: this
      * companion's growth curve is the EXACT operator's (full per-group
      * window sort), not the sketch's — it is a verification query; the
      * production path is [[approxPercentileSketch]]'s one-pass sketch. */
    QueryDef(
      "an_approx_percentile_bound",
      (s, d) => {
        val c = Tables.lineitem(s, d)
          .select(col("l_returnflag"), cents("l_extendedprice").as("cts"))
        val byFlag = Window.partitionBy(col("l_returnflag"))
        val r = c
          .withColumn("rn", row_number().over(byFlag.orderBy(col("cts"))))
          .withColumn("n", count(lit(1)).over(byFlag))
        // Rank slack from the documented guarantee: accuracy=10000 → the
        // estimate's rank is within ceil(n/10000) of the target rank.
        val exact = r.groupBy(col("l_returnflag")).agg(
          max(when(col("rn") === expr("(n + 1) div 2"), col("cts")))
            .as("exact_p50_cents"),
          max(when(col("rn") === expr("(19 * n + 19) div 20"), col("cts")))
            .as("exact_p95_cents"),
          max(when(col("rn") === expr("greatest(1L, (n + 1) div 2 - (n + 9999) div 10000)"),
            col("cts"))).as("lo50"),
          max(when(col("rn") === expr("least(n, (n + 1) div 2 + (n + 9999) div 10000)"),
            col("cts"))).as("hi50"),
          max(when(col("rn") === expr("greatest(1L, (19 * n + 19) div 20 - (n + 9999) div 10000)"),
            col("cts"))).as("lo95"),
          max(when(col("rn") === expr("least(n, (19 * n + 19) div 20 + (n + 9999) div 10000)"),
            col("cts"))).as("hi95"))
        val approx = c.groupBy(col("l_returnflag"))
          .agg(expr("percentile_approx(cts, array(0.5D, 0.95D), 10000)").as("ap"))
          .select(col("l_returnflag").as("rf2"),
            expr("ap[0]").as("a50"), expr("ap[1]").as("a95"))
        exact.join(approx, exact("l_returnflag") === approx("rf2"))
          .select(col("l_returnflag"), col("exact_p50_cents"), col("exact_p95_cents"),
            (col("a50").between(col("lo50"), col("hi50")) &&
             col("a95").between(col("lo95"), col("hi95")))
              .as("within_bound"))
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (SELECT l_returnflag,
             |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cts
             |           FROM lineitem),
             |r AS (SELECT l_returnflag, cts,
             |             row_number() OVER (PARTITION BY l_returnflag ORDER BY cts) AS rn,
             |             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
             |      FROM c)
             |SELECT l_returnflag,
             |       MAX(CASE WHEN rn = (n + 1) // 2 THEN cts END) AS exact_p50_cents,
             |       MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN cts END) AS exact_p95_cents,
             |       TRUE AS within_bound
             |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    /** Z-order (Morton) clustering value over (orderkey, partkey) folded to
      * 10 bits each — the multi-dimensional layout key
      * (graft.sources.Layout.zorderValue): sorting or partitioning by it
      * keeps BOTH join/filter dimensions clustered, so a box predicate
      * touches only overlapping quadtree cells (single-SORTKEY layouts prune
      * one dimension only; ZorderSpec proves the partition pruning on a real
      * write). Narrow integer bit math, no shuffle. */
    QueryDef(
      "an_zorder",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          graft.sources.Layout.zorderValue(
            expr("l_orderkey % 1024"), expr("l_partkey % 1024"), bits = 10).as("zval"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some {
        val terms = (0 until 10).flatMap(j => Seq(
          s"((((l_orderkey % 1024) >> $j) & 1) << ${2 * j})",
          s"((((l_partkey % 1024) >> $j) & 1) << ${2 * j + 1})"))
        s"""SELECT l_orderkey, l_linenumber, l_partkey,
           |       CAST(${terms.mkString(" + ")} AS BIGINT) AS zval
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
      }),

    /** Deterministic stratified sampling — the training-data mixing
      * primitive: per-source keep rates applied via a SHARED hash of the key
      * (md5 high bits mod 100), so the sample is reproducible in any engine
      * and stable under reruns/backfills — none of which holds for
      * rand()-based sampling. Narrow (no shuffle): the filter runs at the
      * scan. */
    QueryDef(
      "an_hash_sample",
      (s, d) => Tables.documents(s, d)
        .withColumn("bucket",
          expr(s"${hashBits("doc_id", 15)} % 100"))
        .filter(expr(
          "(source = 'src0' AND bucket < 25) OR " +
            "(source = 'src1' AND bucket < 75) OR " +
            "(source NOT IN ('src0', 'src1') AND bucket < 50)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source"),
      Some(s"""WITH b AS (SELECT *,
             |  ${duckHashBits("doc_id", 15)} % 100 AS bucket
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM b
             |WHERE (source = 'src0' AND bucket < 25)
             |   OR (source = 'src1' AND bucket < 75)
             |   OR (source NOT IN ('src0', 'src1') AND bucket < 50)
             |GROUP BY source ORDER BY source""".stripMargin)),

    /** Deterministic stratified TRAIN/VAL/TEST split (80/10/10 by md5
      * bucket of doc_id) — the assignment every training pipeline needs to
      * be reproducible across reruns and engines (no RNG: the same doc
      * lands in the same split on any cluster, any partitioning, any day).
      * One narrow pass + one small aggregation; the per-doc split column is
      * the production output, the per-(source, split) counts emitted here
      * keep the oracle result compact. */
    QueryDef(
      "an_train_split",
      (s, d) => Tables.documents(s, d)
        .withColumn("bucket",
          expr(s"${hashBits("doc_id", 15)} % 100"))
        .withColumn("split",
          expr("CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source", "split"),
      Some(s"""WITH b AS (SELECT *,
             |  ${duckHashBits("doc_id", 15)} % 100 AS bucket
             |  FROM documents),
             |sp AS (SELECT source, n_chars,
             |         CASE WHEN bucket < 80 THEN 'train'
             |              WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
             |       FROM b)
             |SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM sp GROUP BY source, split ORDER BY source, split""".stripMargin)),

    /** COHORT RETENTION: users bucketed by first-seen epoch-week, distinct
      * users per (cohort, week offset) — the engagement matrix behind every
      * product-analytics dashboard. Two shuffles: the per-user min (partial
      * aggregate pushes map-side) and the cohort×offset distinct count; the
      * first-week frame joins back user-keyed, so at scale both shuffles
      * hash on user_id and the join is co-partitioned (no extra exchange
      * under AQE). Integer epoch-week arithmetic only. */
    QueryDef(
      "an_retention",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), expr("(ts div 1000000) div 604800000").as("wk"))
        val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
        e.join(first, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_wk", "offset_wk")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
             |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
             |SELECT f.cohort_wk, e.wk - f.cohort_wk AS offset_wk,
             |       COUNT(DISTINCT e.user_id) AS n_users
             |FROM e JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    /** Multi-join analytic through the SQL surface (join-reorder +
      * broadcast-hint showcase; Catalyst plans the dim chain as broadcasts). */
    QueryDef(
      "an_sql_revenue",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("li_sql")
        Tables.orders(s, d).createOrReplaceTempView("o_sql")
        Tables.customer(s, d).createOrReplaceTempView("c_sql")
        Tables.nation(s, d).createOrReplaceTempView("n_sql")
        Tables.region(s, d).createOrReplaceTempView("r_sql")
        s.sql("""SELECT /*+ BROADCAST(c_sql), BROADCAST(n_sql), BROADCAST(r_sql) */
                |       r_name,
                |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                |         AS revenue,
                |       COUNT(DISTINCT o_orderkey) AS n_orders
                |FROM li_sql
                |JOIN o_sql ON l_orderkey = o_orderkey
                |JOIN c_sql ON o_custkey = c_custkey
                |JOIN n_sql ON c_nationkey = n_nationkey
                |JOIN r_sql ON n_regionkey = r_regionkey
                |GROUP BY r_name ORDER BY r_name""".stripMargin)
      },
      Some("""SELECT r_name,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue,
             |       COUNT(DISTINCT o_orderkey) AS n_orders
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    /** BALANCED (exact-count) per-stratum subsample — 30 documents per
      * language, deterministically (no RNG: md5 hash order, so any engine,
      * any partitioning, any rerun picks the same rows — the class-balanced
      * eval-set builder). See [[balancedSamplePhase1]] for the two-phase
      * rank that bounds every task at O(k·groups-per-task), never
      * O(stratum). Strata smaller than k yield all their rows (no coarse
      * prefilter to under-deliver on small strata). */
    QueryDef(
      "an_balanced_sample",
      (s, d) => {
        val wGlobal = Window
          .partitionBy(col("lang")).orderBy(col("hkey").asc, col("doc_id").asc)
        balancedSamplePhase1(
          Tables.documents(s, d).select(col("lang"), col("doc_id")), 30)
          .withColumn("pick", row_number().over(wGlobal))
          .filter(col("pick") <= 30)
          .select(col("lang"), col("doc_id"), col("pick").cast("int").as("pick"))
          .orderBy("lang", "pick")
      },
      Some("""SELECT lang, doc_id, CAST(pick AS INTEGER) AS pick
             |FROM (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             |        ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS pick
             |      FROM documents)
             |WHERE pick <= 30 ORDER BY lang, pick""".stripMargin)),

    /** PER-KEY SKEW REPORT — the diagnostic a 100 TB operator runs before
      * choosing a join/aggregation strategy: the top-5 heaviest keys with
      * their row share, next to the global key count and total. Scale
      * shape: one partially-aggregated shuffle builds the per-key counts,
      * the top-5 comes from a distributed TakeOrdered (never a global
      * window over all keys), and the 1-row totals frame rides along as a
      * broadcast scalar. Integer share arithmetic only. */
    QueryDef(
      "an_skew_report",
      (s, d) => {
        val counts = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
        val tot = counts.agg(count(lit(1)).as("n_keys"), sum(col("n_rows")).as("n_total"))
        val w = Window
          .orderBy(col("n_rows").desc, col("user_id").asc)
        counts.orderBy(col("n_rows").desc, col("user_id").asc).limit(5)
          .withColumn("rank", row_number().over(w).cast("int"))
          .crossJoin(broadcast(tot))
          .withColumn("share_permille", expr("(1000 * n_rows) div n_total"))
          .select(col("rank"), col("user_id"), col("n_rows"),
            col("share_permille"), col("n_keys"), col("n_total"))
          .orderBy("rank")
      },
      Some("""WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
             |t AS (SELECT COUNT(*) AS n_keys, CAST(SUM(n_rows) AS BIGINT) AS n_total FROM c),
             |top AS (SELECT user_id, n_rows,
             |          row_number() OVER (ORDER BY n_rows DESC, user_id ASC) AS rank
             |        FROM c)
             |SELECT CAST(rank AS INTEGER) AS rank, user_id, n_rows,
             |       (1000 * n_rows) // n_total AS share_permille, n_keys, n_total
             |FROM top, t WHERE rank <= 5 ORDER BY rank""".stripMargin)),

    /** Equi-width HISTOGRAM of document length — the stats-collection pass
      * behind length-based quality filters and planner NDV/skew estimates.
      * Two-pass shape: pass 1 computes the global max (one scalar, the
      * partial-agg tree makes it a map-side reduce), pass 2 buckets every
      * row against the broadcast scalar — integer arithmetic only
      * (`(n_chars * 10) div (max+1)` ∈ [0,9]), so bucket edges are
      * bit-identical in both engines. Neither pass shuffles more than the
      * 10-key final aggregate. */
    QueryDef(
      "an_histogram",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val mx = docs.agg(max(col("n_chars")).as("max_chars"))
        docs.crossJoin(broadcast(mx))
          .withColumn("bucket", expr("(n_chars * 10) div (max_chars + 1)"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("bucket")
      },
      Some("""WITH g AS (SELECT MAX(n_chars) AS max_chars FROM documents)
             |SELECT (n_chars * 10) // (g.max_chars + 1) AS bucket,
             |       COUNT(*) AS n_docs,
             |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
             |FROM documents, g
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    /** BATCH SESSIONIZATION — the offline twin of st_sessionize (streaming/
      * EventsStream.scala): split each user's event stream into sessions at
      * >30-minute gaps and emit per-session stats. The canonical gaps-and-
      * islands shape: lag() marks session starts, a running sum over the
      * SAME window numbers them (one doc_id-style shuffle on user_id, one
      * sort, both windows fused), then a grouped aggregate. Tied timestamps
      * are safe: equal-ms rows are indistinguishable in every selected
      * column, so any tie order yields the same (user_id, session_seq)
      * multiset. Scale shape: the window partitions by user_id — millions
      * of small independent partitions, no global sort anywhere before the
      * final presentation ORDER BY. */
    QueryDef(
      "an_sessionize",
      (s, d) => {
        val w = Window
          .partitionBy(col("user_id")).orderBy(col("ms"))
        Tables.events(s, d)
          .select(col("user_id"), expr("ts div 1000000").as("ms"))
          .withColumn("new_sess",
            when(col("ms") - lag(col("ms"), 1).over(w) > 1800000L, 1L)
              .otherwise(when(lag(col("ms"), 1).over(w).isNull, 1L).otherwise(0L)))
          .withColumn("session_seq", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
          .withColumn("dur_ms", col("end_ms") - col("start_ms"))
          .orderBy("user_id", "session_seq")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
             |m AS (SELECT user_id, ms,
             |        CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
             |               OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
             |             THEN 1 ELSE 0 END AS new_sess
             |      FROM e),
             |s AS (SELECT user_id, ms,
             |        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms
             |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |          AS session_seq
             |      FROM m)
             |SELECT user_id, session_seq, COUNT(*) AS n_events,
             |       MIN(ms) AS start_ms, MAX(ms) AS end_ms,
             |       MAX(ms) - MIN(ms) AS dur_ms
             |FROM s GROUP BY user_id, session_seq
             |ORDER BY user_id, session_seq""".stripMargin)),

    /** FIRST-TOUCH ATTRIBUTION — every `purchase` event credited to the
      * FIRST event of its session (the entry channel), with time-to-convert:
      * the marketing-attribution shape every event warehouse serves, built
      * on [[defs an_sessionize]]'s exact gaps-and-islands numbering. Ties
      * are made deterministic by ordering on (ms, event_id) — event_id is
      * unique, so equal-millisecond rows attribute identically in both
      * engines (an_sessionize could ignore ties because its outputs were
      * tie-invariant; first_type is NOT, so the order must be total).
      *
      * Scale shape: ONE shuffle on user_id that every window reuses — the
      * session-numbering windows key on user_id, and the per-session
      * first_value windows key on (user_id, session_seq), which a user_id
      * hash partitioning already co-locates (ClusteredDistribution is
      * satisfied; no second exchange, no self-join — first_value replaces
      * the firsts-table join). Millions of users = millions of small
      * independent partitions; no global sort before the presentation
      * ORDER BY. */
    QueryDef(
      "an_attribution",
      (s, d) => {
        val W = Window
        val wu = W.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
        val ws = W.partitionBy(col("user_id"), col("session_seq"))
          .orderBy(col("ms"), col("event_id"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000000").as("ms"))
          .withColumn("new_sess",
            when(lag(col("ms"), 1).over(wu).isNull, 1L)
              .when(col("ms") - lag(col("ms"), 1).over(wu) > 1800000L, 1L)
              .otherwise(0L))
          .withColumn("session_seq", sum(col("new_sess")).over(
            wu.rowsBetween(W.unboundedPreceding, W.currentRow)))
          .withColumn("first_type", first(col("event_type")).over(ws))
          .withColumn("first_ms", first(col("ms")).over(ws))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("session_seq"),
            col("first_type"), (col("ms") - col("first_ms")).as("ms_to_convert"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
             |           FROM events),
             |m AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
             |                       OR ms - lag(ms) OVER w > 1800000
             |                     THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
             |s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
             |                       ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)
             |                     AS BIGINT) AS session_seq FROM m),
             |f AS (SELECT *, first_value(event_type) OVER ws AS first_type,
             |             first_value(ms) OVER ws AS first_ms
             |      FROM s WINDOW ws AS (PARTITION BY user_id, session_seq
             |                           ORDER BY ms, event_id
             |                           ROWS UNBOUNDED PRECEDING))
             |SELECT event_id, user_id, session_seq, first_type,
             |       CAST(ms - first_ms AS BIGINT) AS ms_to_convert
             |FROM f WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    /** SHARD DRIFT REPORT — per daily shard, the total-variation distance
      * (in 1e-6 units) between the shard's event-type mix and the corpus
      * mix. The monitoring pass a 100 TB ingest runs on every new partition:
      * a drifting shard means upstream breakage or corpus rot, and it must
      * surface before the shard is blessed into training. Exact integer
      * shares on a FULL day×type grid (absent combinations count as zero —
      * without the grid a missing type would silently drop its |0 − g|
      * term). Scale shape: two partially-aggregated shuffles (day×type,
      * type), the type table and 1-row total ride as broadcasts, and the
      * grid is |days|·|types| rows — schema-sized, never data-sized. */
    QueryDef(
      "an_shard_drift",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(expr("(ts div 1000000) div 86400000").as("day"), col("event_type"))
        val sh = e.groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("cnt"))
        val tot = sh.groupBy(col("day")).agg(sum(col("cnt")).as("tot"))
        val g = sh.groupBy(col("event_type")).agg(sum(col("cnt")).as("gcnt"))
        val gt = g.agg(sum(col("gcnt")).as("gtot"))
        tot.crossJoin(broadcast(g)).crossJoin(broadcast(gt))
          .join(sh, Seq("day", "event_type"), "left_outer")
          .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
          .withColumn("diff_micro",
            abs(expr("(1000000 * cnt) div tot - (1000000 * gcnt) div gtot")))
          .groupBy(col("day"))
          .agg(sum(col("cnt")).as("n_events"), sum(col("diff_micro")).as("tv_micro"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, event_type FROM events),
             |sh AS (SELECT day, event_type, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
             |tot AS (SELECT day, CAST(SUM(cnt) AS BIGINT) AS tot FROM sh GROUP BY 1),
             |g AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM sh GROUP BY 1),
             |gt AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS gtot FROM g)
             |SELECT t.day,
             |       CAST(SUM(COALESCE(s.cnt, 0)) AS BIGINT) AS n_events,
             |       CAST(SUM(abs((1000000 * COALESCE(s.cnt, 0)) // t.tot
             |                    - (1000000 * g.gcnt) // gt.gtot)) AS BIGINT) AS tv_micro
             |FROM tot t CROSS JOIN g CROSS JOIN gt
             |LEFT JOIN sh s ON s.day = t.day AND s.event_type = g.event_type
             |GROUP BY t.day ORDER BY t.day""".stripMargin)),

    /** CORPUS DATA CARD — the per-language datasheet a training org
      * publishes with a corpus release: volume (docs, tokens, mean length),
      * exact-duplicate mass (corpus-wide fingerprints, attributed per
      * language), quality-gate pass counts (the tx_quality criteria), and
      * each language's share of the corpus — ONE plan, so the numbers are
      * mutually consistent by construction instead of stitched from
      * separate runs. Shapes: one fingerprint shuffle + join back (the
      * dd_exact key), narrow token/stopword arithmetic, one lang rollup,
      * 1-row total as broadcast. Integer units throughout. */
    QueryDef(
      "an_data_card",
      (s, d) => {
        val tk = "split(trim(text), ' +')"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          expr(s"size($tk)").as("ntok"),
          expr(s"size(filter($tk, t -> t IN ${graft.text.TextStats.stopList}))").as("nstop"),
          md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
        val dupfp = docs.groupBy(col("fp")).agg(count(lit(1)).as("nfp"))
        val tot = docs.agg(count(lit(1)).as("total_docs"))
        docs.join(dupfp, "fp").crossJoin(broadcast(tot))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("n_tokens"),
            sum(when(col("nfp") >= 2, 1L).otherwise(0L)).as("n_dup"),
            sum(when(expr("ntok BETWEEN 10 AND 1000 AND (100 * nstop) div ntok < 40"),
              1L).otherwise(0L)).as("n_quality_pass"),
            max(col("total_docs")).as("total_docs"))
          // 128-bit product (an_volume_anomaly's DECIMAL(38,0) ≙ HUGEINT
          // discipline): 1e6 * n_tokens wraps a BIGINT once a language
          // holds > 9.2e12 tokens (~37 TB of text — inside this query's
          // stated regime); the QUOTIENT is per-doc micro-tokens, safely
          // back in 64 bits.
          .withColumn("avg_tokens_micro",
            expr("CAST((1000000 * CAST(n_tokens AS DECIMAL(38,0))) div n_docs AS BIGINT)"))
          .withColumn("docs_share_permille", expr("(1000 * n_docs) div total_docs"))
          .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_dup"),
            col("n_quality_pass"), col("avg_tokens_micro"), col("docs_share_permille"))
          .orderBy("lang")
      },
      Some(s"""WITH docs AS (
             |  SELECT doc_id, lang,
             |         len(string_split_regex(trim(text), ' +')) AS ntok,
             |         len(list_filter(string_split_regex(trim(text), ' +'),
             |                         t -> t IN ${graft.text.TextStats.stopList})) AS nstop,
             |         md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
             |  FROM documents),
             |dupfp AS (SELECT fp, COUNT(*) AS nfp FROM docs GROUP BY fp),
             |tot AS (SELECT COUNT(*) AS total_docs FROM docs)
             |SELECT lang, COUNT(*) AS n_docs,
             |       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
             |       CAST(SUM(CASE WHEN nfp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |       CAST(SUM(CASE WHEN ntok BETWEEN 10 AND 1000
             |                      AND (100 * nstop) // ntok < 40
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass,
             |       CAST((1000000 * CAST(SUM(ntok) AS HUGEINT)) // COUNT(*) AS BIGINT)
             |         AS avg_tokens_micro,
             |       (1000 * COUNT(*)) // total_docs AS docs_share_permille
             |FROM docs JOIN dupfp USING (fp), tot
             |GROUP BY lang, total_docs ORDER BY lang""".stripMargin)),

    /** VOLUME ANOMALY DAYS — flag days whose event count departs from the
      * corpus mean by more than 2σ, with the inequality cleared of all
      * division and square roots: |x−μ| > 2σ ⟺ (n·x − s)² > 4·(n·sq − s²)
      * where s = Σx, sq = Σx². The squared quantities are 128-bit exact —
      * Spark DECIMAL(38,0) ≙ DuckDB HUGEINT — because the BIGINT form
      * silently wraps once |n·x − s| passes ~3e9 (about 1e8 events/day over
      * 30 days, i.e. exactly the 100 TB regime): Spark would wrap while
      * DuckDB raised, so the engines diverged right where the gate matters.
      * Budget: dev² and n·sq stay under 1e38 for any physical corpus
      * (1e11 events/day × a century of days gives dev² ~ 1e31); the
      * diagnostic columns are emitted as exact decimal STRINGS so no
      * consumer is forced back into a 64-bit lane. The verdict stays
      * division- and sqrt-free. This is the day-shard volume gate next to
      * an_shard_drift's MIX gate (a shard can hold its type mix while
      * silently doubling or halving in volume). Shapes: one day rollup, a
      * 1-row broadcast stats frame, a map-side CASE. */
    QueryDef(
      "an_volume_anomaly",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("(ts div 1000000) div 86400000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("n_events"))
        val stats = daily.agg(count(lit(1)).as("n"),
          sum(col("n_events")).as("s"),
          sum(expr("CAST(n_events AS DECIMAL(19,0)) * n_events")).as("sq"))
        daily.crossJoin(broadcast(stats))
          .withColumn("dev", expr("CAST(n AS DECIMAL(19,0)) * n_events - s"))
          .withColumn("dev2", expr("dev * dev"))
          .withColumn("thresh2",
            expr("4 * (CAST(n AS DECIMAL(19,0)) * sq - CAST(s AS DECIMAL(19,0)) * s)"))
          .withColumn("is_anomaly", col("dev2") > col("thresh2"))
          .select(col("day"), col("n_events"),
            expr("CAST(dev2 AS STRING)").as("dev2"),
            expr("CAST(thresh2 AS STRING)").as("thresh2"),
            col("is_anomaly"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*) AS n_events
             |               FROM events GROUP BY 1),
             |st AS (SELECT COUNT(*) AS n, CAST(SUM(n_events) AS BIGINT) AS s,
             |              SUM(CAST(n_events AS HUGEINT) * n_events) AS sq
             |       FROM daily)
             |SELECT day, n_events,
             |       CAST((CAST(n AS HUGEINT) * n_events - s)
             |            * (CAST(n AS HUGEINT) * n_events - s) AS VARCHAR) AS dev2,
             |       CAST(4 * (CAST(n AS HUGEINT) * sq - CAST(s AS HUGEINT) * s)
             |            AS VARCHAR) AS thresh2,
             |       (CAST(n AS HUGEINT) * n_events - s)
             |         * (CAST(n AS HUGEINT) * n_events - s)
             |         > 4 * (CAST(n AS HUGEINT) * sq - CAST(s AS HUGEINT) * s)
             |         AS is_anomaly
             |FROM daily, st ORDER BY day""".stripMargin)),

    /** HEAVY HITTERS under the Misra-Gries sketch contract
      * (graft.functions.FreqSketch): the frequent-items op of a data
      * pipeline (hot tokens / domains / fingerprints) run where it is
      * HARD — a derived stream that concentrates half its mass on 5 hot
      * items and spreads the rest over thousands of singletons, so a
      * 16-counter summary is under constant decrement pressure from the
      * tail. The query emits the items the MG guarantee says MUST survive
      * (true count > n/(k+1), exact integer inequality), their exact
      * counts, and `in_sketch` — membership of each in the sketch actually
      * computed by the mergeable Aggregator. The oracle states the exact
      * heavy-hitter set plus literal TRUE, so a single guarantee violation
      * (an order-dependence bug in reduce/merge, a wrong subtraction rule)
      * hash-mismatches. Raw sketch contents are deliberately NOT emitted:
      * which tail items pad the remaining counters is order-dependent in
      * any MG, and the guarantee — not raw membership — is the portable
      * contract. Scale shape: the sketch side shuffles k counters per
      * partition (not the item domain); the exact side exists only for
      * verification, like every `_bound` companion. */
    QueryDef(
      "an_heavy_hitters",
      (s, d) => {
        val k = 16
        val items = Tables.events(s, d).select(
          expr("IF(pmod(event_id, 2) = 0, concat('hot_', event_type), " +
            "concat('cold_', CAST(event_id AS STRING)))").as("item"))
        val mg = udaf(graft.functions.FreqSketch.misraGries(k), Encoders.STRING)
        val sketch = items.agg(mg(col("item")).as("sk"))
        val exact = items.groupBy(col("item")).agg(count(lit(1)).as("n_exact"))
        val tot = exact.agg(sum(col("n_exact")).as("n"))
        exact.crossJoin(broadcast(tot))
          .filter(col("n_exact") * (k + 1) > col("n"))
          .crossJoin(broadcast(sketch))
          .select(col("item"), col("n_exact"),
            expr("array_contains(transform(sk, e -> e.item), item)").as("in_sketch"))
          .orderBy("item")
      },
      Some("""WITH it AS (SELECT CASE WHEN event_id % 2 = 0
             |                        THEN 'hot_' || event_type
             |                        ELSE 'cold_' || CAST(event_id AS VARCHAR)
             |                   END AS item FROM events),
             |c AS (SELECT item, COUNT(*) AS n_exact FROM it GROUP BY item),
             |tot AS (SELECT SUM(n_exact) AS n FROM c)
             |SELECT item, n_exact, TRUE AS in_sketch
             |FROM c, tot WHERE n_exact * 17 > n ORDER BY item""".stripMargin)),

    /** TEMPERATURE-WEIGHTED SOURCE MIXING (α = 0.5) — the multilingual /
      * multi-source sampling plan every large pretraining run publishes:
      * sampling weight wᵢ ∝ nᵢ^α flattens the source distribution so
      * low-resource sources are upsampled relative to their raw share
      * (α=1 is proportional, α=0 uniform; 0.5 is the square-root
      * temperature the multilingual-LM lineage standardized). Per source:
      * raw docs, weight, the α-mix share vs the proportional share (ppm),
      * and the boost factor the mix applies.
      *
      * Cross-engine exactness: nᵢ^0.5 = sqrt(nᵢ) is a SINGLE
      * correctly-rounded IEEE-754 op in both engines (no float SUM, no
      * pow), immediately quantized to integer micro-units
      * (`floor(sqrt·1e6)` — double multiply is also correctly rounded), so
      * the share division is BIGINT-exact: no float aggregation ever
      * happens. Headroom: nᵢ = 10¹² docs → weight_micro 10¹² → numerator
      * 10¹⁸ < 2⁶³. Scale shape: one groupBy on source (the partial-agg
      * count), one broadcast scalar attach of the two totals — the
      * an_data_card discipline; output is |sources| rows. */
    QueryDef(
      "an_temperature_sample",
      (s, d) => {
        val n = Tables.documents(s, d)
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .withColumn("weight_micro",
            expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"))
        val tot = n.agg(sum(col("n_docs")).as("tot_docs"),
          sum(col("weight_micro")).as("tot_w"))
        n.crossJoin(broadcast(tot))
          .withColumn("share_ppm", expr("(1000000 * weight_micro) div tot_w"))
          .withColumn("prop_ppm", expr("(1000000 * n_docs) div tot_docs"))
          .withColumn("boost_permille", expr("(1000 * share_ppm) div prop_ppm"))
          .select(col("source"), col("n_docs"), col("weight_micro"),
            col("share_ppm"), col("prop_ppm"), col("boost_permille"))
          .orderBy("source")
      },
      Some("""WITH n AS (SELECT source, COUNT(*) AS n_docs,
             |         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
             |           AS weight_micro
             |       FROM documents GROUP BY source),
             |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
             |               CAST(SUM(weight_micro) AS BIGINT) AS tot_w FROM n)
             |SELECT source, n_docs, weight_micro,
             |       (1000000 * weight_micro) // tot_w AS share_ppm,
             |       (1000000 * n_docs) // tot_docs AS prop_ppm,
             |       (1000 * ((1000000 * weight_micro) // tot_w))
             |         // ((1000000 * n_docs) // tot_docs) AS boost_permille
             |FROM n, tot ORDER BY source""".stripMargin)),

    /** CORPUS RELEASE DIFF — what changed between dataset version v1 and
      * v2, by identity (doc_id) AND content (text fingerprint): the
      * data-versioning report a pipeline publishes with every release so
      * consumers know whether to re-train (`added`/`removed` shift the
      * mix, `changed` silently invalidates cached features). The fixture
      * ships one corpus version, so v2 is DERIVED deterministically in both
      * engines — drop doc_id % 13 = 0 (deletions), append a marker to
      * doc_id % 7 = 0 (content edits), re-id doc_id % 11 = 0 as
      * doc_id + 1000000 (additions) — exercising all four verdicts with
      * non-trivial per-source counts.
      *
      * Distributed shape: one md5 fingerprint per side (narrow), ONE
      * full-outer join on doc_id (the only corpus-sized shuffle; at scale
      * both releases would be bucketed by doc_id and the join co-locates),
      * verdict as a map-side CASE, source × status rollup of schema-sized
      * output. No windows, no pair expansion. */
    QueryDef(
      "an_corpus_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val v1 = docs.select(col("doc_id"), col("source").as("src1"),
          md5(col("text")).as("fp1"))
        val v2base = docs.filter(expr("doc_id % 13 <> 0"))
          .select(col("doc_id"), col("source"),
            expr("CASE WHEN doc_id % 7 = 0 THEN concat(text, ' v2') " +
              "ELSE text END").as("text"))
        val v2 = v2base
          .select(expr("CASE WHEN doc_id % 11 = 0 THEN doc_id + 1000000 " +
              "ELSE doc_id END").as("doc_id"),
            col("source").as("src2"), md5(col("text")).as("fp2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .withColumn("status", expr(
            """CASE WHEN fp1 IS NULL THEN 'added'
              |     WHEN fp2 IS NULL THEN 'removed'
              |     WHEN fp1 = fp2 THEN 'unchanged'
              |     ELSE 'changed' END""".stripMargin))
          .withColumn("source", coalesce(col("src1"), col("src2")))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "status")
      },
      Some("""WITH v1 AS (SELECT doc_id, source AS src1, md5(text) AS fp1
             |            FROM documents),
             |v2b AS (SELECT doc_id, source,
             |          CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
             |            AS text
             |        FROM documents WHERE doc_id % 13 <> 0),
             |v2 AS (SELECT CASE WHEN doc_id % 11 = 0 THEN doc_id + 1000000
             |                   ELSE doc_id END AS doc_id,
             |              source AS src2, md5(text) AS fp2 FROM v2b),
             |j AS (SELECT COALESCE(v1.src1, v2.src2) AS source,
             |             CASE WHEN fp1 IS NULL THEN 'added'
             |                  WHEN fp2 IS NULL THEN 'removed'
             |                  WHEN fp1 = fp2 THEN 'unchanged'
             |                  ELSE 'changed' END AS status
             |      FROM v1 FULL OUTER JOIN v2 USING (doc_id))
             |SELECT source, status, COUNT(*) AS n_docs
             |FROM j GROUP BY source, status ORDER BY source, status""".stripMargin)),

    /** K-ANONYMITY AUDIT — the release-governance check before event data
      * leaves the pipeline: group the stream by its quasi-identifier tuple
      * (event_type × hour-of-day × value decade) and flag every cell whose
      * DISTINCT-user support is below k=5 — those cells re-identify users
      * and must be suppressed or generalized before export. Emits the full
      * cell census with the verdict so the suppression step is a single
      * semi-join against the 'suppress' rows.
      *
      * Distributed shape: one shuffle keyed on the QI tuple carrying
      * (qi, user_id); the distinct-user count partial-aggregates map-side
      * after an in-partition distinct. Output is O(|QI domain|) — here
      * 24·|types|·|decades|, bounded regardless of corpus size. Decade
      * bucket = explicit floor(value/10) on both engines — a raw
      * double→bigint CAST truncates in Spark but rounds in DuckDB, and
      * integer division (`div` and `//` alike) truncates toward zero in
      * BOTH engines, so a negative value would bucket to the wrong
      * (toward-zero) decade under either shortcut. */
    QueryDef(
      "an_kanon_audit",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          expr("(ts div 1000000 div 3600000) % 24").as("hour_of_day"),
          expr("CAST(floor(value / 10.0D) AS BIGINT)").as("value_decade"),
          col("user_id"))
        .groupBy(col("event_type"), col("hour_of_day"), col("value_decade"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
        .withColumn("verdict",
          when(col("n_users") >= 5, "ok").otherwise("suppress"))
        // value_decade is NULLABLE (a NULL event value survives the floor);
        // null direction pinned on BOTH sides because the engines' defaults
        // diverge — Spark ASC is NULLS FIRST, DuckDB NULLS LAST (the
        // an_union_by_name discipline).
        .orderBy(col("event_type"), col("hour_of_day"),
          col("value_decade").asc_nulls_first),
      Some("""SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hour_of_day,
             |       CAST(floor(value / 10) AS BIGINT) AS value_decade,
             |       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
             |       CASE WHEN COUNT(DISTINCT user_id) >= 5 THEN 'ok'
             |            ELSE 'suppress' END AS verdict
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY event_type, hour_of_day, value_decade NULLS FIRST""".stripMargin)),

    /** AUDIENCE-OVERLAP MATRIX — |users(a) ∩ users(b)| and Jaccard for every
      * unordered pair of event types: the cross-feature co-engagement grid
      * behind funnel design and feature bundling (and the same shape as a
      * source-overlap audit on training corpora).
      *
      * Distributed shape: the ONLY data-sized shuffle is the
      * (user, type) DISTINCT; each user then carries a type SET bounded by
      * the type domain (not by activity), and the pair expansion is
      * O(|types|²) per user — never a user×user or row×row join. Per-type
      * audience sizes ride the same distinct frame, and the final join is
      * O(|types|²)-sized. At 100 TB the type domain is still dozens, so
      * everything after the distinct is negligible. */
    QueryDef(
      "an_audience_overlap",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        val pairs = ut.groupBy(col("user_id"))
          .agg(sort_array(collect_set(col("event_type"))).as("ts"))
          .select(explode(expr(
            "flatten(transform(ts, (a, i) -> " +
              "transform(slice(ts, i + 2, size(ts)), b -> struct(a AS ta, b AS tb))))"))
            .as("p"))
          .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
        val n = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        pairs
          .join(broadcast(n.select(col("event_type").as("type_a"), col("n").as("na"))), "type_a")
          .join(broadcast(n.select(col("event_type").as("type_b"), col("n").as("nb"))), "type_b")
          .select(col("type_a"), col("type_b"), col("n_both"),
            expr("(1000 * n_both) div (na + nb - n_both)").as("jaccard_permille"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
             |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             |             COUNT(*) AS n_both
             |      FROM ut a JOIN ut b ON a.user_id = b.user_id
             |           AND a.event_type < b.event_type
             |      GROUP BY 1, 2),
             |n AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1)
             |SELECT type_a, type_b, n_both,
             |       (1000 * n_both) // (na.n + nb.n - n_both) AS jaccard_permille
             |FROM p JOIN n na ON na.event_type = type_a
             |       JOIN n nb ON nb.event_type = type_b
             |ORDER BY type_a, type_b""".stripMargin)),

    /** FRESHNESS / WATERMARK-LAG AUDIT — per event type, how far its newest
      * event trails the newest event anywhere: the staleness monitor that
      * catches a dead upstream producer (one topic stops flowing while the
      * rest advance). Reference point is the CORPUS max — self-contained
      * and engine-reproducible, where wall-clock `now()` would not be.
      * Verdict at a 4-hour lag budget.
      *
      * Distributed shape: one partial-aggregating max per type (map-side
      * combine), then an O(|types|) frame cross-joined with its own 1-row
      * global max — broadcast scalar, no second data pass. */
    QueryDef(
      "an_watermark_lag",
      (s, d) => {
        val perType = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(max(expr("ts div 1000000")).as("max_ms"))
        val global = perType.agg(max(col("max_ms")).as("global_max_ms"))
        perType.crossJoin(broadcast(global))
          .select(col("event_type"), col("max_ms"),
            expr("global_max_ms - max_ms").as("lag_ms"),
            expr("CASE WHEN global_max_ms - max_ms < 14400000 THEN 'fresh' " +
              "ELSE 'stale' END").as("freshness"))
          .orderBy("event_type")
      },
      Some("""WITH m AS (SELECT event_type, MAX(epoch_ms(ts)) AS max_ms
             |          FROM events GROUP BY 1),
             |g AS (SELECT MAX(max_ms) AS global_max_ms FROM m)
             |SELECT event_type, max_ms, global_max_ms - max_ms AS lag_ms,
             |       CASE WHEN global_max_ms - max_ms < 14400000 THEN 'fresh'
             |            ELSE 'stale' END AS freshness
             |FROM m, g ORDER BY event_type""".stripMargin)),

    /** BACKFILL PLANNER — per-type day-partition coverage against the
      * corpus calendar span: how many epoch-days between the corpus min and
      * max does each event type actually have data for, and how many are
      * holes a backfill job must fill. A missing day inside the span is the
      * operational signature of a dropped ingestion batch — the thing a
      * partitioned warehouse must detect BEFORE a consumer reads zeros.
      * Verdict 'backfill' when any day is missing (the spec plants holes;
      * the fixture calendar is complete, verdict 'complete' everywhere).
      *
      * Distributed shape: one (type, day) DISTINCT shuffle — day grain, so
      * the aggregate output is O(types×days) regardless of event volume —
      * then an O(types) rollup cross-joined with its own 1-row span. The
      * day GRID is never materialized (present-count vs span arithmetic),
      * so there is no generate_series × types expansion to shuffle. */
    QueryDef(
      "an_backfill_plan",
      (s, d) => {
        val td = Tables.events(s, d)
          .select(col("event_type"),
            expr("(ts div 1000000) div 86400000").as("day")).distinct()
        val span = td.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        td.groupBy(col("event_type")).agg(count(lit(1)).as("n_days_present"))
          .crossJoin(broadcast(span))
          .select(col("event_type"), col("n_days_present"),
            expr("hi - lo + 1").as("span_days"),
            expr("hi - lo + 1 - n_days_present").as("n_missing"),
            expr("CASE WHEN hi - lo + 1 = n_days_present THEN 'complete' " +
              "ELSE 'backfill' END").as("verdict"))
          .orderBy("event_type")
      },
      Some("""WITH td AS (SELECT DISTINCT event_type,
             |              epoch_ms(ts) // 86400000 AS day FROM events),
             |span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM td),
             |p AS (SELECT event_type, COUNT(*) AS n_days_present FROM td GROUP BY 1)
             |SELECT event_type, n_days_present, hi - lo + 1 AS span_days,
             |       hi - lo + 1 - n_days_present AS n_missing,
             |       CASE WHEN hi - lo + 1 = n_days_present THEN 'complete'
             |            ELSE 'backfill' END AS verdict
             |FROM p, span ORDER BY event_type""".stripMargin)),

    /** FIXED-SIZE PER-STRATUM SAMPLE — exactly k=10 docs per source, chosen
      * as the k SMALLEST md5 draws (a deterministic reservoir: uniform over
      * each stratum, stable across engines, reruns, partitionings — the
      * eval-set constructor where an_hash_sample's threshold form yields a
      * RATE, not a count). The scale story is the bounded TopK Aggregator
      * (graft.functions.TopK, SURVEY §2.8): partial buffers cap every
      * map-side combine at k entries, so the shuffle carries
      * O(sources × k) rows where the window row_number formulation — the
      * oracle's formulation, deliberately an independent algorithm — sorts
      * every row of each stratum through the exchange. The 48-bit draw is
      * exact in a Double (2⁴⁸ < 2⁵³), so score ordering is bit-faithful.
      * Tie-break on an h48 collision inside a stratum: the aggregator's
      * total order is (score desc, id asc) — see graft.functions.TopK.lt —
      * so equal draws resolve by doc_id ASC, exactly the oracle's
      * `ORDER BY h48 ASC, doc_id ASC` (pinned by TopKSpec's equal-score
      * case; the round-13 advisory flagged this as score-only, but the id
      * leg of the comparator is the doc_id tie-break). */
    QueryDef(
      "an_fixed_sample",
      (s, d) => {
        import s.implicits._
        val scored = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            expr(hashBits("doc_id", 12)).as("h48"))
          .as[(String, Long, Long)]
        scored.groupByKey(_._1)
          .mapValues(t => graft.functions.TopK.Scored(t._2, -t._3.toDouble))
          .agg(graft.functions.TopK.topK(10).toColumn)
          .flatMap { case (src, entries) =>
            entries.zipWithIndex.map { case (en, i) =>
              (src, en.id, (-en.score).toLong, i + 1)
            }
          }
          .toDF("source", "doc_id", "h48", "sample_rank")
          .withColumn("sample_rank", col("sample_rank").cast("int"))
          .orderBy("source", "sample_rank")
      },
      Some(s"""SELECT source, doc_id, h48, CAST(rank AS INTEGER) AS sample_rank FROM (
             |  SELECT source, doc_id,
             |         ${duckHashBits("doc_id", 12)} AS h48,
             |         row_number() OVER (PARTITION BY source
             |           ORDER BY ${duckHashBits("doc_id", 12)} ASC, doc_id ASC) AS rank
             |  FROM documents)
             |WHERE rank <= 10 ORDER BY source, sample_rank""".stripMargin)),

    /** A/B ASSIGNMENT + SAMPLE-RATIO-MISMATCH GATE — the experimentation-
      * platform integrity check: users are deterministically bucketed
      * 50/50 into arms by md5(user_id) (the an_hash_sample bucket bits, so
      * assignment replays on any engine), then per event type the gate
      * compares arm audiences against the declared split. A distinct-user
      * imbalance beyond 3·⌊√n⌋ (≈3σ for a fair coin over n users) means
      * the assignment or logging pipe is corrupted and every downstream
      * metric read is invalid — the first dashboard any experiment review
      * checks. IEEE sqrt of an integer below 2⁵³ is correctly rounded, so
      * ⌊√n⌋ is engine-exact (the tx_mixture_sample discipline).
      *
      * Distributed shape: one (type, user) DISTINCT shuffle, conditional-
      * sum pivot to arm counts (partial-aggregating), O(types) verdict
      * arithmetic. */
    QueryDef(
      "an_experiment_srm",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("arm", expr(
          s"CASE WHEN ${hashBits("user_id", 15)} % 100 < 50 THEN 'A' ELSE 'B' END"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_users_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_users_b"))
        .select(col("event_type"), col("n_users_a"), col("n_users_b"),
          abs(col("n_users_a") - col("n_users_b")).as("dev"),
          expr("3 * CAST(floor(sqrt(CAST(n_users_a + n_users_b AS DOUBLE))) AS BIGINT)")
            .as("bound"),
          expr("CASE WHEN abs(n_users_a - n_users_b) > " +
            "3 * CAST(floor(sqrt(CAST(n_users_a + n_users_b AS DOUBLE))) AS BIGINT) " +
            "THEN 'srm' ELSE 'ok' END").as("verdict"))
        .orderBy("event_type"),
      Some(s"""WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
             |a AS (SELECT event_type,
             |        CASE WHEN ${duckHashBits("user_id", 15)} % 100 < 50
             |             THEN 'A' ELSE 'B' END AS arm
             |      FROM ut),
             |g AS (SELECT event_type,
             |        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_users_a,
             |        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_users_b
             |      FROM a GROUP BY event_type)
             |SELECT event_type, n_users_a, n_users_b,
             |       abs(n_users_a - n_users_b) AS dev,
             |       3 * CAST(floor(sqrt(CAST(n_users_a + n_users_b AS DOUBLE))) AS BIGINT)
             |         AS bound,
             |       CASE WHEN abs(n_users_a - n_users_b) >
             |            3 * CAST(floor(sqrt(CAST(n_users_a + n_users_b AS DOUBLE))) AS BIGINT)
             |            THEN 'srm' ELSE 'ok' END AS verdict
             |FROM g ORDER BY event_type""".stripMargin)),
  )

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
