package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout helpers mirroring the reference's table hints
  * (SURVEY.md §4.2; /root/reference/sql_queries.py:40-117):
  *
  *  - DISTKEY / diststyle key  → `repartition(col)`: co-locates rows by key
  *    so downstream joins/aggs on that key avoid a shuffle.
  *  - SORTKEY                  → `sortWithinPartitions(col)`: parquet
  *    row-group min/max stats then give the zone-map range pruning Redshift
  *    gets from sorted blocks.
  *  - diststyle all            → `broadcast(df)` at join time (no storage
  *    action needed; see the broadcast() hints across graft.ops).
  *
  * At 100 TB the same two knobs become table layout policy: partition count
  * scales with cluster cores, and bucketed tables (`writeBucketed`) make
  * repeated equi-joins on the bucket key exchange-free on both sides.
  */
object Layout {

  /** Apply distkey/sortkey layout to a DataFrame before writing. */
  def layout(df: DataFrame, distKey: Option[String], sortKey: Option[String],
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dist = distKey match {
      case Some(k) if partitions > 0 => df.repartition(partitions, col(k))
      case Some(k)                   => df.repartition(col(k))
      case None                      => df
    }
    sortKey.fold(dist)(k => dist.sortWithinPartitions(k))
  }

  /** S4 table sink: idempotent overwrite parquet write (the reference's
    * drop-create-insert cycle collapses to mode=overwrite). */
  def writeParquet(df: DataFrame, path: String,
      distKey: Option[String] = None, sortKey: Option[String] = None): Unit =
    layout(df, distKey, sortKey).write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned write: the time/tenant pruning lever. A query
    * filtering on the partition column reads only matching directories —
    * at 100 TB that is the difference between scanning a day and scanning
    * the lake ("PartitionFilters" in the scan node; see LayoutPruningSpec). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Bucketed catalog table: both sides of a repeated join on `bucketCol`
    * read pre-shuffled. Requires a warehouse-backed catalog (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Morton (Z-order) value of two non-negative keys, `bits` bits each: bit
    * j of `a` lands at position 2j, bit j of `b` at 2j+1. A single SORTKEY
    * prunes one dimension; sorting/partitioning by the interleaved value
    * keeps BOTH dimensions clustered — a box predicate on (a, b) touches
    * only the quadtree cells it overlaps (the Delta/Iceberg OPTIMIZE ZORDER
    * layout, and the reason it exists). Pure integer bit math: unrolled
    * shift/mask sum, codegen'd, and exactly restatable in any engine. */
  def zorderValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    // bits = 32 would place b's top bit at position 63 (the BIGINT sign
    // bit, inverting the sort for half the domain) and bits > 32 wraps
    // shift amounts mod 64 into collisions — both silent corruptions of
    // the clustering this function promises.
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val (al, bl) = (a.cast("bigint"), b.cast("bigint"))
    (0 until bits).flatMap { j =>
      Seq(shiftleft(shiftright(al, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(bl, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ + _)
  }
}
