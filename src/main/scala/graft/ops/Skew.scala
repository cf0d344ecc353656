package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers.
  *
  * A groupBy on a low-cardinality or hot-keyed column concentrates whole key
  * groups on single reducers; at 100 TB one hot key stalls the stage. The
  * standard fix for algebraic aggregates is salting: aggregate on
  * (key, salt) first — distributing each hot key over `buckets` reducers —
  * then re-aggregate the partials on the bare key. Results are identical
  * because sum/count/min/max are associative; the second shuffle moves only
  * `keys × buckets` partial rows.
  *
  * (AQE's skew-join splitting covers the join case; this covers hot-key
  * aggregation, which AQE does not re-salt.)
  */
object Skew {

  /** Working-column name for the salt. Prefixed to make a collision with a
    * caller's own columns implausible; [[saltedJoin]] asserts it anyway
    * (a duplicate would make the join key silently wrong). */
  val SaltCol = "__graft_salt"

  /** Deterministic salt derived from a high-cardinality column. */
  def saltFrom(c: Column, buckets: Int): Column = pmod(xxhash64(c), lit(buckets))

  /** Two-phase salted sum/count: exact same result as
    * `df.groupBy(key).agg(sum(valueCol), count(*))`. */
  def saltedSumCount(df: DataFrame, key: String, saltSource: String,
      valueCol: Column, buckets: Int = 32): DataFrame =
    df.withColumn(SaltCol, saltFrom(col(saltSource), buckets))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))

  /** Salted equi-join for a hot-keyed fact side that must SHUFFLE-join a
    * non-broadcastable dimension (too big to broadcast, too hot for a plain
    * hash join): the fact side gets a random-in-[0,buckets) salt derived
    * from a high-cardinality column, the dim side is replicated once per
    * salt value, and the join runs on (key, salt) — each hot key's rows
    * spread over `buckets` reducers. Result is row-identical to the plain
    * join; cost is dim×buckets replication, the standard trade. (AQE's
    * skew-join split handles sort-merge joins after the fact; salting is
    * the plan-level guarantee that also covers repeated joins and
    * pre-bucketed layouts.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, buckets: Int = 32): DataFrame = {
    require(!fact.columns.contains(SaltCol) && !dim.columns.contains(SaltCol),
      s"input already has a $SaltCol column")
    // buckets <= 0 would be SILENTLY empty, not an error: pmod(x, 0) is
    // NULL under the session's ANSI-off config and NULL never equi-joins.
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = fact.withColumn(SaltCol, saltFrom(col(saltSource), buckets))
    val replicated = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }
}
