package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.QueryDef

/** Incremental/streaming extension of the event pipeline (SURVEY.md §2.7:
  * the reference is batch-only; its ts-stamped append-only event grain maps
  * onto Structured Streaming).
  *
  * One aggregation, two execution modes over the same fixture parquet:
  *  - [[EventsStream.hourlyCountsBatch]] — the batch DataFrame the driver
  *    verifies against the DuckDB oracle;
  *  - [[EventsStream.runHourlyCountsStream]] — the identical logical plan
  *    under `readStream` with a 1-hour watermark and
  *    `Trigger.AvailableNow`, the incremental-rerun story that replaces the
  *    reference's drop-everything-and-reload (create_tables.py:40-41).
  *    At scale this is the same shuffle as the batch group-by, plus state
  *    store bookkeeping bounded by the watermark horizon.
  */
object EventsStream {

  /** Event projection used by the stateful sessionizer. */
  final case class Ev(user_id: Long, event_id: Long, ms: Long, cents: Long)

  /** Open-session state: carries the last-event time so the gap test works
    * across micro-batch boundaries. */
  final case class Open(start: Long, n: Long, cents: Long, lastMs: Long)

  /** Emitted session row. */
  final case class Sess(user_id: Long, session_start_ms: Long, n_events: Long,
      sum_cents: Long)

  /** Streaming-source schema: matches the fixture parquet read with
    * nanosAsLong (ts = BIGINT nanoseconds). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def hourly(events: DataFrame): DataFrame =
    events
      .withColumn("start_time", timestamp_seconds(expr("(ts div 1000000) div 1000")))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(
        date_trunc("hour", col("start_time")).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  def hourlyCountsBatch(spark: SparkSession, sfDir: String): DataFrame =
    hourly(graft.Tables.events(spark, sfDir))
      .orderBy("hour_ts", "event_type")

  /** Run the same aggregation as an incremental stream; returns the final
    * result table (complete mode, memory sink). `eventsDir` is a directory
    * of arriving parquet files — the FileStreamSource contract (a bare file
    * path is rejected), and the realistic landing-zone shape. */
  def runHourlyCountsStream(spark: SparkSession, eventsDir: String,
      queryName: String = "hourly_stream"): DataFrame = {
    val events = spark.readStream
      .schema(eventsSchema)
      .parquet(eventsDir)
    val agg = hourly(
      events
        .withColumn("ts_watermark", timestamp_seconds(expr("(ts div 1000000) div 1000")))
        .withWatermark("ts_watermark", "1 hour"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).orderBy("hour_ts", "event_type")
  }

  /** Session gap: a new session starts after 60 minutes of user inactivity. */
  val SessionGapMs = 3600000L

  /** Batch sessionization — gaps-and-islands with window functions: flag
    * session starts via lag(), number sessions via a running sum, aggregate
    * per (user, session). One shuffle on user_id; the window and the final
    * group-by share that partitioning. */
  def sessionizeBatch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > SessionGapMs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ms")).as("session_start_ms"), count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .select(col("user_id"), col("session_start_ms"), col("n_events"), col("sum_cents"))
      .orderBy("user_id", "session_start_ms")
  }

  /** Streaming sessionization via flatMapGroupsWithState: per-user state
    * carries the open session across micro-batches; a session is emitted as
    * FINAL as soon as a gap-exceeding event proves it closed. State is O(1)
    * per user — the 100 TB-scale shape for this computation (the batch
    * window variant needs the full history resident; this needs one open
    * session per key).
    *
    * State EXPIRES: the input carries a `watermarkDelay` event-time
    * watermark and the state an `EventTimeTimeout` at lastMs + gap. When the
    * watermark passes a user's gap horizon without new events, the open
    * session is emitted as FINAL and the state row is REMOVED — without this
    * a departed user's state lives forever (hundreds of millions of rows at
    * the 100 TB target) and their last session never closes. Expiry cannot
    * diverge from batch semantics: the timeout firing at watermark w implies
    * any future non-late event (ms ≥ w ≥ lastMs + gap) starts a new session
    * under the gap rule anyway.
    *
    * Emit contract: because an append sink cannot retract, the still-open
    * session is re-emitted at the end of every micro-batch it received
    * events in, as a PROVISIONAL row (n_events grows monotonically per
    * emission); the timeout emission above is its final form. Downstream
    * therefore compacts by (user_id, session_start_ms) keeping the row with
    * the largest n_events — the standard upsert-by-key pattern for append
    * streams; [[runSessionizeStream]] applies that compaction before
    * returning, so multi-batch runs agree with [[sessionizeBatch]] exactly.
    *
    * `maxFilesPerTrigger` > 0 bounds files per micro-batch (used by the
    * spec to force a genuine multi-batch run under AvailableNow). */
  def sessionizeStreamQuery(spark: SparkSession, eventsDir: String,
      queryName: String = "sessions_stream",
      maxFilesPerTrigger: Int = 0,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val reader = spark.readStream.schema(eventsSchema)
    if (maxFilesPerTrigger > 0) reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val events = reader.parquet(eventsDir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("et", expr("timestamp_millis(ms)"))
      .withWatermark("et", watermarkDelay)
      .as[Ev]
    def fn(user: Long, it: Iterator[Ev], state: GroupState[Open]): Iterator[Sess] = {
      if (state.hasTimedOut) {
        // watermark passed lastMs + gap with no new events: close out
        val fin = state.getOption.map(s => Sess(user, s.start, s.n, s.cents))
        state.remove()
        fin.iterator
      } else {
        val evs = it.toSeq.sortBy(e => (e.ms, e.event_id))
        var open = state.getOption
        val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
        evs.foreach { e =>
          open = open match {
            case Some(s) if e.ms - s.lastMs <= SessionGapMs =>
              // max: a cross-batch late event (admitted by the watermark)
              // must not REWIND the horizon — that would split sessions the
              // batch (globally sorted) variant keeps whole, and expire the
              // state early
              Some(s.copy(n = s.n + 1, cents = s.cents + e.cents,
                lastMs = math.max(s.lastMs, e.ms)))
            case Some(s) =>
              // closed by gap — this emission is final
              out += Sess(user, s.start, s.n, s.cents)
              Some(Open(e.ms, 1, e.cents, e.ms))
            case None =>
              Some(Open(e.ms, 1, e.cents, e.ms))
          }
        }
        // provisional emission of the open session (see emit contract above)
        open.foreach { s =>
          state.update(s)
          // events passing the late filter have ms ≥ watermark, so this
          // timestamp is always > watermark (Spark rejects stale timeouts)
          state.setTimeoutTimestamp(s.lastMs + SessionGapMs)
          out += Sess(user, s.start, s.n, s.cents)
        }
        out.iterator
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Upsert-by-key compaction of the append-stream emissions: latest
    * provisional/final row per (user, session_start). */
  def compactSessions(spark: SparkSession, queryName: String): DataFrame =
    spark.table(queryName)
      .groupBy(col("user_id"), col("session_start_ms"))
      .agg(max(struct(col("n_events"), col("sum_cents"))).as("m"))
      .select(col("user_id"), col("session_start_ms"),
        col("m.n_events").as("n_events"), col("m.sum_cents").as("sum_cents"))
      .orderBy("user_id", "session_start_ms")

  def runSessionizeStream(spark: SparkSession, eventsDir: String,
      queryName: String = "sessions_stream",
      maxFilesPerTrigger: Int = 0,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val q = sessionizeStreamQuery(spark, eventsDir, queryName, maxFilesPerTrigger,
      watermarkDelay)
    q.awaitTermination()
    compactSessions(spark, queryName)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "st_sessionize",
      (s, d) => sessionizeBatch(s, d),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
             |         CAST(round(value * 100) AS BIGINT) AS cents,
             |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
             |                                 ORDER BY epoch_ms(ts), event_id) AS prev_ms
             |  FROM events),
             |b AS (
             |  SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 3600000
             |                 THEN 1 ELSE 0 END AS brk FROM g),
             |sessions AS (
             |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS session_idx
             |  FROM b)
             |SELECT user_id, MIN(ms) AS session_start_ms, COUNT(*) AS n_events,
             |       CAST(SUM(cents) AS BIGINT) AS sum_cents
             |FROM sessions GROUP BY user_id, session_idx
             |ORDER BY user_id, session_start_ms""".stripMargin)),
    QueryDef(
      "st_hourly_counts",
      (s, d) => hourlyCountsBatch(s, d),
      Some("""SELECT CAST(date_trunc('hour', make_timestamp((epoch_ms(ts) // 1000) * 1000000))
             |            AS TIMESTAMP) AS hour_ts,
             |       event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events GROUP BY 1, 2
             |ORDER BY hour_ts, event_type""".stripMargin)),
  )
}
