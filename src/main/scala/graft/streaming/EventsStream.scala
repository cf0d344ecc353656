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
  *    under `readStream` with `Trigger.AvailableNow`, the incremental-rerun
  *    story that replaces the reference's drop-everything-and-reload
  *    (create_tables.py:40-41). At scale this is the same shuffle as the
  *    batch group-by, plus state store bookkeeping bounded by the GROUP
  *    CARDINALITY — one state row per (hour, type); complete mode never
  *    evicts, so a watermark would be inert here (StreamRuns states the
  *    argument once; the sessionizer is the path with per-event state and
  *    a REAL watermark).
  */
// Serializable: the sessionizer closure calls [[mergeSessions]], so executors
// deserialize the (stateless) singleton with the task.
object EventsStream extends Serializable {

  /** Event projection used by the stateful sessionizer. */
  /** `cents` is an Option: events.value is a NULLABLE double, and the
    * typed seam must tolerate a NULL exactly the way [[sessionizeBatch]]'s
    * untyped `sum(cents)` does (skip the value, still count the event; a
    * session whose every value is NULL sums to NULL) — a primitive Long
    * here made one null-valued arrival crash the stream where batch
    * answers (round-17 review finding). */
  final case class Ev(user_id: Long, event_id: Long, ms: Long, cents: Option[Long])

  /** One pending session interval: [start, end] event-time span plus the
    * running aggregate. Pending sessions are disjoint and gap-separated.
    * `cents` mirrors SQL SUM over the span: None until the first non-NULL
    * value joins the span. */
  final case class PendSess(start: Long, end: Long, n: Long, cents: Option[Long])

  /** Sessionizer state: the user's pending sessions (sorted by start) and a
    * per-user emission sequence number — compaction picks the LATEST row per
    * session key, which mere n_events-max cannot do once a late event can
    * rewind a key away (tombstone). */
  final case class SessState(sessions: List[PendSess], seq: Long)

  /** Emitted session row. `seq` orders emissions per user so downstream
    * compaction keeps the latest row per (user_id, session_start_ms);
    * `n_events = 0` rows are tombstones for keys superseded by a late-event
    * rewind or bridge. */
  final case class Sess(user_id: Long, session_start_ms: Long, n_events: Long,
      sum_cents: Option[Long], seq: Long)

  /** Streaming-source schema with ts = BIGINT nanoseconds — the engine's
    * post-normalization contract (see [[graft.Tables.events]]). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `readStream` over a landing directory of event parquet files, with `ts`
    * normalized to BIGINT epoch-nanos — the streaming twin of
    * [[graft.Tables.events]]'s reader-boundary dispatch. FileStreamSource
    * needs the schema declared up front, so the physical ts type is probed
    * with a static metadata-only read of the same directory (landing files
    * have shipped both BIGINT-nanos and TIMESTAMP(MICROS) shapes across
    * fixture generations; reading TIMESTAMP micros through a LongType schema
    * would silently reinterpret micros as nanos — a 1000x time shift — which
    * is exactly the round-10 regression class this guards against). All
    * micro-batches of one query run under the schema probed at start; a
    * mid-stream type flip in the landing zone surfaces as a read error, not
    * a silent unit change. An EMPTY landing directory — the normal start
    * state of a real stream — has nothing to probe, so the declared
    * [[eventsSchema]] (BIGINT nanos, the engine's post-normalization
    * contract) applies; files that later arrive with a TIMESTAMP ts then
    * fail the batch read loudly instead of being reinterpreted. */
  private def readEventsStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val tsType =
      try spark.read.parquet(eventsDir).schema("ts").dataType
      catch {
        // 'Unable to infer schema' / path-not-yet-created: no files landed
        // yet, so there is no physical type to dispatch on.
        case _: org.apache.spark.sql.AnalysisException => LongType
      }
    val srcSchema = StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val reader = spark.readStream.schema(srcSchema)
    if (maxFilesPerTrigger > 0) reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val raw = reader.parquet(eventsDir)
    if (tsType == LongType) raw
    else raw.withColumn("ts", expr("unix_micros(cast(ts AS timestamp)) * 1000"))
  }

  private def hourly(events: DataFrame): DataFrame =
    events
      .withColumn("start_time", timestamp_seconds(expr("(ts div 1000000) div 1000")))
      .withColumn("cents", expr(graft.Tables.centsSql("value")))
      .groupBy(
        date_trunc("hour", col("start_time")).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  def hourlyCountsBatch(spark: SparkSession, sfDir: String): DataFrame =
    hourly(graft.Tables.events(spark, sfDir))
      // NULL hour_ts (NULL-ts events) / NULL event_type are accounting
      // groups in a monitor — kept, null direction pinned on both sides
      // (Spark ASC is NULLS FIRST, DuckDB NULLS LAST).
      .orderBy(col("hour_ts").asc_nulls_first, col("event_type").asc_nulls_first)

  /** Run the same aggregation as an incremental stream; returns the final
    * result table (complete mode, memory sink). `eventsDir` is a directory
    * of arriving parquet files — the FileStreamSource contract (a bare file
    * path is rejected), and the realistic landing-zone shape. */
  def runHourlyCountsStream(spark: SparkSession, eventsDir: String,
      queryName: String = "hourly_stream"): DataFrame =
    // No watermark: complete mode never evicts state, so one here would be
    // INERT while its presence claimed a bound that doesn't exist (round-17
    // review finding) — the real bound is the O(hours×types) group
    // cardinality; see StreamRuns for the stated-once scale argument.
    StreamRuns.completeToMemory(spark,
      hourly(readEventsStream(spark, eventsDir)),
      queryName, Seq("hour_ts", "event_type"))

  /** Stream-static ENRICHMENT: purchase events joined to the static
    * `customer` dimension on user_id = c_custkey, then hourly revenue per
    * market segment — the classic landing-zone enrichment rollup. The
    * static side is broadcast (re-read per micro-batch by Structured
    * Streaming, so dim updates between batches are picked up); the join
    * itself holds NO streaming state — only the aggregate does, one state
    * row per (hour, segment) group (see StreamRuns' complete-mode note). */
  private def enrichSegment(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase")
      .withColumn("start_time", timestamp_seconds(expr("(ts div 1000000) div 1000")))
      .withColumn("cents", expr(graft.Tables.centsSql("value")))
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(
        date_trunc("hour", col("start_time")).as("hour_ts"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  def enrichSegmentBatch(spark: SparkSession, sfDir: String): DataFrame =
    enrichSegment(graft.Tables.events(spark, sfDir), graft.Tables.customer(spark, sfDir))
      // hourlyCountsBatch's NULL-hour accounting-group pin; segment is
      // nullable too (NULL-mktsegment customer in the nullgrid corpus), so
      // its direction is pinned as well
      .orderBy(col("hour_ts").asc_nulls_first, col("segment").asc_nulls_first)

  /** The same enrichment as an incremental stream over an arriving-files
    * directory, with the customer dim read as a static batch table. */
  def runEnrichSegmentStream(spark: SparkSession, eventsDir: String, sfDir: String,
      queryName: String = "enrich_stream"): DataFrame =
    // No watermark — same reasoning as runHourlyCountsStream.
    StreamRuns.completeToMemory(spark,
      enrichSegment(readEventsStream(spark, eventsDir),
        graft.Tables.customer(spark, sfDir)),
      queryName, Seq("hour_ts", "segment"))

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
      // NULL-EVENT CONTRACT (an_sessionize's user-grain/timeline rule): a
      // NULL-user or NULL-ts event is not sessionizable — excluded in BOTH
      // the batch and stream paths (stream≡batch parity; the stream's
      // Dataset[Ev] encodes user_id/ms into primitive Longs, so an
      // unfiltered NULL would crash the stateful path outright) and in the
      // oracle's WHERE.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"),
        expr(graft.Tables.centsSql("value")).as("cents"))
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

  /** Normalize a pending-session list: sort by span, then merge any two
    * sessions whose interval distance (next.start - cur.end) is within the
    * gap. This is exactly the batch gaps-and-islands equivalence closure —
    * two batch sessions are one session iff the gap between the last event
    * of the first and the first event of the next is ≤ gap, and every
    * event inside a span is within gap of its neighbours by construction —
    * so inserting late events as singleton spans and re-merging reproduces
    * the batch answer for ANY arrival order the watermark admits. */
  /** SQL-SUM combine for the optional running aggregate: NULL is skipped,
    * not zeroed, so an all-NULL span stays NULL — batch parity. */
  private def sumOpt(a: Option[Long], b: Option[Long]): Option[Long] = (a, b) match {
    case (Some(x), Some(y)) => Some(x + y)
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }

  private[streaming] def mergeSessions(ss: List[PendSess]): List[PendSess] =
    ss.sortBy(s => (s.start, s.end))
      .foldLeft(List.empty[PendSess]) { (acc, s) =>
        acc match {
          case h :: t if s.start - h.end <= SessionGapMs =>
            PendSess(h.start, math.max(h.end, s.end), h.n + s.n,
              sumOpt(h.cents, s.cents)) :: t
          case _ => s :: acc
        }
      }.reverse

  /** Streaming sessionization via flatMapGroupsWithState: per-user state
    * carries the PENDING sessions across micro-batches — the open session
    * plus any closed session the watermark hasn't yet certified untouchable.
    * A late event admitted by the watermark can therefore do everything the
    * batch (globally sorted) variant would do with it: extend a session
    * forward, REWIND its start (e.ms < start), or BRIDGE two pending
    * sessions into one. A session is emitted as FINAL only once
    * `end + gap < watermark` — from then on every admissible event has
    * `ms ≥ watermark > end + gap` and can never merge with it, so the final
    * row provably equals the batch row. State is O(sessions inside the
    * watermark horizon) per user — bounded, and still the 100 TB-scale
    * shape (the batch window variant needs the full history resident).
    *
    * State EXPIRES: an `EventTimeTimeout` is armed at the earliest pending
    * `end + gap + 1`; when the watermark passes it, certified sessions are
    * emitted as FINAL and dropped, and a user with nothing pending has the
    * state row REMOVED — without this a departed user's state lives forever
    * (hundreds of millions of rows at the 100 TB target) and their last
    * session never closes.
    *
    * Emit contract: because an append sink cannot retract, every batch that
    * changes a pending session re-emits it as a PROVISIONAL row, and a key
    * superseded by a rewind/bridge gets a TOMBSTONE row (`n_events = 0`).
    * Rows carry a per-user emission sequence number; downstream compacts by
    * (user_id, session_start_ms) keeping the max-`seq` row and dropping
    * tombstones — the standard upsert-by-key pattern for append streams.
    * [[runSessionizeStream]] applies that compaction before returning, so
    * multi-batch runs agree with [[sessionizeBatch]] exactly whenever no
    * event is dropped as too-late (disorder ≤ watermarkDelay); an event the
    * watermark REJECTS is absent from the streaming answer by construction —
    * that divergence is inherent to any bounded-state streaming engine.
    *
    * `maxFilesPerTrigger` > 0 bounds files per micro-batch (used by the
    * spec to force a genuine multi-batch run under AvailableNow). */
  def sessionizeStreamQuery(spark: SparkSession, eventsDir: String,
      queryName: String = "sessions_stream",
      maxFilesPerTrigger: Int = 0,
      watermarkDelay: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val events = readEventsStream(spark, eventsDir, maxFilesPerTrigger)
      // sessionizeBatch's NULL-EVENT CONTRACT (stream≡batch; also keeps
      // NULLs out of the primitive-Long Ev encoder and the watermark)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"),
        expr(graft.Tables.centsSql("value")).as("cents"))
      .withColumn("et", expr("timestamp_millis(ms)"))
      .withWatermark("et", watermarkDelay)
      .as[Ev]
    def fn(user: Long, it: Iterator[Ev], state: GroupState[SessState]): Iterator[Sess] = {
      val wm = state.getCurrentWatermarkMs()
      val old = state.getOption.getOrElse(SessState(Nil, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
      var seq = old.seq
      def emit(s: PendSess): Unit = { seq += 1; out += Sess(user, s.start, s.n, s.cents, seq) }
      val merged =
        if (state.hasTimedOut) old.sessions
        else mergeSessions(old.sessions ++ it.map(e => PendSess(e.ms, e.ms, 1, e.cents)))
      // tombstone keys the merge erased (a rewind moves start earlier; a
      // bridge keeps only the earlier key) — no admissible future event can
      // recreate an erased key, since it now lies strictly inside a span
      val newKeys = merged.map(_.start).toSet
      old.sessions.map(_.start).filterNot(newKeys).sorted
        .foreach { k => seq += 1; out += Sess(user, k, 0L, None, seq) }
      // `end + gap < wm` strictly: an event AT the watermark is admissible
      // and an event at exactly end + gap still merges under `≤ gap`
      val (fin, live) = merged.partition(_.end + SessionGapMs < wm)
      fin.foreach(emit) // final form — provably never touched again
      // provisional re-emission of pending sessions this batch changed
      val oldByKey = old.sessions.map(s => s.start -> s).toMap
      live.filter(s => !oldByKey.get(s.start).contains(s)).foreach(emit)
      if (live.isEmpty) state.remove()
      else {
        state.update(SessState(live, seq))
        // +1: the timeout must be strictly later than the watermark when
        // armed (live ⇒ end + gap ≥ wm), and firing means wm > end+gap+1,
        // which satisfies the strict finality test above
        state.setTimeoutTimestamp(live.head.end + SessionGapMs + 1)
      }
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Upsert-by-key compaction of the append-stream emissions: keep the
    * LATEST (max-seq) row per (user, session_start), drop tombstones. */
  def compactSessions(spark: SparkSession, queryName: String): DataFrame =
    spark.table(queryName)
      .groupBy(col("user_id"), col("session_start_ms"))
      .agg(max(struct(col("seq"), col("n_events"), col("sum_cents"))).as("m"))
      .filter(col("m.n_events") > 0)
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
             |         CAST(round(CASE WHEN (isfinite(value) AND abs(value) <= 9e16) THEN value END * 100) AS BIGINT) AS cents,
             |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
             |                                 ORDER BY epoch_ms(ts), event_id) AS prev_ms
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
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
             |       CAST(SUM(CAST(round(CASE WHEN (isfinite(value) AND abs(value) <= 9e16) THEN value END * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events GROUP BY 1, 2
             |ORDER BY hour_ts NULLS FIRST, event_type NULLS FIRST""".stripMargin)),
    QueryDef(
      "st_enrich_segment",
      (s, d) => enrichSegmentBatch(s, d),
      Some("""SELECT CAST(date_trunc('hour', make_timestamp((epoch_ms(ts) // 1000) * 1000000))
             |            AS TIMESTAMP) AS hour_ts,
             |       c_mktsegment AS segment, COUNT(*) AS n,
             |       CAST(SUM(CAST(round(CASE WHEN (isfinite(value) AND abs(value) <= 9e16) THEN value END * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events JOIN customer ON user_id = c_custkey
             |WHERE event_type = 'purchase'
             |GROUP BY 1, 2
             |ORDER BY hour_ts NULLS FIRST, segment NULLS FIRST""".stripMargin)),

    /** STREAMING DRIFT GATE — graft.ops.Analytics.an_shard_drift's monitor
      * run AT THE LANDING ZONE: per arriving day-shard, the event-type-mix
      * total-variation distance vs the corpus mix, plus the gate verdict
      * (`drift_ok`: tv under 10%). The streamable half is the ONE
      * aggregation Structured Streaming allows (day×type counts, complete
      * mode); the drift scoring is a day-sized batch post-join over the
      * result table — the split that makes the monitor incremental without
      * chained streaming aggregations. Stream≡batch spec in
      * EventsStreamSpec. */
    QueryDef(
      "st_drift",
      (s, d) => driftFromCounts(dayTypeCounts(graft.Tables.events(s, d))),
      Some("""WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, event_type FROM events),
             |sh AS (SELECT day, event_type, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
             |tot AS (SELECT day, CAST(SUM(cnt) AS BIGINT) AS tot FROM sh GROUP BY 1),
             |g AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM sh GROUP BY 1),
             |gt AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS gtot FROM g)
             |SELECT t.day,
             |       CAST(SUM(COALESCE(s.cnt, 0)) AS BIGINT) AS n_events,
             |       CAST(SUM(abs((1000000 * COALESCE(s.cnt, 0)) // t.tot
             |                    - (1000000 * g.gcnt) // gt.gtot)) AS BIGINT) AS tv_micro,
             |       CAST(SUM(abs((1000000 * COALESCE(s.cnt, 0)) // t.tot
             |                    - (1000000 * g.gcnt) // gt.gtot)) AS BIGINT) < 100000
             |         AS drift_ok
             |FROM tot t CROSS JOIN g CROSS JOIN gt
             |LEFT JOIN sh s ON s.day = t.day AND s.event_type = g.event_type
             |GROUP BY t.day ORDER BY t.day NULLS FIRST""".stripMargin)),

    /** Streaming k-anonymity suppression gate — see [[kanonGate]]. */
    QueryDef(
      "st_kanon_gate",
      (s, d) => kanonGateBatch(s, d),
      Some("""WITH q AS (SELECT event_id, event_type,
             |         (epoch_ms(ts) // 3600000) % 24 AS hour_of_day,
             |         CAST(round(CASE WHEN (isfinite(value) AND abs(value) <= 9e16) THEN value END * 100) AS BIGINT) AS cents, user_id
             |       FROM events),
             |ok AS (SELECT event_type, hour_of_day FROM q WHERE event_id % 5 <> 0
             |       GROUP BY 1, 2 HAVING COUNT(DISTINCT user_id) >= 5)
             |SELECT q.event_type,
             |       CASE WHEN ok.event_type IS NOT NULL THEN 'forward'
             |            ELSE 'suppress' END AS verdict,
             |       COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
             |FROM q LEFT JOIN ok ON q.event_type = ok.event_type
             |                   AND q.hour_of_day = ok.hour_of_day
             |GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2""".stripMargin)),
  )

  /** Per-(day, event_type) counts — the streamable half of the drift gate:
    * a single aggregation, legal in complete mode. */
  def dayTypeCounts(events: DataFrame): DataFrame =
    events
      .select(expr("(ts div 1000000) div 86400000").as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("cnt"))

  /** Drift scoring over a day×type count table (day-sized, not data-sized):
    * full grid vs the corpus mix, exact integer shares, gate verdict at
    * 10% total variation. */
  def driftFromCounts(sh: DataFrame): DataFrame = {
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
      .withColumn("drift_ok", col("tv_micro") < 100000L)
      // hourlyCountsBatch's NULL-bucket accounting-group pin
      .orderBy(col("day").asc_nulls_first)
  }

  /** The drift gate as an incremental stream: the day×type aggregation runs
    * under `readStream` (complete mode via `foreachBatch`, AvailableNow),
    * each trigger OVERWRITES a parquet counts table, and the scoring join
    * runs on the re-read table. The file round-trip is the point, twice
    * over: (a) the scoring plan joins the counts against three aggregates
    * of itself, and Spark's relation dedup breaks on a memory-sink view on
    * both sides (INTERNAL_ERROR: conflicting references) — a fresh parquet
    * scan gets fresh attribute ids; (b) unlike the round-9 workaround
    * (collect + re-createDataFrame, bounded by the day×type contract but
    * still driver-side), the counts stay DISTRIBUTED end to end, so the
    * gate survives the grid growing dimensions. At scale this parquet
    * table is the monitor's published artifact — the same discipline as
    * every persisted index. */
  def runDriftStream(spark: SparkSession, eventsDir: String,
      queryName: String = "drift_stream"): DataFrame =
    runCountsMonitor(spark, queryName,
      dayTypeCounts(readEventsStream(spark, eventsDir)), driftFromCounts)

  /** The shared monitor lifecycle behind [[runDriftStream]] /
    * [[runBackfillStream]] / [[runFreshnessStream]] — previously three
    * near-identical copies, which meant every lifecycle defect had to be
    * fixed three times. Streams the O(cells) aggregation in complete mode
    * into a temp parquet table (the file round-trip gives the self-joining
    * scorer fresh attribute ids — see [[runDriftStream]]'s design note),
    * scores the re-read table, MATERIALIZES the result, and deletes the
    * temp dir (previously leaked per call — the lazily-read frame forbade
    * deletion, so repeated monitor runs accumulated unbounded temp
    * parquet). The explicit read schema makes an EMPTY landing dir — the
    * normal start state of a real stream — score as an empty frame
    * instead of dying on parquet schema inference (zero micro-batches
    * write zero files); both fixes are the established
    * EmbedStream.runUpsertStream discipline. */
  private def runCountsMonitor(spark: SparkSession, queryName: String,
      streamedCounts: DataFrame, score: DataFrame => DataFrame): DataFrame =
    StreamDirs.withTempDir(s"graft_$queryName") { countsDir =>
      val schema = streamedCounts.schema
      val q = streamedCounts.writeStream
        .outputMode("complete")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(countsDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      score(spark.read.schema(schema).parquet(countsDir))
        .localCheckpoint()
    }

  /** Coverage scoring of graft.ops.Analytics an_backfill_plan over a
    * day×type count table — the SAME streamable aggregation that feeds the
    * drift monitor ([[dayTypeCounts]]), so one complete-mode stream keeps
    * BOTH monitors current: presence = a count row exists, span from the
    * table's own min/max day, missing = span minus presence. Day-grain
    * input, O(types) output. */
  def backfillFromCounts(sh: DataFrame): DataFrame = {
    val td = sh.filter(col("cnt") > 0).select(col("event_type"), col("day"))
    val span = td.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    td.groupBy(col("event_type")).agg(count(lit(1)).as("n_days_present"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("n_days_present"),
        expr("hi - lo + 1").as("span_days"),
        expr("hi - lo + 1 - n_days_present").as("n_missing"),
        expr("CASE WHEN hi - lo + 1 = n_days_present THEN 'complete' " +
          "ELSE 'backfill' END").as("verdict"))
      .orderBy("event_type")
  }

  /** The backfill planner as an incremental stream — the [[runDriftStream]]
    * parquet round-trip (counts table overwritten per trigger, scoring join
    * over the re-read table). */
  def runBackfillStream(spark: SparkSession, eventsDir: String,
      queryName: String = "backfill_stream"): DataFrame =
    runCountsMonitor(spark, queryName,
      dayTypeCounts(readEventsStream(spark, eventsDir)), backfillFromCounts)

  /** Per-type watermark maxima — the streamable half of the freshness
    * audit (graft.ops.Analytics an_watermark_lag): ONE complete-mode
    * aggregation, O(types) state. */
  def typeWatermarks(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(max(expr("ts div 1000000")).as("max_ms"))

  /** Freshness scoring over the watermark table (type-sized): lag vs the
    * table's own global max, 4h verdict — identical arithmetic to the
    * batch query. */
  def freshnessFromMax(m: DataFrame): DataFrame =
    m.crossJoin(broadcast(m.agg(max(col("max_ms")).as("global_max_ms"))))
      .select(col("event_type"), col("max_ms"),
        expr("global_max_ms - max_ms").as("lag_ms"),
        expr("CASE WHEN global_max_ms - max_ms < 14400000 THEN 'fresh' " +
          "ELSE 'stale' END").as("freshness"))
      .orderBy("event_type")

  /** The freshness audit as an incremental stream — the [[runDriftStream]]
    * parquet round-trip (the scoring join reads the watermark table against
    * an aggregate of itself). */
  def runFreshnessStream(spark: SparkSession, eventsDir: String,
      queryName: String = "freshness_stream"): DataFrame =
    runCountsMonitor(spark, queryName,
      typeWatermarks(readEventsStream(spark, eventsDir)), freshnessFromMax)

  /** GENERALIZED quasi-identifier cell: (event_type, hour-of-day). The
    * fine-grained audit (graft.ops.Analytics an_kanon_audit) flags under-k
    * cells at (type, hour, value-decade) grain; the serving-side remedy is
    * GENERALIZATION — drop the value decade so cells pool enough users —
    * and this is the cell the gate enforces. Row-local, stream-legal. */
  private def withCoarseQi(events: DataFrame): DataFrame =
    events.withColumn("hour_of_day", expr("(ts div 1000000 div 3600000) % 24"))

  /** OK-cell census over the TRUSTED ingested shard (event_id % 5 ≠ 0 — the
    * same already-ingested/arriving split every st_ index uses): generalized
    * QI cells whose distinct-user support reaches k=5, published as a
    * content-keyed parquet artifact (the frameFpIndexPath discipline).
    * O(types × 24) rows — broadcastable forever, regardless of corpus
    * size. */
  def kanonOkCells(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.indexParquet(s, "kanon_cells", d, "events")(
      withCoarseQi(graft.Tables.events(s, d).filter(expr("event_id % 5 <> 0")))
        .groupBy(col("event_type"), col("hour_of_day"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .filter(col("n_users") >= 5)
        .select(col("event_type"), col("hour_of_day")))

  /** K-ANONYMITY SUPPRESSION GATE — the streaming enforcement of the batch
    * audit: an arriving event whose generalized QI cell did NOT reach k=5
    * distinct users in the trusted census is suppressed before export
    * (an UNSEEN cell fails closed — no census support means no anonymity
    * evidence). Emits the per-(type, verdict) event count and value mass —
    * the O(types×2) accounting a release gate alerts on.
    *
    * Stream shape: row-local QI projection → stream-static LEFT join
    * against the broadcast O(types×24) ok-cell table (no streaming state)
    * → ONE aggregation (complete mode). The census is the published
    * artifact, re-read per micro-batch, so census refreshes between
    * batches are picked up without restarting the gate. */
  def kanonGate(events: DataFrame, okCells: DataFrame): DataFrame =
    withCoarseQi(events)
      .join(broadcast(okCells.withColumn("cell_ok", lit(1))),
        Seq("event_type", "hour_of_day"), "left_outer")
      .withColumn("verdict",
        when(col("cell_ok").isNotNull, "forward").otherwise("suppress"))
      .groupBy(col("event_type"), col("verdict"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr(graft.Tables.centsSql("value"))).as("sum_cents"))

  /** Batch registration of [[kanonGate]] (stream≡batch spec in
    * EventsStreamSpec). */
  def kanonGateBatch(s: SparkSession, d: String): DataFrame =
    kanonGate(graft.Tables.events(s, d), kanonOkCells(s, d))
      // hourlyCountsBatch's NULL-type accounting-group pin
      .orderBy(col("event_type").asc_nulls_first, col("verdict"))

  /** [[kanonGate]] as an incremental stream over a landing directory:
    * stream-static join + single aggregation, complete mode, memory sink. */
  def runKanonGateStream(spark: SparkSession, eventsDir: String, staticDir: String,
      queryName: String = "kanon_gate_stream"): DataFrame =
    StreamRuns.completeToMemory(spark,
      kanonGate(readEventsStream(spark, eventsDir), kanonOkCells(spark, staticDir)),
      queryName, Seq("event_type", "verdict"))
}
