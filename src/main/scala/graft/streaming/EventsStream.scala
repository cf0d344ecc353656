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

  val defs: Seq[QueryDef] = Seq(
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
