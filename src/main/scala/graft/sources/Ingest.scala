package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2 ingestion: the reference's two COPY paths re-expressed as schema'd
  * JSON reads (reference: /root/reference/sql_queries.py:122-136).
  *
  *  - S1 `COPY staging_events ... format as json <jsonpaths>`: an explicit
  *    field→column mapping manifest. Spark equivalent: an explicit
  *    `StructType` — fields are matched by name, missing fields are null,
  *    and the declared types drive parse-time coercion.
  *  - S2 `COPY staging_songs ... format as json 'auto'`: name matching,
  *    which is Spark's default behavior with a declared schema.
  *  - `STATUPDATE ON` (S3): planner stats during load — AQE's runtime stats
  *    play that role (Sessions enables AQE).
  *
  * Load-time semantics preserved (SURVEY.md §1.2): DECIMAL(9,0) columns are
  * rounded at load (`length`, `duration`, lat/long — the J1 join therefore
  * compares rounded values), `registration` is stringified, and the two
  * staging NOT NULLs are *validated* (Spark does not enforce nullable=false
  * on read, so a filter drops violating rows the way a Redshift COPY would
  * reject them).
  *
  * At scale: `spark.read.json` with an explicit schema is a single
  * distributed pass (no schema-inference pre-pass), splittable per file —
  * the S3A analog of COPY's slice parallelism.
  */
object Ingest {

  private val dec9 = DecimalType(9, 0)

  /** staging_events (sql_queries.py:26-46). `length` declared DOUBLE here
    * and cast after read: parsing straight to DECIMAL(9,0) would round, but
    * making the cast explicit keeps the load-rounding in one visible place. */
  val eventsStagingSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", IntegerType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", StringType), // numeric in source, stringified (:39)
    StructField("sessionId", IntegerType, nullable = false),
    StructField("song", StringType),
    StructField("status", IntegerType),
    StructField("ts", LongType, nullable = false),
    StructField("userAgent", StringType),
    StructField("userId", IntegerType)))

  /** staging_songs (sql_queries.py:50-61). */
  val songsStagingSchema: StructType = StructType(Seq(
    StructField("num_songs", IntegerType),
    StructField("artist_id", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_longitude", DoubleType),
    StructField("artist_location", StringType),
    StructField("artist_name", StringType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", DoubleType),
    StructField("year", IntegerType)))

  /** S1: events log load — explicit mapping, DECIMAL load-cast, NOT NULL
    * validation on (sessionId, ts), and the VARCHAR(1) truncation the
    * star schema declares on gender (sql_queries.py:83): Redshift silently
    * truncates on insert, so the load applies `substring(gender, 1, 1)`. */
  def readEventsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsStagingSchema).json(path)
      .withColumn("length", col("length").cast(dec9))
      .withColumn("gender", substring(col("gender"), 1, 1))
      .filter(col("sessionId").isNotNull && col("ts").isNotNull)

  /** S2: song metadata load — 'auto' name matching, DECIMAL load-casts. */
  def readSongsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(songsStagingSchema).json(path)
      .withColumn("duration", col("duration").cast(dec9))
      .withColumn("artist_latitude", col("artist_latitude").cast(dec9))
      .withColumn("artist_longitude", col("artist_longitude").cast(dec9))
}
