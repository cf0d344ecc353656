package graft.etl

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed star-schema model (SURVEY.md §1.1): case classes + Encoders for the
  * five star tables, for callers who want compile-time field checks on top
  * of the DataFrame lineages in [[StarEtl]].
  *
  * The fact id is nullable-by-spec: the reference inserts songplay_id as
  * NULL (PK with no IDENTITY, omitted from the INSERT column list,
  * sql_queries.py:141-150) — here the field simply doesn't exist on the
  * faithful fact row; [[withSurrogateIds]] is the documented fix, generating
  * partition-monotonic ids without any global coordination
  * (`monotonically_increasing_id`, safe at any scale).
  */
object StarSchema {

  final case class Songplay(
      start_time: java.sql.Timestamp,
      user_id: String,
      song_id: Long,
      session_id: String,
      user_agent: String)

  final case class User(user_id: Long, level: String)
  // duration/latitude: DECIMAL(9,0) HALF_UP load-rounding applied, then
  // carried as (nullable) BIGINT — see StarEtl.songs/artists.
  final case class Song(song_id: Long, title: String, artist_id: String,
      year: Int, duration: java.lang.Long)
  final case class Artist(artist_id: Long, name: String, location: Int,
      latitude: java.lang.Long)
  final case class TimeRow(start_time: java.sql.Timestamp, hour: Int, day: Int,
      week: Int, month: Int, year: Int, weekday: Int)

  def songplays(spark: SparkSession, sfDir: String): Dataset[Songplay] = {
    import spark.implicits._
    StarEtl.songplays(spark, sfDir).as[Songplay]
  }

  def users(spark: SparkSession, sfDir: String): Dataset[User] = {
    import spark.implicits._
    StarEtl.users(spark, sfDir).as[User]
  }

  def songs(spark: SparkSession, sfDir: String): Dataset[Song] = {
    import spark.implicits._
    StarEtl.songs(spark, sfDir).as[Song]
  }

  def artists(spark: SparkSession, sfDir: String): Dataset[Artist] = {
    import spark.implicits._
    StarEtl.artists(spark, sfDir).as[Artist]
  }

  def time(spark: SparkSession, sfDir: String): Dataset[TimeRow] = {
    import spark.implicits._
    StarEtl.time(spark, sfDir).as[TimeRow]
  }

  /** Documented deviation (SURVEY §1.3): real surrogate fact ids. */
  def withSurrogateIds(spark: SparkSession, sfDir: String) = {
    import org.apache.spark.sql.functions.monotonically_increasing_id
    StarEtl.songplays(spark, sfDir)
      .withColumn("songplay_id", monotonically_increasing_id())
  }
}
