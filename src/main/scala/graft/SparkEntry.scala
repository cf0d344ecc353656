package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.StarEtl

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-equivalent SQL string in
  * [[oracleSql]] (same column names, same explicit ORDER BY) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarEtl.songplays(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Star-schema ELT (reference parity, sql_queries.py:140-220)
    "songplays_build" -> ((s, d) => StarEtl.songplays(s, d)),
    "users_build"     -> ((s, d) => StarEtl.users(s, d)),
    "users_fixed"     -> ((s, d) => StarEtl.usersFixed(s, d)),
    "songs_build"     -> ((s, d) => StarEtl.songs(s, d)),
    "artists_build"   -> ((s, d) => StarEtl.artists(s, d)),
    "time_build"      -> ((s, d) => StarEtl.time(s, d)),
    "time_fixed"      -> ((s, d) => StarEtl.timeFixed(s, d)),
  )

  /** DuckDB equivalents over the same parquet tables (plain table names). */
  def oracleSql: Map[String, String] = Map(
    "songplays_build" ->
      """WITH se AS (SELECT *, epoch_ms(ts) AS ms FROM events WHERE event_type = 'view'),
        |dim AS (SELECT user_id AS d_user, CAST(value AS DECIMAL(9,0)) AS d_value,
        |               MIN(event_id) AS song_id
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT DISTINCT make_timestamp((se.ms // 1000) * 1000000) AS start_time,
        |       CAST(se.user_id AS VARCHAR) AS user_id, dim.song_id,
        |       CAST(se.event_id AS VARCHAR) AS session_id, se.props AS user_agent
        |FROM se JOIN dim ON se.user_id = dim.d_user
        |                AND CAST(se.value AS DECIMAL(9,0)) = dim.d_value
        |ORDER BY start_time, user_id, song_id, session_id, user_agent""".stripMargin,
    "users_build" ->
      """SELECT DISTINCT user_id, json_extract_string(props, '$.k') AS level
        |FROM events WHERE event_type = 'view'
        |ORDER BY user_id, level""".stripMargin,
    "users_fixed" ->
      """SELECT user_id, level FROM (
        |  SELECT user_id, json_extract_string(props, '$.k') AS level,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "songs_build" ->
      """SELECT DISTINCT p_partkey AS song_id, p_name AS title, p_brand AS artist_id,
        |       p_size AS year, CAST(p_retailprice AS DECIMAL(9,0)) AS duration
        |FROM part ORDER BY song_id""".stripMargin,
    "artists_build" ->
      """SELECT DISTINCT s_suppkey AS artist_id, s_name AS name,
        |       s_nationkey AS location, CAST(s_acctbal AS DECIMAL(9,0)) AS latitude
        |FROM supplier ORDER BY artist_id""".stripMargin,
    "time_build" ->
      """WITH t AS (SELECT DISTINCT make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS start_time
        |           FROM events WHERE event_type = 'view')
        |SELECT start_time,
        |       CAST(hour(start_time) AS INTEGER) AS hour,
        |       CAST(day(start_time) AS INTEGER) AS day,
        |       CAST(weekofyear(start_time) AS INTEGER) AS week,
        |       CAST(month(start_time) AS INTEGER) AS month,
        |       CAST(year(start_time) AS INTEGER) AS year,
        |       CAST(weekofyear(start_time) AS INTEGER) AS weekday
        |FROM t ORDER BY start_time""".stripMargin,
    "time_fixed" ->
      """WITH t AS (SELECT DISTINCT make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS start_time
        |           FROM events WHERE event_type = 'view')
        |SELECT start_time,
        |       CAST(hour(start_time) AS INTEGER) AS hour,
        |       CAST(day(start_time) AS INTEGER) AS day,
        |       CAST(weekofyear(start_time) AS INTEGER) AS week,
        |       CAST(month(start_time) AS INTEGER) AS month,
        |       CAST(year(start_time) AS INTEGER) AS year,
        |       CAST(isodow(start_time) - 1 AS INTEGER) AS weekday
        |FROM t ORDER BY start_time""".stripMargin,
  )
}
