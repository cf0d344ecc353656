package graft.etl

import org.apache.spark.sql.SparkSession

/** Catalog DDL for the star schema — the `sql_queries.py:15-118` +
  * `create_tables.py:13-27` analog: the reference declares every table with
  * explicit DROP/CREATE statements before loading; here the same surface is
  * ANSI `DROP TABLE IF EXISTS` / `CREATE TABLE ... USING PARQUET` through
  * the Spark catalog.
  *
  * The reference's physical hints don't exist as Spark DDL keywords, so they
  * are carried as TBLPROPERTIES documentation while the real layout is
  * applied at write time by [[graft.sources.Layout]] (distkey→repartition,
  * sortkey→sortWithinPartitions) — see SURVEY §4.2 for the mapping.
  *
  * Tables are EXTERNAL (LOCATION = the ELT output dir) so `reset` +
  * [[StarPipeline.run]] + `register` reproduces the reference's
  * drop → create → insert lifecycle without coupling the catalog to the
  * data files' lifetime.
  */
object StarCatalog {

  /** (name, column DDL, reference hints) for the five star tables.
    * Types mirror the StarEtl outputs ([[StarSchema]] case classes). */
  val tables: Seq[(String, String, String)] = Seq(
    ("songplays",
      "start_time TIMESTAMP, user_id STRING, song_id BIGINT, session_id STRING, user_agent STRING",
      "distkey=song_id, sortkey=start_time"),
    ("users", "user_id BIGINT, level STRING", "diststyle=all, sortkey=user_id"),
    ("songs", "song_id BIGINT, title STRING, artist_id STRING, year INT, duration BIGINT",
      "distkey=song_id, sortkey=song_id"),
    ("artists", "artist_id BIGINT, name STRING, location INT, latitude BIGINT",
      "diststyle=all, sortkey=artist_id"),
    ("time",
      "start_time TIMESTAMP, hour INT, day INT, week INT, month INT, year INT, weekday INT",
      "diststyle=all, sortkey=start_time"))

  def dropStatements: Seq[String] =
    tables.map { case (name, _, _) => s"DROP TABLE IF EXISTS $name" }

  /** CREATE without LOCATION — managed-table form (round-trip tests). */
  def createStatements: Seq[String] = createStatements(None)

  /** CREATE with optional LOCATION per table (external over ELT output). */
  def createStatements(locationFor: Option[String => String]): Seq[String] =
    tables.map { case (name, cols, hints) =>
      val loc = locationFor.map(f => s" LOCATION '${f(name)}'").getOrElse("")
      s"CREATE TABLE IF NOT EXISTS $name ($cols) USING PARQUET$loc " +
        s"TBLPROPERTIES ('graft.reference.hints' = '$hints')"
    }

  /** create_tables.py:13-19 analog: drop everything. */
  def drop(spark: SparkSession): Unit = dropStatements.foreach(spark.sql(_))

  /** create_tables.py:21-27 analog: declare everything (managed form). */
  def create(spark: SparkSession): Unit = createStatements.foreach(spark.sql(_))

  /** The reference main's drop-then-create sequencing (create_tables.py:40-41). */
  def reset(spark: SparkSession): Unit = { drop(spark); create(spark) }

  /** Re-declare the tables as EXTERNAL over the ELT output directories, so
    * `spark.table("songplays")` etc. serve the loaded data. */
  def register(spark: SparkSession, outDir: String): Unit = {
    drop(spark)
    createStatements(Some((name: String) => s"$outDir/$name")).foreach(spark.sql(_))
  }

  /** The COPY `STATUPDATE ON` analog for CATALOG consumers
    * (sql_queries.py:130/135: Redshift refreshes planner statistics as part
    * of the load). AQE already covers runtime stats (SURVEY §2.1 S3's
    * mapping — the at-scale default); this is the explicit catalog-stats
    * leg, so cost-based decisions that read the metastore (join reorder,
    * broadcast thresholds with AQE off) see post-load row counts/sizes.
    * `columns = true` adds per-column min/max/NDV (the
    * `FOR ALL COLUMNS` form) — the Redshift ANALYZE equivalent. */
  def analyze(spark: SparkSession, columns: Boolean = false): Unit =
    tables.foreach { case (name, _, _) =>
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS" +
        (if (columns) " FOR ALL COLUMNS" else ""))
    }
}
