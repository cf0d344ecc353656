package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming ingestion dedup: exact dedup AT THE LANDING ZONE, the first
  * stage of a continuously-fed training-data pipeline — arriving document
  * files are fingerprinted and deduplicated incrementally, so downstream
  * stages only ever see first occurrences.
  *
  * `dropDuplicates` on the normalized-text fingerprint keeps O(1) state per
  * distinct document (the fingerprint set lives in the state store; with a
  * watermark the horizon is bounded — unbounded here because exact dedup is
  * global by definition). The batch equivalent is `dd_exact`
  * (graft.dedup.Dedup) — DocsStreamSpec asserts the streamed fingerprint set
  * equals the batch one.
  */
object DocsStream {

  /** Streaming-source schema for the documents fixture parquet. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Incremental exact dedup into a parquet landing table with a real
    * checkpoint: each invocation processes only files that arrived since the
    * last run (source offsets live in `checkpointDir`), appends first-seen
    * documents exactly once, and carries the fingerprint state ACROSS runs —
    * the incremental-ingestion lifecycle that replaces the reference's
    * drop-everything-and-reload (create_tables.py:40-41). At scale this is
    * the production shape: file-source offsets + state store in the
    * checkpoint, exactly-once parquet sink via the sink's commit log. */
  def runDedupToParquet(spark: SparkSession, docsDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val q = spark.readStream.schema(docsSchema).parquet(docsDir)
      .withColumn("fp", md5(lower(regexp_replace(trim(col("text")), " +", " "))))
      .dropDuplicates("fp")
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Incremental exact dedup over a directory of arriving document files;
    * returns the deduped rows seen so far (memory sink, AvailableNow).
    * `maxFilesPerTrigger` > 0 forces multi-batch runs (spec). */
  def runDedupStream(spark: SparkSession, docsDir: String,
      queryName: String = "docs_dedup_stream",
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.schema(docsSchema)
    if (maxFilesPerTrigger > 0) reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val q = reader.parquet(docsDir)
      .withColumn("fp", md5(lower(regexp_replace(trim(col("text")), " +", " "))))
      .dropDuplicates("fp")
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
