package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table readers (TESTDATA.md).
  *
  * All queries read the driver-generated parquet at `sfDir`. Reads go through
  * here so every consumer benefits from the same scan hygiene: columnar
  * parquet scans with Catalyst pushing filters/column pruning into the file
  * scan. At cluster scale these would be catalog tables (ideally bucketed /
  * sorted per [[graft.etl.Layout]]); `spark.read.parquet` keeps the harness
  * self-contained.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = read(s, d, "events")
  // Note on scan splits: the fixture ships one row group per file, so the
  // first narrow segment of each pipeline runs on one core until its first
  // exchange. A round-robin repartition after read was measured (bench
  // r2) to cost more than it buys here — the compute-heavy stages already
  // parallelize via their own shuffles, and RoundRobinPartitioning's
  // deterministic full-row local sort taxes every light consumer. On a
  // cluster the lever is source-side: write multiple row groups / files.
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
