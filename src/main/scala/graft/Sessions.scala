package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults so Verify, Bench and the
  * test suites run with identical semantics.
  *
  * - UTC session TZ: E1/E2-E7 extract-family correctness vs the oracle.
  * - ANSI off: Redshift-permissive integer division / overflow (SURVEY §4.3).
  * - nanosAsLong: the fixture `events.ts` is parquet TIMESTAMP(NANOS); Spark
  *   reads it as BIGINT nanos (mirrors the reference's BIGINT staging col).
  * - AQE on: runtime re-plan (skew joins, dynamic coalescing) — the knob that
  *   matters at the 100 TB target, harmless locally.
  * - shuffle.partitions from cpus: local mode wants ~#threads, not 200; on a
  *   real cluster this would scale with executors (AQE coalesces the rest).
  * - RocksDB state store: streaming state (the sessionizer's pending
  *   sessions, the landing-zone dedup's seen-keys) lives off-heap on local
  *   disk instead of the default HDFSBackedStateStore's executor heap — at
  *   hundreds of millions of users the heap provider OOMs long before the
  *   watermark can expire anything. Every spec runs on this provider, so
  *   the tested path IS the at-scale path.
  */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ~100-query workloads generate several codegen units per query; the
      // default 100-entry generated-class cache churns completely within one
      // pass, so every re-execution pays Janino compilation again. Sized to
      // hold the whole library's generated classes (a few MB of classes —
      // model-state scale, not data scale).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")

  def local(cpus: String): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
