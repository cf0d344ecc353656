package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming hourly counts (AvailableNow) equal the batch aggregation") {
    // FileStreamSource wants a directory of arriving files: stage one.
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val batch = EventsStream.hourlyCountsBatch(spark, sf).collect().toSeq
    val stream = EventsStream.runHourlyCountsStream(spark, dir, "hourly_spec").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("stateful sessionization (flatMapGroupsWithState) equals the batch gaps-and-islands") {
    val dir = java.nio.file.Files.createTempDirectory("events_sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val batch = EventsStream.sessionizeBatch(spark, sf).collect().toSeq
    val stream = EventsStream.runSessionizeStream(spark, dir, "sessions_spec").collect().toSeq
    assert(stream == batch)
    assert(batch.size > 100, s"expected many sessions, got ${batch.size}")
  }

  test("sessionization across MULTIPLE micro-batches matches batch (no duplicate emissions)") {
    import org.apache.spark.sql.functions._
    // Split the fixture at the time median into two files so sessions span
    // the batch boundary; per-user event order is preserved (all of file1's
    // events precede file2's). maxFilesPerTrigger=1 forces two micro-batches.
    val dir = java.nio.file.Files.createTempDirectory("events_sess2").toString
    val ev = graft.Tables.events(spark, sf).withColumn("ms", expr("ts div 1000000"))
    val mid = ev.selectExpr("percentile_approx(ms, 0.5)").head.getLong(0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = s"$dir/_tmp_$name"
      df.drop("ms").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis()
    stage(ev.filter(col("ms") <= mid), "part1", t0 - 60000)
    stage(ev.filter(col("ms") > mid), "part2", t0)
    val batch = EventsStream.sessionizeBatch(spark, sf).collect().toSeq
    val stream = EventsStream
      .runSessionizeStream(spark, dir, "sessions_spec2", maxFilesPerTrigger = 1)
      .collect().toSeq
    assert(stream == batch,
      s"multi-batch stream diverged: ${stream.size} vs ${batch.size} sessions")
  }
}
