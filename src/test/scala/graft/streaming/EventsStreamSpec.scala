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
}
