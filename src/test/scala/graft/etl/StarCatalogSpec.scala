package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StarCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("catalog round-trip: reset declares all five tables, drop removes them") {
    StarCatalog.reset(spark)
    StarCatalog.tables.foreach { case (name, _, _) =>
      assert(spark.catalog.tableExists(name), s"$name missing after reset")
      assert(spark.table(name).count() == 0, s"$name should be empty after create")
    }
    // reset is idempotent (CREATE IF NOT EXISTS after DROP IF EXISTS)
    StarCatalog.reset(spark)
    StarCatalog.drop(spark)
    StarCatalog.tables.foreach { case (name, _, _) =>
      assert(!spark.catalog.tableExists(name), s"$name should be dropped")
    }
  }

  test("end-to-end ETL: pipeline writes five tables and register serves them") {
    val out = java.nio.file.Files.createTempDirectory("etl_out").toString
    StarCatalog.reset(spark)
    val results = StarPipeline.run(spark, sf, out)
    assert(results.map(_.name) ==
      Seq("songplays", "users", "songs", "artists", "time"))
    results.foreach(r => assert(r.rows > 0, s"${r.name} wrote no rows"))
    StarCatalog.register(spark, out)
    // catalog now serves the loaded data, with the declared schema
    assert(spark.table("songs").count() == results.find(_.name == "songs").get.rows)
    assert(spark.table("songplays").schema.fieldNames.toSeq ==
      Seq("start_time", "user_id", "song_id", "session_id", "user_agent"))
    // STATUPDATE ON analog: post-load catalog stats land for the planner
    StarCatalog.analyze(spark, columns = true)
    val stats = spark.sql("DESCRIBE EXTENDED songs")
      .filter("col_name = 'Statistics'").collect()
    assert(stats.nonEmpty, "ANALYZE left no table statistics on songs")
    val rowCount = stats.head.getString(1)
    assert(rowCount.contains(s"${results.find(_.name == "songs").get.rows} rows"),
      s"statistics don't carry the loaded row count: $rowCount")
    val colStats = spark.sql("DESCRIBE EXTENDED songs song_id")
      .filter("info_name = 'distinct_count'").collect()
    assert(colStats.nonEmpty && colStats.head.getString(1) != "NULL",
      "FOR ALL COLUMNS left no NDV on songs.song_id")
    StarCatalog.drop(spark)
  }
}
