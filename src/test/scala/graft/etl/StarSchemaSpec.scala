package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StarSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("typed datasets round-trip the DataFrame lineages") {
    import spark.implicits._
    val sp = StarSchema.songplays(spark, sf)
    // typed transform: field access is compile-checked
    val users = sp.map(_.user_id).distinct().count()
    assert(users > 0 && users <= StarSchema.users(spark, sf).count())
    assert(StarSchema.songs(spark, sf).filter(_.duration != null).count() > 0)
    assert(StarSchema.time(spark, sf).filter(t => t.weekday == t.week).count() ==
      StarSchema.time(spark, sf).count()) // E7 quirk visible through types
  }

  test("surrogate ids are unique (the documented NULL-id fix)") {
    val ids = StarSchema.withSurrogateIds(spark, sf)
    assert(ids.select("songplay_id").distinct().count() == ids.count())
  }
}
