package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StarEtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("E1: epoch millis → timestamp truncates the millisecond component") {
    import spark.implicits._
    // reference example: 1541121934796 ms → 2018-11-02 01:25:34 (millis dropped)
    val df = Seq(1541121934796L).toDF("ms")
      .select(StarEtl.epochToTimestamp(col("ms")).as("st"))
    val got = df.select(date_format(col("st"), "yyyy-MM-dd HH:mm:ss")).head.getString(0)
    assert(got == "2018-11-02 01:25:34")
  }

  test("DECIMAL(9,0) cast rounds HALF_UP like a Redshift load") {
    import spark.implicits._
    val got = Seq(2.5, 3.49, 3.5, -2.5).toDF("x")
      .select(col("x").cast(DecimalType(9, 0))).collect().map(_.getDecimal(0).intValue)
    assert(got.toSeq == Seq(3, 3, 4, -3))
  }

  test("E7 quirk: time.weekday equals the ISO week column, not day-of-week") {
    val t = StarEtl.time(spark, sf)
    assert(t.filter(col("weekday") =!= col("week")).count() == 0)
    val f = StarEtl.timeFixed(spark, sf)
    assert(f.filter(col("weekday") > 6).count() == 0)
  }

  test("A2 quirk: users dedup key includes level → upgraded users duplicate") {
    val u = StarEtl.users(spark, sf)
    val dupUsers = u.groupBy("user_id").count().filter(col("count") > 1).count()
    assert(dupUsers > 0, "expected at least one user with multiple levels")
    val fixed = StarEtl.usersFixed(spark, sf)
    assert(fixed.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(fixed.count() == u.select("user_id").distinct().count())
  }

  test("J1: DECIMAL(9,0)-rounded join matches more than raw-double equality") {
    import spark.implicits._
    val se  = StarEtl.stagingEvents(spark, sf).filter(col("event_type") === "view")
    val dimRaw = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("d_user"), col("value").as("d_value")).distinct()
    val raw = se.join(dimRaw,
      se("user_id") === dimRaw("d_user") && se("value") === dimRaw("d_value")).count()
    val rounded = StarEtl.songplays(spark, sf).count()
    assert(rounded > raw, s"rounded=$rounded should exceed raw=$raw")
  }

  test("songplays: no duplicate fact rows after DISTINCT") {
    val sp = StarEtl.songplays(spark, sf)
    assert(sp.count() == sp.distinct().count())
  }
}
