package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StarPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("pipeline materializes all five star tables, idempotently") {
    val out = Files.createTempDirectory("star").toString
    val r1 = StarPipeline.run(spark, sf, out)
    assert(r1.map(_.name) == Seq("songplays", "users", "songs", "artists", "time"))
    assert(r1.forall(_.rows > 0))
    // rerun = the reference's drop-and-reload: same results
    val r2 = StarPipeline.run(spark, sf, out)
    assert(r2 == r1)
    // written fact matches the query lineage it came from
    assert(spark.read.parquet(s"$out/songplays").count() ==
      StarEtl.songplays(spark, sf).count())
  }
}
