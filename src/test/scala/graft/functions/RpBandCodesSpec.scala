package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RpBandCodesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("rp_band_codes resolves via GraftExtensions and has the declared shape") {
    import spark.implicits._
    val codes = Seq(Seq(1L, -2L, 3L)).toDF("vm")
      .select(expr("rp_band_codes(vm)").as("codes"))
      .head.getSeq[Long](0)
    assert(codes.length == RpBandCodesImpl.Bands)
    // every band code fits in BandBits bits
    assert(codes.forall(c => c >= 0L && c < (1L << RpBandCodesImpl.BandBits)))
  }

  test("native kernel equals the exploded SUM(xm*sgn) SQL formulation on the fixture") {
    val planes = RpBandCodesImpl.Planes
    val bits = RpBandCodesImpl.BandBits
    val dim = graft.sim.Similarity.Dim
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .createOrReplaceTempView("emb_rp")
    // The relational formulation the kernel replaced: explode quantized
    // components × the md5-derived ±1 plane table, integer dot per plane,
    // pack sign bits into band codes.
    val viaSql = spark.sql(
      s"""SELECT vec_id, CAST(p div $bits AS INT) AS bi,
         |  CAST(SUM(IF(dm >= 0, shiftleft(CAST(1 AS BIGINT), CAST(p % $bits AS INT)), 0L))
         |       AS BIGINT) AS bv
         |FROM (
         |  SELECT vec_id, p, SUM(xm * sgn) AS dm
         |  FROM (
         |    SELECT e.vec_id, pl.p,
         |           CAST(round(element_at(e.v, CAST(pl.i AS INT) + 1) * 1000000) AS BIGINT) AS xm,
         |           pl.sgn
         |    FROM emb_rp e,
         |         (SELECT p, i,
         |                 CASE WHEN substr(md5(concat('rp:', CAST(p AS STRING), ':', CAST(i AS STRING))), 1, 1)
         |                      IN ('0','1','2','3','4','5','6','7')
         |                      THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sgn
         |          FROM (SELECT explode(sequence(0, ${planes - 1})) AS p)
         |          LATERAL VIEW explode(sequence(0, ${dim - 1})) AS i) pl)
         |  GROUP BY vec_id, p)
         |GROUP BY vec_id, CAST(p div $bits AS INT)""".stripMargin)
    val viaNative = spark.sql(
      """SELECT vec_id, bi, bv FROM (
        |  SELECT vec_id, posexplode(
        |    rp_band_codes(transform(v, x -> CAST(round(x * 1000000) AS BIGINT)))) AS (bi, bv)
        |  FROM emb_rp)""".stripMargin)
      .select(col("vec_id"), col("bi").cast("int").as("bi"), col("bv"))
    val sqlN = viaSql.select(col("vec_id"), col("bi").cast("int").as("bi"), col("bv"))
    assert(viaNative.exceptAll(sqlN).count() == 0)
    assert(sqlN.exceptAll(viaNative).count() == 0)
  }

  test("sign derivation matches the engine's md5 high-hex-char rule") {
    import spark.implicits._
    val pi = Seq((0, 0), (0, 63), (7, 3), (127, 63), (55, 17))
    val viaSql = pi.toDF("p", "i")
      .select(expr(
        "CASE WHEN substr(md5(concat('rp:', CAST(p AS STRING), ':', CAST(i AS STRING))), 1, 1) " +
          "IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END").as("sgn"))
      .as[Int].collect().toSeq
    // kernel path: a unit vector at dim i isolates plane p's sign at band
    // p/BandBits bit p%BandBits (dot = sgn * 1e6; bit set iff sgn > 0)
    val viaKernel = pi.map { case (p, i) =>
      val vm = new Array[Long](64); vm(i) = 1000000L
      val codes = RpBandCodesImpl.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vm))
      val bv = codes.getLong(p / RpBandCodesImpl.BandBits)
      if (((bv >> (p % RpBandCodesImpl.BandBits)) & 1L) == 1L) 1 else -1
    }
    assert(viaSql == viaKernel)
  }
}
