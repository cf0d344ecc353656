package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("simhash32 resolves via GraftExtensions (no manual registration)") {
    // TestSpark's session is built by Sessions → extensions injected the fn
    import spark.implicits._
    val v = Seq("a b c").toDF("text")
      .select(expr("simhash32(split(text, ' '))").as("h"))
      .head.getLong(0)
    assert(v >= 0 && v <= 0xffffffffL)
  }

  test("native simhash32 equals the exploded bit-vote SQL formulation") {
    val docs = graft.Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_sh")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  CAST(SUM(IF(s >= 0, shiftleft(CAST(1 AS BIGINT), j), 0L)) AS BIGINT) AS simhash
        |FROM (
        |  SELECT doc_id, j, SUM(IF((shiftright(h, j) & 1) = 1, 1, -1)) AS s
        |  FROM (
        |    SELECT doc_id, CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) AS h
        |    FROM (SELECT doc_id, explode(array_distinct(split(trim(text), ' +'))) AS t
        |          FROM docs_sh))
        |  LATERAL VIEW explode(sequence(0, 31)) AS j
        |  GROUP BY doc_id, j)
        |GROUP BY doc_id""".stripMargin)
    val viaNative = docs.select(col("doc_id"),
      expr("simhash32(array_distinct(split(trim(text), ' +')))").as("simhash"))
    assert(viaNative.exceptAll(viaSql).count() == 0)
    assert(viaSql.exceptAll(viaNative).count() == 0)
  }

  test("tokenHash matches the hex-substr md5 SQL derivation") {
    import spark.implicits._
    val got = Seq("spark", "graft", "x").toDF("t")
      .select(expr("CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)")).as[Long]
      .collect().toSeq
    val native = Seq("spark", "graft", "x")
      .map(s => SimHashImpl.tokenHash(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(got == native)
  }

  test("empty token array hashes to NULL, not the all-ones code") {
    // Zero tokens = every bit vote ties at 0, and the >= 0 rule would set
    // all 32/60 bits — clustering every token-less doc into ONE LSH bucket
    // and diverging from the exploded formulation, which emits no row for
    // a doc with no tokens. Null is the scalar analog of that absent row.
    import spark.implicits._
    val r = Seq(("a b", 1), ("", 2)).toDF("text", "id")
      .select(expr("simhash32(array_remove(split(text, ' '), ''))").as("h32"),
        expr("simhash60(array_remove(split(text, ' '), ''))").as("h60"))
      .orderBy("h32").collect()
    assert(r.exists(row => row.isNullAt(0) && row.isNullAt(1)),
      "token-less doc must hash to null")
    assert(r.exists(row => !row.isNullAt(0) && !row.isNullAt(1)))
  }

  test("all-NULL token array hashes to NULL too — the same degenerate case") {
    // Null elements are skipped by the vote loop, so array(NULL) would tie
    // every bit at 0 exactly like the empty array and take the all-ones
    // code — one quadratic LSH bucket for every doc whose extraction chain
    // nulled its tokens rather than removing them.
    import spark.implicits._
    val r = Seq(1).toDF("id")
      .select(expr("simhash32(array(CAST(NULL AS STRING)))").as("h32"),
        expr("simhash60(array(CAST(NULL AS STRING), CAST(NULL AS STRING)))").as("h60"),
        // a null element ALONGSIDE real tokens is simply ignored
        expr("simhash32(array('a', CAST(NULL AS STRING), 'b'))").as("mixed"),
        expr("simhash32(array('a', 'b'))").as("plain"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1), "zero usable tokens must be NULL")
    assert(r.getLong(2) == r.getLong(3), "null elements must be vote-neutral")
  }

  test("wrong input types and wrong arity fail at analysis, not mid-execution") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L), "s")).toDF("nums", "s")
    // type checks: array<bigint> into simhash32, bigint into md5_prefix48
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("simhash32(nums)")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("md5_prefix48(CAST(1 AS BIGINT))")).collect()
    }
    // arity: surplus arguments were previously dropped SILENTLY
    // (cosine_sim(a, b, c) computed from (a, b) — a wrong answer, no error)
    val e = intercept[Exception] {
      df.select(expr("simhash32(nums, s)")).collect()
    }
    assert(e.getMessage.contains("argument"), e.getMessage)
  }
}
