package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CosineSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("cosine_sim is bit-identical to the left-fold HOF formula on fixture vectors") {
    GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val l = e.select(col("vec_id").as("a"), col("v").as("va"))
    val r = e.select(col("vec_id").as("b"), col("v").as("vb"))
    val pairs = l.join(r, col("a") < col("b")).limit(50000)
      .withColumn("native", expr("cosine_sim(va, vb)"))
      .withColumn("hof",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, x) -> a + x) / " +
          "sqrt(aggregate(transform(va, x -> x * x), 0D, (a, x) -> a + x) * " +
          "aggregate(transform(vb, x -> x * x), 0D, (a, x) -> a + x))"))
    // bit-identical, not approximately equal: same fold order by construction
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("cosine_sim basics: self-similarity 1, orthogonal 0, opposite -1") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0), Array(0.0, 5.0)),
      (Array(2.0, -1.0), Array(-2.0, 1.0))).toDF("va", "vb")
      .withColumn("c", expr("round(cosine_sim(va, vb), 9)"))
    assert(df.select("c").as[Double].collect().toSeq == Seq(1.0, 0.0, -1.0))
  }
}
