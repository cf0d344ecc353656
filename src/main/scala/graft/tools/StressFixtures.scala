package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic adversarial inputs shared by SkewSpec and the PLANS.md skew
  * appendix: a hot-key document corpus for the Dedup.MaxBucket cap, and a
  * hot-key fact/dim pair for the salted join. */
object StressFixtures {

  /** First doc_id of the planted near-dup trio in [[stageHotCorpus]]. */
  val PlantBase = 10000000L

  /** Stage `documents.parquet` under `dir`: `nHot` IDENTICAL documents
    * (every shingle/band bucket they form exceeds any sane cap — uncapped,
    * candidate generation would expand nHot·(nHot−1)/2 pairs from a single
    * bucket) plus three planted near-dup docs with pairwise shingle-Jaccard
    * ≥ 0.5 that must SURVIVE the cap. */
  def stageHotCorpus(spark: SparkSession, dir: String, nHot: Int): Unit = {
    val hotText = "the quick brown fox jumps over the lazy dog again"
    val base = (1 to 18).map(i => s"tok$i")
    val plants = Seq(
      base ++ Seq("tok19", "tok20"),
      base ++ Seq("tok19", "alt20"),
      base ++ Seq("alt19", "alt20"))
    val hot = spark.range(1, nHot + 1L)
      .select(col("id").as("doc_id"), lit(hotText).as("text"))
    val planted = spark.createDataFrame(
      plants.zipWithIndex.map { case (ts, i) => (PlantBase + i, ts.mkString(" ")) })
      .toDF("doc_id", "text")
    hot.unionAll(planted)
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("stress"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** 200k-row fact, 90% of rows on one hot key; `id` is the
    * high-cardinality salt source. */
  def skewedFact(spark: SparkSession): DataFrame =
    spark.range(200000L).select(col("id"),
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(pmod(col("id"), lit(100L))).as("k"))

  /** 100-key dimension — too hot-joined to leave unsalted, assumed too big
    * to broadcast (the spec disables broadcast to model that). */
  def dim(spark: SparkSession): DataFrame =
    spark.range(100L).select(col("id").as("k"), concat(lit("d"), col("id")).as("payload"))
}
