package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def run(name: String) =
    Similarity.defs.find(_.name == name).get.fn(spark, sf)

  test("brute-force top-k: 5 neighbors per query, self excluded, cos in [-1,1]") {
    val t = run("sim_topk_brute")
    val perQ = t.groupBy("q_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 5))
    assert(t.filter(col("cand_id") === col("q_id")).count() == 0)
    assert(t.filter(col("cos6") > 1.000001 || col("cos6") < -1.000001).count() == 0)
  }

  test("k-means training: K centroids of Dim components, deterministic") {
    // uncached path both times: determinism of the training itself, not memo
    val c1 = Similarity.trainKMeansUncached(spark, sf, Similarity.K, Similarity.Iters)
    val c2 = Similarity.trainKMeansUncached(spark, sf, Similarity.K, Similarity.Iters)
    assert(c1 == c2, "training must be bit-deterministic (oracle replays it)")
    assert(c1.size == Similarity.K)
    assert(c1.forall(_._2.size == Similarity.Dim))
    // training moved the centroids off their init vectors
    val init = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < Similarity.K)
      .orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    assert(c1.map(_._2) != init.toSeq)
  }

  test("IVF assignment: every vector lands in exactly one trained cell") {
    val a = run("sim_ivf_assign")
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(a.count() == n)
    assert(a.select("cell").distinct().count() <= Similarity.K)
  }

  test("ANN(IVF) recall >= 0.9 vs brute force at top-3") {
    val brute = run("sim_topk_brute").filter(col("rank") <= 3)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = run("sim_ann_ivf")
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.9, s"ANN recall $recall below 0.9 (${brute.size} truth pairs)")
  }

  test("ANN rank-1 cosine never exceeds brute-force rank-1 cosine") {
    val ann = run("sim_ann_ivf")
    assert(ann.count() > 0)
    val b1 = run("sim_topk_brute").filter(col("rank") === 1)
      .select(col("q_id"), col("cos6").as("bcos"))
    val a1 = ann.filter(col("rank") === 1).select(col("q_id"), col("cos6").as("acos"))
    val bad = a1.join(b1, "q_id").filter(col("acos") > col("bcos")).count()
    assert(bad == 0)
  }
}
