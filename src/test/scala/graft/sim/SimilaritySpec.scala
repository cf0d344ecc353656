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

  test("IVF assignment: every vector lands in exactly one anchor cell") {
    val a = run("sim_ivf_assign")
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(a.count() == n)
    assert(a.select("anchor_id").distinct().count() <= 3)
    // anchors are their own nearest anchor
    assert(a.filter(col("vec_id") === col("anchor_id")).count() == 3)
  }

  test("ANN(IVF, nprobe=1) results are a subset of brute-force candidates by score") {
    val ann = run("sim_ann_ivf")
    assert(ann.count() > 0)
    // rank-1 ANN cosine can never exceed rank-1 brute-force cosine
    val b1 = run("sim_topk_brute").filter(col("rank") === 1)
      .select(col("q_id"), col("cos6").as("bcos"))
    val a1 = ann.filter(col("rank") === 1).select(col("q_id"), col("cos6").as("acos"))
    val bad = a1.join(b1, "q_id").filter(col("acos") > col("bcos")).count()
    assert(bad == 0)
  }
}
