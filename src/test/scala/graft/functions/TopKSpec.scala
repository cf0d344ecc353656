package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TopK.{Buf, Scored}

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("aggregator top-k equals window row_number top-k on the fixture") {
    val byAgg = graft.sim.Similarity.defs.find(_.name == "sim_topk_agg").get
      .fn(spark, sf).collect().toSeq
    val byWindow = graft.sim.Similarity.defs.find(_.name == "sim_topk_brute").get
      .fn(spark, sf).collect().toSeq
    assert(byAgg == byWindow)
    assert(byAgg.nonEmpty)
  }

  test("buffer keeps at most k entries, ordered by (score desc, id asc)") {
    // The equal-score rows here are the an_fixed_sample collision contract:
    // an h48 collision inside a stratum (score = -h48) resolves by id ASC,
    // matching the oracle's ORDER BY h48 ASC, doc_id ASC (r13 advisory).
    val agg = TopK.topK(3)
    val b = Seq(Scored(1, 0.5), Scored(2, 0.9), Scored(3, 0.5), Scored(4, 0.1),
      Scored(5, 0.9)).foldLeft(agg.zero)(agg.reduce)
    assert(b.entries == Seq(Scored(2, 0.9), Scored(5, 0.9), Scored(1, 0.5)))
    // merge respects the same bound and order
    val m = agg.merge(b, Buf(Vector(Scored(6, 0.7), Scored(7, 0.05))))
    assert(m.entries == Seq(Scored(2, 0.9), Scored(5, 0.9), Scored(6, 0.7)))
  }

  test("NaN scores never enter the buffer (cosine_sim of a zero-norm vector)") {
    // The comparator is not a total order under NaN: one NaN-scored entry
    // reaching entries.last made the full-buffer guard reject EVERY later
    // candidate (lt(in, NaN) is always false) — an arrival-order-dependent
    // wrong top-k. NaN candidates are dropped at reduce.
    val agg = TopK.topK(2)
    val b = Seq(Scored(1, 0.1), Scored(2, Double.NaN), Scored(3, 0.2),
      Scored(4, 0.9), Scored(5, Double.NaN)).foldLeft(agg.zero)(agg.reduce)
    assert(b.entries == Seq(Scored(4, 0.9), Scored(3, 0.2)),
      "NaN must neither rank nor block later candidates")
    intercept[IllegalArgumentException] { TopK.topK(0) }
  }
}
