package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwires for the plan-shape claims the operator Scaladocs make: if a
  * refactor re-introduces a sort-merge join where a broadcast was promised,
  * or adds a shuffle to a scan-parallel projection, these fail BEFORE the
  * bench round notices a regression. String checks run on the physical plan
  * of the sf0.001 fixture (plan shape, not timing — cheap). */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?<!Reused)Exchange ".r.findAllIn(p).length

  test("tx_curriculum_order: scan-parallel — the only exchange is the output sort") {
    val p = plan("tx_curriculum_order")
    assert(exchanges(p) == 1, s"expected only the ORDER BY range exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), "no join/window allowed")
  }

  test("dd_soft_dedup: one fingerprint shuffle feeds the window, no join-back") {
    val p = plan("dd_soft_dedup")
    assert(!p.contains("Join"), s"group size must come from a window, not a join-back:\n$p")
    assert(exchanges(p) == 2, s"expected fp hash + output range exchanges only:\n$p")
  }

  test("an_kanon_audit / an_audience_overlap / mm_modality_mix: dims broadcast, no sort-merge join") {
    Seq("an_kanon_audit", "an_audience_overlap", "mm_modality_mix",
        "an_watermark_lag", "an_backfill_plan", "tx_dp_histogram").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: sort-merge join crept in:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product crept in:\n$p")
    }
  }

  test("sim_mips_ivf: probes broadcast against the assignment artifact") {
    val p = plan("sim_mips_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"probe join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge join crept in:\n$p")
  }
}
