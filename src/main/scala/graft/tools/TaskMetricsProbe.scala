package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-granularity skew measurement: the scale question is never "how many
  * rows total" but "how many rows does the WORST task see" — that task is
  * the stage's wall clock at 1000 executors. */
object TaskMetricsProbe {

  /** Run `action` and return the max shuffle-read record count of any single
    * task it scheduled (0 if nothing shuffled). */
  def maxTaskShuffleRows(spark: SparkSession)(action: => Unit): Long = {
    val max = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          max.getAndAccumulate(m.shuffleReadMetrics.recordsRead,
            (a: Long, b: Long) => math.max(a, b))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // the listener bus is async — poll until the running max is stable
      var last = -1L
      var stableMs = 0
      while (stableMs < 500) {
        val v = max.get
        if (v == last) { Thread.sleep(100); stableMs += 100 }
        else { last = v; stableMs = 0 }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    max.get
  }
}
