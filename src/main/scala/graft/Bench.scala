package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Methodology:
  *  - The action is a noop-format write, which executes the FULL physical
  *    plan (final sorts and projects included) without collecting or
  *    persisting anything — `.count()` would let Catalyst drop plan tails
  *    and undercount.
  *  - Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
  *    best run is reported, so JVM/codegen/file-index first-touch noise
  *    doesn't masquerade as query cost (observed ~8x on identical shapes).
  *
  * Cost floor for narrow single-pass queries at local fixture scale
  * (profiled round 3, sf0.1, idle machine): ~0.19 s scan + noop job
  * constant, +~0.15-0.2 s when the query ends in a global ORDER BY (range
  * exchange = an extra sampling job — fixed latency, not per-row cost), and
  * only then per-row compute (simhash32 over 5,000 docs: ~0.03 s). Round 1's
  * 0.19-0.22 s readings for dd_simhash/tx_tokens were count()-harness
  * artifacts (compute AND sort pruned); ~0.33-0.44 s is the honest
  * plan-complete number, and the 0.84-0.96 s readings in BENCH_r02 do not
  * reproduce idle (concurrent sbt/compile inflates timings badly — rerun
  * before believing a regression).
  */
object Bench {
  private def runOnce(spark: SparkSession, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String): Double = {
    val t0 = System.nanoTime()
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] query failed: ${e.getClass.getName}: ${e.getMessage}")
        -1.0
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Dev loop: bench only the queries matching a name regex (driver sets none).
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val spark = Sessions.local(cpus)
    // Warm the JVM/codegen/file-index paths once so the first measured query
    // doesn't absorb session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      val times = (1 to runs).map(_ => runOnce(spark, fn, sfDir)).filter(_ >= 0)
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.values.filter(_ >= 0).sum
    // A regressed-to-throwing query must not read as an improved total:
    // surface an explicit failure count and a nonzero exit code.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.size},"sf":"$sfDir"}""")
    failed.foreach(k => System.err.println(s"[bench] FAILED: $k"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
