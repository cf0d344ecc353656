package graft.tools

import org.apache.spark.sql.DataFrame

import graft.{Sessions, SparkEntry}

/** Dev utility: time a named query and print its formatted physical plan.
  * Usage: runMain graft.tools.PlanProbe <queryName> <sfDir> [explain]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    var t0 = System.nanoTime()
    val n = df.count()
    println(f"[probe] $name first run: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    t0 = System.nanoTime()
    df.count()
    println(f"[probe] $name warm run:  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    if (args.contains("final")) {
      // Post-execution adaptive plan — shows AQE's runtime exchange reuse,
      // which the pre-execution explain("formatted") cannot. Must drive THIS
      // queryExecution (count() would plan a separate one).
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
