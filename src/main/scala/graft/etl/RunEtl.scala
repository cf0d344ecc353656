package graft.etl

import graft.Sessions

/** CLI entry point — the `python etl.py` analog (reference etl.py:32-43):
  * drops/recreates the catalog tables, runs the five-table star ELT end to
  * end, and prints per-table row counts.
  *
  * Usage: `sbt "runMain graft.etl.RunEtl <sfDir> <outDir>"`
  * (cpus via SPARK_GRAFT_CPUS, default 4).
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunEtl <sfDir> <outDir>")
    val (sfDir, outDir) = (args(0), args(1))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    try {
      // create_tables.py analog: reset the catalog before loading
      StarCatalog.reset(spark)
      val results = StarPipeline.run(spark, sfDir, outDir)
      StarCatalog.register(spark, outDir)
      results.foreach(r => println(s"[etl] ${r.name}: ${r.rows} rows -> ${r.path}"))
    } finally spark.stop()
  }
}
