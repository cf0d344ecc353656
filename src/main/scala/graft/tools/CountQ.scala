package graft.tools
/** Dev scratch: row counts of named registered queries on an arbitrary
  * fixture dir — `CountQ <dir> <query> [query...]`. Used for the
  * kept-vs-verified pair-mass measurements (SCALING.md): DiagBuckets
  * reports what the banding WILL keep analytically; this reports what the
  * Hamming/cosine verify actually emits. */
object CountQ {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val s = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (name <- args.tail.toSeq) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, d).count()
      println(f"[countq] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    s.stop()
  }
}
