package graft.tools
/** Dev scratch: time named queries (args) at sf0.1, 3 rounds each. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    for (name <- args.toSeq; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, d).collect()
      println(f"$name round $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
