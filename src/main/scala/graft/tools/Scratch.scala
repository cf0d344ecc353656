package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: stage decomposition of dd_simhash_pairs at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(s)
    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[scratch] $label round $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val codes = s.read.parquet(
      java.io.File.listRoots().head.toPath.resolve("tmp").toFile.listFiles()
        .filter(_.getName.startsWith("graft_simhash60_")).head.getAbsolutePath)
    println(s"[scratch] codes rows = ${codes.count()}")
    time("codes scan")(codes.write.format("noop").mode("overwrite").save())
    val bandKeys = (0 until 4).map(b =>
      struct(lit(b).as("bi"),
        expr(s"shiftright(simhash, ${b * 15}) & 32767").as("bv")))
    val buckets = codes
      .select(col("doc_id"), col("simhash"), explode(array(bandKeys: _*)).as("bk"))
      .groupBy(col("bk"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ds"))
    time("buckets")(buckets.write.format("noop").mode("overwrite").save())
    println("[scratch] bucket size histogram:")
    buckets.select(size(col("ds")).as("n")).groupBy(expr("CASE WHEN n>=1000 THEN 1000 WHEN n>=100 THEN 100 WHEN n>=10 THEN 10 ELSE 1 END").as("bin"))
      .agg(count(lit(1)), sum(expr("CAST(n AS BIGINT)*n"))).orderBy("bin").show()
    val pairs = graft.dedup.Dedup.cappedElementPairs(buckets)
    time("expansion")(pairs.write.format("noop").mode("overwrite").save())
    val filtered = pairs
      .select(col("p.x.doc_id").as("doc_a"), col("p.y.doc_id").as("doc_b"),
        expr("CAST(bit_count(p.x.simhash ^ p.y.simhash) AS INTEGER)").as("hamming"))
      .filter(col("hamming") <= 10)
    time("expansion+filter")(filtered.write.format("noop").mode("overwrite").save())
    time("full")(filtered.distinct().orderBy("doc_a", "doc_b")
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
