package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Dev utility: stage-by-stage timing of the dedup pipelines. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("split(trim(text), ' +')").as("t"))
      // docs with <3 tokens have no 3-gram shingles; without this filter
      // sequence(1, size(t) - 2) would descend and element_at hit index 0
      .filter(expr("size(t) >= 3"))
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(t) - 2), i -> " +
          "concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))")
          .as("sh"))
    t("shingled.count")(println(sh.count()))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("sng"))
      .select(col("doc_id"), xxhash64(col("sng")).as("sk"))
    t("exploded.count")(println(ex.count()))
    val l = ex.select(col("sk"), col("doc_id").as("doc_a"))
    val r = ex.select(col("sk").as("sk2"), col("doc_id").as("doc_b"))
    val inter = l.join(r, l("sk") === r("sk2") && l("doc_a") < r("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    t("inter.count")(println(inter.count()))
    t("inter.count warm")(println(inter.count()))
    spark.stop()
  }
}
