package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine contract for the corpus-adaptive LSH band-width ladders
  * (VERDICT r16 #5): both ladders are stated once in Scala
  * (Dedup.SimShape / Similarity.RpShape) and GENERATED into the oracle SQL
  * (`simShapeSql` / `rpShapeSql`), so they cannot drift structurally — but
  * an off-by-one between the Scala `collectFirst { n <= t }` and the SQL
  * `CASE WHEN COUNT(*) <= t` would split the engines at EXACTLY one corpus
  * size and no fixture would ever catch it. These tests evaluate the
  * generated CASE text (the identical string the DuckDB oracle embeds —
  * the fragment is dialect-shared) in Spark SQL over a relation of exactly
  * N rows, at N = each threshold and threshold+1, and assert the selected
  * rung equals the Scala selector's. */
class LadderBoundarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Evaluate a generated shape-SQL string against a relation of exactly
    * `n` rows registered under `view`. `spark.range(n)` is metadata-only
    * until the COUNT runs, so even the 4,194,305-row boundary costs
    * milliseconds. */
  private def sqlBits(shapeSql: String, view: String, n: Long): Int = {
    spark.range(n).createOrReplaceTempView(view)
    try spark.sql(shapeSql).collect()(0).getInt(0)
    finally spark.catalog.dropTempView(view)
  }

  test("simhash ladder: generated SQL picks the same rung as simBitsFor at every boundary") {
    // thresholds from Dedup.SimShape (16,384 → 15|20; 2,097,152 → 20|30),
    // plus the degenerate 1-row corpus and a mid-rung point
    for (n <- Seq(1L, 5000L, 16384L, 16385L, 2097152L, 2097153L)) {
      val view = "ladder_docs_probe"
      val got = sqlBits(graft.dedup.Dedup.simShapeSqlFrom(view), view, n)
      assert(got == graft.dedup.Dedup.simBitsFor(n),
        s"simhash rung split at n=$n: SQL=$got Scala=${graft.dedup.Dedup.simBitsFor(n)}")
    }
  }

  test("rp ladder: generated SQL picks the same rung as rpBitsFor at every boundary") {
    // thresholds from Similarity.RpShape (16,384 → 8|16; 4,194,304 → 16|32)
    for (n <- Seq(1L, 2000L, 16384L, 16385L, 4194304L, 4194305L)) {
      val view = "ladder_vecs_probe"
      val got = sqlBits(graft.sim.Similarity.rpShapeSql(view), view, n)
      assert(got == graft.sim.Similarity.rpBitsFor(n),
        s"rp rung split at n=$n: SQL=$got Scala=${graft.sim.Similarity.rpBitsFor(n)}")
    }
  }

  test("phash rides the simhash ladder verbatim: the oracle fragment is the same string") {
    // mm_phash_dedup's oracle embeds Dedup.simShapeSql directly — the pHash
    // family has no ladder of its own to drift. Pin that it stays a single
    // shared definition (a copied-and-edited fragment would break this).
    assert(graft.dedup.Dedup.simShapeSql == graft.dedup.Dedup.simShapeSqlFrom("documents"))
  }
}
