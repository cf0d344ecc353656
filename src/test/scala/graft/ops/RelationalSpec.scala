package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavior of the multi-pass fuzzy-join candidate generator
  * (Relational.fuzzyMultiblockPairs) under its recall contract:
  *  - a name typo is recovered by pass 1 (same brand, size);
  *  - a BRAND typo is recovered by pass 2 (same name-prefix-12, size) —
  *    the whole point of the second pass;
  *  - a hot (prefix, size) block past MaxBucket is dropped entirely, so a
  *    degenerate key cannot go quadratic (the oracle mirrors the drop with
  *    its HAVING <= MaxBucket CTE by construction). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def parts(rows: Seq[(Long, String, String, Int)]) = {
    val s = spark; import s.implicits._
    rows.toDF("p_partkey", "p_name", "p_brand", "p_size")
  }

  test("pass 2 recovers a brand-typo pair that pass 1 must miss") {
    // 1-2: same (brand, size), names one edit apart -> pass 1.
    // 3-4: same name + size but different brand -> ONLY pass 2 can pair them.
    // 5: shares nothing -> appears in no pair.
    val df = parts(Seq(
      (1L, "misty rose gear", "Brand#1", 7),
      (2L, "misty rosy gear", "Brand#1", 7),
      (3L, "antique azure bolt", "Brand#2", 9),
      (4L, "antique azure bolt", "Brand#9", 9),
      (5L, "unrelated widget", "Brand#5", 1)))
    val got = Relational.fuzzyMultiblockPairs(df)
      .select("part_a", "part_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("a hot (prefix, size) block past MaxBucket is dropped, survivors still pair") {
    val cap = graft.dedup.Dedup.MaxBucket
    // Hot block: cap+100 rows, identical name prefix and size, all-distinct
    // brands (so pass 1's (brand, size) blocks are singletons and generate
    // nothing). Uncapped, pass 2 would expand ~(cap+100)^2/2 = 600k+ pairs.
    val hot = (0 until cap + 100).map(i =>
      (1000L + i, "hothothothot block name", s"Brand#H$i", 3))
    val good = Seq(
      (1L, "antique azure bolt", "Brand#2", 9),
      (2L, "antique azure bolt", "Brand#9", 9))
    val got = Relational.fuzzyMultiblockPairs(parts(hot ++ good))
      .select("part_a", "part_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)),
      s"hot block leaked past the cap: ${got.size} pairs")
  }
}
