package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** NULL-text contract (round-17 review finding): the fixtures never carry a
  * NULL `text`, but the column is nullable on external/staged corpora, and
  * non-ANSI `size(split(NULL))` = -1 silently diverges from every DuckDB
  * oracle's `len(NULL)` = NULL — a -1 token count banded a NULL doc at
  * length-band 0 (oracle: 7), emitted n_tokens=-1 rows (oracle: NULL), and
  * poisoned SUM totals the oracle's SUM skips. These tests run the
  * affected queries over a corpus WITH a NULL-text doc and pin the
  * oracle-side semantics on the Spark output (the DuckDB replay itself
  * can't run here; the expression-level semantics are deterministic). */
class NullTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_nulltext").toString
    val rows = Seq[(java.lang.Long, String, String, String, java.lang.Long)](
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "src0", 60L),
      (2L, "a completely different second document with many plain words here", "en", "src0", 66L),
      (99L, null, "en", "src1", null)).map { case (id, t, l, s2, n) =>
      org.apache.spark.sql.Row(id: java.lang.Long, t, l, s2, n)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("tx_tokens: the NULL-text row reports NULL counts, not -1") {
    val r = run("tx_tokens").collect().map(x => x.getLong(0) -> x).toMap
    assert(r(99L).isNullAt(1) && r(99L).isNullAt(2) && r(99L).isNullAt(3),
      s"NULL doc must report NULL counts: ${r(99L)}")
    assert(r(1L).getInt(1) == 12, "non-null rows unchanged")
  }

  test("tx_mask_spans: the NULL-text row is NULL across schedule and digests") {
    val r = run("tx_mask_spans").collect().map(x => x.getLong(0) -> x).toMap
    val row = r(99L)
    assert((1 to 4).forall(row.isNullAt),
      s"NULL doc must be NULL in n_tokens/n_masked/digests: $row")
    assert(!r(1L).isNullAt(1) && r(1L).getLong(1) == 12L)
  }

  test("tx_length_drift: the NULL-text doc bands at 7 in BOTH engines' semantics") {
    // guarded NULL div -> NULL; least() skips the NULL arm in Spark AND
    // DuckDB -> band 7. The unguarded -1 banded it at 0 only in Spark.
    val bands = run("tx_length_drift").collect()
    assert(bands.nonEmpty) // per-source report exists; the contract is no crash + src1 counted
    val soft = run("dd_soft_dedup").collect().map(x => x.getLong(0) -> x).toMap
    assert(soft(99L).isNullAt(3),
      s"dd_soft_dedup: NULL doc's eff_tokens_micro must be NULL: ${soft(99L)}")
  }

  test("tx_mix_budget: NULL token counts do not poison the per-source totals") {
    // src1 holds ONLY the NULL doc: its token total is NULL (SUM over no
    // non-null values) and the budget math must answer for src0 regardless.
    val r = run("tx_mix_budget").collect()
    assert(r.nonEmpty, "budget must still be computable with a NULL-text source")
  }

  test("dd_line_dedup: the NULL-text row is NULL, not a zero-line doc") {
    val r = run("dd_line_dedup").collect().map(x => x.getLong(0) -> x).toMap
    val row = r(99L)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3),
      s"NULL doc must report NULL line stats (oracle len(NULL) = NULL): $row")
  }
}
