package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (when the operator is
  * SQL-expressible) a DuckDB-equivalent oracle over the same parquet tables.
  * Column names and ORDER BY must agree between the two (driver contract).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Aggregate a module list into the SparkEntry maps. A duplicate name
    * across modules must be LOUD: toMap's last-wins would silently drop
    * the earlier query from BOTH the bench and the correctness matrix —
    * the silently-shrinking-matrix failure mode the r10 Verify hardening
    * (errors.json) exists to prevent. */
  def queryMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] = {
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names across modules: ${dups.mkString(", ")}")
    defs.map(d => d.name -> d.fn).toMap
  }

  def oracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

/** Locale-fixed numeric formatting for MACHINE-PARSED output lines (the
  * GRAFT_BENCH / GRAFT_PIPELINE / bpe-envelope JSON records): Scala's f""
  * interpolator formats through the JVM default locale, so a comma-decimal
  * host (LANG=de_DE and friends) would emit `"value":76,206` — invalid
  * JSON that silently drops the record from tools/scaling.py's parse.
  * Human-facing stderr lines keep the plain interpolator. */
object Jnum {
  def f(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, "%." + decimals + "f", Double.box(v))
}
