package graft

import java.nio.file.{Files, Paths}

/** INI-style config loader — the `dwh.cfg` + `configparser` analog
  * (reference sql_queries.py:5-11 reads host/dbname/user/password/port and
  * S3 paths from dwh.cfg; create_cluster.py:16-27 reads the cluster shape).
  *
  * The reference is config-driven end to end, so the Spark port is too:
  * `[GRAFT] SF_DIR / OUT_DIR / CPUS` drive [[graft.etl.RunEtl]] (argv
  * overrides config, mirroring how the reference lets notebooks override
  * `configparser` values), and the reference's own sections ([S3] LOG_DATA /
  * LOG_JSONPATH / SONG_DATA, [DWH] DWH_NUM_NODES, …) parse as-is, quoted
  * values included — a user can point their existing dwh.cfg at this engine
  * unchanged.
  *
  * Parser semantics match Python `configparser` where the reference relies
  * on them: `[SECTION]` headers (trailing whitespace tolerated — the
  * reference's `[DWH] ` line has one), `KEY=value` pairs with whitespace
  * trimmed, keys matched CASE-INSENSITIVELY on lookup with last-wins
  * collapse across case variants (configparser's default `optionxform`
  * observable behavior — though the stored key keeps its ORIGINAL case, a
  * deliberate deviation so the `[HADOOP]` passthrough can hand
  * case-sensitive Hadoop keys like `fs.AbstractFileSystem.s3a.impl`
  * through verbatim; configparser would lowercase them, which Hadoop then
  * silently ignores), a loud error on a key before any section header
  * (configparser's MissingSectionHeaderError), empty values allowed
  * (`HOST=`), `#`/`;` comment lines, and the single quotes the reference
  * writes around S3 URIs are stripped (psycopg2 SQL interpolation needed
  * them; a path loader does not).
  */
object GraftConfig {

  final case class Config(sections: Map[String, Map[String, String]]) {
    /** Lookup: section name matched exactly first (configparser sections ARE
      * case-sensitive), falling back to the lexicographically-first
      * case-insensitive match — a deterministic convenience the reference's
      * all-caps sections never need. Keys are matched case-insensitively
      * (configparser optionxform; exact match first, then the
      * lexicographically-first case-insensitive hit — the stored key keeps
      * its written case for the [HADOOP] verbatim passthrough). Empty
      * values read as absent — `HOST=` in the shipped dwh.cfg means "not
      * configured", not "empty string host". */
    def get(section: String, key: String): Option[String] =
      sections.get(section)
        .orElse(sections.keys.filter(_.equalsIgnoreCase(section))
          .toSeq.sorted.headOption.map(sections))
        .flatMap(m => m.get(key).orElse(
          m.keys.filter(_.equalsIgnoreCase(key)).toSeq.sorted.headOption.map(m)))
        .filter(_.nonEmpty)

    def getOr(section: String, key: String, default: String): String =
      get(section, key).getOrElse(default)
  }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '\'' && v.last == '\'') || (v.head == '"' && v.last == '"')))
      v.substring(1, v.length - 1)
    else v

  def parse(text: String): Config = {
    var section: Option[String] = None
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[")) {
          // ANY '['-prefixed line that is not a well-formed header must be
          // LOUD — '[AWS' (no bracket) or '[AWS]KEY=k' (header glued to a
          // key) treated as junk/key lines would silently mis-scope every
          // following key into the previous section: AWS credentials
          // landing in [S3], read as absent, and the run failing with an
          // anonymous 403 at read time (the exact silent fallback the
          // Sessions partial-credentials guard exists to prevent).
          if (!line.endsWith("]"))
            throw new IllegalArgumentException(
              s"line ${ln + 1}: malformed section header: '$line'")
          val s = line.substring(1, line.length - 1).trim
          section = Some(s)
          if (!out.contains(s)) out(s) = Map.empty
        } else line.indexOf('=') match {
          case -1 => // configparser would raise; a config loader skips junk lines
          case i =>
            val s = section.getOrElse(throw new IllegalArgumentException(
              s"line ${ln + 1}: key before any [section] header: '$line'"))
            val k = line.substring(0, i).trim
            val v = unquote(line.substring(i + 1).trim)
            // last-wins across case variants (what configparser's lowercase
            // collapse does observably), but the surviving entry keeps ITS
            // OWN case — the [HADOOP] passthrough needs it verbatim
            out(s) = out(s).filterNot(_._1.equalsIgnoreCase(k)) + (k -> v)
        }
      }
    }
    Config(out.toMap)
  }

  def load(path: String): Config = parse(Files.readString(Paths.get(path)))
}
