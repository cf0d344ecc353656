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
  * trimmed, empty values allowed (`HOST=`), `#`/`;` comment lines, and the
  * single quotes the reference writes around S3 URIs are stripped (psycopg2
  * SQL interpolation needed them; a path loader does not).
  */
object GraftConfig {

  final case class Config(sections: Map[String, Map[String, String]]) {
    /** Lookup, case-insensitive in the section name (configparser keeps
      * section case but the reference always matches exactly; keys are
      * stored as written). Empty values read as absent — `HOST=` in the
      * shipped dwh.cfg means "not configured", not "empty string host". */
    def get(section: String, key: String): Option[String] =
      sections.collectFirst {
        case (s, kv) if s.equalsIgnoreCase(section) => kv
      }.flatMap(_.get(key)).filter(_.nonEmpty)

    def getOr(section: String, key: String, default: String): String =
      get(section, key).getOrElse(default)
  }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '\'' && v.last == '\'') || (v.head == '"' && v.last == '"')))
      v.substring(1, v.length - 1)
    else v

  def parse(text: String): Config = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          if (!out.contains(section)) out(section) = Map.empty
        } else line.indexOf('=') match {
          case -1 => // configparser would raise; a config loader skips junk lines
          case i =>
            val k = line.substring(0, i).trim
            val v = unquote(line.substring(i + 1).trim)
            out(section) = out.getOrElse(section, Map.empty) + (k -> v)
        }
      }
    }
    Config(out.toMap)
  }

  def load(path: String): Config = parse(Files.readString(Paths.get(path)))
}
