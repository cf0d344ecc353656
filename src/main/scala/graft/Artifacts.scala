package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once persisted artifacts (signature tables, pair graphs, fingerprint
  * indexes) and memoized driver-state models (k-means centroids, PQ
  * codebooks), keyed by dataset CONTENT — not by the dataset path.
  *
  * Why content keys: a path-keyed cache (`dir.hashCode`, rounds 5–9) silently
  * serves a stale artifact when the dataset under the path is regenerated
  * within a JVM lifetime or across JVMs sharing one tmpdir — a correctness
  * hazard for a real engine even though harness fixtures are immutable. The
  * key here digests the table's file names, sizes, and mtimes (the
  * `stagedEventsJson` staging-cache discipline from round 5, see
  * sources/Ingest.scala), so a mutated corpus provably forces a rebuild and
  * two distinct corpora can never collide onto one artifact file.
  *
  * Why atomic publish: concurrent JVMs (bench + tests) may race to build the
  * same artifact. Each builder writes to a private temp dir and publishes
  * with a single atomic directory rename; the loser of the race discards its
  * temp copy and reads the winner's (identical — the build is a deterministic
  * function of the content key). A reader never observes a half-written
  * artifact because the final path only ever appears via rename.
  *
  * At 100 TB the same discipline holds with the tmpdir swapped for a durable
  * object-store prefix and the mtime digest swapped for the catalog's
  * snapshot/version id: an index is an artifact of a corpus SNAPSHOT.
  */
object Artifacts {

  /** Content signature of one fixture table under `d`: a 12-hex md5 of the
    * absolute path plus every data file's (name, size, mtime). Cheap — a
    * directory listing, no data read — so callers can recompute it per query
    * and still catch in-place dataset rewrites. */
  def tableSig(d: String, table: String): String = {
    val src = new java.io.File(s"$d/$table.parquet")
    val files =
      if (src.isDirectory)
        Option(src.listFiles()).fold(Seq.empty[java.io.File])(_.toSeq.sortBy(_.getName))
      else Seq(src)
    val sig = src.getAbsolutePath +
      files.map(f => s"|${f.getName}:${f.length}:${f.lastModified}").mkString
    md5Hex(sig).take(12)
  }

  /** Memo key for driver-state models derived from table `table` of dataset
    * `d`: the content signature, so the model cache invalidates exactly when
    * the artifact files would. */
  def contentKey(d: String, table: String): String = s"$d@${tableSig(d, table)}"

  /** Artifact store root: the `graft.artifact.dir` system property when set
    * (in-JVM override — lets a destructive spec like ArtifactsSpec's gc test
    * point the store at a private root instead of sweeping the shared tmpdir
    * out from under a concurrently-running Verify/Bench JVM), else
    * `GRAFT_ARTIFACT_DIR` (on a cluster, a durable shared path — every
    * executor and every job sees one copy per corpus snapshot), else the JVM
    * tmpdir (the sandbox default). */
  def baseDir: String =
    sys.props.get("graft.artifact.dir")
      .orElse(sys.env.get("GRAFT_ARTIFACT_DIR"))
      .getOrElse(sys.props("java.io.tmpdir"))

  /** Path of the build-once parquet artifact `name` derived from
    * `d/table.parquet`, building it if this content signature has no
    * published copy yet. `build` runs at most once per (name, content) per
    * race winner; the result is `_SUCCESS`-guarded and atomically renamed
    * into place.
    *
    * `root` defaults to [[baseDir]]; a destructive spec passes its own
    * private root EXPLICITLY instead of mutating the process-global
    * `graft.artifact.dir` property — under parallel suite execution a
    * concurrent suite's publish during the mutation window would land in
    * the private root and be torn down with it. The fast-path map is keyed
    * by (root, name, content-sig) so two roots never serve each other's
    * paths. */
  def indexParquetPath(s: SparkSession, name: String, d: String, table: String,
      root: String = baseDir)(build: => DataFrame): String = {
    val key = s"${name}_${tableSig(d, table)}"
    val mapKey = s"$root|$key"
    def publish(): String = {
      val fin = new java.io.File(root, s"graft_$key")
      if (!new java.io.File(fin, "_SUCCESS").exists()) {
        val tmp = new java.io.File(root,
          s"graft_${key}_w${java.util.UUID.randomUUID.toString.take(8)}")
        build.write.mode("overwrite").parquet(tmp.getAbsolutePath)
        if (fin.exists() && !new java.io.File(fin, "_SUCCESS").exists())
          deleteRecursively(fin) // corrupt leftover (crashed writer): clear it
        if (!tmp.renameTo(fin)) deleteRecursively(tmp) // lost the race: reuse winner's
      }
      fin.getAbsolutePath
    }
    val cached = published.getOrElseUpdate(mapKey, publish())
    // Self-heal a swept artifact: the fast-path map can outlive the files
    // when ANOTHER process's retention sweep (or a manual tmp clean) removes
    // the published dir — observed round 11 as PATH_NOT_FOUND mid-suite when
    // a concurrent JVM gc'd the shared store. The durable guard is the
    // _SUCCESS file, so re-check it on every handout and republish on miss:
    // one file stat per query against a query-plan's worth of work.
    if (new java.io.File(cached, "_SUCCESS").exists()) cached
    else { published.remove(mapKey); published.getOrElseUpdate(mapKey, publish()) }
  }

  /** [[indexParquetPath]] + read: the artifact as a DataFrame. */
  def indexParquet(s: SparkSession, name: String, d: String, table: String)
      (build: => DataFrame): DataFrame =
    s.read.parquet(indexParquetPath(s, name, d, table)(build))

  /** Memoize a driver-state model under a content-signature key. The cache
    * grows one entry per corpus CONTENT actually seen — model-sized values
    * only (centroids, codebooks, a count), never data-sized. */
  def memo[T](cache: scala.collection.concurrent.TrieMap[String, T], key: String)
      (build: => T): T =
    cache.getOrElseUpdate(key, build)

  /** Retention sweep for the artifact store: delete published artifacts
    * whose `_SUCCESS` is older than `maxAgeMs`, plus writer temp dirs older
    * than the same horizon (a crashed writer's `_w########` leftover is
    * garbage the moment its JVM died). Content keying makes this safe at
    * any time: a live corpus snapshot re-publishes under the same key on
    * next touch, and a reader never holds a path without its `_SUCCESS`
    * (the fast-path map is invalidated for swept keys). On a cluster this
    * is the nightly janitor over the shared store prefix. Returns the
    * number of directories removed. `root` defaults to [[baseDir]]; specs
    * sweep a private root explicitly (see [[indexParquetPath]]). */
  def gc(maxAgeMs: Long, storeRoot: String = baseDir): Int = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val root = new java.io.File(storeRoot)
    // Store-shaped names ONLY — graft_<name>_<12-hex content sig>, plus
    // writer temps with a _w<8-hex> suffix. The tmpdir also hosts unrelated
    // graft-prefixed dirs (spec temps, the scaling fixture); those are not
    // this store's to delete.
    val storeName = "^graft_.+_[0-9a-f]{12}(_w[0-9a-f]{8})?$".r
    val victims = Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && storeName.matches(f.getName))
      .filter { f =>
        val success = new java.io.File(f, "_SUCCESS")
        if (success.exists()) success.lastModified() < cutoff
        else f.lastModified() < cutoff // half-written leftover or temp dir
      }
    victims.foreach { f =>
      published.filterInPlace((_, p) => p != f.getAbsolutePath)
      deleteRecursively(f)
    }
    victims.size
  }

  // Published-artifact paths, keyed by (name, content-sig). Only a fast-path
  // map: the durable guard is the _SUCCESS file, which other JVMs also honor.
  private val published = scala.collection.concurrent.TrieMap.empty[String, String]

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
