package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** One committed snapshot version.
  *
  * @param version        monotonically increasing snapshot version
  * @param idempotenceKey caller-supplied replay key — commits carrying a key
  *                       already present in the log are skipped (the
  *                       exactly-once contract: `(partition, resolvedTs)` /
  *                       batch id, mirroring the reference's memo +
  *                       applied-ledger pairing, internal/staging/memo/
  *                       memo.go:67-78 and source/cdc/resolver.go:318-337)
  * @param resolvedNanos/resolvedLogical the resolved fence this commit
  *                       carried the table to (0 for immediate mode)
  * @param schemaDdl      snapshot schema at this version (DDL string)
  * @param buckets        bucket id -> relative BASE data directory holding
  *                       that bucket's compacted rows; untouched buckets
  *                       point at files of earlier versions (copy-on-write
  *                       reuse)
  * @param bucketSchemas  bucket id -> version whose schema its files carry
  *                       (needed to read old files after type widening)
  * @param deltas         bucket id -> ordered relative DELTA directories
  *                       appended since the bucket's last compaction
  *                       (merge-on-read: a delta merge writes only the
  *                       batch's rows; readers fold base ∪ deltas per key)
  * @param deltaSchemas   delta directory -> schema DDL its files carry
  * @param pkCols         the table's merge key, recorded so readers can
  *                       fold multi-version rows without a spec
  * @param metrics        applied-mutation counters (upserts/deletes/rows)
  * @param partitionMetrics per-bucket applied row counts (lineage/metrics
  *                       requirement of the north rule)
  * @param lineage        input provenance: source files / batch ids folded in
  */
final case class CommitMeta(
    version: Long,
    idempotenceKey: String,
    resolvedNanos: Long,
    resolvedLogical: Int,
    schemaDdl: String,
    numBuckets: Int,
    buckets: Map[String, String],
    bucketSchemas: Map[String, String],
    deltas: Map[String, Seq[String]],
    deltaSchemas: Map[String, String],
    pkCols: Seq[String],
    metrics: Map[String, Long],
    partitionMetrics: Map[String, Long],
    lineage: Seq[String],
    committedAtMs: Long
) {

  /** Type-safe metric read. `metrics` is declared `Map[String, Long]`, but a
    * meta RE-READ from JSON carries boxed Integers for small values (Jackson
    * + type erasure) — pattern-matching through Number absorbs both.
    */
  def metric(name: String): Option[Long] =
    metrics.asInstanceOf[Map[String, Any]].get(name) match {
      case Some(n: Number) => Some(n.longValue())
      case _ => None
    }
}

/** File-based commit log with atomic-rename commits.
  *
  * Commit files are `commits/<version>%020d.json`, written to a temp name and
  * atomically renamed; the reader's "current snapshot" is the highest
  * version present. A crashed writer leaves only a temp file, which is
  * ignored — this is the sandbox stand-in for an Iceberg/metastore catalog
  * commit (single writer per table, as in the reference's lease-guarded
  * loops, internal/staging/leases/leases.go).
  */
final class CommitLog(root: String) {
  private val dir: Path = Paths.get(root, "commits")
  Files.createDirectories(dir)

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  private def pathFor(version: Long): Path =
    dir.resolve(f"$version%020d.json")

  def listVersions(): Seq[Long] =
    graft.util.Dirs
      .listDir(dir)
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong)
      .sorted

  def latest(): Option[CommitMeta] =
    listVersions().lastOption.map(read)

  /** test hook: commit-file deserializations performed by this instance */
  private[graft] var fileReads: Long = 0

  def read(version: Long): CommitMeta = {
    fileReads += 1
    mapper.readValue(pathFor(version).toFile, classOf[CommitMeta])
  }

  def all(): Seq[CommitMeta] = listVersions().map(read)

  /** [[read]] that absorbs a missing commit file (vacuumed / never written). */
  def tryRead(version: Long): Option[CommitMeta] =
    if (Files.exists(pathFor(version))) Some(read(version)) else None

  // idempotence keys, loaded once per process then maintained on commit():
  // contains() is O(1) per merge instead of deserializing every commit JSON
  // (single writer per table, so the cache can only be a superset of the
  // on-disk keys — and a superset is the safe direction for idempotence)
  private var keyCache: scala.collection.mutable.Set[String] = null

  private def keys(): scala.collection.mutable.Set[String] = synchronized {
    if (keyCache == null) {
      keyCache = scala.collection.mutable.Set.empty[String]
      all().foreach(m => keyCache += m.idempotenceKey)
    }
    keyCache
  }

  /** True if some commit already carries this idempotence key. */
  def contains(idempotenceKey: String): Boolean =
    keys().contains(idempotenceKey)

  /** Atomically publish a commit. Returns false if the version already
    * exists (lost race / replay) — callers re-check idempotence then.
    */
  def commit(meta: CommitMeta): Boolean = {
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    mapper.writerWithDefaultPrettyPrinter().writeValue(tmp.toFile, meta)
    try {
      Files.move(tmp, pathFor(meta.version), StandardCopyOption.ATOMIC_MOVE)
      synchronized { if (keyCache != null) keyCache += meta.idempotenceKey }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }
}
