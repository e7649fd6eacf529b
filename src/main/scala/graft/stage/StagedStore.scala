package graft.stage

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Hlc

/** Durable staging buffer for mutations awaiting their resolved fence.
  *
  * Mirrors the reference's per-table staging tables
  * (reference: internal/staging/stage/stage.go:49-53, 90-97): an append-only
  * parquet dataset keyed `(nanos, logical, key)`, partitioned by an HLC time
  * bucket so that
  *   - fence-window reads prune partitions (the analog of the
  *     `(nanos, logical) BETWEEN prev AND next` index scan, stage.go:171-195),
  *   - retirement of applied mutations is a metadata-only partition drop
  *     (the analog of the windowed DELETE loop, stage.go:390-436).
  *
  * Idempotence: appends may be replayed (micro-batch retry) and the feed
  * itself may deliver duplicates (types.go:150-151); readers deduplicate on
  * `(nanos, logical, key)` — duplicate deliveries are byte-identical by
  * protocol, so any survivor is correct.
  */
final class StagedStore(
    spark: SparkSession,
    val root: String,
    /** HLC nanos per staging partition bucket */
    val bucketNanos: Long = 3600L * 1000000000L,
    /** When true, [[append]] repartitions by `(ts_bucket, 4-way key salt)`
      * before writing — few large files per bucket, at the cost of
      * shuffling the FULL batch volume once per micro-batch. Default
      * false: staging is a transient pass-through buffer, and paying a
      * whole-feed shuffle purely for file-count control is the wrong
      * trade at 100 TB — per-batch file count is already bounded by
      * (input splits x ts-buckets-per-batch), readers scan staging with
      * split-sized tasks regardless of file layout, and retirement drops
      * whole partition directories either way.
      */
    val coalesceAppend: Boolean = false
) {
  import StagedStore._

  private val dataDir = s"$root/data"
  private val markerDir = Paths.get(root, "_batch_markers")
  private val seqFile = Paths.get(root, "_seq")
  private val fieldsFile = Paths.get(root, "_fields")
  Files.createDirectories(markerDir)
  Files.createDirectories(Paths.get(dataDir))

  private def bucketOf(nanos: Long): Long = Math.floorDiv(nanos, bucketNanos)

  /** Write `staged` into a private scratch tree, then ADOPT the part files
    * into the shared partition layout with driver-side renames (the same
    * pattern [[StagedStore.appendMultiTopic]] always used).
    *
    * Two concurrent appenders writing `mode("append")` into one directory
    * share the Hadoop committer's `_temporary` tree: the first job's
    * cleanup deletes the second's in-flight task files, failing it with
    * TASK_WRITE_FAILED — the write-side face of an HA restart overlap
    * (two drivers on one staging store). A per-append scratch dir gives
    * every job a private committer tree; adoption is per-file rename
    * (part names carry the job UUID, so two appenders can adopt into one
    * bucket dir without name collisions). A concurrent retire may drop
    * the target dir between create and move — retried, recreating the
    * dir; the row is then re-merged from this fresh file or already
    * covered by the competitor's fence.
    */
  private def writeAdopt(staged: DataFrame): Unit = {
    // reclaim orphans of killed writers (a scratch tree is live for the
    // duration of one append job; 30 min is far past any batch)
    graft.util.Dirs.listDir(Paths.get(root)).foreach { p =>
      if (p.getFileName.toString.startsWith("_scratch-") &&
        Files.getLastModifiedTime(p).toMillis < System.currentTimeMillis() - 30 * 60 * 1000L)
        rmTree(p)
    }
    val scratch = Files.createTempDirectory(Paths.get(root), "_scratch-")
    try {
      val out = scratch.resolve("out").toString
      staged.write.mode("overwrite").partitionBy(TS_BUCKET).parquet(out)
      graft.util.Dirs.listDir(Paths.get(out)).foreach { bucketDir =>
        val name = bucketDir.getFileName.toString
        if (name.startsWith(s"$TS_BUCKET=")) {
          val target = Paths.get(dataDir, name)
          graft.util.Dirs.listDir(bucketDir).foreach { f =>
            if (f.getFileName.toString.endsWith(".parquet")) {
              var tries = 0
              var done = false
              while (!done) {
                try {
                  Files.createDirectories(target)
                  Files.move(f, target.resolve(f.getFileName))
                  done = true
                } catch {
                  case _: java.nio.file.NoSuchFileException if tries < 3 =>
                    tries += 1
                }
              }
            }
          }
        }
      }
    } finally rmTree(scratch)
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) graft.util.Dirs.listDir(p).foreach(rmTree)
    Files.deleteIfExists(p)
  }

  /** Monotone append counter, persisted across restarts. Every successful
    * (non-replayed) [[append]] stamps its rows with the next value; the
    * replay loop records the counter at merge time so later merges can
    * separate "staged after my last merge" (late, must apply) from "already
    * merged" rows without re-reading either. Unlike Spark batch ids, this
    * never resets when a checkpoint is wiped.
    */
  def currentSeq(): Long =
    if (Files.exists(seqFile)) Files.readString(seqFile).trim.toLong else 0L

  private def nextSeq(): Long = {
    val n = currentSeq() + 1
    Files.writeString(seqFile, n.toString)
    n
  }

  /** Append a batch of parsed mutations
    * `(key, data, nanos, logical, src_file)`. `batchId` makes replays cheap
    * no-ops (a marker is written after a successful append); a crash between
    * append and marker re-appends, which the read-side dedup absorbs.
    *
    * When `validatePk` is set, the drift summary — key arities, the distinct
    * payload field set, PK-presence — rides the SAME scan that writes the
    * staged files (Observation): no separate summary pass ever touches the
    * data again. Violations (wrong key arity, missing PK) throw before the
    * marker is written, so the batch fails exactly once and replays retry
    * it; the field set is persisted in the marker for merge-time schema
    * reconciliation (field sets only grow, so the union over markers is the
    * window's field set).
    */
  def append(
      mutations: DataFrame,
      batchId: Long,
      validatePk: Option[(Int, Seq[String])] = None
  ): Boolean = {
    val marker = markerDir.resolve(s"$batchId")
    if (Files.exists(marker)) return false
    val seq = nextSeq()
    val stamped = mutations
      .withColumn(SEQ, lit(seq))
      .withColumn(TS_BUCKET, floor(col("nanos") / bucketNanos))
    // shuffle-free by default (see `coalesceAppend`): each input task
    // writes its rows straight into the ts-bucket directories it touches
    val staged =
      if (coalesceAppend)
        stamped.repartition(col(TS_BUCKET), pmod(xxhash64(col("key")), lit(4)))
      else stamped

    validatePk match {
      case None =>
        // no PK validation (e.g. a PK-less spec with a synthetic rowid),
        // but the payload FIELD SET must still be collected — schema
        // evolution at merge time reads it from observedFields()
        val obs = org.apache.spark.sql.Observation(
          s"stage-$batchId-${java.util.UUID.randomUUID()}"
        )
        writeAdopt(
          staged.observe(
            obs,
            array_distinct(flatten(collect_set(expr("json_object_keys(data)"))))
              .as("fields")
          )
        )
        obs.get.get("fields") match {
          case Some(f: Seq[_]) => recordFields(f.map(_.toString))
          case _ => ()
        }
        Files.writeString(marker, s"""{"seq":$seq}""")
      case Some((pkArity, pkSrcNames)) =>
        // a PK-less spec (synthetic rowid) never validates here, but guard
        // the empty reduce anyway
        val missingPkCond =
          if (pkSrcNames.isEmpty) lit(false)
          else
            col("data").isNotNull &&
              pkSrcNames
                .map(n => get_json_object(col("data"), s"$$.$n").isNull)
                .reduce(_ || _)
        // globally-unique name: Observations match by name on the shared
        // listener bus, so two sessions staging the same stageKey
        // concurrently would otherwise read each other's drift metrics
        val obs = org.apache.spark.sql.Observation(
          s"stage-$batchId-${java.util.UUID.randomUUID()}"
        )
        writeAdopt(
          staged.observe(
            obs,
            collect_set(size(from_json(col("key"), org.apache.spark.sql.types.ArrayType(StringType))))
              .as("arities"),
            array_distinct(flatten(collect_set(expr("json_object_keys(data)"))))
              .as("fields"),
            max(when(missingPkCond, 1).otherwise(0)).as("missing_pk")
          )
        )
        val m = obs.get
        val arities = m("arities").asInstanceOf[Seq[Int]]
        val fields = m("fields").asInstanceOf[Seq[String]]
        val missingPk =
          Option(m("missing_pk")).exists(_.asInstanceOf[Number].intValue() == 1)
        arities.find(_ != pkArity).foreach { got =>
          throw new graft.model.SchemaDriftException(
            s"the mutation key has $got values, expected $pkArity"
          )
        }
        if (missingPk) {
          throw new graft.model.SchemaDriftException(
            s"missing primary-key column in payload; expected all of " +
              pkSrcNames.mkString("[", ", ", "]")
          )
        }
        // fold the batch's payload field set into the ONE compacted
        // `_fields` file BEFORE the marker lands: a crash in between
        // replays the batch and re-unions (idempotent — sets only grow)
        recordFields(fields)
        Files.writeString(marker, s"""{"seq":$seq}""")
    }
    true
  }

  /** Fold `fields` into the compacted field-set file (read-union-write,
    * atomic rename; single writer per store). Keeps [[observedFields]] an
    * O(1) file read no matter how many batches have ever been staged.
    */
  private def readFieldsFile(): Set[String] = {
    if (!Files.exists(fieldsFile)) return Set.empty
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val f = mapper.readTree(Files.readString(fieldsFile)).get("fields")
    if (f == null) Set.empty
    else f.elements().asScala.map(_.asText()).toSet
  }

  /** Field sets recorded per-marker by the pre-compaction format. Folded in
    * whenever the compacted file is first created so staged-but-unmerged
    * pre-upgrade batches keep their field universe — the fold must run on
    * the first WRITE, not only on the first read: the loop's own first
    * append calls [[recordFields]] before any [[observedFields]] call, and
    * creating `_fields` from the new batch alone would orphan the legacy
    * sets forever.
    */
  private def legacyMarkerFields(): Set[String] = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    StagedStore
      .listDir(markerDir)
      .flatMap { p =>
        val f = mapper.readTree(Files.readString(p)).get("fields")
        if (f == null) Nil else f.elements().asScala.map(_.asText()).toList
      }
      .toSet
  }

  private[graft] def recordFields(fields: Seq[String]): Unit = {
    val legacy =
      if (!Files.exists(fieldsFile)) legacyMarkerFields() else Set.empty[String]
    val merged = (readFieldsFile() ++ legacy ++ fields).toSeq.sorted
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    val arr = node.putArray("fields")
    merged.foreach(arr.add)
    val tmp = Paths.get(root, s"._fields-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, mapper.writeValueAsString(node))
    Files.move(
      tmp,
      fieldsFile,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING
    )
  }

  /** Union of every payload field set ever staged (monotone — schemas only
    * grow). ONE compacted-file read, independent of batch count: the
    * per-batch markers exist only for append idempotence and are retired by
    * [[retire]], so the field universe cannot live in them.
    */
  def observedFields(): Set[String] = {
    if (!Files.exists(fieldsFile)) {
      // read-side half of the migration (see [[legacyMarkerFields]])
      val legacy = legacyMarkerFields()
      if (legacy.nonEmpty) recordFields(Nil)
      return legacy
    }
    readFieldsFile()
  }

  private def schema: StructType = StructType(
    Seq(
      StructField("key", StringType),
      StructField("data", StringType),
      StructField("nanos", LongType),
      StructField("logical", IntegerType),
      StructField("src_file", StringType),
      StructField(SEQ, LongType)
    )
  )

  private def readRaw(): DataFrame =
    spark.read
      .schema(schema.add(TS_BUCKET, LongType))
      .parquet(dataDir)
      // files written before the seq column existed read as null -> 0
      .withColumn(SEQ, coalesce(col(SEQ), lit(0L)))

  /** All currently staged mutations (deduplicated). */
  def readAll(): DataFrame =
    readRaw().dropDuplicates("nanos", "logical", "key")

  /** [[selectWindow]] without the `(nanos, logical, key)` dedup shuffle:
    * duplicate deliveries are byte-identical by protocol, and the snapshot
    * merge's per-key max_by keeps exactly one of any exact-tie group — so
    * the merge path can skip the dedup entirely. Use [[selectWindow]] when
    * consumers need unique rows.
    */
  /** @param stagedAfterSeq when set, rows staged with `stage_seq >` this
    *   value are included even when their ts is at/below `from` — the
    *   late-delivery branch: a transport-reordered mutation below the
    *   committed fence still applies exactly once (it was never merged),
    *   while rows already merged by earlier fences (ts <= from AND staged
    *   before the last merge) stop being re-read and re-written every fence.
    */
  def selectWindowRaw(
      from: Hlc,
      to: Hlc,
      stagedAfterSeq: Option[Long] = None
  ): DataFrame = {
    val ts = struct(col("nanos"), col("logical"))
    val lo = struct(lit(from.nanos), lit(from.logical))
    val hi = struct(lit(to.nanos), lit(to.logical))
    val inWindow = ts > lo
    val cond = stagedAfterSeq match {
      case None =>
        // pure window read: lower-bound partition pruning applies
        col(TS_BUCKET).between(bucketOf(from.nanos), bucketOf(to.nanos)) &&
          col("nanos").between(from.nanos, to.nanos) && inWindow
      case Some(seq) =>
        // late rows live in ts buckets below `from`; retirement keeps the
        // on-disk set bounded, so only the UPPER bound prunes here
        col(TS_BUCKET) <= bucketOf(to.nanos) &&
          col("nanos") <= to.nanos &&
          (inWindow || col(SEQ) > seq)
    }
    readRaw().filter(cond && ts <= hi)
  }

  /** Staged mutations with `from < ts <= to` (HLC order), deduplicated.
    * The `ts_bucket` range predicate prunes partitions; the `nanos` range is
    * pushed to the parquet scan; the exact HLC tuple bounds are applied
    * post-scan.
    */
  def selectWindow(
      from: Hlc,
      to: Hlc,
      stagedAfterSeq: Option[Long] = None
  ): DataFrame =
    // filter (selectWindowRaw) BEFORE the dedup aggregate so partition
    // pruning and parquet predicate pushdown see the raw scan
    selectWindowRaw(from, to, stagedAfterSeq)
      .dropDuplicates("nanos", "logical", "key")

  /** Distinct commit timestamps present in staging within the window —
    * the reference's TransactionTimes scan (stage.go:126-164).
    */
  def transactionTimes(from: Hlc, to: Hlc): DataFrame =
    selectWindow(from, to).select("nanos", "logical").distinct()

  /** Highest staging partition bucket currently on disk (directory listing
    * only — no data read). None when nothing is staged.
    */
  def maxStagedBucket(): Option[Long] = {
    StagedStore
      .listDir(Paths.get(dataDir))
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$TS_BUCKET="))
      .map(_.stripPrefix(s"$TS_BUCKET=").toLong)
      .maxOption
  }

  def bucketOfNanos(nanos: Long): Long = bucketOf(nanos)

  /** Drop whole staging partitions whose every mutation is at or below the
    * committed fence, and prune old batch markers. Metadata-only (directory
    * removal); partial buckets are kept — their applied rows are screened
    * out by the fence on read. Returns the number of partitions dropped.
    *
    * Marker retirement: markers exist only so an append replayed by the
    * streaming engine is a cheap no-op, and the engine only ever replays
    * the most recent uncommitted batch — so the newest `markerKeep` markers
    * are ample. A re-append past that horizon (wiped checkpoint) is still
    * absorbed by the read-side `(nanos, logical, key)` dedup / merge
    * max_by; without pruning, a day at 1 batch/s leaves ~86k files that
    * every directory listing pays for.
    */
  def retire(upTo: Hlc, markerKeep: Int = 64): Int = {
    val fenceBucket = bucketOf(upTo.nanos) // drop buckets strictly below
    var dropped = 0
    StagedStore.listDir(Paths.get(dataDir)).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith(s"$TS_BUCKET=")) {
        val b = name.stripPrefix(s"$TS_BUCKET=").toLong
        if (b < fenceBucket) {
          deleteRecursively(p)
          dropped += 1
        }
      }
    }
    // marker names are batch-identity hashes (not sequential); recency
    // comes from the store seq embedded in the marker CONTENT (exact and
    // monotone — file mtime alone mis-orders markers written within one
    // coarse-granularity mtime tick). Legacy seq-less markers sort oldest,
    // then by (mtime, name) for determinism.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def markerSeq(p: java.nio.file.Path): Long =
      try {
        val n = mapper.readTree(Files.readString(p)).get("seq")
        if (n == null) Long.MinValue else n.asLong(Long.MinValue)
      } catch { case _: Exception => Long.MinValue }
    val markers = StagedStore
      .listDir(markerDir)
      .map(p =>
        (markerSeq(p), Files.getLastModifiedTime(p).toMillis, p.getFileName.toString, p)
      )
      .sortBy { case (s, t, n, _) => (s, t, n) }
    markers.dropRight(markerKeep).foreach { case (_, _, _, p) => Files.deleteIfExists(p) }
    dropped
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) StagedStore.listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object StagedStore {
  val TS_BUCKET = "ts_bucket"
  val SEQ = "stage_seq"

  /** Eager, stream-closing directory listing (shared impl: [[graft.util.Dirs]]). */
  private[graft] def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    graft.util.Dirs.listDir(p)

  /** ONE-PASS staging of a multi-topic batch.
    *
    * The per-topic `append` loop scans the (cached) batch once per topic —
    * T passes. This writes every topic's slice in a single Spark job
    * (`partitionBy(topic, ts_bucket)` into a batch-scoped spill dir), runs
    * ONE `groupBy(topic)` drift aggregation, then adopts the written files
    * into each topic's store with driver-side renames (metadata only) and
    * writes the per-topic markers. Crash between adopt and marker replays
    * the batch; duplicate rows are byte-identical and collapse in the
    * read-side dedup / merge max_by, same contract as [[StagedStore.append]].
    *
    * `mutations` must carry `(topic, key, data, nanos, logical, src_file)`.
    * Per-topic seq values are stamped at write time (CASE over topics) and
    * the stores' counters are bumped after adoption.
    */
  def appendMultiTopic(
      mutations: DataFrame,
      batchId: Long,
      stores: Map[String, StagedStore],
      validatePk: Map[String, (Int, Seq[String])]
  ): Unit = {
    import org.apache.spark.sql.functions._
    require(stores.nonEmpty)
    val pending: Map[String, StagedStore] = stores.filter { case (_, st) =>
      !Files.exists(st.markerDir.resolve(s"$batchId"))
    }
    if (pending.isEmpty) return
    val topics = pending.keys.toSeq.sorted
    val muts = mutations.filter(col("topic").isin(topics.map(lit): _*))

    // per-topic seq and ts-bucket width, folded into single columns
    val seqOf: Map[String, Long] =
      pending.map { case (t, st) => t -> (st.currentSeq() + 1) }
    val seqCol = topics.foldLeft(lit(0L)) { (acc, t) =>
      when(col("topic") === t, lit(seqOf(t))).otherwise(acc)
    }
    val bucketCol = topics.foldLeft(lit(0L)) { (acc, t) =>
      when(col("topic") === t, floor(col("nanos") / pending(t).bucketNanos))
        .otherwise(acc)
    }

    val spillRoot = Files.createTempDirectory(s"graft-multistage-$batchId")
    val spillDir = spillRoot.resolve("data").toString
    val staged = muts
      .withColumn(SEQ, seqCol)
      .withColumn(TS_BUCKET, bucketCol)
      .repartition(col("topic"), col(TS_BUCKET), pmod(xxhash64(col("key")), lit(4)))

    // ONE drift aggregation for every topic (groupBy replaces T Observations)
    val keyArr = from_json(col("key"), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType))
    val missingPkCol = validatePk.foldLeft(lit(false)) { case (acc, (t, (_, names))) =>
      if (names.isEmpty) acc // PK-less topic: rowid is synthesized at plan time
      else
        when(
          col("topic") === t,
          col("data").isNotNull &&
            names.map(n => get_json_object(col("data"), s"$$.$n").isNull).reduce(_ || _)
        ).otherwise(acc)
    }
    val summary = muts
      .groupBy(col("topic"))
      .agg(
        collect_set(size(keyArr)).as("arities"),
        array_distinct(flatten(collect_set(expr("json_object_keys(data)"))))
          .as("fields"),
        max(when(missingPkCol, 1).otherwise(0)).as("missing_pk")
      )
      .collect()
      .map(r =>
        r.getString(0) -> ((r.getSeq[Int](1), r.getSeq[String](2), !r.isNullAt(3) && r.getInt(3) == 1))
      )
      .toMap

    validatePk.foreach { case (t, (arity, names)) =>
      summary.get(t).foreach { case (arities, _, missing) =>
        arities.find(_ != arity).foreach { got =>
          throw new graft.model.SchemaDriftException(
            s"[$t] the mutation key has $got values, expected $arity"
          )
        }
        if (missing) {
          throw new graft.model.SchemaDriftException(
            s"[$t] missing primary-key column in payload; expected all of " +
              names.mkString("[", ", ", "]")
          )
        }
      }
    }

    staged
      .withColumnRenamed("topic", "__topic")
      .write
      .mode("overwrite")
      .partitionBy("__topic", TS_BUCKET) // partition cols stay out of files
      .parquet(spillDir)

    // adopt: move each topic's ts_bucket part files into its store (driver
    // renames — no data pass), bump seq, fold the field set into the
    // compacted `_fields` file, then write the idempotence marker
    topics.foreach { t =>
      val st = pending(t)
      val topicDir = Paths.get(spillDir, s"__topic=$t")
      listDir(topicDir).foreach { bucketDir =>
        val name = bucketDir.getFileName.toString // ts_bucket=N
        if (name.startsWith(s"$TS_BUCKET=")) {
          val target = Paths.get(st.root, "data", name)
          Files.createDirectories(target)
          listDir(bucketDir).foreach { f =>
            if (f.getFileName.toString.endsWith(".parquet")) {
              Files.move(f, target.resolve(f.getFileName))
            }
          }
        }
      }
      Files.writeString(st.seqFile, seqOf(t).toString)
      st.recordFields(summary.get(t).map(_._2).getOrElse(Nil))
      Files.writeString(
        st.markerDir.resolve(s"$batchId"),
        s"""{"seq":${seqOf(t)}}"""
      )
    }
    // scratch cleanup (only empty partition dirs and _SUCCESS remain)
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) listDir(p).foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(spillRoot)
  }
}
