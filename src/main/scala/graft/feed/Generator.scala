package graft.feed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded changefeed generator over the BASELINE input table
  * shape `repo_files(repo, path, commit, lang, content)` with PK (repo, path).
  *
  * Plays the role of the reference's source adapters (pglogical / mylogical /
  * changefeed emitters — reference: internal/source/pglogical/conn.go,
  * internal/sinktest/mutations/mutations.go:44-88): it produces the common
  * wire format the engine consumes (ndjson mutations + resolved markers) with
  * the adversarial properties the reference tests for:
  *
  *   - insert/update/delete mix with full row images;
  *   - hot-key skew (power-law over key ids, so a few (repo, path) keys
  *     receive a large share of updates — the skew the salted LWW path has
  *     to absorb);
  *   - out-of-timestamp-order delivery *within* a bounded disorder window
  *     (block-local permutation of HLC ranks), while still honoring the
  *     resolved-timestamp protocol: a resolved marker is emitted only after
  *     every mutation with ts <= resolved has been emitted;
  *   - byte-identical duplicate deliveries (staging idempotence,
  *     reference: internal/types/types.go:150-151);
  *   - mutations with ts beyond the next resolved timestamp arriving early
  *     (they must stay staged across windows — fencing);
  *   - optional schema drift: a `stars` column appears in payloads in the
  *     last `evolveFraction` of the feed (schema-evolution path).
  *
  * Every field of every event is a pure function of (seed, eventIndex), so
  * the feed is reproducible at any parallelism level.
  */
object Generator {

  final case class FeedSpec(
      seed: Long = 42L,
      numEvents: Long = 30000L,
      numKeys: Long = 10000L,
      numRepos: Int = 50,
      resolvedWindows: Int = 3,
      /** events per arrival-order file chunk */
      eventsPerFile: Long = 10000L,
      deleteFraction: Double = 0.05,
      duplicateFraction: Double = 0.02,
      /** power-law exponent: key = floor(K * u^skew); higher = hotter heads */
      skew: Double = 3.0,
      /** bounded-disorder block size; must divide numEvents/resolvedWindows */
      disorderBlock: Long = 1000L,
      /** payloads in the last fraction of the feed gain a `stars` column */
      evolveFraction: Double = 0.0,
      baseNanos: Long = 1700000000000000000L,
      nanosStep: Long = 1000000L,
      /** content length range: contentMin + hash % contentRange chars —
        * benches use KB-sized values (realistic source-file row images)
        */
      contentMin: Int = 64,
      contentRange: Int = 192
  ) {
    require(numEvents % resolvedWindows == 0, "windows must divide events")
    require(
      (numEvents / resolvedWindows) % disorderBlock == 0,
      "disorder block must divide the window size"
    )
    def windowSize: Long = numEvents / resolvedWindows
  }

  // --- splitmix64: the per-event PRNG kernel -------------------------------
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  @inline def hash01(seed: Long, j: Long, salt: Long): Double = {
    val h = mix64(seed ^ mix64(j ^ mix64(salt)))
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Bounded-disorder HLC rank: a within-block bijection of the arrival
    * index. gcd(7, block) must be 1 (block sizes not divisible by 7).
    */
  def tsRank(spec: FeedSpec, j: Long): Long = {
    val b = spec.disorderBlock
    val block = j / b
    val i = j % b
    block * b + ((i * 7 + block * 13) % b)
  }

  final case class Event(
      key: String,
      data: Option[String],
      nanos: Long,
      logical: Int,
      isResolved: Boolean,
      fileId: Long
  )

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def keyId(spec: FeedSpec, j: Long): Long = {
    val u = hash01(spec.seed, j, 1L)
    math.min(
      spec.numKeys - 1,
      (spec.numKeys * math.pow(u, spec.skew)).toLong
    )
  }

  private val langs = Array("scala", "go", "rust", "py", "md")

  def repoOf(spec: FeedSpec, k: Long): String = s"repo-${k % spec.numRepos}"
  def pathOf(k: Long): String = s"src/file_$k.txt"

  /** Deterministic content body for key k at event j. */
  def contentOf(spec: FeedSpec, k: Long, j: Long): String = {
    val h0 = mix64(spec.seed ^ mix64(k) ^ mix64(j ^ 0x5bd1e995L))
    val len = spec.contentMin + (math.abs(h0) % spec.contentRange).toInt
    val sb = new StringBuilder(len + 48)
    sb.append(s"// ${repoOf(spec, k)}/${pathOf(k)} v$j\n")
    var h = h0
    while (sb.length < len) {
      h = mix64(h)
      sb.append(java.lang.Long.toHexString(h))
      sb.append(' ')
    }
    sb.setLength(len)
    sb.toString
  }

  /** Arrival index -> canonical event index: duplicate deliveries replay the
    * previous arrival verbatim.
    */
  def canonicalIndex(spec: FeedSpec, jIn: Long): Long =
    if (jIn > 0 && hash01(spec.seed, jIn, 3L) < spec.duplicateFraction) jIn - 1
    else jIn

  def isDeleteOf(spec: FeedSpec, j: Long): Boolean =
    hash01(spec.seed, j, 7L) < spec.deleteFraction

  /** (commit, lang) of the row image for key k at canonical event j —
    * exposed so tests can build an independent in-memory oracle of the
    * expected final state.
    */
  def commitOf(spec: FeedSpec, j: Long): String =
    java.lang.Long.toHexString(mix64(spec.seed ^ mix64(j + 77)))
  def langOf(k: Long): String = langs((math.abs(mix64(k ^ 0x77L)) % 5).toInt)

  /** The canonical mutation for arrival index j (pure function). */
  def eventAt(spec: FeedSpec, jIn: Long): Event = {
    val j = canonicalIndex(spec, jIn)
    val k = keyId(spec, j)
    val rank = tsRank(spec, j)
    val nanos = spec.baseNanos + rank * spec.nanosStep
    val logical = (mix64(spec.seed ^ j) & 0x3).toInt
    val repo = repoOf(spec, k)
    val path = pathOf(k)
    val key = s"""["${jsonEscape(repo)}","${jsonEscape(path)}"]"""
    val isDelete = isDeleteOf(spec, j)
    val data =
      if (isDelete) None
      else {
        val commit = commitOf(spec, j)
        val lang = langOf(k)
        val content = contentOf(spec, k, j)
        val evolved =
          spec.evolveFraction > 0 &&
            jIn >= (spec.numEvents * (1.0 - spec.evolveFraction)).toLong
        val stars =
          if (evolved) s""","stars":${math.abs(mix64(j)) % 10000}""" else ""
        Some(
          s"""{"repo":"${jsonEscape(repo)}","path":"${jsonEscape(path)}","commit":"$commit","lang":"$lang","content":"${jsonEscape(content)}"$stars}"""
        )
      }
    Event(key, data, nanos, logical, isResolved = false, jIn / spec.eventsPerFile)
  }

  /** Resolved timestamp that closes window w (0-based): covers HLC ranks
    * [0, (w+1)*windowSize).
    */
  def resolvedAt(spec: FeedSpec, w: Int): Event = {
    val arrivalPos = (w + 1) * spec.windowSize - 1
    Event(
      key = null,
      data = None,
      nanos = spec.baseNanos + ((w + 1) * spec.windowSize - 1) * spec.nanosStep,
      logical = Int.MaxValue - 1,
      isResolved = true,
      fileId = arrivalPos / spec.eventsPerFile
    )
  }

  /** Generate the feed as a DataFrame in *arrival order* columns
    * `(key, data, nanos, logical, is_resolved, sort_key, file_id)`.
    * Fully distributed; every row is a pure function of (seed, index).
    */
  def feedDf(spark: SparkSession, spec: FeedSpec, parallelism: Int = 32): DataFrame = {
    import spark.implicits._
    val events = spark
      .range(0, spec.numEvents, 1, parallelism)
      .as[Long]
      .map { j =>
        val e = eventAt(spec, j)
        (e.key, e.data, e.nanos, e.logical, e.isResolved, j * 2, e.fileId)
      }
    val markers = spark
      .range(0, spec.resolvedWindows.toLong, 1, 1)
      .as[Long]
      .map { w =>
        val e = resolvedAt(spec, w.toInt)
        val arrivalPos = (w + 1) * spec.windowSize - 1
        (e.key, e.data, e.nanos, e.logical, e.isResolved, arrivalPos * 2 + 1, e.fileId)
      }
    events
      .union(markers)
      .toDF("key", "data", "nanos", "logical", "is_resolved", "sort_key", "file_id")
  }

  /** Write the feed as ndjson chunks under `dir`, one zero-padded
    * subdirectory per arrival chunk so lexical path order == arrival order
    * for the file streaming source.
    */
  def writeFeed(
      spark: SparkSession,
      spec: FeedSpec,
      dir: String,
      parallelism: Int = 32
  ): Unit = {
    val df = feedDf(spark, spec, parallelism)
    val lines = df.select(
      Changefeed.lineCol.as("value"),
      format_string("%06d", col("file_id")).as("chunk")
    )
    lines
      .repartition(col("chunk"))
      .write
      .mode("overwrite")
      .partitionBy("chunk")
      .text(dir)
    // the file streaming source orders by modification time; parallel
    // writes land with arbitrary mtimes, which would reorder arrival and
    // break the resolved protocol (markers before their mutations). Stamp
    // strictly increasing mtimes in chunk order. (The engine tolerates
    // reordering anyway — the stage_seq late-delivery branch — but a protocol-correct
    // feed is the realistic baseline.)
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    val chunks = java.nio.file.Files
      .list(root)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.startsWith("chunk="))
      .toSeq
      .sortBy(_.getFileName.toString)
    val base = System.currentTimeMillis() - chunks.size * 2000L
    chunks.zipWithIndex.foreach { case (chunkDir, i) =>
      val t = java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L)
      java.nio.file.Files
        .list(chunkDir)
        .iterator()
        .asScala
        .foreach(f => java.nio.file.Files.setLastModifiedTime(f, t))
      java.nio.file.Files.setLastModifiedTime(chunkDir, t)
    }
  }
}
