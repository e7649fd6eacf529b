package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video travel as opaque `binary`
  * columns with typed metadata, and decode / feature-extraction runs as a
  * batched per-partition pipeline.
  *
  * The Spark-side plumbing — schema convention, partition sizing, batched
  * iteration (the JVM analog of `mapInPandas` batch shape), deterministic
  * output schema — is real and tested. The decoder itself is a clearly
  * marked STUB (`FakeCodec`): the sandbox ships no image/audio libraries,
  * so it derives deterministic pseudo-features from the bytes. Swapping in
  * a real codec is a one-function change (`MediaCodec` trait).
  */
object MultiModalOps {

  /** Canonical multimodal row: an opaque blob + typed metadata. */
  val blobSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = true),
      StructField("blob", BinaryType, nullable = true)
    )
  )

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double
  )

  /** Pluggable decoder boundary. Implementations must be pure
    * (deterministic per blob) so the pipeline stays replayable.
    */
  trait MediaCodec extends Serializable {
    def decode(mime: String, blob: Array[Byte]): MediaFeatures.PartialFeatures
  }
  object MediaFeatures {
    final case class PartialFeatures(
        width: Int,
        height: Int,
        channels: Int,
        meanLuma: Double
    )
  }

  /** STUB codec: no real image/audio libs in this sandbox. Derives
    * deterministic pseudo-dimensions/stats from the bytes so the pipeline
    * shape (schemas, batching, partitioning) is fully exercised.
    */
  object FakeCodec extends MediaCodec {
    override def decode(
        mime: String,
        blob: Array[Byte]
    ): MediaFeatures.PartialFeatures = {
      var h = 0xcbf29ce484222325L
      var i = 0
      var lumaAcc = 0L
      while (i < blob.length) {
        h ^= blob(i) & 0xffL
        h *= 0x100000001b3L
        lumaAcc += blob(i) & 0xff
        i += 1
      }
      val w = 64 + math.abs(h % 1024).toInt
      val ht = 64 + math.abs((h >>> 17) % 1024).toInt
      MediaFeatures.PartialFeatures(
        width = w,
        height = ht,
        channels = if (mime != null && mime.startsWith("image")) 3 else 1,
        meanLuma =
          if (blob.isEmpty) 0.0 else lumaAcc.toDouble / blob.length
      )
    }
  }

  /** Decode + feature-extract: batched mapPartitions over the blob table.
    * `batchSize` bounds peak decoded memory per task (the `mapInPandas`
    * batch-shape analog); blobs stream through the iterator, never
    * collected.
    */
  def extractFeatures(
      spark: SparkSession,
      blobs: DataFrame,
      codec: MediaCodec = FakeCodec,
      batchSize: Int = 64
  ): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs
      .select(col("media_id"), col("mime"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, mime, blob) =>
            val bytes = if (blob == null) Array.emptyByteArray else blob
            val f = codec.decode(mime, bytes)
            MediaFeatures(
              media_id = id,
              mime = mime,
              byte_len = bytes.length,
              width = f.width,
              height = f.height,
              channels = f.channels,
              mean_luma = f.meanLuma
            )
          }
        }
      }
  }

  /** Deterministic frame sampling plan for video blobs: every row fans out
    * to `framesPerDoc` (frame_no, byte_offset) probe points — pure column
    * math (the decode of each probe point would go through [[MediaCodec]]).
    */
  def frameSamplePlan(blobs: DataFrame, framesPerDoc: Int = 4): DataFrame =
    blobs
      .withColumn("n_bytes", length(col("blob")))
      .withColumn(
        "frame",
        explode(
          transform(
            sequence(lit(0), lit(framesPerDoc - 1)),
            i =>
              struct(
                i.as("frame_no"),
                (i * greatest(col("n_bytes"), lit(1)) / framesPerDoc)
                  .cast("long")
                  .as("byte_offset")
              )
          )
        )
      )
      .select(
        col("media_id"),
        col("frame.frame_no").as("frame_no"),
        col("frame.byte_offset").as("byte_offset")
      )

  /** Synthesize a deterministic blob table from any id column — test/bench
    * fabric for the multimodal path (no external data).
    */
  def syntheticBlobs(df: DataFrame, idCol: String, bytesPerBlob: Int = 256): DataFrame = {
    val mimes = array(lit("image/png"), lit("audio/wav"), lit("video/mp4"))
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("mime", element_at(mimes, (pmod(col("media_id"), lit(3)) + 1).cast("int")))
      .withColumn(
        "blob",
        // deterministic bytes: unhex of repeated per-id hash strings
        unhex(
          substring(
            repeat(sha2(concat(lit("blob"), col("media_id").cast("string")), 256), bytesPerBlob / 16),
            1,
            bytesPerBlob * 2
          )
        )
      )
  }
}
