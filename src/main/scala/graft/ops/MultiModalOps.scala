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
  * output schema — is real and tested, and so is the default decode path:
  * [[JdkCodec]] performs REAL PNG and WAV decoding with the pure-JDK
  * `javax.imageio` / `javax.sound.sampled` stacks (no native libraries).
  * Formats the JDK cannot decode (video containers, modern image codecs)
  * fall back to the clearly-marked [[FakeCodec]] stub, which derives
  * deterministic pseudo-features from the bytes; swapping in a real codec
  * for those stays a one-function change (`MediaCodec` trait).
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

  /** REAL pure-JDK decoder: PNG via `javax.imageio` and WAV via
    * `javax.sound.sampled` — both ship with the JDK, so no native codec
    * libraries are needed. Feature mapping:
    *   - images: (width, height, raster bands, mean raw sample value) —
    *     mean over every band of every pixel, in the 0-255 sample space;
    *   - audio: (frames as width, sample rate as height, channels, mean
    *     |sample| / 32768 over all 16-bit PCM samples).
    * Unsupported mimes fall back to [[FakeCodec]] so mixed-corpus
    * pipelines stay total. Deterministic per blob (pure decode + integer
    * sums folded to double at the end).
    */
  object JdkCodec extends MediaCodec {

    /** Total by construction: a malformed/truncated blob (ImageIO
      * IIOException, AudioSystem UnsupportedAudioFileException, or the
      * non-16-bit-PCM require below) must DEGRADE to the fallback
      * features, not fail the whole Spark task — one bad blob in a
      * 100 TB corpus is data, not an error.
      */
    override def decode(
        mime: String,
        blob: Array[Byte]
    ): MediaFeatures.PartialFeatures =
      try decodeStrict(mime, blob)
      catch { case scala.util.control.NonFatal(_) => FakeCodec.decode(mime, blob) }

    private def decodeStrict(
        mime: String,
        blob: Array[Byte]
    ): MediaFeatures.PartialFeatures = mime match {
      case m if m != null && m.startsWith("image") && blob.nonEmpty =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        if (img == null) FakeCodec.decode(mime, blob)
        else {
          val r = img.getRaster
          val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          MediaFeatures.PartialFeatures(
            w, h, bands, sum.toDouble / (w.toLong * h * bands))
        }
      case m if m != null && m.startsWith("audio") && blob.nonEmpty =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(blob))
        try {
          val fmt = ais.getFormat
          require(
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"unsupported WAV sample format: $fmt"
          )
          val frames = ais.getFrameLength.toInt
          val bytes = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < bytes.length) {
            val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            sum += math.abs(s.toLong)
            i += 2
          }
          val nSamples = bytes.length / 2
          MediaFeatures.PartialFeatures(
            width = frames,
            height = fmt.getSampleRate.toInt,
            channels = fmt.getChannels,
            meanLuma =
              if (nSamples == 0) 0.0 else sum.toDouble / nSamples / 32768.0
          )
        } finally ais.close()
      case _ => FakeCodec.decode(mime, blob)
    }
  }

  /** Synthesize REAL media blobs (even ids: PNG, odd ids: WAV), encoded
    * executor-side with the same pure-JDK libraries [[JdkCodec]] decodes
    * with. Every decoded feature is a pure function of the id, so an
    * external oracle can re-derive the whole decode output from id
    * arithmetic alone — decoding these blobs proves the codec is real:
    *   - PNG: (8 + id%16) x (8 + (id/16)%16), RGB, all pixels the constant
    *     gray id%256 (mean sample == id%256 exactly);
    *   - WAV: 800 + (id%5)*160 frames, 8 kHz, 1 + (id/2)%2 channels,
    *     16-bit PCM with every sample == id%16384 (mean |sample|/32768 ==
    *     (id%16384)/32768, exact — a power-of-two division).
    */
  def realMediaBlobs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String
  ): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions(_.map { id =>
        if (id % 2 == 0) (id, "image/png", synthPng(id))
        else (id, "audio/wav", synthWav(id))
      })
      .toDF("media_id", "mime", "blob")
  }

  private[ops] def synthPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + ((id / 16) % 16).toInt
    val g = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[ops] def synthWav(id: Long): Array[Byte] = {
    val frames = 800 + (id % 5).toInt * 160
    val channels = 1 + ((id / 2) % 2).toInt
    val s = (id % 16384).toInt
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < data.length) {
      data(i) = (s & 0xff).toByte
      data(i + 1) = ((s >> 8) & 0xff).toByte
      i += 2
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem
      .write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
