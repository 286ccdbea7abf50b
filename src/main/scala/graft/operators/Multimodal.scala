package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition (mapPartitions — the Scala
  * analog of mapInPandas batch shape), frame sampling is a pure
  * projection.
  *
  * Two decode tiers share the plumbing:
  *  - [[MediaCodec]] — REAL pure-JDK decodes: PNG via `javax.imageio`
  *    (zlib inflate + defilter) and WAV via `javax.sound.sampled`
  *    (RIFF parse), wired below as [[pngMedia]]/[[imageFeatures]] and
  *    [[wavMedia]]/[[audioFeatures]]. Features come from decoded
  *    pixels/PCM frames, oracle-verified.
  *  - [[FakeByteDecoder]] — byte-level payload statistics for formats
  *    with no in-JVM decoder (video, proprietary codecs): treats the
  *    payload as opaque bytes; swap in a JNI/javacv decoder without
  *    touching the pipeline.
  */
object Multimodal {

  /** Stats are Option-typed: a NULL payload (upstream text/blob was
    * NULL — real corpora carry those) yields a row of NULL features,
    * matching SQL null-propagation, instead of a task-killing NPE
    * (found by the r17 nullify metamorphic sweep). */
  case class MediaFeatures(media_id: Long, byte_len: Option[Long],
                           byte_sum: Option[Long], h0: Option[Long],
                           h1: Option[Long], h2: Option[Long], h3: Option[Long])

  /** Deterministic stand-in for a media decoder: length, byte sum, and
    * a 4-bin histogram of the top-2 bits of each byte. */
  object FakeByteDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null)
        return MediaFeatures(id, None, None, None, None, None, None)
      var sum = 0L
      val bins = new Array[Long](4)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        bins(b >> 6) += 1
        i += 1
      }
      MediaFeatures(id, Some(bytes.length.toLong), Some(sum), Some(bins(0)),
        Some(bins(1)), Some(bins(2)), Some(bins(3)))
    }
  }

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * the text, metadata struct carries declared dimensions/format. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit("fake/raw").as("format")).as("meta"))

  /** Batched feature extraction over the binary column. Partition-
    * parallel, no shuffle; the decoder sees raw bytes exactly as a
    * real decoder would. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeByteDecoder.decode(id, bytes) })
  }

  /** The id scan is a pruned single-column parquet read — a few hundred
    * KB that Spark packs into ONE split, which would serialize the
    * expensive per-row codec work behind it onto one core (measured:
    * the whole sf1 JPEG family CPU is ~6 s, but ran on 1 task). One
    * tiny shuffle of the bare ids buys full-cluster parallelism for
    * the codec stage — the shape a 100 TB media pipeline needs, where
    * compute per row dwarfs row width. */
  private def spread(spark: SparkSession, ids: DataFrame, idCol: String) = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** Id-keyed REAL PNG payload table (media_id, content): each row's
    * binary column is a genuine zlib-compressed PNG whose pixels are
    * the oracle-shared generator function. Partition-parallel encode. */
  def pngMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    spread(spark, ids, idCol)
      .mapPartitions(_.map(id => (id, MediaCodec.encodePng(id))))
      .toDF("media_id", "content")
  }

  /** Real image decode over the binary column: `javax.imageio` PNG
    * inflate per row, features from the decoded raster only. */
  def imageFeatures(spark: SparkSession,
      media: DataFrame): Dataset[MediaCodec.ImageFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => MediaCodec.decodePngFeatures(id, b) })
  }

  /** Id-keyed REAL JPEG payload table (media_id, content): each row a
    * genuine baseline JPEG (quality 1.0, block-constant gray — the
    * exact-roundtrip family, see [[MediaCodec.jpegBlockValue]]). */
  def jpegMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    spread(spark, ids, idCol)
      .mapPartitions(_.map(id => (id, MediaCodec.encodeJpeg(id))))
      .toDF("media_id", "content")
  }

  /** Id-keyed varying-JPEG payload table (media_id, content): the
    * NON-block-constant family ([[MediaCodec.jpegVaryingValue]]) whose
    * every 8×8 block carries real AC coefficients. */
  def jpegVaryingMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    spread(spark, ids, idCol)
      .mapPartitions(_.map(id => (id, MediaCodec.encodeJpegVarying(id))))
      .toDF("media_id", "content")
  }

  /** Decode varying JPEGs and emit the tolerance-band verdict as data
    * — same partition-parallel zero-shuffle shape as [[imageFeatures]]. */
  def jpegBandedFeatures(spark: SparkSession,
      media: DataFrame): Dataset[MediaCodec.JpegBandFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => MediaCodec.decodeJpegBanded(id, b) })
  }

  /** Id-keyed REAL WAV payload table (media_id, content): 16-bit PCM
    * mono in a genuine RIFF container. */
  def wavMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    spread(spark, ids, idCol)
      .mapPartitions(_.map(id => (id, MediaCodec.encodeWav(id))))
      .toDF("media_id", "content")
  }

  /** Real audio decode over the binary column: JDK RIFF/fmt-chunk
    * parse per row, features from the decoded PCM frames only. */
  def audioFeatures(spark: SparkSession,
      media: DataFrame): Dataset[MediaCodec.AudioFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => MediaCodec.decodeWavFeatures(id, b) })
  }

  /** Frame sampling for a "video" payload: fixed-size frames, keep
    * every `every`-th, as a pure projection (sequence + transform +
    * explode — fully codegen, no driver loop). */
  def sampleFrames(media: DataFrame, frameSize: Int, every: Int): DataFrame =
    media
      .withColumn("frame_idx",
        // empty payloads produce zero frames (sequence(0,-1) would throw)
        explode(when(length(col("content")) > 0,
            expr(s"sequence(0, CAST(floor((length(content) - 1) / $frameSize) AS INT), $every)"))
          .otherwise(array().cast("array<int>"))))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(content, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
      .withColumn("frame_len", length(col("frame")).cast("long"))
      .withColumn("frame_hash", md5(col("frame")))
      .drop("frame")
}
