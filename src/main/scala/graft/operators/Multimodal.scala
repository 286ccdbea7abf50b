package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition (mapPartitions — the Scala
  * analog of mapInPandas batch shape), frame sampling is a pure
  * projection.
  *
  * The actual media decode is STUBBED with a deterministic byte-level
  * fake (no image/audio libs in this environment); the Spark-side
  * plumbing — schema, binary handling, partition batching, feature
  * fan-out — is real and oracle-tested. Swap `FakeByteDecoder` for a
  * real decoder (JNI/javacv) without touching the pipeline.
  */
object Multimodal {

  case class MediaFeatures(media_id: Long, byte_len: Long, byte_sum: Long,
                           h0: Long, h1: Long, h2: Long, h3: Long)

  /** Deterministic stand-in for a media decoder: length, byte sum, and
    * a 4-bin histogram of the top-2 bits of each byte. */
  object FakeByteDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      var sum = 0L
      val bins = new Array[Long](4)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        bins(b >> 6) += 1
        i += 1
      }
      MediaFeatures(id, bytes.length.toLong, sum, bins(0), bins(1), bins(2), bins(3))
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
