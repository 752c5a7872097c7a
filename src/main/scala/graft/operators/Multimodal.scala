package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape (iterator-per-partition, the same shape a vectorized/arrow decode
  * runs in), checksum/size metadata derived with codegen'd expressions. The
  * actual codec is STUBBED (`decodeStub`): this container ships no
  * image/audio libraries, so decode is a deterministic fake over the bytes;
  * swap `decodeStub` for a real codec binding in production.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media_type: String,
      media: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      frames: Int)

  /** Build a media table from any source with an id and a payload column.
    * Metadata (size, checksum) is computed with expressions at scan time —
    * no decode needed for pruning/statistics queries.
    */
  def toMediaTable(src: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("media"))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
      .withColumn("checksum", md5(col("media")))

  /** STUB — deterministic fake decode standing in for an image/audio codec.
    * Real implementation: decode `bytes` with an actual codec (e.g. a JNI
    * binding) inside the same mapPartitions loop. Kept pure so tests are
    * stable.
    */
  def decodeStub(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    mediaType match {
      case t if t.startsWith("image") => ((n % 640) + 1, (n % 480) + 1, 1)
      case t if t.startsWith("video") => ((n % 640) + 1, (n % 480) + 1, (n % 300) + 1)
      case t if t.startsWith("audio") => (0, 0, (n % 48000) + 1)
      case _ => (0, 0, 0)
    }
  }

  /** Feature extraction over the binary column: runs per partition over an
    * iterator of rows — the decode-batch shape. Everything except the codec
    * call is production-real (encoders, partition sizing left to the caller
    * via `repartition`).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, f) = decodeStub(r.media_type, r.media)
          MediaFeatures(
            media_id = r.media_id,
            media_type = r.media_type,
            n_bytes = r.media.length.toLong,
            checksum = java.security.MessageDigest.getInstance("MD5")
              .digest(r.media).map("%02x".format(_)).mkString,
            width = w, height = h, frames = f)
        }
      }
  }

  /** Frame sampling for video-typed rows: every `stride`-th frame index up
    * to the decoded frame count — pure plan-side arithmetic once frames is
    * known (posexplode keeps it distributed).
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("media_type").startsWith("video"))
      .select(col("media_id"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frame_idx"))

  final case class ResizedRow(
      media_id: Long,
      media_type: String,
      media: Array[Byte],
      width: Int,
      height: Int)

  /** STUB — deterministic fake resize standing in for a real scaler: the
    * payload is resampled byte-wise to the target pixel count so output
    * sizes, schema, and distribution are production-shaped; swap the body
    * for a real codec+scaler binding.
    */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val outLen = math.max(targetW * targetH / 64, 1) // fake bytes-per-pixel packing
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = if (bytes.isEmpty) 0 else bytes((i.toLong * bytes.length / outLen).toInt)
      i += 1
    }
    out
  }

  /** Batch resize of image-typed rows to fixed dimensions — the
    * iterator-per-partition shape a vectorized decode-resize-encode pipeline
    * runs in; only the codec call is stubbed. Non-image rows pass through
    * untouched.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.media_type.startsWith("image")) {
            val (w, h) = (targetW, targetH)
            ResizedRow(r.media_id, r.media_type, resizeStub(r.media, w, h), w, h)
          } else {
            val (w, h, _) = decodeStub(r.media_type, r.media)
            ResizedRow(r.media_id, r.media_type, r.media, w, h)
          }
        }
      }
  }
}
