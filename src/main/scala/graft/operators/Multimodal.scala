package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode/resize are REAL: `javax.imageio` (JDK built-in — PNG, JPEG,
  * BMP, GIF) decodes inside the same iterator-per-partition loop a
  * vectorized/arrow codec pipeline runs in, and resize is a genuine
  * nearest-neighbor resample + PNG re-encode. Video ships as a
  * length-prefixed PNG frame-sequence container (`video/x-frameseq`) so the
  * per-frame path exercises the same real codec; production video/audio
  * formats need an external codec binding (ffmpeg JNI etc.) wired into the
  * same [[decode]] seam — this container ships none, and such media decodes
  * to None rather than fake numbers.
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
      frames: Int,
      channel_sum: Long)

  /** Decoded media: dimensions, frame count, and the sum of all RGB channel
    * values over every pixel of every frame — the "pixel checksum" that
    * pins the decode end-to-end (a codec that returns the right dims but
    * wrong pixels fails it).
    */
  final case class Decoded(width: Int, height: Int, frames: Int, channelSum: Long)

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

  // ----------------------------------------------------------------- codecs

  /** Deterministic solid-color PNG — the fixture-derivation encoder (the
    * driver fixtures carry no image bytes, so queries/tests synthesize
    * real PNGs with closed-form expected decode results).
    */
  def syntheticPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0, "syntheticPng needs positive dims")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Length-prefixed concatenation of per-frame images — the
    * `video/x-frameseq` container (each frame is a REAL encoded image).
    */
  def frameSeq(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  private def splitFrameSeq(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val frames = Seq.newBuilder[Array[Byte]]
    while (in.available() >= 4) {
      val n = in.readInt()
      if (n < 0 || n > in.available()) return frames.result() // truncated tail
      val buf = new Array[Byte](n)
      in.readFully(buf)
      frames += buf
    }
    frames.result()
  }

  private def channelSumOf(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val c = img.getRGB(x, y)
        sum += ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** REAL decode. image types → javax.imageio; `video/x-frameseq` → per-frame
    * javax.imageio (dims from the first frame, channel sum over all).
    * Undecodable bytes or media types this container has no codec for
    * (real video containers, audio) → None — never fabricated numbers.
    */
  def decode(mediaType: String, bytes: Array[Byte]): Option[Decoded] =
    mediaType match {
      case t if t.startsWith("image") =>
        Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          .map(img => Decoded(img.getWidth, img.getHeight, 1, channelSumOf(img)))
      case "video/x-frameseq" =>
        val imgs = splitFrameSeq(bytes)
          .flatMap(f => Option(ImageIO.read(new ByteArrayInputStream(f))))
        imgs.headOption.map(h =>
          Decoded(h.getWidth, h.getHeight, imgs.size, imgs.map(channelSumOf).sum))
      case _ => None
    }

  /** Feature extraction over the binary column: runs per partition over an
    * iterator of rows — the decode-batch shape, with the real codec inside
    * the loop. Undecodable media keeps its metadata (size, checksum) with
    * zeroed decode fields.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val d = decode(r.media_type, r.media).getOrElse(Decoded(0, 0, 0, 0L))
          MediaFeatures(
            media_id = r.media_id,
            media_type = r.media_type,
            n_bytes = r.media.length.toLong,
            checksum = java.security.MessageDigest.getInstance("MD5")
              .digest(r.media).map("%02x".format(_)).mkString,
            width = d.width, height = d.height, frames = d.frames,
            channel_sum = d.channelSum)
        }
      }
  }

  /** Frame sampling for video-typed rows: every `stride`-th frame index up
    * to the decoded frame count — pure plan-side arithmetic once frames is
    * known (posexplode keeps it distributed).
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("media_type").startsWith("video") && col("frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frame_idx"))

  // ------------------------------------------------------------------ audio

  /** A minimal-but-real PCM16 mono/stereo WAV: RIFF header + `fmt ` chunk +
    * `data` chunk (the public RIFF/WAVE layout) — the synthesis half of the
    * audio leg, so [[audioMeta]] parses genuine WAV bytes.
    */
  def syntheticWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  final case class AudioMeta(
      media_id: Long, sample_rate: Long, channels: Long, n_samples: Long,
      duration_ms: Long, amp_sum: Long)

  /** REAL RIFF/WAVE parse per partition (the audio twin of
    * [[extractFeatures]]): chunk walk to `fmt ` (channels, sample rate,
    * bits) and `data` (frame count = bytes / block align), integer
    * duration, and the sum of |sample| over all PCM16 samples — the "pixel
    * checksum" of the audio path (a parser that returns the right header
    * but misreads samples fails it). Non-WAV or non-PCM16 bytes → honest
    * zeros, same contract as the image/video decode.
    */
  def audioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("media")).as[MediaRow]
      .mapPartitions(_.map { r =>
        parseWav(r.media) match {
          case Some((rate, ch, n, amp)) =>
            AudioMeta(r.media_id, rate, ch, n, n * 1000L / rate, amp)
          case None => AudioMeta(r.media_id, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** (sampleRate, channels, nSamples, Σ|sample|) of a PCM16 WAV, or None. */
  private def parseWav(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    parseWavSamples(bytes).map { case (rate, channels, samples) =>
      var amp = 0L
      var i = 0
      while (i < samples.length) { amp += math.abs(samples(i).toLong); i += 1 }
      (rate, channels, samples.length / channels, amp)
    }

  /** (sampleRate, channels, interleaved PCM16 samples) of a WAV, or None:
    * RIFF chunk walk to `fmt ` (PCM16 only) and `data`.
    */
  private def parseWavSamples(bytes: Array[Byte]): Option[(Long, Long, Array[Short])] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    if (fourcc() != "RIFF") return None
    bb.getInt // riff size (trust the actual buffer instead)
    if (fourcc() != "WAVE") return None
    var rate = 0L; var channels = 0L; var bits = 0; var fmtSeen = false
    while (bb.remaining() >= 8) {
      val id = fourcc(); val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None
      if (id == "fmt ") {
        val start = bb.position()
        val audioFormat = bb.getShort
        channels = bb.getShort.toLong
        rate = bb.getInt.toLong
        bb.getInt; bb.getShort // byte rate, block align
        bits = bb.getShort.toInt
        if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0) return None
        fmtSeen = true
        bb.position(start + size + (size & 1)) // chunks pad to even
      } else if (id == "data") {
        if (!fmtSeen) return None
        val n = (size / (channels * 2)).toInt * channels.toInt
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = bb.getShort; i += 1 }
        return Some((rate, channels, samples))
      } else bb.position(bb.position() + size + (size & 1))
    }
    None
  }

  final case class AudioSegmentQuality(
      media_id: Long, segment: Long, seg_samples: Long, mean_sq: Long,
      silence_permille: Long)

  /** Windowed audio-quality signals (x63) — the curation gate of the audio
    * leg, the way x38/x49/x56 gate text: the interleaved PCM16 stream is
    * cut into segments of `window` samples (last partial segment kept) and
    * each emits its mean square power (`Σ s² DIV n` — the RMS² without the
    * root, so everything stays EXACT integer arithmetic; threshold on
    * power² instead of power downstream) and its silence ratio in permille
    * (samples with |s| ≤ `silenceThreshold`, `· 1000 DIV n`). Long stretches
    * of near-zero power ⇒ dead air; uniform max power ⇒ clipping — both
    * flaggable with integer predicates over these rows. Runs in the same
    * iterator-per-partition codec loop as [[audioMeta]], one flatMap, no
    * shuffle: O(total samples) work distributed over the media rows.
    * Non-WAV / non-PCM16 payloads emit NO rows (a segment row with made-up
    * power would poison downstream aggregates; absence is honest).
    */
  def audioQuality(
      spark: SparkSession, media: DataFrame,
      window: Int = 1024, silenceThreshold: Int = 512): Dataset[AudioSegmentQuality] = {
    require(window > 0, "audioQuality window must be positive")
    require(silenceThreshold >= 0, "audioQuality silenceThreshold must be >= 0")
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("media")).as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        parseWavSamples(r.media) match {
          case None => Iterator.empty
          case Some((_, _, samples)) =>
            samples.grouped(window).zipWithIndex.map { case (seg, gi) =>
              val n = seg.length.toLong
              var sumSq = 0L
              var silent = 0L
              var i = 0
              while (i < seg.length) {
                val v = seg(i).toLong
                sumSq += v * v
                if (math.abs(v) <= silenceThreshold) silent += 1
                i += 1
              }
              AudioSegmentQuality(r.media_id, gi.toLong, n, sumSq / n, silent * 1000L / n)
            }
        }
      })
  }

  /** x38-style boolean quality gate over [[audioQuality]]'s segment rows
    * (x65) — the documented audio admission rule instead of ad-hoc
    * predicates: per media row, the permille of segments that are SILENT
    * (segment silence_permille ≥ `segmentSilencePermille` — dead air), the
    * permille that are CLIPPED (segment mean square ≥ `clipMeanSq` —
    * sustained near-full-swing power), and the mean segment power; the row
    * passes when silence ≤ `maxSilentPermille`, clipping ≤
    * `maxClipPermille`, and mean power ≥ `minMeanPower`. One grouped
    * aggregate over the segment rows (map-side combined), all integer
    * arithmetic — exactly reproducible, closed-form oracle-able. Media
    * that decodes to NO segments (non-WAV) simply has no gate row:
    * admission of undecodable media is a routing decision, not a quality
    * score.
    */
  def audioGate(
      spark: SparkSession, media: DataFrame,
      window: Int = 1024, silenceThreshold: Int = 512,
      segmentSilencePermille: Long = 900,
      maxSilentPermille: Long = 500,
      clipMeanSq: Long = 900000000L,
      maxClipPermille: Long = 100,
      minMeanPower: Long = 1000000L): DataFrame =
    audioQuality(spark, media, window, silenceThreshold).toDF()
      .groupBy("media_id")
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("silence_permille") >= segmentSilencePermille, 1L)
          .otherwise(0L)).as("n_silent"),
        sum(when(col("mean_sq") >= clipMeanSq, 1L).otherwise(0L)).as("n_clip"),
        sum(col("mean_sq")).as("sum_sq"))
      .select(col("media_id"), col("n_segments"),
        expr("n_silent * 1000 DIV n_segments").as("silent_permille"),
        expr("n_clip * 1000 DIV n_segments").as("clip_permille"),
        expr("sum_sq DIV n_segments").as("mean_power"))
      .withColumn("pass",
        col("silent_permille") <= maxSilentPermille &&
          col("clip_permille") <= maxClipPermille &&
          col("mean_power") >= minMeanPower)

  final case class ResizedRow(
      media_id: Long,
      media_type: String,
      media: Array[Byte],
      width: Int,
      height: Int)

  /** REAL resize: decode → nearest-neighbor resample onto a target-sized
    * RGB raster → PNG re-encode. Deterministic (integer source-pixel
    * mapping, no interpolation rounding).
    */
  def resizePng(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { src =>
      val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        val sy = (y.toLong * src.getHeight / targetH).toInt
        var x = 0
        while (x < targetW) {
          val sx = (x.toLong * src.getWidth / targetW).toInt
          dst.setRGB(x, y, src.getRGB(sx, sy) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }

  /** Batch resize of image-typed rows to fixed dimensions — the
    * iterator-per-partition decode-resize-encode pipeline, all real.
    * Non-image rows (and undecodable payloads) pass through untouched with
    * whatever dims their decode yields (0 when none).
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val resized =
            if (r.media_type.startsWith("image")) resizePng(r.media, targetW, targetH)
            else None
          resized match {
            case Some(bytes) => ResizedRow(r.media_id, r.media_type, bytes, targetW, targetH)
            case None =>
              val d = decode(r.media_type, r.media).getOrElse(Decoded(0, 0, 0, 0L))
              ResizedRow(r.media_id, r.media_type, r.media, d.width, d.height)
          }
        }
      }
  }
}
