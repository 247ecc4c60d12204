package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video carried as opaque `binary`
  * columns with typed metadata, decoded / feature-extracted partition-wise.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch iteration —
  * and so is the IMAGE decode: PNG/BMP payloads (probed by magic bytes) go
  * through `javax.imageio` (in the JDK) to exact integer image statistics.
  * Other modalities (audio/video codecs don't ship in this container) keep
  * a deterministic byte-derived fallback vector; swap that arm of
  * `decodeOne` for a real codec (e.g. via JNI or a sidecar process pool)
  * without touching the dataflow.
  *
  * Scale notes: payloads stay columnar in Parquet (binary column, never
  * driver-collected); decode runs inside mapPartitions so each task
  * amortizes codec init across its whole partition; feature extraction
  * emits fixed-width vectors so downstream similarity ops (Similarity.scala)
  * apply unchanged.
  */
object Multimodal {

  /** Typed record for a media row: payload + metadata. */
  case class MediaRecord(
      media_id: Long,
      format: String,        // e.g. "txt", "png", "wav"
      payload: Array[Byte],
      n_bytes: Long)

  case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      checksum: String,
      features: Array[Float]) // fixed-width feature vector

  /** Attach a binary payload column + metadata struct to a text table —
    * the text modality of the multimodal schema (documents fixture). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("txt").as("format"),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** PNG / BMP magic-byte probe — decode is content-driven, so a lying
    * `format` tag can't route garbage into the codec or images around it. */
  private def looksRaster(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
        b(3) == 'G'.toByte) ||
        (b(0) == 'B'.toByte && b(1) == 'M'.toByte))

  /** RIFF/WAVE magic-byte probe. */
  private def looksWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
      b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
      b(10) == 'V'.toByte && b(11) == 'E'.toByte

  /** Real WAV decode via `javax.sound.sampled` (in the JDK): header-derived
    * format fields plus exact integer sample statistics. Only 16-bit
    * signed little-endian PCM is claimed; anything else falls back to the
    * byte stub rather than guessing. Features:
    * [sampleRate, channels, bits, frames, minSample, maxSample, sampleSum,
    * firstSample] — all integers, exact in Float at these magnitudes. */
  private def decodeWav(bytes: Array[Byte]): Option[Array[Float]] = try {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val ok = fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
      fmt.getChannels == 1
    if (!ok) None
    else {
      val pcm = ais.readAllBytes()
      val frames = pcm.length / 2
      var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L; var s0 = 0
      var i = 0
      while (i < frames) {
        val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
        if (i == 0) s0 = s
        if (s < mn) mn = s
        if (s > mx) mx = s
        sum += s
        i += 1
      }
      if (frames == 0) None
      else Some(Array(fmt.getSampleRate, fmt.getChannels.toFloat, 16f,
        frames.toFloat, mn.toFloat, mx.toFloat, sum.toFloat, s0.toFloat))
    }
  } catch {
    case _: java.io.IOException => None
    case _: javax.sound.sampled.UnsupportedAudioFileException => None
  }

  /** Decode one media record. Raster payloads (PNG/BMP by magic bytes) go
    * through a REAL decoder — `javax.imageio` ships in the JDK, so no new
    * dependency — producing exact integer image statistics:
    * [width, height, bands, meanR, meanG, meanB, minLum, maxLum]
    * (means are integer-division sums, lum = (r+g+b)/3 — all integer math,
    * so the features are engine-reproducible and oracle-checkable).
    * WAV payloads decode through `javax.sound.sampled` the same way
    * ([[decodeWav]]). Non-media payloads (e.g. the text modality) and
    * undecodable bytes keep the deterministic byte-derived fallback. */
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val checksum = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val decoded: Option[Array[Float]] =
      if (looksWav(bytes)) decodeWav(bytes)
      else if (!looksRaster(bytes)) None
      else try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val bands = img.getRaster.getNumBands
            var sr = 0L; var sg = 0L; var sb = 0L
            var minL = 256L; var maxL = -1L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val cr = (rgb >> 16) & 0xff; val cg = (rgb >> 8) & 0xff
                val cb = rgb & 0xff
                sr += cr; sg += cg; sb += cb
                val lum = (cr + cg + cb) / 3L
                if (lum < minL) minL = lum
                if (lum > maxL) maxL = lum
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Array(w.toFloat, h.toFloat, bands.toFloat,
              (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
              minL.toFloat, maxL.toFloat)
          }
      } catch { case _: java.io.IOException => None }
    val feats = decoded.getOrElse(
      Array.tabulate(8)(i =>
        if (bytes != null && i < bytes.length) (bytes(i) & 0xff).toFloat / 255f
        else 0f))
    MediaFeatures(r.media_id, r.format, r.n_bytes, checksum, feats)
  }

  /** Partition-wise decode + feature extraction. Codec init happens once
    * per partition (where a real decoder would allocate its context). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // per-partition codec context would be created here
      it.map(decodeOne)
    }
  }

  /** End-to-end: documents -> typed media records -> features DataFrame. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = withPayload(docs, "doc_id", "text").as[MediaRecord]
    decodeFeatures(media).toDF()
  }

  /** Deterministic solid-color PNG — the synthetic image modality (no image
    * fixtures ship in the warehouse, so gated queries derive pixels from
    * ids). Solid color makes every decoded statistic exact arithmetic over
    * the generator parameters, which is what lets DuckDB oracle-check a
    * REAL ImageIO decode without being able to decode PNGs itself. */
  def syntheticPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Id-keyed synthetic image record; the parameter formulas are mirrored
    * verbatim by the q98 oracle (MultimodalOps). */
  def syntheticImageRecord(id: Long): MediaRecord = {
    val payload = syntheticPng(
      8 + (id % 8).toInt, 8 + (id % 5).toInt,
      (id % 256).toInt, ((id * 7) % 256).toInt, ((id * 13) % 256).toInt)
    MediaRecord(id, "png", payload, payload.length.toLong)
  }

  /** Deterministic 16-bit mono PCM WAV — the synthetic audio modality.
    * The RIFF header is hand-rolled (canonical 44-byte PCM layout), so the
    * generator shares no code with the `javax.sound` decoder under test.
    * Sample i is the integer pseudo-sequence `(i*37 + id) % 2001 - 1000`,
    * which a SQL oracle replays with pure list arithmetic. */
  def syntheticWav(id: Long, sampleRate: Int = 8000): Array[Byte] = {
    val frames = 64 + 2 * (id % 32).toInt
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (((i.toLong * 37 + id) % 2001) - 1000).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                      // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)    // byte rate
      .putShort(2).putShort(16)                     // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  /** Id-keyed synthetic audio record; formulas mirrored by the q99 oracle. */
  def syntheticWavRecord(id: Long): MediaRecord = {
    val payload = syntheticWav(id)
    MediaRecord(id, "wav", payload, payload.length.toLong)
  }

  /** One sampled frame of a media payload. */
  case class FrameRecord(
      media_id: Long,
      frame_idx: Long,  // index in the ORIGINAL frame sequence
      frame: Array[Byte],
      frame_bytes: Long)

  /** STUB frame sampling (video modality): treat the payload as a sequence
    * of fixed-size pseudo-frames, keep every `everyNth` frame up to
    * `maxFrames`. A real decoder would demux/seek keyframes inside the same
    * flatMap — the dataflow (typed rows out, one per frame, partition-wise,
    * nothing driver-side) is the production shape. Deterministic, so the
    * per-media frame COUNTS are oracle-checkable from n_bytes alone. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   everyNth: Int, maxFrames: Int): Dataset[FrameRecord] = {
    require(frameBytes > 0 && everyNth > 0 && maxFrames > 0,
      s"frameBytes=$frameBytes, everyNth=$everyNth, maxFrames=$maxFrames must be positive")
    implicit val enc = org.apache.spark.sql.Encoders.product[FrameRecord]
    media.flatMap { r =>
      // null payload (e.g. NULL source text) samples nothing — same row the
      // metadata oracle drops via n_bytes. Long math: byte arrays can reach
      // 2^31-1, where (len + frameBytes - 1) overflows Int.
      if (r.payload == null) Iterator.empty
      else {
        val nChunks = ((r.payload.length.toLong + frameBytes - 1) / frameBytes).toInt
        Iterator.range(0, nChunks, everyNth)
          .take(maxFrames)
          .map { i =>
            val from = i * frameBytes
            val until = math.min(from.toLong + frameBytes, r.payload.length).toInt
            FrameRecord(r.media_id, i.toLong,
              java.util.Arrays.copyOfRange(r.payload, from, until),
              (until - from).toLong)
          }
      }
    }
  }

  /** STUB resize (image modality): normalize every payload to exactly
    * `targetBytes` (truncate or zero-pad) — the fixed-resolution analog; a
    * real implementation decodes, scales, re-encodes in the same
    * partition-wise map. Output schema/metadata stay consistent with
    * [[MediaRecord]] so downstream ops are unchanged. */
  def resized(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRecord]
    media.mapPartitions { it =>
      // per-partition codec context would be created here
      it.map { r =>
        if (r.payload == null) r // null media passes through undecoded
        else r.copy(
          payload = java.util.Arrays.copyOf(r.payload, targetBytes),
          n_bytes = targetBytes.toLong)
      }
    }
  }
}
