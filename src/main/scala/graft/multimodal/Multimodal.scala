package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video carried as opaque `binary`
  * columns with typed metadata, decoded / feature-extracted partition-wise.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch iteration —
  * while the actual media decode is a STUB (no image/audio libs in this
  * container): `stubDecodeFeatures` derives a deterministic fake feature
  * vector from the payload bytes. Swap `decodeOne` for a real codec (e.g.
  * via JNI or an sidecar process pool) without touching the dataflow.
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

  /** STUB decode: deterministic fake features from payload bytes (first 8
    * bytes, scaled). Replace with a real codec for non-text media. */
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val feats = Array.tabulate(8)(i =>
      if (i < bytes.length) (bytes(i) & 0xff).toFloat / 255f else 0f)
    val checksum = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
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
