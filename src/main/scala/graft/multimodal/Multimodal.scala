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
}
