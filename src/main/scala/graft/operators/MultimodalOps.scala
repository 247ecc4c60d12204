package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked surface of the multimodal plumbing: payload/metadata
  * derivation is pure SQL (byte length, md5 checksum, first-byte probe),
  * so DuckDB can verify it; the mapPartitions decode path is covered by
  * ScalaTest (MultimodalSpec) since a stubbed codec isn't SQL. */
object MultimodalOps {

  val defs: Seq[Q] = Seq(

    Q("q48_multimodal_meta",
      """SELECT doc_id AS media_id, 'txt' AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  ascii(substr(text, 1, 1)) AS first_byte
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Tables.t(s, d, "documents")
        .select(
          col("doc_id").as("media_id"),
          lit("txt").as("format"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
          md5(col("text")).as("checksum"),
          ascii(substring(col("text"), 1, 1)).as("first_byte"))
        .orderBy("media_id")
    }
  )
}
