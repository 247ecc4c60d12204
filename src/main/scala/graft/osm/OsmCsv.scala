package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Pinned-column-order CSV sink/source (SURVEY.md §2.1 S3/S4).
  *
  * Matches the reference's writer behavior: header row, UTF-8, minimal
  * quoting, ISO-8601 `Z` timestamps (ways.csv:2), field order from
  * OsmModel.columnOrder (py:91).
  */
object OsmCsv {

  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** pythonCsvDialect=true reproduces the reference writer BYTE-exactly:
    * Python's csv module terminates rows with \r\n (its default
    * lineterminator), while Spark's default is \n. Quoting semantics
    * (minimal quoting, quotes escaped by doubling) already match, asserted
    * byte-for-byte against the committed golden files in GoldenWaysSpec. */
  def write(df: DataFrame, path: String, table: String,
            pythonCsvDialect: Boolean = false): Unit =
    df.select(OsmModel.columnOrder(table).map(col): _*)
      .write.mode("overwrite")
      .option("header", true)
      .option("timestampFormat", TsFormat)
      .option("emptyValue", "")
      // Python csv dialect (the reference writer): quotes escaped by
      // doubling (RFC 4180), not backslash.
      .option("escape", "\"")
      // Spark's writer trims field whitespace by default; Python's csv
      // writer never does — keep values verbatim
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .option("lineSep", if (pythonCsvDialect) "\r\n" else "\n")
      .csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", true)
      .option("timestampFormat", TsFormat)
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
}
