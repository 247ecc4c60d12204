package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.11 / §7.4).
  *
  * Design rule: every transform is written against a plain DataFrame so the
  * SAME function runs in batch (oracle-checkable, see WindowingOps) and
  * behind `readStream` (incremental with watermark + state). That is the
  * Spark-native generalization of the reference's incremental-but-batch
  * iterparse pipeline (py:179–186): stateless shape/clean transforms are
  * streaming-safe as-is.
  */
object EventStreams {

  /** Tumbling-window counts + exact value sum. Batch and streaming. */
  def tumbling(events: DataFrame, dur: String): DataFrame =
    events
      .groupBy(window(col("ts"), dur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))

  /** Sliding-window counts (each event lands in windowDur/slideDur windows). */
  def sliding(events: DataFrame, windowDur: String, slideDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur, slideDur))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
      .select(col("window.start").as("ws"), col("n"), col("sum_v"))

  /** Session windows per user with a fixed inactivity gap. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** File-source stream of event parquet (same schema as the batch table).
    * `maxFilesPerTrigger` bounds per-micro-batch work at scale. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // events fixtures carry TIMESTAMP(NANOS) — see Tables.t
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    // FileStreamSource requires a directory or glob; a single-file fixture
    // path is wrapped in a {name} glob so its parent becomes the basePath.
    // Glob metacharacters in the file name are escaped, otherwise a name
    // like part-[0].parquet silently matches nothing (or the wrong files).
    val f = new java.io.File(dir)
    val path =
      if (f.isFile) s"${f.getParent}/{${f.getName.replaceAll("([{}\\[\\]*?,\\\\])", "\\\\$1")}}"
      else dir
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
    // same micros conversion Tables.t applies to the batch table, so
    // watermarks / event-time windows see a real TimestampType column
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Watermarked streaming tumbling aggregation: drops events later than
    * the watermark; append-mode emits a window only once it is final. */
  def tumblingWithWatermark(stream: DataFrame, dur: String, watermark: String): DataFrame =
    tumbling(stream.withWatermark("ts", watermark), dur)

  /** Stream-stream interval join: purchases joined to the clicks of the
    * same user within the preceding `window`. Both sides watermarked so
    * join state is bounded — the required shape for unbounded stream-stream
    * joins (state eviction needs both the watermark and the time-range
    * predicate). Works identically on batch frames. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
                        watermark: String, window: String): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
  }

  /** Streaming exact dedup: drop re-deliveries of the same id, with state
    * bounded by the watermark (late duplicates beyond it age out of state —
    * the only way dedup state stays finite over an unbounded stream). */
  def dedupedStream(stream: DataFrame, idCol: String, watermark: String): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  // ---- custom state: typed sessionization via flatMapGroupsWithState ----

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, start: java.sql.Timestamp,
                        durationMs: Long, n_events: Int)

  /** Custom stateful sessionization (KeyValueGroupedDataset +
    * flatMapGroupsWithState with processing-time timeout). Demonstrates the
    * arbitrary-state API; the declarative `sessions` above is preferred
    * where the gap semantics suffice. */
  def statefulSessions(spark: SparkSession, events: DataFrame,
                       gapMs: Long): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_type")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // Batch mode: iterate the user's events in time order, emitting a
          // session whenever the gap is exceeded. Streaming mode keeps the
          // open session in `state` across micro-batches.
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var cur = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            if (cur == null) cur = SessionState(t, t, 1)
            else if (t - cur.last >= gapMs) {
              out += SessionOut(uid, new java.sql.Timestamp(cur.start),
                cur.last - cur.start, cur.n)
              cur = SessionState(t, t, 1)
            } else cur = SessionState(cur.start, t, cur.n + 1)
          }
          if (cur != null) {
            state.update(cur)
            // In batch mode nothing further arrives: close the open session.
            out += SessionOut(uid, new java.sql.Timestamp(cur.start),
              cur.last - cur.start, cur.n)
          }
          out.iterator
      }.toDF()
  }
}
