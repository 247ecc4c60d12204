package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: wall time of the stateful streaming gates at sf0.1 under
  * the bench session shape (local[32], 32 shuffle partitions) — the
  * family the round-15 state-partition sizing targets. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q82_stream_tumbling", "q90_stream_dedup",
        "q110_stream_contamination", "q151_stream_stream_join",
        "q203_stream_hll")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.allQueries.filter(q => names.contains(q.name))
    qs.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"warm ${q.name}: ${e.getMessage}") }
    }
    for (q <- qs) {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, "/root/testdata/sf0.1").count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBESTREAM ${q.name}%-32s min=${runs.min}%6.2fs")
    }
    spark.stop()
  }
}
