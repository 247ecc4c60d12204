package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: q151 wall time vs streaming state-partition count (the
  * round-14 verdict's one unadjudicated mover). Stream-stream joins
  * create one state store per shuffle partition per micro-batch; at a
  * bounded 100k-row replay the store setup/commit overhead dominates,
  * so the partition count IS the knob. Results → BASELINE.md. */
object Probe151 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (parts <- Seq("32", "8", "2")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName(s"probe151-$parts").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val q = SparkEntry.allQueries.find(_.name == "q151_stream_stream_join").get
      q.run(spark, "/root/testdata/sf0.001").count() // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE151 parts=$parts%-3s min=${times.min}%6.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
    }
  }
}
