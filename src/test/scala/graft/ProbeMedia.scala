package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (not a spec): times run vs benchRun for the media decode
  * family at a given SF dir — decides whether payload pre-materialization
  * actually beats inline synthesis. */
object ProbeMedia {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q98_image_decode", "q102_video_frames", "q100_jpeg_decode")
    val qs = SparkEntry.allQueries.filter(q => names.contains(q.name))
    for (q <- qs; which <- Seq("run", "bench"); pass <- 1 to 3) {
      val body = if (which == "run") q.run else q.bench
      val t0 = System.nanoTime()
      body(spark, sfDir).count()
      println(f"[probe] ${q.name}%-20s $which%-5s pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
