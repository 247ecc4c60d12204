package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time q134 at an arbitrary SF (not part of the spec suite). */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.allQueries.find(_.name == "q134_bpe_merges").get
    q.run(spark, "/root/testdata/sf0.001").count() // warm codegen
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      println(f"q134 pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
