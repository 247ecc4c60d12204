package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the library surface): prints the executed plan of
  * one named gated query plus timing — used to audit exchange reuse and
  * re-measure individual queries between bench rounds. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q39_ngram_jaccard")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // warm codegen + finalize AQE on this exact instance
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
