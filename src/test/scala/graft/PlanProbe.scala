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
    // optional second arg: timed passes (default 1). Multi-pass medians
    // matter for fixture-heavy families (NSW, release): one warm pass in
    // a fresh JVM doesn't amortize Janino/JIT across their many stages,
    // so a single timed pass reads far above the in-suite steady state.
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(1)
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"rows=$n time=${sec}s")
      sec
    }
    if (passes > 1)
      println(f"median=${times.sorted.apply(passes / 2)}%.3fs min=${times.min}%.3fs")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
