package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named queries to files —
  * the plans/r{N}/<query>_{before,after}.txt evidence the optimization
  * rounds commit. Usage:
  *   runMain graft.PlanText <sfDir> <outDir> <suffix> <name1,name2,...>
  * Writes <outDir>/<name>_<suffix>.txt per query. The dump is the
  * FINAL frame's physical plan; composite lifecycle queries that
  * materialize bounded results driver-side show a LocalRelation tail —
  * for those the interesting evidence is the per-stage code + bench
  * delta, noted in OPTIMIZATION_r*.md. */
object PlanText {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args.take(4)
    val names = namesCsv.split(",").toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.allQueries.filter(q => names(q.name)).foreach { q =>
      try {
        val df = q.bench(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q.name}_$suffix.txt"),
          formatted)
        println(s"[plantext] wrote ${q.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plantext] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
