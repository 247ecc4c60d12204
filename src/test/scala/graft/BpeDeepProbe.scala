package graft

import graft.operators.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (test source set): batched-BPE training at REAL tokenizer
  * depth — wall-clock and Spark-jobs-per-merge at ≥1,024 merges (round-7
  * verdict item 2). Not a spec; results are recorded in BASELINE.md.
  *
  * The driver's `documents` fixture has only 31 distinct word types (138
  * type-chars), which caps its total BPE pair supply at ~107 merges — no
  * parameterization can reach 1k merges on it. The probe therefore
  * derives a supply-rich corpus from the fixture (the ScaleGen move:
  * deterministic transforms of driver data, never hand-written content):
  * each document contributes its original text plus four md5-hex words
  * keyed by doc_id. Hex words are unique per document (Zipf-free worst
  * case for merge reuse) but share the 16-char hex alphabet, so pair
  * counts aggregate corpus-wide exactly as natural text's do; at sf0.1
  * that's ~20k types / ~600k-merge supply.
  *
  * What the numbers mean at 30k merges: jobs-per-merge is the scheduling
  * cost a 1000-executor cluster pays per merge learned (the batched
  * trainer's whole point is driving it below 1 — [[Bpe.mergesBatched]]'s
  * scaladoc); wall-per-merge at fixed batchSize is ~constant once the
  * type table is cached, so total wall extrapolates linearly in passes.
  */
object BpeDeepProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val id = col("doc_id").cast("string")
    val corpus = Tables.t(spark, dir, "documents")
      .select(concat_ws(" ", col("text"),
        md5(id), md5(concat(id, lit("a"))), md5(concat(id, lit("b"))),
        substring(md5(concat(id, lit("c"))), 1, 12)).as("text"))
      .cache()
    val nTypes = corpus
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    println(s"PROBE corpus: $dir derived, $nTypes distinct words")

    def jobsIn(group: String)(body: => Unit): Int = {
      val sc = spark.sparkContext
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }

    // codegen/JIT warmup on the small config so the timed sweep measures
    // execution (the Bench warmup rule)
    Bpe.mergesBatched(corpus, "text", passes = 2, batchSize = 16).count()

    val configs = Seq((8, 16), (16, 32), (32, 32), (64, 32))
    val results = for (((passes, bs), i) <- configs.zipWithIndex) yield {
      var merges = 0L
      val t0 = System.nanoTime()
      val jobs = jobsIn(s"bpe-deep-$i") {
        merges = Bpe.mergesBatched(corpus, "text", passes, bs).count()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBE passes=$passes%3d batch=$bs%3d merges=$merges%5d " +
        f"wall=$wall%7.1fs jobs=$jobs%5d jobs/merge=${jobs.toDouble / merges}%6.3f " +
        f"wall/merge=${wall / merges}%7.4fs")
      (passes, bs, merges, wall, jobs)
    }
    println("PROBE_JSON " + results.map { case (p, b, m, w, j) =>
      s"""{"passes":$p,"batch":$b,"merges":$m,"wall_s":$w,"jobs":$j}"""
    }.mkString("[", ",", "]"))
    spark.stop()
  }
}
