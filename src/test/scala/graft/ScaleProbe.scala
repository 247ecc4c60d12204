package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (test source set): sf0.1 → sf1 wall-time scaling of the heavy
  * operator families (round-5 verdict item 2). The sf1 dataset comes from
  * [[ScaleGen]]: 10 isomorphic replicas of sf0.1 in disjoint
  * key/shingle/vector regions (Caesar-rotated text, signed
  * dimension-permuted embeddings, offset ids), so per-replica dup density,
  * cluster structure and per-key stream density match sf0.1 exactly while
  * totals grow 10× — instead of the 100× candidate-pair blowup a naive
  * row-copy would cause. Not a spec; results are recorded in BASELINE.md. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // args: [sfDir sf1Dir [queryName...]] — extra args select the probed
    // queries (default: the round-5 heavy families)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q74_dedup_keeplist", "q83_embedding_keeplist",
        "q114_substring_dedup", "q131_kmeans_lloyd", "q134_bpe_merges",
        "q140_pretrain_pipeline", "q151_stream_stream_join")
    val dirs = if (args.length >= 2) args.take(2).toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.allQueries.filter(q => names.contains(q.name))
    qs.foreach { q => // codegen warmup at the smallest fixture
      try q.run(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"warm ${q.name}: ${e.getMessage}") }
    }
    val results = for (q <- qs) yield {
      val t = dirs.map { d =>
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          q.run(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        runs.min
      }
      println(f"PROBE ${q.name}%-28s sf0.1=${t.head}%7.2fs  sf1=${t(1)}%7.2fs  ratio=${t(1) / t.head}%5.2f")
      (q.name, t.head, t(1))
    }
    println("PROBE_JSON " + results.map { case (n, a, b) =>
      s""""$n":[$a,$b]""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
