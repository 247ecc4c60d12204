package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch profiler for the Jaccard pipeline stages (dev tool). */
object Prof39 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs  rows=$n")
    }
    val docs = Tables.t(spark, d, "documents")
    docs.count()
    val compact = operators.Dedup.shingleRows(docs, "doc_id", "text", 3)
    time("shingle rows")(compact.count())
    time("shingle rows again")(compact.count())
    val cached = compact.cache()
    time("cache populate")(cached.count())
    val a = cached.select(col("doc_id").as("id_a"), col("ns").as("na"), col("s"))
    val b = cached.select(col("doc_id").as("id_b"), col("ns").as("nb"), col("s"))
    val joined = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
    time("join only")(joined.count())
    val grouped = joined.groupBy("id_a","id_b","na","nb").agg(count(lit(1)).as("inter"))
    time("join+group")(grouped.count())
    time("full q39")(operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("full q39 again")(operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
