package graft

import graft.operators.{GraphAnn, Similarity}
import org.apache.spark.sql.functions._

/** Scratch probe: where does NSW construction time go at sf1. */
object ProbeNsw {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      val emb = Tables.t(spark, d, "embeddings")
      val n = emb.count()
      val planes = Similarity.adaptivePlanes(n, 64)
      def time[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"$d n=$n $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
      }
      val g0 = time("seed-only (rr=0)") {
        GraphAnn.nswGraphResult(emb, "vec_id", "embedding", 16, planes, 64, 0) }
      g0.release()
      val g1 = time("seed+1 refine   ") {
        GraphAnn.nswGraphResult(emb, "vec_id", "embedding", 16, planes, 64, 1) }
      g1.release()
      time("full search     ") {
        GraphAnn.nswSearch(emb.filter(col("vec_id") < 10), emb, "vec_id",
          "embedding", 5, 16, planes, 64, 1, 8, 3).count() }
    }
  }
}
