package graft

import graft.operators.{GraphAnn, Similarity}
import org.apache.spark.sql.functions._

/** Scratch probe: NSW recall vs IVF with HONEST budgets — the NSW budget
  * is the measured mean DISTINCT visited candidates per query (run the
  * search with k=1e6 so the output IS the visited pool). */
object ProbeNsw {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings").cache()
    val queries = emb.filter(col("vec_id") < 10)
    val gold = Similarity.exactL2Knn(queries, emb, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, bw, sr) <- Seq((12, 8, 3), (12, 12, 3), (16, 12, 3), (16, 16, 3), (12, 12, 4), (16, 8, 3))) {
      val all = GraphAnn.nswSearch(queries, emb, "vec_id", "embedding",
          1000000, m, 3, 64, 1, bw, sr).cache()
      val visited = all.count() / 10.0
      val nsw = all.filter(col("rank") <= 5)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      all.unpersist()
      println(f"NSW m=$m bw=$bw sr=$sr recall=${(nsw & gold).size.toDouble / gold.size}%.2f visited/query=$visited%.0f")
    }
  }
}
