package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (test source set): trained-vs-seeded k-means quality at sf0.1
  * — WCSS, cluster balance, IVF recall@5 vs brute force. Not a spec. */
object ProbeLloyd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Tables.t(spark, d, "embeddings")
    import graft.operators.Similarity

    for (rounds <- Seq(0, 1, 2, 4)) {
      val asg = if (rounds == 0)
        Similarity.kmeansAssign(emb, "vec_id", "embedding", 8)
      else
        Similarity.kmeansAssignTrained(emb, "vec_id", "embedding", 8, rounds)
      val wcss = asg.agg(sum("dist_sq")).head.getLong(0)
      val sizes = asg.groupBy("cid").count().collect().map(_.getLong(1))
      val bal = sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
      println(s"ROUNDS=$rounds wcss=$wcss maxCell=${sizes.max} " +
        s"cells=${sizes.length} balance=$bal")
    }

    val queries = emb.filter(col("vec_id") < 50)
    val brute = Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 5)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (rounds <- Seq(0, 2, 4)) {
      val ivf = Similarity.ivfKnn(queries, emb, "vec_id", "embedding", 5, 8, 2,
        trainRounds = rounds)
        .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (ivf intersect brute).size.toDouble / brute.size
      println(s"IVF trainRounds=$rounds recall@5=$recall")
    }
    spark.stop()
  }
}
