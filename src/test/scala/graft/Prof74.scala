package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the text keep-list pipeline (q74) —
  * shingles → signatures → bands → candidates → verify → CC → anti-join. */
object Prof74 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof74] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.t(spark, sfDir, "documents")
    docs.count()
    // warm codegen
    Dedup.nearDupKeepList(docs, "doc_id", "text", 3, 0.8).count()
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3).cache()
    time("shingles")(sh.count())
    val bands = Dedup.lshBands(Dedup.signaturesFromShingles(sh, "doc_id", 16),
      "doc_id", 16, 4)
    val cand = Dedup.candidatesFromBands(bands, "doc_id")
    time("bands+candidates")(cand.count())
    val pairs = Dedup.verifyCandidates(cand, sh, "doc_id", 0.8)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    time("verify")(pairs.count())
    val cc = time("cc")(Graph.connectedComponentsResult(pairs))
    println(s"[prof74] cc rounds = ${cc.rounds}")
    val dropped = time("dropped-checkpoint")(
      cc.labels.filter(col("component") =!= col("v"))
        .select(col("v").as("doc_id")).localCheckpoint())
    cc.release()
    time("anti-join")(
      docs.select(col("doc_id")).join(dropped, Seq("doc_id"), "left_anti").count())
    sh.unpersist()
    time("end-to-end")(Dedup.nearDupKeepList(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
