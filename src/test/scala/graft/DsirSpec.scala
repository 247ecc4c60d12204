package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q276's DSIR importance selection, pinned at the properties the hash
  * gate can't state: the weight actually POINTS AT the target
  * distribution (a doc assembled from target-language text outweighs
  * one assembled from non-target text; the selected set is
  * target-enriched vs the corpus), and the report covers every doc
  * exactly once — a selection that silently drops unscored docs reads
  * as "not selected" when it should read "bug". */
class DsirSpec extends SparkTestBase {

  private lazy val docs = Tables.t(spark, Sf, "documents")

  test("selected set is target-enriched vs the corpus") {
    val out = TextOps.dsirSelect(docs, col("lang") === "en")
    val r = out.agg(
      sum(when(col("selected") && col("lang") === "en", 1L).otherwise(0L)),
      sum(when(col("selected"), 1L).otherwise(0L)),
      sum(when(col("lang") === "en", 1L).otherwise(0L)),
      count(lit(1))).head
    val (selEn, sel, en, n) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(sel > 0 && sel < n, s"degenerate selection: $sel of $n")
    // fraction compare in exact cross-multiplied integers
    assert(selEn * n > en * sel,
      s"selected en-fraction $selEn/$sel must exceed corpus $en/$n")
  }

  test("a target-assembled doc outweighs a non-target-assembled doc") {
    import spark.implicits._
    val enText = docs.filter(col("lang") === "en")
      .orderBy("doc_id").limit(3)
      .agg(concat_ws(" ", collect_list("text"))).head.getString(0)
    val zhText = docs.filter(col("lang") === "zh")
      .orderBy("doc_id").limit(3)
      .agg(concat_ws(" ", collect_list("text"))).head.getString(0)
    val planted = Seq(
      (900001L, "en", enText, enText.length.toLong, "srcX"),
      (900002L, "zh", zhText, zhText.length.toLong, "srcX"))
      .toDF("doc_id", "lang", "text", "n_chars", "source")
    // plant as lang-NEUTRAL rows? No — keep their labels: two planted
    // docs among thousands of tokens cannot flip the distributions,
    // and the weights under test are the docs' own profiles
    val out = TextOps.dsirSelect(
        docs.select("doc_id", "lang", "text", "n_chars", "source")
          .unionByName(planted), col("lang") === "en")
      .filter(col("doc_id") >= 900001L)
      .select("doc_id", "lw_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(900001L) > out(900002L),
      s"target-assembled doc must outweigh the non-target one: $out")
  }

  test("the report covers every doc exactly once") {
    val out = TextOps.dsirSelect(docs, col("lang") === "en")
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
  }

  test("frozen model: a delta doc's verdict is independent of co-arrivals") {
    import graft.operators.Sampling
    val base = docs.filter(Sampling.splitLabel(col("doc_id"), 1) === "train")
    val delta = docs.filter(Sampling.splitLabel(col("doc_id"), 1) === "eval")
    val full = TextOps.dsirSelectDelta(base, delta, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val halfIds = delta.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).zipWithIndex
      .collect { case (id, i) if i % 2 == 0 => id }.toSet
    val half = TextOps.dsirSelectDelta(
        base, delta.filter(col("doc_id").isin(halfIds.toSeq: _*)),
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(half.nonEmpty)
    half.foreach { case (id, row) =>
      assert(row === full(id),
        s"doc $id scored differently when co-arrivals changed")
    }
  }

  test("a torn DSIR artifact is refused") {
    import graft.operators.{DsirStore, TextOps => T}
    val dir = TempDirs.create("dsir-torn-spec").toString
    val m = T.dsirTrain(docs, col("lang") === "en")
    DsirStore.save(m, dir)
    // crash-mid-rewrite simulation: the lr parquet loses rows while the
    // params still record the full count
    val lr = spark.read.parquet(s"$dir/lr")
    val truncated = lr.limit((lr.count() - 1).toInt).collect()
    val tdf = spark.createDataFrame(
      spark.sparkContext.parallelize(truncated.toSeq), lr.schema)
    tdf.coalesce(1).write.mode("overwrite").parquet(s"$dir/lr")
    val e = intercept[IllegalArgumentException] {
      DsirStore.load(spark, dir)
    }
    assert(e.getMessage.toLowerCase.contains("lr"),
      s"refusal must name the torn component: ${e.getMessage}")
  }
}
