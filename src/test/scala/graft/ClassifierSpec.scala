package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PerceptronStore, Sampling, TextOps}

/** The q280–q286 round-14 batch, pinned at the properties the hash gates
  * can't state:
  *   - the trained quality filter is actually USABLE (accuracy floor —
  *     an absolute bound, the VectorSpec recall-floor stance);
  *   - a frozen classifier's verdict is a pure function of (base, doc)
  *     (the DSIR co-arrival independence stance);
  *   - the persisted model round-trips bit-exactly and refuses torn /
  *     future-version artifacts with designed messages;
  *   - the leakage-safe split NEVER separates a verified near-dup pair
  *     (the property q281's zero is built from).
  */
class ClassifierSpec extends SparkTestBase {

  private lazy val docs = Tables.t(spark, Sf, "documents")

  test("trained quality filter beats 0.9 accuracy on its corpus") {
    val w = TextOps.trainQualityFilter(docs)
    val scored = TextOps.scoreQualityFilter(docs, w)
    val r = scored.agg(
      sum(when(col("pred") === col("label"), 1L).otherwise(0L)),
      count(lit(1))).head
    val (ok, n) = (r.getLong(0), r.getLong(1))
    // absolute floor: chars/tokens correlate strongly, a working
    // trainer should land well above 90% (measured: 0.99 at sf0.01)
    assert(ok * 10L >= n * 9L, s"accuracy $ok/$n below the 0.9 floor")
  }

  test("frozen filter: a delta doc's verdict is independent of co-arrivals") {
    val base = docs.filter(Sampling.splitLabel(col("doc_id"), 1) === "train")
    val delta = docs.filter(Sampling.splitLabel(col("doc_id"), 1) === "eval")
    val w = TextOps.trainQualityFilter(base)
    val full = TextOps.scoreQualityFilter(delta, w)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val halfIds = delta.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).zipWithIndex
      .collect { case (id, i) if i % 2 == 0 => id }.toSet
    val half = TextOps.scoreQualityFilter(
        delta.filter(col("doc_id").isin(halfIds.toSeq: _*)), w)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(half.nonEmpty)
    half.foreach { case (id, row) =>
      assert(row === full(id),
        s"doc $id scored differently when co-arrivals changed")
    }
  }

  test("persisted weights round-trip bit-exactly") {
    val dir = TempDirs.create("classifier-rt-spec").toString
    val w = TextOps.trainQualityFilter(docs)
    PerceptronStore.save(spark, w, dir)
    assert(PerceptronStore.load(spark, dir).toSeq === w.toSeq)
  }

  test("an empty weight row is refused at save, with the designed message") {
    val e = intercept[IllegalArgumentException] {
      PerceptronStore.save(spark, Array.empty[Long],
        TempDirs.create("classifier-empty-spec").toString)
    }
    assert(e.getMessage.contains("empty weight row"),
      s"refusal must be the designed one, not a selectExpr error: ${e.getMessage}")
  }

  test("a hybrid artifact (wider weights, stale params) is refused") {
    import spark.implicits._
    val dir = TempDirs.create("classifier-hybrid-spec").toString
    PerceptronStore.save(spark, Array(1L, 2L), dir)
    // crash AFTER the new, WIDER weights parquet landed but BEFORE the
    // params rewrite: old params (n_w=2) sit beside b0..b2 — every
    // expected column exists, so a subset check would silently serve
    // the new row truncated to the old count (round-14 advice)
    Seq((7L, 8L, 9L)).toDF("b0", "b1", "b2")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    val e = intercept[IllegalArgumentException] {
      PerceptronStore.load(spark, dir)
    }
    assert(e.getMessage.toLowerCase.contains("torn"),
      s"hybrid artifact must be refused as torn: ${e.getMessage}")
  }

  test("foreign-typed weight columns widen (int) or refuse (double) designedly") {
    import spark.implicits._
    val intDir = TempDirs.create("classifier-int-spec").toString
    PerceptronStore.save(spark, Array(5L, 6L), intDir)
    Seq((5, 6)).toDF("b0", "b1")
      .coalesce(1).write.mode("overwrite").parquet(s"$intDir/weights")
    assert(PerceptronStore.load(spark, intDir).toSeq === Seq(5L, 6L),
      "int-width weights from a foreign writer must widen, not throw")
    val dblDir = TempDirs.create("classifier-dbl-spec").toString
    PerceptronStore.save(spark, Array(5L, 6L), dblDir)
    Seq((5.0, 6.0)).toDF("b0", "b1")
      .coalesce(1).write.mode("overwrite").parquet(s"$dblDir/weights")
    val e = intercept[IllegalArgumentException] {
      PerceptronStore.load(spark, dblDir)
    }
    assert(e.getMessage.contains("malformed classifier artifact"),
      s"non-integer weights must refuse with the designed message: ${e.getMessage}")
  }

  test("a torn classifier artifact is refused") {
    import spark.implicits._
    val dir = TempDirs.create("classifier-torn-spec").toString
    PerceptronStore.save(spark, Array(1L, 2L, 3L), dir)
    // crash-mid-rewrite simulation: the weights parquet loses a column
    // while the params still record the full count
    Seq((1L, 2L)).toDF("b0", "b1")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    val e = intercept[IllegalArgumentException] {
      PerceptronStore.load(spark, dir)
    }
    assert(e.getMessage.toLowerCase.contains("weights"),
      s"refusal must name the torn component: ${e.getMessage}")
  }

  test("a future-version classifier artifact is refused") {
    import spark.implicits._
    val dir = TempDirs.create("classifier-ver-spec").toString
    PerceptronStore.save(spark, Array(1L, 2L), dir)
    Seq((PerceptronStore.FormatVersion + 1, 2L)).toDF("version", "n_w")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
    val e = intercept[IllegalArgumentException] {
      PerceptronStore.load(spark, dir)
    }
    assert(e.getMessage.contains("version"),
      s"refusal must name the version: ${e.getMessage}")
  }

  test("q290 anneal phase is a subset of the main phase, per source") {
    val out = SparkEntry.queries("q290_anneal_schedule")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val anneal = out.keys.filter(_._1 == "anneal").map(_._2)
    assert(anneal.nonEmpty, "anneal phase selected nothing anywhere")
    anneal.foreach { src =>
      val (aDocs, aToks) = out(("anneal", src))
      val (mDocs, mToks) = out(("main", src))
      assert(aDocs <= mDocs && aToks <= mToks,
        s"anneal exceeds main for $src: $aDocs/$mDocs docs, $aToks/$mToks toks")
    }
  }

  test("q291: length-bucketed batching wastes less than naive on this corpus") {
    val out = SparkEntry.queries("q291_batch_padding_waste")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("waste_ppm")).toMap
    // not a theorem (adversarial corpora exist), but on any
    // length-varied corpus co-locating similar lengths must reclaim
    // padding — if it doesn't, the bucketing is wired wrong
    assert(out("length_bucketed") < out("naive"), out)
    assert(out("naive") > 0L, "naive batching shows zero waste — suspicious")
  }

  test("cluster-keyed split never separates a verified near-dup pair") {
    val pl = Dedup.nearDupPairLabels(docs, "doc_id", "text", 3, 0.8)
    def sl(c: String) = Sampling.splitLabel(col(c), 1)
    val n = pl.count()
    assert(n > 0, "fixture must plant near-dup pairs")
    // both endpoints carry the SAME component label...
    assert(pl.filter(col("comp_a") =!= col("comp_b")).count() === 0L)
    // ...so the component-keyed split can never separate them
    assert(pl.filter(sl("comp_a") =!= sl("comp_b")).count() === 0L)
  }
}
