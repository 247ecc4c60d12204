package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Guards on the two-pass stratified quota sample (q132's operator): the
  * driver-side boundary walk is only safe while the stratum column is a
  * genuine stratification key, so the documented [[Sampling.MaxStrata]]
  * cap must trip BEFORE an unbounded histogram reaches the driver.
  */
class SamplingSpec extends SparkTestBase {

  test("stratifiedQuotaSample: a high-cardinality stratum column (doc_id " +
    "passed by mistake) trips the documented cap instead of collecting an " +
    "unbounded histogram") {
    val docs = spark.range(Sampling.MaxStrata + 10L)
      .select(col("id").as("doc_id"), col("id").as("not_a_stratum"))
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedQuotaSample(docs, "doc_id", "not_a_stratum", outOf = 4)
        .count()
    }
    assert(e.getMessage.contains("distinct values"), e.getMessage)
  }

  test("q176 priority draw: inclusion frequency is proportional to weight " +
    "(planted weights 1/2/4, bottom-k cut below saturation)") {
    // 30k ids, weights planted 1/2/4 by id mod 3 (10k each); keep the
    // k = 3000 smallest priorities. pri = (h << 20) div w with h uniform
    // on [0, 2^32), so P(keep | w) = T·w / 2^32 for the threshold T the
    // cut lands on — inclusion ∝ w while every rate is far below 1
    // (expected rates here ≈ 4.3% / 8.6% / 17%). md5 is deterministic,
    // so this measures the draw itself, not sampling luck; the ±0.3
    // ratio tolerance is ~2σ of the equivalent Bernoulli noise.
    val n = 30000L
    val k = 3000
    val perGroup = n / 3
    val kept = spark.range(n)
      .select(col("id").as("doc_id"),
        when(col("id") % 3 === 0, 1L).when(col("id") % 3 === 1, 2L)
          .otherwise(4L).as("w"),
        Sampling.md5Prefix32(col("id")).as("h"))
      .withColumn("pri", Sampling.priorityKey)
      .orderBy("pri", "doc_id").limit(k)
      .groupBy("w").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val Seq(r1, r2, r4) = Seq(1L, 2L, 4L)
      .map(w => kept.getOrElse(w, 0L).toDouble / perGroup)
    info(f"inclusion rates: w=1 $r1%.4f, w=2 $r2%.4f, w=4 $r4%.4f " +
      f"(ratios ${r2 / r1}%.2f, ${r4 / r2}%.2f)")
    assert(r1 > 0 && r2 > r1 && r4 > r2,
      s"inclusion not monotone in weight: $r1, $r2, $r4")
    for ((ratio, lbl) <- Seq((r2 / r1, "w2/w1"), (r4 / r2, "w4/w2")))
      assert(ratio > 1.7 && ratio < 2.3,
        f"$lbl inclusion ratio $ratio%.2f outside [1.7, 2.3] — doubling " +
          "the weight must double the draw odds below saturation")
  }

  test("stratifiedQuotaSample: bounded strata pass the guard and keep " +
    "exactly n div outOf per stratum") {
    val docs = spark.range(1000L).select(col("id").as("doc_id"),
      (col("id") % 7).cast("string").as("lang"))
    val keptPerStratum = Sampling
      .stratifiedQuotaSample(docs, "doc_id", "lang", outOf = 4)
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(keptPerStratum.getOrElse(lang, 0L) === n / 4,
        s"stratum $lang: expected ${n / 4} of $n")
    }
  }
}
