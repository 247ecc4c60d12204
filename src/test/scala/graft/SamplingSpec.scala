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
