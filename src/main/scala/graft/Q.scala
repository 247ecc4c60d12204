package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Oracle-determinism rules used across the suite (so a value-hash compare
  * between Spark and DuckDB is bit-exact):
  *  - sums/averages over DOUBLE go through DECIMAL(18,4) (exact; no double
  *    is exactly on a decimal midpoint, so the cast is unambiguous in both
  *    engines), final result cast back to DOUBLE (correctly-rounded in both);
  *  - a decimal whose integer significand can exceed 2^53 (e.g. a SUM of
  *    scale-8 products) is renormalized to DECIMAL(18,4) BEFORE the double
  *    cast: DuckDB converts wide decimals hugeint-first and double-rounds,
  *    while an int64-significand decimal divides exactly once in both
  *    engines (found as a real 1-ulp mismatch on q03 at sf0.1);
  *  - ratios of exact integers use DOUBLE division directly (correctly
  *    rounded, identical in both engines); decimal division is NOT safe
  *    cross-engine — each engine rounds at its own result scale first;
  *  - every query is totally ordered (explicit tie-breakers);
  *  - only correctly-rounded IEEE ops (+,-,*,/,sqrt) on identical inputs in
  *    per-row float math — no libm transcendentals;
  *  - vector math is quantized to integers first (order-independent exact
  *    accumulation), see VectorFunctions;
  *  - iterative centroid updates (k-means Lloyd rounds) round components
  *    with TRUNCATING integer division (`sum / n` on Longs == DuckDB `//`,
  *    both toward zero — verified empirically, -7//2 = -3 in both), so
  *    trained centroids are bit-identical across engines;
  *  - hashing across engines uses md5 (identical in both).
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame,
    val benchRun: Option[(SparkSession, String) => DataFrame] = None) {

  /** Body Bench times: identical semantics to [[run]], but allowed to read
    * expensive fixture inputs from a pre-materialized cache so the timed
    * number reflects the OPERATOR (scan + decode + agg), not per-run
    * fixture synthesis. Verify always gates [[run]], and MultimodalSpec
    * asserts the two bodies return identical rows. */
  def bench: (SparkSession, String) => DataFrame = benchRun.getOrElse(run)
}

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(run)

  /** A query whose bench body differs from its gated body (fixture
    * pre-materialization); semantics MUST be identical. */
  def withBench(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame)(
      benchRun: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(run, Some(benchRun))
}
