package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev generator (test source set): builds the sf1 probe dataset for
  * [[ScaleProbe]] as 10 deterministic REPLICAS of sf0.1, each transformed
  * so replicas cannot cross-contaminate the operator families under test.
  * A naive row-copy would give every document 10 exact twins (a 100×
  * candidate-pair blowup in the dedup families) and every embedding 10
  * coincident copies; instead each replica is an isomorphic image of
  * sf0.1 in a disjoint key/shingle/vector region, so per-replica dup
  * density, cluster structure and per-key stream density all match sf0.1
  * exactly while totals grow 10× — the right shape for a wall-time
  * scaling probe:
  *
  *  - documents: replica r applies an AFFINE letter cipher via
  *    `translate` (bijective on [a-z]/[A-Z], digits kept; distinct per
  *    replica up to 312 copies — round 14, for the sf10 probe) —
  *    token/char lengths and the within-replica frequency profile are
  *    preserved verbatim, but replicas share (essentially) no shingles,
  *    words, or char windows, so MinHash/substring-dedup/BPE all see N×
  *    the types at the same per-type density. doc_id offset per replica.
  *  - embeddings: replica r applies a SIGNED DIMENSION PERMUTATION
  *    (new[i] = ±old[(i+5r) mod 64]) — an isometry, so every
  *    within-replica cosine/distance (k-means geometry, near-dup pairs)
  *    is exactly preserved while cross-replica similarity is scrambled;
  *    labels move to a per-replica range.
  *  - events: fresh user/event ids per replica, timestamps kept — the
  *    stream windows hold 10× the keys at the same per-key event rate.
  *  - orders/lineitem: order-key offset per replica (join-consistent
  *    6M-row lineitem); remaining dims copied as-is.
  *
  * Everything is expression-only (`translate`, `transform`, arithmetic)
  * — no UDFs, no driver-side data. Not a spec; output goes to /tmp/sf1
  * and results are recorded in BASELINE.md.
  */
object ScaleGen {
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  // the 12 units of Z/26 — multipliers coprime to 26, so the affine map
  // i -> (a*i + b) mod 26 is a bijection on letter positions
  private val Units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Replica r's letter permutation as a translate() target alphabet:
    * an AFFINE cipher i -> (a·i + b) mod 26 with (a, b) distinct per
    * replica for r < 312 (12 units × 26 shifts) — a plain Caesar
    * rotation has period 26, so at 100 replicas four replicas would
    * share a mapping and their documents would be cross-replica EXACT
    * twins, quadrupling dup density instead of preserving it. r = 0 is
    * the identity (a=1, b=0). */
  private def affine(s: String, r: Int): String = {
    val a = Units(r % Units.length)
    val b = (r / Units.length) % s.length
    (0 until s.length).map(i => s((a * i + b) % s.length)).mkString
  }

  /** Union of `copies` transformed replicas of `df`. */
  private def replicate(df: DataFrame, copies: Int)(
      transform: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(r => transform(df, r)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val (src, dst, copies) =
      (args.headOption.getOrElse("/root/testdata/sf0.1"),
        args.lift(1).getOrElse("/tmp/sf1"),
        args.lift(2).map(_.toInt).getOrElse(10))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Off = 1000000000L // replica key offset: far above any sf0.1 id

    def write(name: String, df: DataFrame): Unit = {
      // single file per table, matching the fixture layout Tables.t reads
      df.coalesce(8).write.mode("overwrite")
        .parquet(s"$dst/${name}.parquet")
      println(s"GEN $name -> $dst/${name}.parquet")
    }

    // small dims: copy as-is
    for (n <- Seq("region", "nation", "customer", "supplier", "part"))
      write(n, Tables.t(spark, src, n))

    write("orders", replicate(Tables.t(spark, src, "orders"), copies) {
      (df, r) => df.withColumn("o_orderkey", col("o_orderkey") + lit(r * Off))
    })
    write("lineitem", replicate(Tables.t(spark, src, "lineitem"), copies) {
      (df, r) => df.withColumn("l_orderkey", col("l_orderkey") + lit(r * Off))
    })

    write("documents", replicate(Tables.t(spark, src, "documents"), copies) {
      (df, r) =>
        df.withColumn("doc_id", col("doc_id") + lit(r * Off))
          .withColumn("text", translate(col("text"),
            Lower + Upper, affine(Lower, r) + affine(Upper, r)))
    })

    write("embeddings", replicate(Tables.t(spark, src, "embeddings"), copies) {
      (df, r) =>
        val dim = 64
        // signed permutation: new[i] = sign(i,r) * old[((i + 5r) mod dim)
        // XOR (r div dim)]; the XOR layer keeps the 100-replica family
        // collision-free — the 5r rotation alone has period 64 (gcd(5,64)
        // = 1), so replicas r and r+64 would share a permutation; XOR by
        // a constant is a bijection on 0..63 and never equals a pure
        // rotation, so all (rotation, xor) pairs are distinct. Sign flips
        // where bit-parity of (i*(r+3)) is odd — deterministic, half the
        // dims flip, replica 0 is the identity (shift 0, xor 0, no flips)
        val perm = (0 until dim).map { i =>
          val jj = ((i + 5 * r) % dim) ^ (r / dim)
          val sign = if (r == 0 || Integer.bitCount(i * (r + 3)) % 2 == 0) 1f else -1f
          (jj, sign)
        }
        val permuted = array(perm.map { case (jj, sign) =>
          element_at(col("embedding"), jj + 1) * lit(sign)
        }: _*)
        df.withColumn("vec_id", col("vec_id") + lit(r * Off))
          .withColumn("label", (col("label") + lit(r * 1000)).cast("int"))
          .withColumn("embedding", permuted)
    })

    write("events", replicate(Tables.t(spark, src, "events"), copies) {
      (df, r) =>
        df.withColumn("event_id", col("event_id") + lit(r * Off))
          .withColumn("user_id", col("user_id") + lit(r * Off))
    })

    spark.stop()
  }
}
