package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication library: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB):
  *  - exact dedup is a hash-groupBy on the fingerprint — one shuffle keyed
  *    by md5, uniform by construction (no skew);
  *  - near-dup never compares all pairs: candidates come from an LSH
  *    band-bucket equi-join (shuffle keyed by (band_idx, band_hash)), so
  *    cost is Σ bucket², bounded by band width choice;
  *  - the shingle→signature aggregation is a two-phase hash agg (partial
  *    min per mapper), so the shuffle carries one signature row per doc,
  *    not one row per shingle;
  *  - md5 (not murmur/xxhash) everywhere a result crosses engines.
  */
object Dedup {

  /** (id, shingle) rows, one per DISTINCT word n-gram per document. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
      explode(array_distinct(TextFunctions.wordShingles(col(textCol), n))).as("s"))

  /** Exact pairwise n-gram Jaccard for all pairs sharing at least one
    * shingle; keeps pairs with jaccard >= minJaccard.
    * Output: (id_a, id_b, inter, jac), id_a < id_b. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, minJaccard: Double): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n).cache()
    val ns = sh.groupBy(col(idCol)).agg(count(lit(1)).as("ns"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(ns.select(col(idCol).as("id_a"), col("ns").as("na")), "id_a")
      .join(ns.select(col(idCol).as("id_b"), col("ns").as("nb")), "id_b")
      .withColumn("jac",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jac") >= minJaccard)
      .select("id_a", "id_b", "inter", "jac")
  }

  /** MinHash signature: numHashes md5-permutation minima per doc, carried
    * as 60-bit longs (the first 15 hex chars of the md5 — same ordering as
    * the hex string since all prefixes are equal length). Long minima keep
    * the aggregation in HashAggregate (string min buffers force a
    * SortAggregate fallback) and shrink the signature shuffle 4×. One row
    * per doc with columns mh0..mh{k-1}; two-phase hash agg — the shuffle
    * carries signatures, not shingles. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val aggs = (0 until numHashes).map(i =>
      min(expr(s"CAST(conv(substr(md5(concat('$i:', s)), 1, 15), 16, 10) AS BIGINT)"))
        .as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a MinHash signature: (id, band_idx, band_hash) rows.
    * rowsPerBand minhashes are concatenated and re-hashed per band. */
  def lshBands(signatures: DataFrame, idCol: String,
               numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      // ':'-separated so adjacent minhash values can't alias across docs
      struct(lit(b).as("band_idx"),
        md5(concat_ws(":", cols: _*)).as("band_hash"))
    }
    signatures.select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate near-dup pairs: docs sharing >= 1 LSH band.
    * Output: (id_a, id_b, shared_bands), id_a < id_b. The equi-join on
    * (band_idx, band_hash) is the whole point at scale: cost tracks bucket
    * occupancy, never n². */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val bands = lshBands(
      minhashSignatures(docs, idCol, textCol, n, numHashes),
      idCol, numHashes, rowsPerBand).cache()
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared_bands"))
  }

  /** SimHash over tokens: `bits`-bit signature from md5-derived token
    * hashes; each token occurrence votes ±1 per bit. All-integer math —
    * engine-exact. One shuffle (groupBy doc). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", expr("CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)).as(s"v$b"))
    val sig = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val packed = (0 until bits).map(b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    sig.select(col(idCol), packed.as("simhash"))
  }
}
