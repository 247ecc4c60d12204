package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted serving handle for the binary (sign-bit) quantization
  * family (q294) — the fifth serving family to get the full
  * [[IvfAdcIndex]] lifecycle treatment (save / load / append / delete /
  * filtered / stream / MIPS), in the SAME artifact discipline: the
  * corpus-sized words table as parquet, params written LAST with the
  * on-disk row count, [[ArtifactParams]] validating shape / version /
  * torn-write counts at load.
  *
  * The binary family is the simplest of the five because it has ZERO
  * trained state — sign-bit packing is data-independent — so append is
  * a pure encode map with no drift story at all (an appended index
  * serves EXACTLY what a full rebuild serves, which is why the append
  * gate shares the full-corpus oracle instead of a frozen-base one),
  * and the artifact is just the words plus the layout constants.
  * Serving is [[Similarity.binaryServe]] — the ONE owner the inline
  * route (q294) uses — so handle ≡ inline by construction. */
final class BinaryIndex private[operators] (
    val words: DataFrame,
    releaseStorage: () => Unit,
    val nBands: Int, val bandBits: Int,
    corpus: DataFrame, idCol: String, vecCol: String) {

  private val spark = words.sparkSession

  /** Serve top-k: band-probe candidates from the materialized words,
    * hamming cut, exact rerank against the corpus binding. */
  def query(queries: DataFrame, k: Int, candidates: Int): DataFrame =
    Similarity.binaryServe(queries, words,
      Similarity.prepared(corpus, idCol, vecCol), idCol, vecCol,
      k, candidates, nBands, bandBits)

  /** Metadata-filtered serve (the q220 stance): the allow-list
    * semi-joins the words BEFORE the candidate cut, so the whole
    * candidate budget is spent on admissible vectors. `allowed`'s
    * FIRST column is the id. */
  def queryFiltered(queries: DataFrame, allowed: DataFrame, k: Int,
      candidates: Int): DataFrame =
    Similarity.binaryServe(queries, words,
      Similarity.prepared(corpus, idCol, vecCol), idCol, vecCol,
      k, candidates, nBands, bandBits, Some(allowed))

  /** Extend with `delta` rows — NO retraining because there is no
    * trained state: one narrow encode map over the delta, snapshot-
    * backed independent storage (the [[Sq8Index.append]] pattern minus
    * its bounds-drift caveat — binary words cannot drift). */
  def append(delta: DataFrame): BinaryIndex = {
    val deltaWords = Similarity.prepared(delta, idCol, vecCol)
      .select(col(idCol).as("nid"),
        Similarity.binaryWordsCol(nBands, bandBits).as("wds"))
    val (flat, snap) = Graph.snapshot(words.union(deltaWords))
    flat.count() // materialize while the base blocks are still hot
    val union = corpus.select(col(idCol), col(vecCol))
      .union(delta.select(col(idCol), col(vecCol)))
    new BinaryIndex(flat, () => Graph.release(snap), nBands, bandBits,
      union, idCol, vecCol)
  }

  /** Remove ids (retractions, GDPR deletions): ONE anti-join drops the
    * word rows, the corpus binding drops the same ids for the rerank
    * stage — deleted vectors can never resurface. */
  def delete(ids: DataFrame, idsCol: String): BinaryIndex = {
    val del = ids.select(col(idsCol).as("nid"))
    val (flat, snap) = Graph.snapshot(
      words.join(del, Seq("nid"), "left_anti"))
    flat.count()
    val rest = corpus.join(ids.select(col(idsCol).as(idCol)),
      Seq(idCol), "left_anti")
    new BinaryIndex(flat, () => Graph.release(snap), nBands, bandBits,
      rest, idCol, vecCol)
  }

  /** Band-bucket occupancy report (the q207/q237 introspection stance
    * for this family): per band index, the distinct bucket count, the
    * largest bucket and Σ bucket² — the last is EXACTLY the candidate
    * volume the band equi-join pays per probe hitting that band, so
    * this is the number a serving owner watches to see whether corpus
    * drift is making buckets hot (sign-bit buckets have no retrain
    * story — the mitigation is wider bands, which the report sizes).
    * One groupBy over the exploded words, then a ≤ nBands-row agg. */
  def stats: DataFrame = {
    val g = words.select(posexplode(col("wds")).as(Seq("b", "v")))
      .groupBy("b", "v").agg(count(lit(1)).as("n"))
    g.groupBy(col("b").as("band_idx"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("n")).cast("long").as("max_bucket"),
        sum(col("n") * col("n")).cast("long").as("sum_sq"))
      .orderBy("band_idx")
  }

  def release(): Unit = releaseStorage()

  /** Persist: words parquet + params LAST with the words count AS
    * WRITTEN (footer-metadata read, never an encode re-run) — the
    * shared torn-write stance. */
  def save(path: String): Unit = {
    import spark.implicits._
    words.write.mode("overwrite").parquet(s"$path/words")
    val nWords = spark.read.parquet(s"$path/words").count()
    Seq((BinaryIndex.FormatVersion, idCol, vecCol, nBands, bandBits,
        nWords))
      .toDF("version", "id_col", "vec_col", "n_bands", "band_bits",
        "n_words")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }
}

object BinaryIndex {
  val FormatVersion = 1

  private val handleCache = new HandleCache[BinaryIndex](8, _.release())

  /** [[build]] memoized per (cacheKey, corpus plan, parameters,
    * session) — the [[Sq8Index.buildCached]] stance for the binary
    * family. Callers must NOT release a cached handle. */
  def buildCached(corpus: DataFrame, cacheKey: String, idCol: String,
      vecCol: String, nBands: Int = 8, bandBits: Int = 8): BinaryIndex =
    handleCache.get(
      HandleCache.key(corpus, cacheKey, s"bin|$idCol|$vecCol|$nBands|$bandBits"))(
      build(corpus, idCol, vecCol, nBands, bandBits))

  /** Encode + materialize the words table — one narrow map, zero
    * shuffle at any corpus size. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nBands: Int = 8, bandBits: Int = 8): BinaryIndex = {
    val cached = Similarity.prepared(corpus, idCol, vecCol)
      .select(col(idCol).as("nid"),
        Similarity.binaryWordsCol(nBands, bandBits).as("wds"))
      .persist()
    cached.count() // materialize: queries must never pay encode work
    new BinaryIndex(cached, () => { cached.unpersist(); () },
      nBands, bandBits, corpus, idCol, vecCol)
  }

  /** Rebuild a serving handle from a [[BinaryIndex.save]] artifact:
    * one bounded params read + the persisted words frame — zero encode
    * jobs. `corpus` must be the frame the saved index encoded (the
    * [[IvfAdcIndex.load]] contract). */
  def load(spark: SparkSession, path: String,
      corpus: DataFrame): BinaryIndex = {
    val p = ArtifactParams.read(spark, path, "binary index",
      Seq("version", "id_col", "vec_col", "n_bands", "band_bits",
        "n_words"))
    p.requireVersion(FormatVersion.toLong)
    val words = spark.read.parquet(s"$path/words").persist()
    val got = words.count() // one pass: materialize + torn check
    p.verifyCounts { words.unpersist() }(
      ArtifactParams.Count("words", Some(p.long("n_words")), got))
    new BinaryIndex(words, () => { words.unpersist(); () },
      p.int("n_bands"), p.int("band_bits"), corpus,
      p.string("id_col"), p.string("vec_col"))
  }
}
