package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted serving handles for the two remaining quantized-family
  * variants (round-13 verdict item 3): SQ8 ([[Sq8Index]]) and
  * Matryoshka prefix serving ([[MatryoshkaIndex]]). Each gets the
  * [[IvfAdcIndex]] treatment — build once / query many / save / load —
  * in the SAME artifact discipline: corpus-sized table as parquet,
  * driver-held trained artifacts as tiny tables, params written LAST
  * with the on-disk row count, [[ArtifactParams]] validating shape /
  * version / torn-write counts at load. Serving semantics are exactly
  * [[Similarity.sq8Knn]] / [[Similarity.matryoshkaKnn]] (q198 / q206
  * gate load ≡ build against those oracles), so a deployment that
  * picked SQ8 for its 8× memory cut — or prefix serving for its 4× —
  * now has the restart story the IVF-ADC and NSW families have. */

/** Scalar-quantized (SQ8) serving handle: per-dimension trained
  * [min,max] bounds (O(dim), driver-held) + the encoded uint8 code
  * table (dim bytes/vector resident — the 8× cut vs quantized floats).
  * `corpus` is the exact-rerank binding, joined BY id for candidates
  * only (the index stores codes, not vectors — FAISS's external-storage
  * split, as [[IvfAdcIndex]]). */
final class Sq8Index private[operators] (
    val codes: DataFrame,
    releaseStorage: () => Unit,
    val mns: IndexedSeq[Long], val mxs: IndexedSeq[Long],
    corpus: DataFrame, idCol: String, vecCol: String) {

  private val spark = codes.sparkSession
  val dim: Int = mns.length

  /** Two-stage serve: integer L2 on the CODES ranks stage-1 candidates
    * (query side encoded narrowly and broadcast — the corpus never
    * builds a hash table), exact rerank on the original dims for the
    * ≤ candidates survivors. Identical math to [[Similarity.sq8Knn]]. */
  def query(queries: DataFrame, k: Int, candidates: Int): DataFrame =
    queryImpl(queries, None, k, candidates)

  /** Metadata-filtered serve (the q220 stance for the SQ8 family): the
    * allow-list semi-joins the materialized codes BEFORE the candidate
    * cut, so the whole candidate budget is spent on admissible vectors
    * — a post-filter over k results would starve under selective
    * predicates. `allowed`'s FIRST column is the id. */
  def queryFiltered(queries: DataFrame, allowed: DataFrame, k: Int,
      candidates: Int): DataFrame =
    queryImpl(queries, Some(allowed), k, candidates)

  private def queryImpl(queries: DataFrame, allowed: Option[DataFrame],
      k: Int, candidates: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    val admissible = allowed match {
      case Some(a) =>
        codes.join(a.select(col(a.columns.head).as("nid")),
          Seq("nid"), "left_semi")
      case None => codes
    }
    val qcodes = Similarity.prepared(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("q").as("qq"),
        col("nsq").as("qnsq"), Sq8Index.codeCol(mns, mxs).as("qcode"))
      .withColumn("qcnsq", normSq(col("qcode")))
    val wA = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    val cand = admissible.join(broadcast(qcodes), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qq"), col("qnsq"),
        (col("qcnsq") + col("cnsq")
          - lit(2L) * dot(col("qcode"), col("code")))
          .cast("long").as("adist"))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= candidates)
      .select("qid", "nid", "qq", "qnsq")
    Similarity.pqRerank(cand,
      Similarity.prepared(corpus, idCol, vecCol), idCol, k)
  }

  /** Remove ids — the FAISS `remove_ids` step for the SQ8 family
    * (retractions, GDPR deletions): ONE anti-join drops the code rows,
    * the corpus binding drops the same ids for the rerank stage. No
    * retraining — bounds describe a distribution, not a membership
    * set, so the trained [min,max] stays exactly as valid for the
    * survivors (the [[IvfAdcIndex.delete]] argument). Snapshot-backed
    * independent storage; deleted vectors can never resurface —
    * candidates come from the filtered codes, the rerank joins the
    * filtered corpus BY id. */
  def delete(ids: DataFrame, idsCol: String): Sq8Index = {
    val del = ids.select(col(idsCol).as("nid"))
    val (flat, snap) = Graph.snapshot(
      codes.join(del, Seq("nid"), "left_anti"))
    flat.count() // materialize before the caller releases the source
    val rest = corpus.join(ids.select(col(idsCol).as(idCol)),
      Seq(idCol), "left_anti")
    new Sq8Index(flat, () => Graph.release(snap), mns, mxs, rest,
      idCol, vecCol)
  }

  def release(): Unit = releaseStorage()

  /** Extend the index with `delta` rows encoded under the FROZEN
    * trained bounds — the [[IvfAdcIndex.append]] pattern for the SQ8
    * family (FAISS's train-on-sample/add-everything split): no
    * retraining, ONE narrow encode map over the delta, snapshot-backed
    * INDEPENDENT storage (release source and result in either order;
    * the chain serializes flat at any append depth). Bounds drift (a
    * delta outside the trained [min,max]) clamps to 0/255 — visible as
    * code-distance recall loss, never wrong results: the exact rerank
    * is bounds-independent. */
  def append(delta: DataFrame): Sq8Index = {
    val p = Similarity.prepared(delta, idCol, vecCol)
    val deltaCodes = p.select(col(idCol).as("nid"),
        Sq8Index.codeCol(mns, mxs).as("code"))
      .withColumn("cnsq", normSq(col("code")))
    val (flat, snap) = Graph.snapshot(codes.union(deltaCodes))
    flat.count() // materialize while the base blocks are still hot
    val union = corpus.select(col(idCol), col(vecCol))
      .union(delta.select(col(idCol), col(vecCol)))
    new Sq8Index(flat, () => Graph.release(snap), mns, mxs, union,
      idCol, vecCol)
  }

  /** Persist: codes parquet + dim-row bounds table + params LAST with
    * the codes count AS WRITTEN (footer-metadata read, never an encode
    * re-run) — the writeArtifact torn-write stance. */
  def save(path: String): Unit = {
    import spark.implicits._
    codes.write.mode("overwrite").parquet(s"$path/codes")
    mns.indices.map(i => (i, mns(i), mxs(i))).toDF("i", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bounds")
    val nCodes = spark.read.parquet(s"$path/codes").count()
    Seq((Sq8Index.FormatVersion, idCol, vecCol, dim, nCodes))
      .toDF("version", "id_col", "vec_col", "dim", "n_codes")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }
}

object Sq8Index {
  val FormatVersion = 1

  private val handleCache = new HandleCache[Sq8Index](8, _.release())

  /** [[build]] memoized per (cacheKey, corpus plan, parameters,
    * session) — the [[IvfAdcIndex.buildCached]] stance for the SQ8
    * family (see [[HandleCache]]): serving-path gates time the serve /
    * round-trip / stream drain, the build amortizing across calls as a
    * production index amortizes across query batches. Callers must NOT
    * release a cached handle — the cache owns it. */
  def buildCached(corpus: DataFrame, cacheKey: String, idCol: String,
      vecCol: String, dim: Int): Sq8Index =
    handleCache.get(
      HandleCache.key(corpus, cacheKey, s"sq8|$idCol|$vecCol|$dim"))(
      build(corpus, idCol, vecCol, dim))

  /** The literal-bound div/clamp encode lane: dim codegen'd columns
    * over the prepared `q` vector — zero shuffle at any corpus size. */
  private[operators] def codeCol(mns: IndexedSeq[Long],
      mxs: IndexedSeq[Long]): Column =
    array(mns.indices.map { i =>
      val span = mxs(i) - mns(i)
      if (span > 0L)
        least(greatest(
          expr(s"((q[$i] - ${mns(i)}L) * 255L) div ${span}L"), lit(0L)),
          lit(255L))
      else lit(0L)
    }: _*)

  /** Train per-dimension bounds (ONE O(dim) agg to the driver) and
    * encode + materialize the code table — every parameter as in
    * [[Similarity.sq8Knn]]. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int): Sq8Index = {
    val p = Similarity.prepared(corpus, idCol, vecCol)
    val boundAggs = (0 until dim).flatMap(i => Seq(
      min(col("q").getItem(i)).as(s"mn$i"),
      max(col("q").getItem(i)).as(s"mx$i")))
    val row = p.agg(boundAggs.head, boundAggs.tail: _*).head()
    val mns = (0 until dim).map(i => row.getLong(2 * i))
    val mxs = (0 until dim).map(i => row.getLong(2 * i + 1))
    val cached = p.select(col(idCol).as("nid"),
        codeCol(mns, mxs).as("code"))
      .withColumn("cnsq", normSq(col("code")))
      .persist()
    cached.count() // materialize: queries must never pay encode work
    new Sq8Index(cached, () => { cached.unpersist(); () }, mns, mxs,
      corpus, idCol, vecCol)
  }

  /** Rebuild a serving handle from a [[Sq8Index.save]] artifact: two
    * bounded reads (bounds, params) + the persisted codes frame — zero
    * training or encode jobs. `corpus` must be the frame the saved
    * index encoded (the [[IvfAdcIndex.load]] contract). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame): Sq8Index = {
    val p = ArtifactParams.read(spark, path, "SQ8 index",
      Seq("version", "id_col", "vec_col", "dim", "n_codes"))
    p.requireVersion(FormatVersion.toLong)
    val idCol = p.string("id_col")
    val vecCol = p.string("vec_col")
    val dim = p.int("dim")
    val bRows = spark.read.parquet(s"$path/bounds").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Long]("mn"), r.getAs[Long]("mx")))
      .sortBy(_._1)
    require(bRows.length == dim,
      s"torn SQ8 index artifact at $path: bounds table has " +
        s"${bRows.length} rows, params records dim=$dim")
    val mns = bRows.map(_._2).toIndexedSeq
    val mxs = bRows.map(_._3).toIndexedSeq
    val codes = spark.read.parquet(s"$path/codes").persist()
    val got = codes.count() // one pass: materialize + torn check
    p.verifyCounts { codes.unpersist() }(
      ArtifactParams.Count("codes", Some(p.long("n_codes")), got))
    new Sq8Index(codes, () => { codes.unpersist(); () }, mns, mxs,
      corpus, idCol, vecCol)
  }
}

/** Matryoshka (MRL) prefix-serving handle: the persisted table is the
  * prefix slice (nid, pq, pnsq) — prefixDim/dim of the bytes resident —
  * and serving is [[Similarity.matryoshkaKnn]]'s two stages: prefix-L2
  * candidates, exact full-dim rerank via the corpus binding. There is
  * no trained artifact at all (slicing is free and axis-aligned), so
  * the params table carries only the binding + prefix width + count. */
final class MatryoshkaIndex private[operators] (
    val prefixes: DataFrame,
    releaseStorage: () => Unit,
    val prefixDim: Int,
    corpus: DataFrame, idCol: String, vecCol: String) {

  private val spark = prefixes.sparkSession

  def query(queries: DataFrame, k: Int, candidates: Int): DataFrame =
    queryImpl(queries, None, k, candidates)

  /** Metadata-filtered serve — the allow-list semi-joins the prefix
    * table BEFORE the candidate cut (the q220 stance); `allowed`'s
    * FIRST column is the id. */
  def queryFiltered(queries: DataFrame, allowed: DataFrame, k: Int,
      candidates: Int): DataFrame =
    queryImpl(queries, Some(allowed), k, candidates)

  private def queryImpl(queries: DataFrame, allowed: Option[DataFrame],
      k: Int, candidates: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    val admissible = allowed match {
      case Some(a) =>
        prefixes.join(a.select(col(a.columns.head).as("nid")),
          Seq("nid"), "left_semi")
      case None => prefixes
    }
    val qp = Similarity.prepared(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("q").as("qq"),
        col("nsq").as("qnsq"), slice(col("q"), 1, prefixDim).as("qpq"))
      .withColumn("qpnsq", normSq(col("qpq")))
    val wA = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    val cand = admissible.join(broadcast(qp), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qq"), col("qnsq"),
        (col("qpnsq") + col("pnsq")
          - lit(2L) * dot(col("qpq"), col("pq")))
          .cast("long").as("adist"))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= candidates)
      .select("qid", "nid", "qq", "qnsq")
    Similarity.pqRerank(cand,
      Similarity.prepared(corpus, idCol, vecCol), idCol, k)
  }

  /** Remove ids — one anti-join each on the prefix table and the
    * rerank corpus binding; nothing trained, so nothing to revalidate.
    * Snapshot-backed independent storage. */
  def delete(ids: DataFrame, idsCol: String): MatryoshkaIndex = {
    val del = ids.select(col(idsCol).as("nid"))
    val (flat, snap) = Graph.snapshot(
      prefixes.join(del, Seq("nid"), "left_anti"))
    flat.count()
    val rest = corpus.join(ids.select(col(idsCol).as(idCol)),
      Seq(idCol), "left_anti")
    new MatryoshkaIndex(flat, () => Graph.release(snap), prefixDim,
      rest, idCol, vecCol)
  }

  def release(): Unit = releaseStorage()

  /** Extend with `delta` rows — slicing has NO trained state, so the
    * appended index is INDISTINGUISHABLE from a full rebuild (q255
    * gates appended ≡ inline against the q206 oracle); one narrow
    * slice map over the delta, snapshot-backed independent storage. */
  def append(delta: DataFrame): MatryoshkaIndex = {
    val deltaPre = Similarity.prepared(delta, idCol, vecCol)
      .select(col(idCol).as("nid"),
        slice(col("q"), 1, prefixDim).as("pq"))
      .withColumn("pnsq", normSq(col("pq")))
    val (flat, snap) = Graph.snapshot(prefixes.union(deltaPre))
    flat.count()
    val union = corpus.select(col(idCol), col(vecCol))
      .union(delta.select(col(idCol), col(vecCol)))
    new MatryoshkaIndex(flat, () => Graph.release(snap), prefixDim,
      union, idCol, vecCol)
  }

  def save(path: String): Unit = {
    import spark.implicits._
    prefixes.write.mode("overwrite").parquet(s"$path/prefix")
    val nRows = spark.read.parquet(s"$path/prefix").count()
    Seq((MatryoshkaIndex.FormatVersion, idCol, vecCol, prefixDim, nRows))
      .toDF("version", "id_col", "vec_col", "prefix_dim", "n_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }
}

object MatryoshkaIndex {
  val FormatVersion = 1

  private val handleCache =
    new HandleCache[MatryoshkaIndex](8, _.release())

  /** [[build]] memoized per (cacheKey, corpus plan, parameters,
    * session) — the [[Sq8Index.buildCached]] stance for the prefix
    * family. Callers must NOT release a cached handle. */
  def buildCached(corpus: DataFrame, cacheKey: String, idCol: String,
      vecCol: String, prefixDim: Int): MatryoshkaIndex =
    handleCache.get(
      HandleCache.key(corpus, cacheKey, s"mry|$idCol|$vecCol|$prefixDim"))(
      build(corpus, idCol, vecCol, prefixDim))

  /** Slice + materialize the prefix table — one narrow map, no
    * training pass at all. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      prefixDim: Int): MatryoshkaIndex = {
    val cached = Similarity.prepared(corpus, idCol, vecCol)
      .select(col(idCol).as("nid"),
        slice(col("q"), 1, prefixDim).as("pq"))
      .withColumn("pnsq", normSq(col("pq")))
      .persist()
    cached.count()
    new MatryoshkaIndex(cached, () => { cached.unpersist(); () },
      prefixDim, corpus, idCol, vecCol)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame): MatryoshkaIndex = {
    val p = ArtifactParams.read(spark, path, "matryoshka index",
      Seq("version", "id_col", "vec_col", "prefix_dim", "n_rows"))
    p.requireVersion(FormatVersion.toLong)
    val idCol = p.string("id_col")
    val vecCol = p.string("vec_col")
    val prefixDim = p.int("prefix_dim")
    val pre = spark.read.parquet(s"$path/prefix").persist()
    val got = pre.count() // one pass: materialize + torn check
    p.verifyCounts { pre.unpersist() }(
      ArtifactParams.Count("prefix rows", Some(p.long("n_rows")), got))
    new MatryoshkaIndex(pre, () => { pre.unpersist(); () },
      prefixDim, corpus, idCol, vecCol)
  }
}
