package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-checked similarity-search queries over `embeddings` (64-dim
  * float vectors). Implementations in [[Similarity]]. */
object SimilarityOps {

  private val Dim = 64
  private val Planes = 12

  /** DuckDB replica of [[Similarity.scalarDriftChi2]] downstream of two
    * CTEs `base`/`delta` exposing (`idCol`, v) — ONE definition shared by
    * the q210 embedding-norm gate and the q211 doc-length twin (TextOps),
    * the shingleCteN single-owner rule. Ends in the final SELECT. */
  private[operators] def driftChi2TailSql(idCol: String): String =
    s"""rb AS (SELECT v, row_number() OVER (ORDER BY v, $idCol) AS rn, count(*) OVER () AS nb FROM base),
       |ps AS (SELECT unnest(range(1, 10)) AS p),
       |tv AS (SELECT rb.v FROM rb JOIN ps ON rb.rn = (ps.p * rb.nb + 9) // 10),
       |thr AS (SELECT list(v ORDER BY v) AS ts FROM tv),
       |bb AS (SELECT CAST(len(list_filter(ts, t -> t <= v)) AS INTEGER) AS b FROM base, thr),
       |bd AS (SELECT CAST(len(list_filter(ts, t -> t <= v)) AS INTEGER) AS b FROM delta, thr),
       |cb AS (SELECT b, count(*) AS nb_b FROM bb GROUP BY b),
       |cd AS (SELECT b, count(*) AS nd_b FROM bd GROUP BY b),
       |tot AS (SELECT (SELECT count(*) FROM base) AS nbt, (SELECT count(*) FROM delta) AS ndt),
       |spine AS (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS b),
       |terms AS (
       |  SELECT spine.b, coalesce(cb.nb_b, 0) AS nb_b, coalesce(cd.nd_b, 0) AS nd_b,
       |    (CAST(coalesce(cd.nd_b,0) AS HUGEINT)*nbt - CAST(coalesce(cb.nb_b,0) AS HUGEINT)*ndt)
       |      * (CAST(coalesce(cd.nd_b,0) AS HUGEINT)*nbt - CAST(coalesce(cb.nb_b,0) AS HUGEINT)*ndt)
       |      * 1000000
       |      // (CAST(greatest(coalesce(cb.nb_b,0), 1) AS HUGEINT) * ndt * nbt) AS chi2_term_ppm
       |  FROM spine LEFT JOIN cb ON cb.b = spine.b LEFT JOIN cd ON cd.b = spine.b, tot)
       |SELECT b AS bucket, CAST(nb_b AS BIGINT) AS base_n, CAST(nd_b AS BIGINT) AS delta_n,
       |  CAST(chi2_term_ppm AS BIGINT) AS chi2_term_ppm,
       |  CAST(sum(chi2_term_ppm) OVER () AS BIGINT) AS chi2_total_ppm,
       |  sum(chi2_term_ppm) OVER () >= 16919000 AS drifted
       |FROM terms ORDER BY bucket""".stripMargin

  // data dir -> the ONE index-artifact dir this JVM round-trips through
  // (each q189 invocation overwrite-saves the same dir — the save is the
  // operator under test — but repeated bench/verify passes must not
  // accumulate a fresh index copy per call; the FormatOps.rtDirs rule)
  private def dirFor(map: java.util.concurrent.ConcurrentHashMap[String, String],
      prefix: String, d: String): String =
    map.computeIfAbsent(new java.io.File(d).getCanonicalPath,
      _ => graft.TempDirs.create(prefix).toString)

  /** The REAL micro-batch scaffold q193/q213/q231 share: a schema'd
    * file stream over staged single-file parquet batches
    * (maxFilesPerTrigger=1 → one genuine micro-batch per file), each
    * batch drained through `serve` into a bounded driver buffer and
    * emitted as ONE ordered frame. Staging stays per-site — the
    * arrival patterns genuinely differ — but the streaming discipline
    * has one owner. */
  private def fileStreamDrain(s: org.apache.spark.sql.SparkSession,
      inSchema: org.apache.spark.sql.types.StructType, glob: String,
      outSchema: org.apache.spark.sql.types.StructType,
      orderCols: Seq[String])(
      serve: org.apache.spark.sql.DataFrame => Array[org.apache.spark.sql.Row]): org.apache.spark.sql.DataFrame = {
    val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    graft.streaming.StreamHarness.drainFileStream(s, inSchema, glob) {
      batch => serve(batch).foreach(buf.add)
    }
    s.createDataFrame(new java.util.ArrayList(buf), outSchema)
      .orderBy(orderCols.map(col): _*)
  }

  private val idxDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def idxDir(d: String): String = dirFor(idxDirs, "graft-annidx", d)

  // data dir -> the ONE q216 lifecycle-chain artifact dir (same reuse rule;
  // holds the night0/ and night1/ artifacts of the persisted chain)
  private val chainDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def chainDir(d: String): String = dirFor(chainDirs, "graft-annchain", d)

  // data dir -> the ONE q217 delta-arrival staging dir (same reuse rule)
  private val maintDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def maintDir(d: String): String = dirFor(maintDirs, "graft-annmaint", d)

  // data dir -> the ONE q217 BENCH staging (files written inside the
  // computeIfAbsent lambda, the q253 stagedDeltaBatches rule): repeated
  // bench passes re-drain one deterministic staging instead of
  // re-writing it; the gated run body always stages fresh
  private val maintStaged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedMaintGroups(delta: org.apache.spark.sql.DataFrame,
      d: String, groups: Int): String =
    maintStaged.computeIfAbsent(new java.io.File(d).getCanonicalPath, _ => {
      val dir = graft.TempDirs.create("graft-annmaint-bench").toString
      AnnMaintenance.stageDeltaGroups(delta, dir, groups, "vec_id")
      dir
    })

  // data dir -> the ONE q193 query-arrival staging dir (same reuse rule)
  private val streamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def streamDir(d: String): String = dirFor(streamDirs, "graft-annstream", d)

  // data dir -> the ONE SQ8 / matryoshka index-artifact dir (the idxDirs
  // rule for the two round-14 persisted variants, q251/q252)
  private val sq8Dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sq8Dir(d: String): String = dirFor(sq8Dirs, "graft-sq8idx", d)
  private val mryDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def mryDir(d: String): String = dirFor(mryDirs, "graft-mryidx", d)

  // data dir -> the ONE q265/q266 MIPS-artifact dir each (own dir per
  // consuming query — the round-13 shared-dir advice: q251/q252 also
  // overwrite-save inside their bodies, and a shared path could serve a
  // half-overwritten artifact to a concurrently running suite)
  private val sq8MipsDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sq8MipsDir(d: String): String =
    dirFor(sq8MipsDirs, "graft-sq8mips", d)
  private val mryMipsDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def mryMipsDir(d: String): String =
    dirFor(mryMipsDirs, "graft-mrymips", d)

  // data dir -> the ONE binary-index artifact / stream staging dir each
  // (the q251/q261 pattern for the fifth serving family); q301 gets its
  // OWN artifact dir (round-15 advice: q297 and q301 both overwrite-save
  // inside their bodies, and a shared path would let a concurrently
  // running suite read a half-overwritten artifact)
  private val binDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def binDir(d: String): String = dirFor(binDirs, "graft-binidx", d)
  private val binStreamIdxDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def binStreamIdxDir(d: String): String =
    dirFor(binStreamIdxDirs, "graft-binsidx", d)
  private val binStreamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def binStreamDir(d: String): String =
    dirFor(binStreamDirs, "graft-binstream", d)

  // data dir -> the ONE q271 delta-arrival staging dir: the delta split
  // into three single-file arrival batches by vec_id mod 3 (interleaved
  // ranges — the schedule must not matter, and a modulo split is
  // SF-independent)
  private val semStreamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def semStreamDir(d: String,
      delta: org.apache.spark.sql.DataFrame): String =
    semStreamDirs.computeIfAbsent(new java.io.File(d).getCanonicalPath,
      _ => {
        val dir = graft.TempDirs.create("graft-semstream").toString
        (0 to 2).foreach { i =>
          delta.filter(pmod(col("vec_id"), lit(3)) === i)
            .coalesce(1).write.parquet(s"$dir/b$i")
        }
        dir
      })

  // data dir -> the ONE q274 router-artifact dir (own dir — the
  // round-13 shared-dir advice)
  private val semRouterDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def semRouterDir(d: String): String =
    dirFor(semRouterDirs, "graft-semrouter", d)

  // per-query arrival staging for the q261/q262 stream-serve gates (own
  // dir per consuming query — the round-13 shared-dir advice)
  private val sq8StreamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sq8StreamDir(d: String): String =
    dirFor(sq8StreamDirs, "graft-sq8stream", d)
  private val mryStreamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def mryStreamDir(d: String): String =
    dirFor(mryStreamDirs, "graft-mrystream", d)

  /** The SQ8 oracle body, parameterized over the bounds-training input
    * (the q187 `ivfAdcOracle` pattern): `trainFilter` restricts the
    * per-dimension [min,max] training scan — empty for
    * train-on-everything (q198/q251), a vec_id bound for the append
    * gate (q254: bounds FROZEN from the base, encode sees the union).
    * One owner for every downstream character. */
  // single-owner SQ8 SQL expressions — the encode lanes, code norm and
  // code distance are shared by every SQ8 oracle (q198 family, q254
  // append, q263 MIPS) so the stage text can never drift
  private def sq8CodeExpr(dim: Int): String =
    s"list_transform(range(0, $dim), j -> " +
      "CASE WHEN mxs[CAST(j + 1 AS INTEGER)] > mns[CAST(j + 1 AS INTEGER)] " +
      "THEN least(greatest(((q[CAST(j + 1 AS INTEGER)] - mns[CAST(j + 1 AS INTEGER)]) * 255) " +
      "// (mxs[CAST(j + 1 AS INTEGER)] - mns[CAST(j + 1 AS INTEGER)]), 0), 255) " +
      "ELSE 0 END)"
  private val Sq8CnsqExpr =
    "CAST(list_dot_product(list_transform(code, x -> CAST(x AS DOUBLE)), " +
      "list_transform(code, x -> CAST(x AS DOUBLE))) AS BIGINT)"
  private val Sq8AdistExpr =
    "a.cnsq + b.cnsq - 2 * CAST(list_dot_product(" +
      "list_transform(a.code, x -> CAST(x AS DOUBLE)), " +
      "list_transform(b.code, x -> CAST(x AS DOUBLE))) AS BIGINT)"

  private def sq8Oracle(trainFilter: String = "",
      adFilter: String = ""): String =
    s"""WITH $PreparedCte,
       |dx AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM e$trainFilter),
       |st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM dx GROUP BY i),
       |sa AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM st),
       |c AS (SELECT vec_id, ${sq8CodeExpr(Dim)} AS code FROM e, sa),
       |cn AS (SELECT vec_id, code, $Sq8CnsqExpr AS cnsq FROM c),
       |ad AS (SELECT a.vec_id AS qid, b.vec_id AS nid, $Sq8AdistExpr AS adist
       |  FROM cn a JOIN cn b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 10$adFilter),
       |cand AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS arank FROM ad) t
       |  WHERE arank <= 100),
       |scored AS (SELECT cc.qid, cc.nid,
       |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2
       |  FROM cand cc JOIN n na ON na.vec_id = cc.qid JOIN n nb ON nb.vec_id = cc.nid)
       |SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT qid, nid, d2, row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank FROM scored) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The ONE SQ8 oracle instance shared by q198 (inline funnel) and
    * q251 (index artifact round-trip) — the q189/q184 single-owner
    * rule: identical hash proves load ≡ build ≡ inline. */
  private lazy val Sq8OracleSql: String = sq8Oracle()

  /** The ONE matryoshka oracle instance shared by q206, q252 (artifact
    * round-trip) and q255 (append): slicing has NO trained state, so an
    * appended index must serve EXACTLY what a full build serves. */
  // single-owner matryoshka SQL pieces (the sq8CodeExpr discipline):
  // the prefix slice + prefix norm, shared by the L2 oracle (q206
  // family) and the MIPS oracle (q264) on both sides of its seam
  private def mryPrefixCte(name: String, src: String): String =
    s"$name AS (SELECT vec_id, qd[1:16] AS pqd, " +
      s"list_dot_product(qd[1:16], qd[1:16]) AS pnsq FROM $src)"
  private val MryAdistExpr =
    "CAST(a.pnsq + b.pnsq - 2 * list_dot_product(a.pqd, b.pqd) AS BIGINT)"

  private def mryOracle(adFilter: String = ""): String =
    s"""WITH $PreparedCte,
       |${mryPrefixCte("pn", "n")},
       |ad AS (SELECT a.vec_id AS qid, b.vec_id AS nid, $MryAdistExpr AS adist
       |  FROM pn a JOIN pn b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 10$adFilter),
       |cand AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS arank FROM ad) t
       |  WHERE arank <= 100),
       |scored AS (SELECT cc.qid, cc.nid,
       |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2
       |  FROM cand cc JOIN n na ON na.vec_id = cc.qid JOIN n nb ON nb.vec_id = cc.nid)
       |SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT qid, nid, d2, row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank FROM scored) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The q264 oracle: the shared augmentation CTEs + the shared prefix
    * stage text with the query/corpus seam split. The augmented
    * component sits at position 65 — OUTSIDE the 16-dim prefix — so
    * candidates rank by the original direction and only the exact
    * rerank sees the augmentation (which is exactly what makes the
    * reduction compose with prefix serving at all). */
  private lazy val MryMipsOracleSql: String =
    s"WITH $MipsAugCtesSql,\n" +
      s"""${mryPrefixCte("pn", "n")},
         |${mryPrefixCte("qpn", "nq")},
         |ad AS (SELECT a.vec_id AS qid, b.vec_id AS nid, $MryAdistExpr AS adist
         |  FROM qpn a JOIN pn b ON b.vec_id <> a.vec_id),
         |cand AS (SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS arank FROM ad) t
         |  WHERE arank <= 200),
         |scored AS (SELECT cc.qid, cc.nid,
         |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2
         |  FROM cand cc JOIN nq na ON na.vec_id = cc.qid JOIN n nb ON nb.vec_id = cc.nid)
         |SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, d2, row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The ONE matryoshka oracle instance shared by q206, q252 and q255
    * — see [[mryOracle]] for the filtered/delete parameterization. */
  private lazy val MatryoshkaOracleSql: String = mryOracle()
  // multi-probe kNN uses fewer planes: 2^6 buckets over the fixture keeps
  // inverted lists populated so every query finds candidates (recall knob)
  private val MpPlanes = 6

  /** DuckDB replica of VectorFunctions.lshBucketExpr over a quantized list
    * column named `q` — all-integer math, identical in both engines.
    * `planesExpr` may be a literal or a column from a cross-joined CTE
    * (the occupancy-scaled q83 path). */
  private def bucketSqlDuckDyn(planesExpr: String): String =
    s"""CAST(list_sum(list_transform(range(0, $planesExpr), p ->
       |    CASE WHEN list_sum(list_transform(range(0, $Dim), d ->
       |      q[CAST(d + 1 AS INTEGER)] * ((p * 73856093 + d * 19349663) % 2001 - 1000))) >= 0
       |    THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END)) AS BIGINT)""".stripMargin

  private def bucketSqlDuck(planes: Int): String = bucketSqlDuckDyn(planes.toString)

  /** DuckDB replica of VectorFunctions.signMatrix + randomProject over a
    * quantized list column named `q`: 16 signed pools whose ±1 signs come
    * from the md5-parity rule (first hex digit of md5(j·dim+i) < '8').
    * ONE definition shared by the q138/q139 oracles — the same
    * single-owner rule as the k-means CTE helpers. */
  private val ProjDim = 16
  private def projListSql: String =
    s"""list_transform(range(0, $ProjDim), j ->
       |    CAST(list_sum(list_transform(range(0, $Dim), i ->
       |      (CASE WHEN substr(md5(CAST(j * $Dim + i AS VARCHAR)), 1, 1) BETWEEN '0' AND '7'
       |            THEN 1 ELSE -1 END) * q[CAST(i AS INTEGER) + 1])) AS BIGINT))""".stripMargin

  /** DuckDB side of VectorFunctions.quantize + exact norms: integer-valued
    * doubles, so list_dot_product sums are exact in any order. `src` lets
    * the q190 drift oracle read a transformed source CTE instead of the
    * raw table; every other gate keeps the default. */
  /** `eName` renames ONLY the first (quantize) CTE: when this chain is
    * embedded as an inner WITH inside the release oracle (q275), the
    * outer body's `e` is MATERIALIZED and DuckDB 1.0 cannot shadow a
    * materialized outer CTE (verified: plain outer CTEs shadow fine) —
    * `p`/`n` collide only with non-materialized outer names, which
    * shadow correctly. Default text is byte-identical to the
    * pre-parameter owner. */
  private def preparedCte(src: String = "embeddings",
      eName: String = "e"): String =
    s"""$eName AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM $src),
       |p AS (
       |  SELECT vec_id, list_transform(q, x -> CAST(x AS DOUBLE)) AS qd FROM $eName),
       |n AS (
       |  SELECT vec_id, qd, list_dot_product(qd, qd) AS nsq FROM p)""".stripMargin
  private val PreparedCte = preparedCte()

  // ---- shared k-means-family oracle fragments (ONE definition for the
  //      packing constants — the drift hazard shingleCteN already solved
  //      for the dedup oracles) ----

  /** 2^ceil(log2 k) — Similarity.assignTo's packing shift. */
  private def shiftFor(k: Int): Long = {
    var s = 1L
    while (s < k) s <<= 1
    s
  }

  /** Shared PQ oracle fragments (the q179/q184 codebook + encode + query
    * lookup-table replica of Similarity's pq* helpers — ONE definition,
    * the shingleCteN single-owner rule): 16 subspaces × 4 dims, 8
    * centroids each, queries vec_id < 10. The codebook is seeded first-8
    * per subspace then per-subspace Lloyd-TRAINED for [[PqRounds]] E/M
    * rounds, replayed bit-for-bit (the lloydCte rules applied per
    * subspace: packed argmin with its low-cid tie-break, truncating `//`
    * centroid update, empty-cell carry-over) — so a drift anywhere in
    * PQ TRAINING, not just encode, breaks the q179/q184 hashes. Emits
    * `codes` (vec_id, m, cid) and `qdt` (qid, m, cid, pd). */
  private val PqRounds = 2
  private val PqCtes: String = pqCtes()
  /** [[PqCtes]] with the TRAINING reads (codebook seed E/M rounds)
    * optionally restricted — `trainWhere` must reference alias `s`
    * (e.g. "\n  WHERE s.vec_id < 400"). Encode (`codes`) and the query
    * tables (`qdt`) always read the full corpus: the q187 contract —
    * train on the base, encode everything. `qdtWhere` selects the query
    * set (default: the q179/q184 first-10 sample). */
  private def pqCtes(trainWhere: String = "",
      qdtWhere: String = "s.vec_id < 10", from: String = "n"): String = {
    val seed =
      s"""ms AS (SELECT unnest(range(0, 16)) AS m),
        |sub AS (
        |  SELECT $from.vec_id, ms.m,
        |    qd[CAST(ms.m * 4 + 1 AS INTEGER):CAST(ms.m * 4 + 4 AS INTEGER)] AS sq
        |  FROM $from, ms),
        |subn AS MATERIALIZED (SELECT vec_id, m, sq, list_dot_product(sq, sq) AS snsq
        |         FROM sub),
        |pc0 AS (SELECT m, CAST(vec_id AS BIGINT) AS cid, sq AS cq,
        |         snsq AS cnsq
        |       FROM subn WHERE vec_id < 8)""".stripMargin
    val rds = (1 to PqRounds).map { r =>
      s"""pa$r AS (
         |  SELECT s.vec_id, s.m,
         |    CAST(min(CAST(s.snsq + c.cnsq - 2 * list_dot_product(s.sq, c.cq)
         |      AS BIGINT) * 8 + c.cid) % 8 AS BIGINT) AS cid
         |  FROM subn s JOIN pc${r - 1} c ON c.m = s.m$trainWhere
         |  GROUP BY s.vec_id, s.m),
         |ps$r AS (
         |  SELECT a.m, a.cid, t.d,
         |    CAST(sum(s.sq[CAST(t.d AS INTEGER)]) AS BIGINT) AS sm,
         |    count(*) AS cnt
         |  FROM pa$r a JOIN subn s ON s.vec_id = a.vec_id AND s.m = a.m
         |  CROSS JOIN range(1, 5) t(d)
         |  GROUP BY a.m, a.cid, t.d),
         |pu$r AS (SELECT m, cid, list(CAST(sm // cnt AS DOUBLE) ORDER BY d) AS cq
         |        FROM ps$r GROUP BY m, cid),
         |pc$r AS MATERIALIZED (
         |  SELECT prev.m, prev.cid, coalesce(u.cq, prev.cq) AS cq,
         |    coalesce(list_dot_product(u.cq, u.cq), prev.cnsq) AS cnsq
         |  FROM pc${r - 1} prev
         |  LEFT JOIN pu$r u ON u.m = prev.m AND u.cid = prev.cid)""".stripMargin
    }
    val tail =
      s"""cbq AS (SELECT m, cid, cq, cnsq FROM pc$PqRounds),
         |enc AS (
         |  SELECT s.vec_id, s.m,
         |    min(CAST(s.snsq + c.cnsq - 2 * list_dot_product(s.sq, c.cq)
         |      AS BIGINT) * 8 + c.cid) AS key
         |  FROM subn s JOIN cbq c ON c.m = s.m
         |  GROUP BY s.vec_id, s.m),
         |codes AS (SELECT vec_id, m, key % 8 AS cid FROM enc),
         |qdt AS (
         |  SELECT s.vec_id AS qid, c.m, c.cid,
         |    CAST(s.snsq + c.cnsq - 2 * list_dot_product(s.sq, c.cq)
         |      AS BIGINT) AS pd
         |  FROM subn s JOIN cbq c ON c.m = s.m
         |  WHERE $qdtWhere)""".stripMargin
    (seed +: rds :+ tail).mkString(",\n")
  }

  /** First-k seed centroid CTE `c` (dense cid == vec_id on the contiguous
    * fixture id space, exactly Similarity.seedCentroids' relabeling). */
  private def seedCte(k: Int): String =
    s"""c AS (SELECT CAST(vec_id AS BIGINT) AS cid, qd AS cqd, nsq AS cnsq
       |     FROM n WHERE vec_id < $k)""".stripMargin

  /** DuckDB replica of Similarity.assignTo's packed argmin over the
    * PreparedCte's `n` rows against centroid CTE `c`: `d` = packed keys
    * (dist_sq·shift + cid), `m` = per-vector min key. */
  private def argminCte(k: Int): String =
    s"""d AS (
       |  SELECT n.vec_id,
       |    CAST(n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd) AS BIGINT) * ${shiftFor(k)}
       |      + c.cid AS key
       |  FROM n, c),
       |m AS (SELECT vec_id, min(key) AS key FROM d GROUP BY vec_id)""".stripMargin

  /** Per-vector assignment CTE `asg` (vec_id, cid) from the argmin. */
  private def asgCte(k: Int): String =
    s"""${argminCte(k)},
       |asg AS (SELECT vec_id, CAST(key % ${shiftFor(k)} AS BIGINT) AS cid FROM m)""".stripMargin

  /** The (vec_id, cid, dist_sq) unpacking select over `m`. */
  private def argminSelect(k: Int): String =
    s"""SELECT vec_id, CAST(key % ${shiftFor(k)} AS BIGINT) AS cid,
       |  CAST(key // ${shiftFor(k)} AS BIGINT) AS dist_sq
       |FROM m""".stripMargin

  /** The occupancy-scaled LSH keep-list pipeline (q83's oracle body,
    * shared with the q135 ingestion gate): adaptive plane count, quantize,
    * bucket, multi-probe candidates, exact-cosine verify at 0.45, 3-round
    * min-label propagation. Ends with CTEs `c` (vec_id, bucket, qd, nsq)
    * and `l3` (v, l) — keep set = l3 WHERE l = v. */
  private lazy val AdaptiveKeepListCtes: String =
    s"""cnt AS (SELECT count(*) AS n FROM embeddings),
       |pl AS (SELECT GREATEST(2, COALESCE(
       |  (SELECT min(p) FROM range(0, 25) t(p), cnt
       |   WHERE (CAST(32 AS BIGINT) << CAST(p AS INTEGER)) >= n), 24)) AS planes),
       |e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |b AS (SELECT vec_id, q, ${bucketSqlDuckDyn("planes")} AS bucket FROM e, pl),
       |c AS (
       |  SELECT vec_id, bucket, list_transform(q, x -> CAST(x AS DOUBLE)) AS qd,
       |    list_dot_product(list_transform(q, x -> CAST(x AS DOUBLE)),
       |                     list_transform(q, x -> CAST(x AS DOUBLE))) AS nsq
       |  FROM b),
       |pr AS (
       |  SELECT vec_id, qd, nsq, unnest(list_concat([bucket],
       |    list_transform(range(0, planes),
       |      p -> xor(bucket, CAST(1 AS BIGINT) << CAST(p AS INTEGER))))) AS probe
       |  FROM c, pl),
       |cand AS (
       |  SELECT DISTINCT pr.vec_id AS i, c2.vec_id AS j,
       |    list_dot_product(pr.qd, c2.qd) / sqrt(pr.nsq * c2.nsq) AS cos
       |  FROM pr JOIN c c2 ON pr.probe = c2.bucket AND pr.vec_id < c2.vec_id),
       |pairs AS (SELECT i, j FROM cand WHERE cos >= 0.45),
       |ed AS (SELECT i AS a, b FROM (SELECT i, j AS b FROM pairs UNION SELECT j, i FROM pairs) t(i, b)),
       |l1 AS (SELECT d.vec_id AS v, LEAST(d.vec_id, coalesce(min(ed.b), d.vec_id)) AS l
       |       FROM embeddings d LEFT JOIN ed ON ed.a = d.vec_id GROUP BY d.vec_id),
       |l2 AS (SELECT l1.v, LEAST(l1.l, coalesce(min(nb.l), l1.l)) AS l
       |       FROM l1 LEFT JOIN ed ON ed.a = l1.v LEFT JOIN l1 nb ON nb.v = ed.b
       |       GROUP BY l1.v, l1.l),
       |l3 AS (SELECT l2.v, LEAST(l2.l, coalesce(min(nb.l), l2.l)) AS l
       |       FROM l2 LEFT JOIN ed ON ed.a = l2.v LEFT JOIN l2 nb ON nb.v = ed.b
       |       GROUP BY l2.v, l2.l)""".stripMargin

  /** `rounds` Lloyd iterations in SQL, replaying Similarity.kmeansTrain
    * bit-for-bit: seed kc0 = first-k centroids; each round an argmin
    * assignment (identical packing), then the exact integer M-step — new
    * component = sum // count in TRUNCATING division (DuckDB `//` and
    * Java/Scala Long division both truncate toward zero; verified
    * empirically, -7//2 = -3). Clusters left empty keep their previous
    * centroid (the LEFT JOIN coalesce). Emits a final CTE `c`, the trained
    * centroid frame, so downstream fragments ([[argminCte]] etc.) compose
    * unchanged. */
  private def lloydCte(k: Int, rounds: Int, trainWhere: String = "",
      seedSql: Option[String] = None): String = {
    val shift = shiftFor(k)
    // seedSql overrides the kc0 seed (the q272 sampled-training case:
    // the k smallest ids OF THE SAMPLE, densely re-labeled — the
    // Similarity.seedCentroids contract); the default is the
    // 0-contiguous-fixture identity text every existing oracle pins
    val seed = seedSql.getOrElse(
      s"""kc0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, qd AS cqd, nsq AS cnsq
         |       FROM n WHERE vec_id < $k)""".stripMargin)
    val rds = (1 to rounds).map { r =>
      s"""ka$r AS (
         |  SELECT n.vec_id, CAST(min(
         |      CAST(n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd) AS BIGINT) * $shift
         |        + c.cid) % $shift AS BIGINT) AS cid
         |  FROM n, kc${r - 1} c$trainWhere GROUP BY n.vec_id),
         |ks$r AS (
         |  SELECT a.cid, t.d, CAST(sum(n.qd[CAST(t.d AS INTEGER)]) AS BIGINT) AS s,
         |    count(*) AS cnt
         |  FROM ka$r a JOIN n USING (vec_id) CROSS JOIN range(1, $Dim + 1) t(d)
         |  GROUP BY a.cid, t.d),
         |ku$r AS (
         |  SELECT cid, list(CAST(s // cnt AS DOUBLE) ORDER BY d) AS cqd
         |  FROM ks$r GROUP BY cid),
         |kc$r AS (
         |  SELECT prev.cid, coalesce(u.cqd, prev.cqd) AS cqd,
         |    coalesce(list_dot_product(u.cqd, u.cqd), prev.cnsq) AS cnsq
         |  FROM kc${r - 1} prev LEFT JOIN ku$r u USING (cid))""".stripMargin
    }
    (seed +: rds).mkString(",\n") + s",\nc AS (SELECT * FROM kc$rounds)"
  }

  /** The complete IVF-ADC oracle, shared by q184 (inline one-shot body),
    * q185 (the [[IvfAdcIndex]] serving path) and — with the training
    * reads restricted to a base subset — q187 (incremental append):
    * ONE SQL definition, so a handle-served hash matching it PROVES
    * handle ≡ inline — the same single-owner rule the routing/packing
    * CTEs follow. Replays the 2-round Lloyd training of the coarse
    * quantizer, the cell argmin, the per-subspace 2-round Lloyd PQ
    * training + encode, the ADC sum within the 2 probed lists, the
    * top-50 candidate cut AND the exact rerank. */
  private def ivfAdcOracle(trainLloyd: String = "",
      trainPq: String = "", adFilter: String = ""): String =
    s"""WITH ${ivfAdcCtes(trainLloyd, trainPq, adFilter = adFilter)}
       |SELECT qid, nid, d2, rank FROM appr ORDER BY qid, rank""".stripMargin

  /** The IVF-ADC route as a reusable CTE chain ending in `appr`
    * (qid, nid, d2, rank ≤ 5) — composed by [[ivfAdcOracle]] (q184/q185/
    * q187's full statement) and the q188 recall canary (appr joined
    * against the exact top-k). */
  private def ivfAdcCtes(trainLloyd: String = "",
      trainPq: String = "", src: String = "embeddings",
      qrWhere: String = "n.vec_id < 10",
      qdtWhere: String = "s.vec_id < 10",
      adFilter: String = "", rerankK: Int = 5): String =
    s"""${preparedCte(src)},
       |${lloydCte(8, 2, trainLloyd)},
       |${asgCte(8)},
       |${pqCtes(trainPq, qdtWhere)},
       |${ivfAdcTail(qrWhere, adFilter, rerankK)}""".stripMargin

  /** The nlist-INDEPENDENT back half of the IVF-ADC route (query
    * routing → in-list ADC → candidate cut → exact rerank → appr),
    * shared by [[ivfAdcCtes]] (static nlist = 8) and the q192
    * adaptive-nlist oracle — every stage here only reads `c`/`asg`/
    * `codes`/`qdt`, so ONE definition serves both cell-count modes. */
  private def ivfAdcTail(qrWhere: String = "n.vec_id < 10",
      adFilter: String = "", rerankK: Int = 5): String =
    s"""qr AS (
       |  SELECT n.vec_id AS qid, c.cid,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd), c.cid) AS crn
       |  FROM n, c WHERE $qrWhere),
       |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
       |ad AS (
       |  SELECT pr.qid, a.vec_id AS nid, CAST(sum(t.pd) AS BIGINT) AS adist
       |  FROM pr
       |  JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.qid$adFilter
       |  JOIN codes x ON x.vec_id = a.vec_id
       |  JOIN qdt t ON t.qid = pr.qid AND t.m = x.m AND t.cid = x.cid
       |  GROUP BY pr.qid, a.vec_id),
       |${adcCutRerankSql("", rerankK)}""".stripMargin

  /** The ADC candidate cut + exact rerank CTE tail (reads `ad` and the
    * raw `n`) — ONE definition shared by [[ivfAdcTail]] and the q223
    * residual route so the cut/tie-break/rerank can never drift. */
  private val AdcCutRerankSql: String = adcCutRerankSql()

  /** [[AdcCutRerankSql]] with SUFFIXED CTE names (cand$sfx/scored$sfx/
    * appr$sfx reading ad$sfx) — the q224 nprobe sweep needs one cut +
    * rerank chain PER probed depth in a single statement. */
  private def adcCutRerankSql(sfx: String = "", rerankK: Int = 5): String =
    s"""cand$sfx AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |      row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS arank
       |    FROM ad$sfx) t
       |  WHERE arank <= 50),
       |scored$sfx AS (
       |  SELECT c2.qid, c2.nid,
       |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd)
       |      AS BIGINT) AS d2
       |  FROM cand$sfx c2
       |  JOIN n na ON na.vec_id = c2.qid
       |  JOIN n nb ON nb.vec_id = c2.nid),
       |appr$sfx AS (
       |  SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
       |    SELECT qid, nid, d2,
       |      row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
       |    FROM scored$sfx) t
       |  WHERE rank <= $rerankK)""".stripMargin

  private val IvfAdcOracleSql: String = ivfAdcOracle()

  /** Occupancy-scaled nlist CTE `nl` (one column `k`) — the DuckDB
    * replica of [[Similarity.adaptiveNlist]], the q83 pl-CTE pattern
    * applied to IVF: smallest power-of-two k with 64·k >= count(*),
    * clamped [8, 2^20], pure integer arithmetic (a float log could
    * round a power-of-two boundary differently across engines). */
  private def nlCte(src: String = "embeddings"): String =
    s"""icnt AS (SELECT count(*) AS n FROM $src),
       |nl AS (SELECT GREATEST(CAST(8 AS BIGINT), COALESCE(
       |  (SELECT min(CAST(1 AS BIGINT) << CAST(p AS INTEGER))
       |   FROM range(0, 21) t(p), icnt
       |   WHERE (CAST(64 AS BIGINT) << CAST(p AS INTEGER)) >= n),
       |  CAST(1 AS BIGINT) << 20)) AS k)""".stripMargin

  /** [[lloydCte]] with the cell count DYNAMIC from the `nl` CTE: the
    * packing shift IS k (power of two by [[Similarity.adaptiveNlist]]'s
    * construction), so every literal shift becomes one uncorrelated
    * scalar subselect and the training replay stays bit-exact at ANY
    * corpus size. Emits `c` like the static variant. `trainWhere`
    * restricts the E-step scans (and the kc0 seed, which stays the
    * k-smallest-ids identity because every restricted caller trains on
    * an id-contiguous-from-0 base — the q269 AppendBase shape). */
  private def lloydCteDyn(rounds: Int, trainWhere: String = ""): String = {
    val kSel = "(SELECT k FROM nl)"
    val seed =
      s"""kc0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, qd AS cqd, nsq AS cnsq
         |       FROM n WHERE vec_id < $kSel)""".stripMargin
    val rds = (1 to rounds).map { r =>
      s"""ka$r AS (
         |  SELECT n.vec_id, CAST(min(
         |      CAST(n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd) AS BIGINT) * $kSel
         |        + c.cid) % $kSel AS BIGINT) AS cid
         |  FROM n, kc${r - 1} c$trainWhere GROUP BY n.vec_id),
         |ks$r AS (
         |  SELECT a.cid, t.d, CAST(sum(n.qd[CAST(t.d AS INTEGER)]) AS BIGINT) AS s,
         |    count(*) AS cnt
         |  FROM ka$r a JOIN n USING (vec_id) CROSS JOIN range(1, $Dim + 1) t(d)
         |  GROUP BY a.cid, t.d),
         |ku$r AS (
         |  SELECT cid, list(CAST(s // cnt AS DOUBLE) ORDER BY d) AS cqd
         |  FROM ks$r GROUP BY cid),
         |kc$r AS (
         |  SELECT prev.cid, coalesce(u.cqd, prev.cqd) AS cqd,
         |    coalesce(list_dot_product(u.cqd, u.cqd), prev.cnsq) AS cnsq
         |  FROM kc${r - 1} prev LEFT JOIN ku$r u USING (cid))""".stripMargin
    }
    (seed +: rds).mkString(",\n") + s",\nc AS (SELECT * FROM kc$rounds)"
  }

  /** [[asgCte]] with the dynamic shift — same packed argmin, `k` from
    * the `nl` CTE. */
  private def asgCteDyn(): String = {
    val kSel = "(SELECT k FROM nl)"
    s"""d AS (
       |  SELECT n.vec_id,
       |    CAST(n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd) AS BIGINT) * $kSel
       |      + c.cid AS key
       |  FROM n, c),
       |m AS (SELECT vec_id, min(key) AS key FROM d GROUP BY vec_id),
       |asg AS (SELECT vec_id, CAST(key % $kSel AS BIGINT) AS cid FROM m)""".stripMargin
  }

  /** q192's oracle: the full IVF-ADC route with the cell count computed
    * FROM THE CORPUS SIZE on both sides — nl in SQL,
    * [[Similarity.adaptiveNlist]] in Spark — so the gate stays in sync
    * at any scale factor instead of pinning the tuned-for-sf constant
    * (8 cells at 500 vectors, 32 at sf0.1's 2000, growing with n). */
  private lazy val AdaptiveIvfAdcOracleSql: String =
    s"""WITH ${nlCte()},
       |$PreparedCte,
       |${lloydCteDyn(2)},
       |${asgCteDyn()},
       |${pqCtes()},
       |${ivfAdcTail()}
       |SELECT qid, nid, d2, rank FROM appr ORDER BY qid, rank""".stripMargin

  /** Rule-(b) CTE chain over `ag` (vec_id, cid, dist_sq) + `n` — the
    * routing join `cr`, the verified within-cell pairs `pv` (cell
    * attributed, for the q273 stats aggregation) and the keep-rule
    * `losers`. ONE owner for every full-corpus semantic-dedup oracle
    * (q267 fixed-k, q268 adaptive, q272 sampled-training) and the q273
    * stats — the sq8CodeExpr single-owner discipline. */
  private def semanticRuleCtes(thr: String = "0.45"): String =
    s"""cr AS (SELECT ag.vec_id, ag.cid, ag.dist_sq, n.qd, n.nsq
       |  FROM ag JOIN n USING (vec_id)),
       |pv AS (SELECT a.cid, a.vec_id AS ia, b.vec_id AS ib,
       |    a.dist_sq AS da, b.dist_sq AS db
       |  FROM cr a JOIN cr b ON b.cid = a.cid AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.qd, b.qd) / sqrt(a.nsq * b.nsq) >= $thr),
       |losers AS (SELECT DISTINCT CASE WHEN da < db THEN ia
       |    WHEN db < da THEN ib ELSE GREATEST(ia, ib) END AS vec_id FROM pv)""".stripMargin
  private val SemanticRuleCtes: String = semanticRuleCtes()

  /** The keep-list projection every full-corpus semantic-dedup oracle
    * ends with. */
  private val SemanticKeepSelect: String =
    """SELECT e2.vec_id FROM embeddings e2
      |LEFT JOIN losers l ON l.vec_id = e2.vec_id
      |WHERE l.vec_id IS NULL ORDER BY e2.vec_id""".stripMargin

  /** The COMPLETE full-corpus semantic-dedup route over an arbitrary
    * (vec_id, embedding) relation `src`, as a self-contained scalar
    * subquery body ending in the rule-(b) LOSER projection — the oracle
    * twin of [[Similarity.semanticDropList]], for a COMPOSING pipeline
    * (the release oracle embeds this as `(WITH ... SELECT vec_id FROM
    * losers)` inside its own WITH scope; the inner `p`/`n` bindings
    * shadow the release body's plain CTEs, and the quantize CTE is
    * renamed `semq` because the body's `e` is MATERIALIZED — see
    * [[preparedCte]]). The seed is the q272 dense-relabel text over
    * the RESTRICTED `n` (k smallest ids of `src`, relabeled 0..k-1 in
    * id order — the seedCentroids contract; the default `vec_id < k`
    * seed only holds on the contiguous full-corpus fixture). */
  private[operators] def semanticLosersSubquerySql(src: String,
      thr: String = "0.45"): String =
    s"""WITH ${preparedCte(src, eName = "semq")},
       |${lloydCte(8, 2, seedSql = Some(
          s"""kc0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
             |    qd AS cqd, nsq AS cnsq
             |  FROM (SELECT n.vec_id, n.qd, n.nsq FROM n
             |        ORDER BY n.vec_id LIMIT 8))""".stripMargin))},
       |${argminCte(8)},
       |ag AS (${argminSelect(8)}),
       |${semanticRuleCtes(thr)}
       |SELECT vec_id FROM losers""".stripMargin

  /** The ONE incremental-semantic-dedup oracle instance shared by q269
    * (batch) and q271 (streaming front door) — identical hash proves
    * streamed ≡ batch, the q228/q253 twin discipline: Lloyd trains on
    * the base-restricted scan (the q187 trainWhere parameterization),
    * the shared argmin owner assigns everything, rule (a) = any
    * ≥ 0.45 base neighbor in the cell, rule (b) = the SemDeDup
    * keep-the-outlier pair rule within the delta. */
  private lazy val SemanticDeltaOracleSql: String =
    s"""WITH $PreparedCte,
       |${lloydCte(8, 2, s"\n  WHERE n.vec_id < $AppendBase")},
       |${argminCte(8)},
       |ag AS (${argminSelect(8)}),
       |$SemanticDeltaTailSql""".stripMargin

  /** The delta rules + keep projection over an `ag` (vec_id, cid,
    * dist_sq) assignment CTE — ONE tail owner for the fixed-k delta
    * oracle (q269/q271) and its occupancy-scaled twin (q292): both
    * rules, both cell-local, replayed character for character, only
    * the router sizing upstream differs. */
  private lazy val SemanticDeltaTailSql: String =
    s"""crb AS (SELECT ag.vec_id, ag.cid, n.qd, n.nsq
       |  FROM ag JOIN n USING (vec_id) WHERE ag.vec_id < $AppendBase),
       |crd AS (SELECT ag.vec_id, ag.cid, ag.dist_sq, n.qd, n.nsq
       |  FROM ag JOIN n USING (vec_id) WHERE ag.vec_id >= $AppendBase),
       |dvb AS (SELECT DISTINCT d.vec_id FROM crd d JOIN crb b ON b.cid = d.cid
       |  WHERE list_dot_product(d.qd, b.qd) / sqrt(d.nsq * b.nsq) >= 0.45),
       |pvd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    a.dist_sq AS da, b.dist_sq AS db
       |  FROM crd a JOIN crd b ON b.cid = a.cid AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.qd, b.qd) / sqrt(a.nsq * b.nsq) >= 0.45),
       |losers AS (SELECT vec_id FROM dvb UNION
       |  SELECT CASE WHEN da < db THEN ia WHEN db < da THEN ib
       |    ELSE GREATEST(ia, ib) END FROM pvd)
       |SELECT e2.vec_id FROM embeddings e2
       |LEFT JOIN losers l ON l.vec_id = e2.vec_id
       |WHERE e2.vec_id >= $AppendBase AND l.vec_id IS NULL
       |ORDER BY e2.vec_id""".stripMargin

  /** q292's oracle: the SAME delta rules, with the router OCCUPANCY-
    * SCALED by the [[Similarity.semanticDedupDeltaResultAdaptive]]
    * formula — adaptiveNlist over the UNION count (the cell count must
    * bound both routed joins), capped at the largest power of two the
    * BASE can seed, floored at 8 — replayed in pure integer arithmetic
    * so the gate stays in sync at any snapshot size (the q268 stance
    * for q269's path). */
  private lazy val SemanticDeltaAdaptiveNlCte: String =
    s"""icnt AS (SELECT count(*) AS n FROM embeddings),
       |bcnt AS (SELECT count(*) AS n FROM embeddings WHERE vec_id < $AppendBase),
       |nl AS (SELECT GREATEST(CAST(8 AS BIGINT), LEAST(
       |  COALESCE((SELECT min(CAST(1 AS BIGINT) << CAST(p AS INTEGER))
       |    FROM range(0, 21) t(p), icnt
       |    WHERE (CAST(64 AS BIGINT) << CAST(p AS INTEGER)) >= n),
       |    CAST(1 AS BIGINT) << 20),
       |  COALESCE((SELECT max(CAST(1 AS BIGINT) << CAST(p AS INTEGER))
       |    FROM range(0, 21) t(p), bcnt
       |    WHERE (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) <= n),
       |    CAST(8 AS BIGINT)))) AS k)""".stripMargin

  private lazy val SemanticDeltaAdaptiveOracleSql: String =
    s"""WITH $SemanticDeltaAdaptiveNlCte,
       |$PreparedCte,
       |${lloydCteDyn(2, s"\n  WHERE n.vec_id < $AppendBase")},
       |${asgCteDyn()},
       |ag AS (SELECT vec_id, CAST(key % (SELECT k FROM nl) AS BIGINT) AS cid,
       |  CAST(key // (SELECT k FROM nl) AS BIGINT) AS dist_sq FROM m),
       |$SemanticDeltaTailSql""".stripMargin

  /** The split-comparison tail over the rule CTEs' verified pairs `pv`
    * — ONE tail owner for the fixed-k split audit (q287) and its
    * occupancy-scaled twin (q293): the q74-style 3-round min-label
    * propagation over the pair edges, then the shared md5 split CASE
    * at both keying levels (vec-keyed leaks, component-keyed cannot). */
  private lazy val SemanticSplitAuditTailSql: String =
    s"""pairs AS (SELECT ia AS i, ib AS j FROM pv),
       |${DedupOps.labelPropCtesFor("embeddings", "vec_id", edges = "le")},
       |pl AS (SELECT p.i, p.j, la.l AS li, lb.l AS lj
       |       FROM pairs p JOIN l3 la ON la.v = p.i
       |       JOIN l3 lb ON lb.v = p.j),
       |sp AS (SELECT
       |    ${Sampling.splitLabelSql("i", 1)} AS si,
       |    ${Sampling.splitLabelSql("j", 1)} AS sj,
       |    ${Sampling.splitLabelSql("li", 1)} AS ci,
       |    ${Sampling.splitLabelSql("lj", 1)} AS cj
       |  FROM pl)
       |SELECT 'cluster_level' AS strategy, count(*) AS n_pairs,
       |  CAST(coalesce(sum(CASE WHEN ci <> cj THEN 1 END), 0) AS BIGINT) AS n_cross
       |FROM sp
       |UNION ALL
       |SELECT 'vec_level', count(*),
       |  CAST(coalesce(sum(CASE WHEN si <> sj THEN 1 END), 0) AS BIGINT)
       |FROM sp
       |ORDER BY strategy""".stripMargin

  /** The Spark half of the split-audit tail: split-label both
    * endpoints of every labeled pair at both keying levels and count
    * the crossings — shared by q287 (fixed-k pair labels) and q293
    * (occupancy-scaled pair labels). */
  private def semanticSplitAuditFrame(pl: DataFrame): DataFrame = {
    def sl(c: String) = Sampling.splitLabel(col(c), 1)
    val sp = pl.select(sl("id_a").as("si"), sl("id_b").as("sj"),
      sl("comp_a").as("ci"), sl("comp_b").as("cj"))
    val cross = (a: Column, b: Column) =>
      coalesce(sum(when(a =!= b, 1L)), lit(0L)).cast("long").as("n_cross")
    sp.agg(count(lit(1)).as("n_pairs"), cross(col("ci"), col("cj")))
      .select(lit("cluster_level").as("strategy"), col("n_pairs"),
        col("n_cross"))
      .unionAll(
        sp.agg(count(lit(1)).as("n_pairs"), cross(col("si"), col("sj")))
          .select(lit("vec_level").as("strategy"), col("n_pairs"),
            col("n_cross")))
      .orderBy("strategy")
  }

  /** The q187 split point: quantizers train on vec_id < [[AppendBase]],
    * the index serves every vector — one value owned here, used by the
    * gated body AND the oracle restrictions. Every fixture SF has ≥ 500
    * vectors, so base (400) and delta (≥ 100) are both non-trivial. */
  private val AppendBase = 400

  /** q190's canary sample: 5 base-distribution queries + 5 drifted-delta
    * queries — drift only shows when the monitor queries the drifted
    * region, so the sample straddles the split point. */
  private val CanaryQrWhere =
    s"(n.vec_id < 5 OR (n.vec_id >= $AppendBase AND n.vec_id < ${AppendBase + 5}))"
  private val CanaryQdtWhere =
    s"(s.vec_id < 5 OR (s.vec_id >= $AppendBase AND s.vec_id < ${AppendBase + 5}))"

  /** q190's retrain threshold (percent mean recall@5). Measured frozen-
    * quantizer recall on the negated-delta fixture sits well below this
    * at every SF, so the gate deterministically exercises the RETRAIN
    * path; the decision compare itself is oracle-replayed integer math
    * either way. */
  private val DriftMinRecallPct = 80

  /** The q190 oracle: the COMPLETE maintenance loop in one statement —
    * a drifted source (delta = embeddings scaled by 2^-4; a
    * power-of-two scale is EXACT in both engines' float math — pure
    * exponent shift — and collapses the delta toward the origin, where
    * the base-trained PQ codebooks can't resolve it: every drifted
    * subvector argmins to the same near-zero codeword, ADC ranking
    * degenerates to the nid tie-break, and frozen-quantizer recall
    * craters — a distribution shift an ISOMETRY like negation can't
    * plant, since consistent negation preserves every intra-delta
    * distance), the frozen-quantizer route (training CTEs restricted
    * to the base — q187's contract), the exact gold, the integer
    * threshold decision, and whichever serve chain the decision picks
    * (the retrained chain trains on ALL of demb). The two IVF-ADC
    * chains nest as scoped sub-WITH blocks over the shared `demb`, so
    * one statement carries both without CTE-name collisions. */
  private lazy val DriftMaintOracleSql: String = {
    val frozenChain = ivfAdcCtes(
      trainLloyd = s"\n  WHERE n.vec_id < $AppendBase",
      trainPq = s"\n    AND s.vec_id < $AppendBase",
      src = "demb", qrWhere = CanaryQrWhere, qdtWhere = CanaryQdtWhere)
    val retrChain = ivfAdcCtes("", "", "demb", CanaryQrWhere, CanaryQdtWhere)
    s"""WITH demb AS (
       |  SELECT vec_id,
       |    CASE WHEN vec_id < $AppendBase THEN embedding
       |         ELSE list_transform(embedding,
       |                x -> x * CAST(0.0625 AS DOUBLE)) END AS embedding
       |  FROM embeddings),
       |frozen AS (SELECT * FROM (WITH $frozenChain
       |  SELECT qid, nid, d2, rank FROM appr) z),
       |retr AS (SELECT * FROM (WITH $retrChain
       |  SELECT qid, nid, d2, rank FROM appr) z),
       |gold AS (SELECT qid, nid FROM (
       |  WITH ${preparedCte("demb")}
       |  SELECT a.vec_id AS qid, b.vec_id AS nid,
       |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |      CAST(a.nsq + b.nsq - 2 * list_dot_product(a.qd, b.qd) AS BIGINT),
       |      b.vec_id) AS rk
       |  FROM n a JOIN n b
       |    ON (a.vec_id < 5 OR (a.vec_id >= $AppendBase AND a.vec_id < ${AppendBase + 5}))
       |    AND a.vec_id <> b.vec_id) t
       |  WHERE rk <= 5),
       |dec AS (
       |  SELECT CAST(hits AS DOUBLE) / total AS mean_recall,
       |    hits * 100 < $DriftMinRecallPct * total AS retrained
       |  FROM (SELECT count(f.nid) AS hits, count(*) AS total
       |        FROM gold g LEFT JOIN frozen f
       |          ON f.qid = g.qid AND f.nid = g.nid) h)
       |SELECT t.qid, t.nid, t.d2, t.rank, dec.mean_recall, dec.retrained
       |FROM dec, (
       |  SELECT * FROM frozen WHERE NOT (SELECT retrained FROM dec)
       |  UNION ALL
       |  SELECT * FROM retr WHERE (SELECT retrained FROM dec)) t
       |ORDER BY t.qid, t.rank""".stripMargin
  }

  val defs: Seq[Q] = Seq(

    // ---- embedding near-dup: top-50 all-pairs cosine ----
    Q("q42_embedding_neardup",
      s"""WITH $PreparedCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  list_dot_product(a.qd, b.qd) / sqrt(a.nsq * b.nsq) AS cos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |ORDER BY cos DESC, id_a, id_b LIMIT 50""".stripMargin) { (s, d) =>
      Similarity.allPairsCosine(Tables.t(s, d, "embeddings"), "vec_id", "embedding")
        .orderBy(col("cos").desc, col("id_a"), col("id_b"))
        .limit(50)
    },

    // ---- brute-force cosine top-k ----
    Q("q43_knn_brute",
      s"""WITH $PreparedCte,
         |scored AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    list_dot_product(a.qd, b.qd) / sqrt(a.nsq * b.nsq) AS cos
         |  FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
         |SELECT qid, nid, cos, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.bruteForceKnn(
          emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
        .select("qid", "nid", "cos", "rank")
        .orderBy("qid", "rank")
    },

    // ---- random-hyperplane LSH bucket assignment ----
    Q("q44_knn_lsh_buckets",
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(range(0, $Planes), p ->
         |    CASE WHEN list_sum(list_transform(range(0, $Dim), d ->
         |      q[CAST(d + 1 AS INTEGER)] * ((p * 73856093 + d * 19349663) % 2001 - 1000))) >= 0
         |    THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END)) AS BIGINT) AS bucket
         |FROM e ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.lshBuckets(Tables.t(s, d, "embeddings"), "vec_id", "embedding",
          Planes, Dim)
        .orderBy("vec_id")
    },

    // ---- multi-probe LSH kNN: the scale path, oracle-gated. Each query
    //      probes its bucket + all single-bit flips, exact-reranks the
    //      candidates. Deterministic end-to-end (integer buckets, exact
    //      integer dots), so DuckDB replays it bit-for-bit. ----
    Q("q81_knn_multiprobe", {
      val probes = "bucket" +:
        (0 until MpPlanes).map(p => s"xor(bucket, ${1L << p})")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |b AS (SELECT vec_id, q, ${bucketSqlDuck(MpPlanes)} AS bucket FROM e),
         |n AS (
         |  SELECT vec_id, bucket, list_transform(q, x -> CAST(x AS DOUBLE)) AS qd
         |  FROM b),
         |c AS (SELECT vec_id, bucket, qd, list_dot_product(qd, qd) AS nsq FROM n),
         |qs AS (
         |  SELECT vec_id AS qid, qd AS qqd, nsq AS qnsq,
         |    unnest([${probes.mkString(", ")}]) AS probe
         |  FROM c WHERE vec_id < 10),
         |scored AS (
         |  SELECT DISTINCT qid, c.vec_id AS nid,
         |    list_dot_product(qqd, c.qd) / sqrt(qnsq * c.nsq) AS cos
         |  FROM qs JOIN c ON qs.probe = c.bucket AND qs.qid <> c.vec_id)
         |SELECT qid, nid, cos, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    }) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.multiProbeKnn(
          emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
          5, MpPlanes, Dim)
        .select("qid", "nid", "cos", "rank")
        .orderBy("qid", "rank")
    },

    // ---- k-means E-step: nearest of 8 first-k centroids by exact integer
    //      squared L2. The argmin is a packed-key MIN (dist·8 + cid), so
    //      the shuffle carries one row per vector, never the n×k cross
    //      product; centroids broadcast. The oracle replays the identical
    //      packing — distance formula, tie-break on cid, and the exact
    //      integer arithmetic are all hash-gated. ----
    Q("q107_kmeans_assign",
      s"""WITH $PreparedCte,
         |${seedCte(8)},
         |${argminCte(8)}
         |${argminSelect(8)} ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.kmeansAssign(Tables.t(s, d, "embeddings"), "vec_id", "embedding", 8)
        .orderBy("vec_id")
    },

    // ---- Lloyd-iterated k-means: 2 full E/M rounds from the first-k
    //      seed, then the final assignment. The oracle replays BOTH
    //      training rounds — packing, the truncating-division centroid
    //      update, empty-cluster carry-over — so a drift anywhere in the
    //      iteration (not just the last E-step) breaks the hash. This is
    //      the trained quantizer q109's IVF lists and q123's SemDeDup
    //      cells route through. ----
    Q("q131_kmeans_lloyd",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${argminCte(8)}
         |${argminSelect(8)} ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.kmeansAssignTrained(Tables.t(s, d, "embeddings"),
          "vec_id", "embedding", k = 8, rounds = 2)
        .orderBy("vec_id")
    },

    // ---- k-means M-step: per-cluster counts + exact integer centroid-
    //      update aggregates (nsq sum + index-weighted component checksum —
    //      a wrong component in ANY of the 64 dims shifts wsum_total).
    //      Two shuffles: per-vector argmin, then a k-row aggregation. ----
    Q("q108_kmeans_update",
      s"""WITH $PreparedCte,
         |w AS (SELECT vec_id, nsq,
         |  list_dot_product(qd, list_transform(range(1, $Dim + 1),
         |    i -> CAST(i AS DOUBLE))) AS wsum FROM n),
         |${seedCte(8)},
         |${argminCte(8)}
         |SELECT CAST(key % ${shiftFor(8)} AS BIGINT) AS cid, count(*) AS n_members,
         |  CAST(sum(w.wsum) AS BIGINT) AS wsum_total,
         |  CAST(sum(w.nsq) AS BIGINT) AS nsq_total
         |FROM m JOIN w ON w.vec_id = m.vec_id
         |GROUP BY 1 ORDER BY cid""".stripMargin) { (s, d) =>
      Similarity.kmeansUpdate(Tables.t(s, d, "embeddings"), "vec_id", "embedding", 8)
        .orderBy("cid")
    },

    // ---- true IVF k-NN: k-means coarse quantizer (8 inverted lists,
    //      packed-argmin assignment, Lloyd-TRAINED — 2 E/M rounds — so the
    //      lists stay ~n/nlist even on a skewed corpus) + 2-probe routing +
    //      exact cosine rerank on the probed lists only. The oracle replays
    //      the whole route INCLUDING the training rounds: packing, the
    //      truncating-division centroid update, probe ranking with its
    //      tie-break, and the rerank — so training, routing AND scoring
    //      bugs all break the hash. ----
    Q("q109_knn_ivf",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd), c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 10),
         |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
         |cand AS (
         |  SELECT pr.qid, a.vec_id AS nid
         |  FROM pr JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.qid),
         |scored AS (
         |  SELECT qid, nid,
         |    list_dot_product(qn.qd, nn.qd) / sqrt(qn.nsq * nn.nsq) AS cos
         |  FROM cand JOIN n qn ON qn.vec_id = qid JOIN n nn ON nn.vec_id = nid)
         |SELECT qid, nid, cos, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.ivfKnn(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
          k = 5, nlist = 8, nprobe = 2, trainRounds = 2)
        .orderBy("qid", "rank")
    },

    // ---- end-to-end embedding dedup, LSH-routed: multi-probe candidates →
    //      exact cosine verify → connected components → keep-list. The
    //      oracle replays the identical deterministic pipeline (integer
    //      buckets, exact integer dots, 3-round min-label propagation —
    //      fixture pair graph has diameter 1; Spark iterates to fixpoint).
    //      The plane count is OCCUPANCY-SCALED on both sides: Spark calls
    //      adaptivePlanes(count); the oracle's pl CTE replays the same
    //      integer formula (smallest p with 32·2^p >= n, clamped [2,24]),
    //      so the gate stays in sync at ANY scale factor instead of
    //      pinning the tuned-for-sf0.01 constant. ----
    Q("q83_embedding_keeplist",
      s"""WITH $AdaptiveKeepListCtes
         |SELECT v AS vec_id FROM l3 WHERE l = v ORDER BY vec_id""".stripMargin) { (s, d) =>
      // occupancy-scaled planes on both sides: adaptivePlanes(count) here,
      // the pl CTE in the oracle — same integer formula, any SF
      Similarity.nearDupKeepListAdaptive(Tables.t(s, d, "embeddings"),
          "vec_id", "embedding", 0.45, Dim)
        .orderBy("vec_id")
    },

    // ---- SemDeDup-style SEMANTIC dedup, trained-centroid-routed (the
    //      public SemDeDup recipe — Abbas et al. 2023, arXiv:2303.09540):
    //      Lloyd-trained k-means cells as the candidate router
    //      (DATA-ADAPTIVE, where q83's random hyperplanes are
    //      data-oblivious), exact-cosine verify WITHIN a cell only, and
    //      the paper's keep-the-outlier drop rule — of each verified
    //      pair the member CLOSER to its centroid drops (tie → larger
    //      id); redundant mass sits near the cluster center, extreme
    //      points carry the information. Per-pair local (no transitive
    //      closure), so the keep set is deterministic and
    //      engine-reproducible. The oracle replays the 2-round Lloyd
    //      training (the SHARED lloydCte owner), the packed argmin WITH
    //      its dist_sq payload (the shared argminCte/argminSelect
    //      owners — the keep-rule statistic is the argmin's own
    //      distance), the within-cell pair join, the float cosine on
    //      exact integer inputs (the q83 determinism argument) and the
    //      drop rule. ----
    Q("q267_semantic_dedup",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${argminCte(8)},
         |ag AS (${argminSelect(8)}),
         |$SemanticRuleCtes
         |$SemanticKeepSelect""".stripMargin) { (s, d) =>
      Similarity.semanticDedupKeepList(Tables.t(s, d, "embeddings"),
          "vec_id", "embedding", minCosine = 0.45, k = 8)
        .orderBy("vec_id")
    },

    // ---- the OCCUPANCY-SCALED semantic dedup (the q192 adaptive stance
    //      applied to the SemDeDup router): the cell count comes from
    //      adaptiveNlist(count) on the Spark side and the nl CTE on the
    //      oracle side — the same integer formula — so the within-cell
    //      pair fan-out stays Σ|cell|² ≈ n·targetCell at ANY scale
    //      factor instead of degrading toward n² when a fixed k meets
    //      1000× the data. This is the 100 TB shape: the fixed-k gate
    //      above pins the drop rule, this one pins that the ROUTER
    //      scales. ----
    Q("q268_semantic_dedup_adaptive",
      s"""WITH ${nlCte()},
         |$PreparedCte,
         |${lloydCteDyn(2)},
         |${asgCteDyn()},
         |ag AS (SELECT vec_id, CAST(key % (SELECT k FROM nl) AS BIGINT) AS cid,
         |  CAST(key // (SELECT k FROM nl) AS BIGINT) AS dist_sq FROM m),
         |$SemanticRuleCtes
         |$SemanticKeepSelect""".stripMargin) { (s, d) =>
      val kl = Similarity.semanticDedupResultAdaptive(
        Tables.t(s, d, "embeddings"), "vec_id", "embedding",
        minCosine = 0.45)
      kl.keep.orderBy("vec_id")
    },

    // ---- SAMPLED-TRAINING semantic dedup (the FAISS stance for
    //      large-corpus quantizer training, applied to the SemDeDup
    //      router): Lloyd trains on a DETERMINISTIC md5 id-hash sample
    //      (1 of 4 buckets — the q85 split machinery, reproducible in
    //      any engine and under any partitioning), assignment and the
    //      pair rule still see EVERY vector. At scale this caps the
    //      training passes at (n/buckets)·k while the one irreducible
    //      n·k pass left is the final assign — a zero-shuffle narrow
    //      map over broadcast centroids. The oracle seeds kc0 from the
    //      k smallest SAMPLED ids (densely re-labeled — the
    //      seedCentroids contract) and restricts the E-step scans with
    //      the same md5 condition; downstream it is the SHARED rule
    //      CTEs, character for character. ----
    Q("q272_semantic_dedup_sampled", {
      val cond = "CAST(('0x' || substr(md5(CAST(n.vec_id AS VARCHAR))," +
        " 1, 8)) AS BIGINT) % 4 < 1"
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2, s"\n  WHERE $cond",
            seedSql = Some(
              s"""kc0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
                 |    qd AS cqd, nsq AS cnsq
                 |  FROM (SELECT n.vec_id, n.qd, n.nsq FROM n WHERE $cond
                 |        ORDER BY n.vec_id LIMIT 8))""".stripMargin))},
         |${argminCte(8)},
         |ag AS (${argminSelect(8)}),
         |$SemanticRuleCtes
         |$SemanticKeepSelect""".stripMargin
    }) { (s, d) =>
      val kl = Similarity.semanticDedupSampledResult(
        Tables.t(s, d, "embeddings"), "vec_id", "embedding",
        minCosine = 0.45, k = 8)
      kl.keep.orderBy("vec_id")
    },

    // ---- semantic-dedup ROUTER introspection (the q207 invlists-stats
    //      stance for this family): per occupied cell, member count,
    //      verified ε-pair count and distinct drop count — what a
    //      pipeline owner watches to see whether cell skew is defeating
    //      the Σ|cell|² candidate budget and a retrain (or a k bump) is
    //      due. The oracle aggregates the SHARED rule CTEs, so the gate
    //      pins that the REPORTED structure is exactly the structure
    //      the dedup acts on. ----
    Q("q273_semantic_dedup_stats",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${argminCte(8)},
         |ag AS (${argminSelect(8)}),
         |$SemanticRuleCtes,
         |lv AS (SELECT cid, CASE WHEN da < db THEN ia WHEN db < da THEN ib
         |    ELSE GREATEST(ia, ib) END AS loser FROM pv),
         |mb AS (SELECT cid, count(*) AS n_members FROM ag GROUP BY cid),
         |pa AS (SELECT cid, count(*) AS n_pairs FROM pv GROUP BY cid),
         |dr AS (SELECT cid, count(DISTINCT loser) AS n_dropped FROM lv GROUP BY cid)
         |SELECT mb.cid, mb.n_members,
         |  COALESCE(pa.n_pairs, 0) AS n_pairs,
         |  COALESCE(dr.n_dropped, 0) AS n_dropped
         |FROM mb LEFT JOIN pa USING (cid) LEFT JOIN dr USING (cid)
         |ORDER BY mb.cid""".stripMargin) { (s, d) =>
      Similarity.semanticDedupStats(Tables.t(s, d, "embeddings"),
        "vec_id", "embedding", minCosine = 0.45, k = 8)
    },

    // ---- INCREMENTAL semantic dedup (the q228 cross-snapshot stance
    //      for the SemDeDup router): the delta dedups against the
    //      SHIPPED base (base always wins — rule (a)) and against
    //      itself (keep-the-outlier — rule (b)) under a quantizer
    //      FROZEN on the base, the Sq8 append stance: deltas never
    //      retrain the router, so routing is snapshot-stable. The two
    //      rules apply independently — the outcome is a pure function
    //      of the two snapshots, no rule ordering, no arrival order.
    //      The oracle trains Lloyd on the base-restricted scan (the
    //      SHARED trainWhere parameterization q187 introduced), assigns
    //      EVERYTHING with the shared argmin owner, and replays both
    //      rules. ----
    Q("q269_semantic_dedup_delta", SemanticDeltaOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val kl = Similarity.semanticDedupDeltaResult(
        emb.filter(col("vec_id") < AppendBase),
        emb.filter(col("vec_id") >= AppendBase),
        "vec_id", "embedding", minCosine = 0.45, k = 8)
      kl.keep.orderBy("vec_id")
    },

    // ---- STREAMING semantic-dedup front door (the q253 stance for the
    //      vector modality): delta vectors arrive as a REAL file stream
    //      (3 staged single-file batches, maxFilesPerTrigger=1); the
    //      router is FROZEN on the shipped base — trained once, before
    //      any arrival — so every micro-batch routes its arrivals
    //      identically; rule (a) evaluates PER ARRIVAL against the
    //      static base cells (a per-row predicate — arrival boundaries
    //      are invisible), routed rows + verdicts append to a
    //      delta-sized parquet accumulator; the cross-delta rule (b)
    //      runs ONCE over the drained, id-deduped accumulator through
    //      the SAME semanticDeltaTail owner the batch path finishes
    //      through. Idempotent under at-least-once redelivery (the
    //      drain dedupes by vec_id). Gated against the SAME oracle
    //      instance as q269: streamed ≡ batch. ----
    Q("q271_semantic_dedup_stream", SemanticDeltaOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < AppendBase)
      val delta = emb.filter(col("vec_id") >= AppendBase)
      val stage = semStreamDir(d, delta)
      val cent = Similarity.kmeansTrain(base, "vec_id", "embedding",
        k = 8, rounds = 2)
      val cb = Similarity.semanticCells(base, "vec_id", "embedding",
        cent, k = 8).persist()
      cb.count() // resident before the first arrival (the q110 stance)
      // fresh accumulator per invocation (the round-13 shared-dir advice)
      val accum = graft.TempDirs.create("graft-semaccum").toString
      graft.streaming.StreamHarness
        .drainFileStream(s, emb.schema, s"$stage/b*") { batch =>
          val cdB = Similarity.semanticCells(batch, "vec_id",
            "embedding", cent, k = 8)
          val flagged = Similarity
            .semanticDropVsBase(cdB, cb, "vec_id", 0.45)
            .withColumn("drop_a", lit(true))
          cdB.join(flagged, Seq("vec_id"), "left")
            .na.fill(false, Seq("drop_a"))
            .write.mode("append").parquet(s"$accum/cells")
        }
      val acc = s.read.parquet(s"$accum/cells").dropDuplicates("vec_id")
      val kl = Similarity.semanticDeltaTail(acc,
        acc.filter(col("drop_a")).select("vec_id"), "vec_id", 0.45)
      val out = kl.keep.orderBy("vec_id")
      val served = out.collect()
      kl.release()
      cb.unpersist()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- delta dedup from the PERSISTED router (the restart story for
    //      the semantic family's one piece of trained state): train on
    //      the shipped base → save the O(k·dim) centroid artifact
    //      (params-written-last, shared ArtifactParams owner) → load
    //      into a fresh frame → run the delta dedup through the SAME
    //      with-router owner the inline path uses. SAME oracle instance
    //      as q269/q271: load ≡ train — centroid components are exact
    //      integers, so the parquet round-trip is lossless and routing
    //      is bit-identical across the process boundary. ----
    Q("q274_semantic_delta_from_router", SemanticDeltaOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < AppendBase)
      val delta = emb.filter(col("vec_id") >= AppendBase)
      val cent = Similarity.kmeansTrain(base, "vec_id", "embedding",
        k = 8, rounds = 2)
      val dir = semRouterDir(d)
      SemanticRouter.save(cent, k = 8, dir)
      val (loaded, k) = SemanticRouter.load(s, dir)
      val kl = Similarity.semanticDedupDeltaWithRouter(base, delta,
        "vec_id", "embedding", minCosine = 0.45, loaded, k)
      val out = kl.keep.orderBy("vec_id")
      val served = out.collect()
      kl.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- SEMANTIC decontamination report (the vector-modality q105:
    //      an eval example the trained model has semantically seen is
    //      leakage even when no n-gram matches — the SemDeDup-era
    //      eval-hygiene check): per EVAL vector, the count of ≥ 0.45
    //      TRAIN neighbors within its trained cell + the verdict, zeros
    //      included (a report that omits clean rows can't distinguish
    //      "clean" from "unrouted"). Router trains on TRAIN only — the
    //      split under audit must not shape the cells. ----
    Q("q270_semantic_contamination",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2, s"\n  WHERE n.vec_id < $AppendBase")},
         |${argminCte(8)},
         |ag AS (${argminSelect(8)}),
         |crt AS (SELECT ag.vec_id, ag.cid, n.qd, n.nsq
         |  FROM ag JOIN n USING (vec_id) WHERE ag.vec_id < $AppendBase),
         |cre AS (SELECT ag.vec_id, ag.cid, n.qd, n.nsq
         |  FROM ag JOIN n USING (vec_id) WHERE ag.vec_id >= $AppendBase),
         |h AS (SELECT e.vec_id, count(*) AS n_contaminating
         |  FROM cre e JOIN crt t ON t.cid = e.cid
         |  WHERE list_dot_product(e.qd, t.qd) / sqrt(e.nsq * t.nsq) >= 0.45
         |  GROUP BY e.vec_id)
         |SELECT e2.vec_id, COALESCE(h.n_contaminating, 0) AS n_contaminating,
         |  COALESCE(h.n_contaminating, 0) > 0 AS contaminated
         |FROM cre e2 LEFT JOIN h ON h.vec_id = e2.vec_id
         |ORDER BY e2.vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.semanticContamination(
          emb.filter(col("vec_id") < AppendBase),
          emb.filter(col("vec_id") >= AppendBase),
          "vec_id", "embedding", minCosine = 0.45, k = 8)
        .orderBy("vec_id")
    },

    // ---- the float→quantized INGESTION path, gated end to end: raw
    //      array<float> parquet → the SQL-registered graft_quantize(v,
    //      1000) → the pre-quantized keep-list entry point → kept ids with
    //      their exact norms and a per-component round-trip audit
    //      (q_d <= x_d·1000 < q_d+1 — floor's defining inequality, so any
    //      mis-scale or mis-rounding in the materialized column flips
    //      quant_ok and breaks the hash; the kept set itself must equal
    //      q83's, which the shared oracle body asserts). ----
    Q("q135_quantize_ingest",
      s"""WITH $AdaptiveKeepListCtes
         |SELECT l3.v AS vec_id, CAST(c.nsq AS BIGINT) AS nsq, TRUE AS quant_ok
         |FROM l3 JOIN c ON c.vec_id = l3.v
         |WHERE l3.l = l3.v ORDER BY vec_id""".stripMargin) { (s, d) =>
      graft.plans.GraftFunctions.register(s)
      Tables.t(s, d, "embeddings").createOrReplaceTempView("emb_raw_q135")
      // the materialize-once ingestion step a user would run at write time
      val quant = s.sql(
        "SELECT vec_id, embedding, graft_quantize(embedding, 1000) AS q FROM emb_raw_q135")
      val kept = Similarity.nearDupKeepListQuantized(quant, "vec_id", "q",
        0.45, Dim)
      quant.join(kept, Seq("vec_id"), "left_semi")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.normSq(col("q")).as("nsq"),
          expr("""forall(zip_with(q, embedding, (qi, x) ->
                 |  CAST(qi AS DOUBLE) <= CAST(x AS DOUBLE) * 1000D AND
                 |  CAST(x AS DOUBLE) * 1000D < CAST(qi AS DOUBLE) + 1D),
                 |  b -> b)""".stripMargin).as("quant_ok"))
        .orderBy("vec_id")
    },

    // ---- random-projection dimensionality reduction: 64-dim quantized
    //      embeddings → 16 signed-pool components (±1 matrix from md5
    //      parity, driver-held literals — see VectorFunctions.signMatrix).
    //      The sketch that cuts ANN memory/width 4× before bucketing; each
    //      component is one codegen'd exact integer dot, so the whole op
    //      is a NARROW per-row map — zero shuffle at any corpus size. The
    //      oracle rebuilds the matrix from the same md5 rule and replays
    //      the projection, so a drift in either the matrix derivation or
    //      the dot accumulation breaks the hash. ----
    Q("q138_random_projection",
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings)
         |SELECT vec_id,
         |  array_to_string($projListSql, ',') AS proj_csv
         |FROM e ORDER BY vec_id""".stripMargin) { (s, d) =>
      import graft.functions.VectorFunctions
      Tables.t(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
        .select(col("vec_id"),
          array_join(transform(
            VectorFunctions.randomProject(col("q"), ProjDim, Dim),
            v => v.cast("string")), ",").as("proj_csv"))
        .orderBy("vec_id")
    },

    // ---- two-stage kNN through the q138 sketch: top-100 candidates by
    //      PROJECTED cosine (16 components — ¼ the pair-scoring work and
    //      bytes), exact rerank on the original 64 quantized dims. The
    //      oracle replays matrix derivation, projected ranking (with its
    //      tie-break), the candidate cut AND the exact rerank — so a
    //      drift anywhere in the two-stage funnel breaks the hash.
    //      Recall-vs-brute is spec-gated (VectorSpec), not oracle-gated:
    //      hash-exactness proves the funnel is the one specified, the
    //      spec proves the funnel is WORTH running. ----
    Q("q139_projected_knn",
      s"""WITH $PreparedCte,
         |pj AS (SELECT vec_id, $projListSql AS pq FROM e),
         |pjd AS (SELECT vec_id, list_transform(pq, x -> CAST(x AS DOUBLE)) AS pqd FROM pj),
         |pjn AS (SELECT vec_id, pqd, list_dot_product(pqd, pqd) AS pnsq FROM pjd),
         |cand AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY list_dot_product(a.pqd, b.pqd) / sqrt(a.pnsq * b.pnsq) DESC,
         |        b.vec_id) AS prank
         |  FROM pjn a JOIN pjn b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 10),
         |scored AS (
         |  SELECT c.qid, c.nid,
         |    list_dot_product(na.qd, nb.qd) / sqrt(na.nsq * nb.nsq) AS cos
         |  FROM cand c JOIN n na ON na.vec_id = c.qid JOIN n nb ON nb.vec_id = c.nid
         |  WHERE c.prank <= 100)
         |SELECT qid, nid, cos, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.projectedKnn(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 100,
          projDim = ProjDim, dim = Dim)
        .orderBy("qid", "rank")
    },

    // ---- PRODUCT-QUANTIZED ANN funnel (ADC + exact rerank): 64 dims →
    //      16 subspaces × 4, each coded against an 8-centroid per-
    //      subspace codebook — first-8 seeded then per-subspace
    //      Lloyd-TRAINED (2 E/M rounds, the FAISS train() step; the
    //      oracle replays BOTH rounds — packing, truncating-division
    //      update, empty-cell carry-over — so a training drift breaks
    //      the hash, the q131 precedent applied per subspace).
    //      Stage 1 ranks the corpus by asymmetric lookup distance — Σ of
    //      16 table reads per pair instead of a 64-dim dot, and at scale
    //      16 bytes of codes per corpus vector instead of 64 floats
    //      resident — keeping the top-100; stage 2 exact-reranks only
    //      those survivors (the IVFADC+rerank pattern). Encode is a
    //      NARROW map against the literal codebook (zero shuffle —
    //      PlanSpec pins no Exchange on the corpus side of the ADC
    //      join); the bounded query side carries its lookup tables and
    //      broadcasts. The oracle replays codebook derivation, the
    //      per-subspace packed argmin (same tie-break), the ADC sum, the
    //      candidate cut AND the exact rerank — all exact integer math.
    //      Recall-vs-exact-L2 is spec-gated (VectorSpec), as for q139. ----
    Q("q179_pq_knn",
      s"""WITH $PreparedCte,
         |$PqCtes,
         |ad AS (
         |  SELECT d.qid, x.vec_id AS nid, CAST(sum(d.pd) AS BIGINT) AS adist
         |  FROM codes x JOIN qdt d ON d.m = x.m AND d.cid = x.cid
         |  WHERE d.qid <> x.vec_id
         |  GROUP BY d.qid, x.vec_id),
         |cand AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS arank
         |    FROM ad) t
         |  WHERE arank <= 100),
         |scored AS (
         |  SELECT c.qid, c.nid,
         |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd)
         |      AS BIGINT) AS d2
         |  FROM cand c
         |  JOIN n na ON na.vec_id = c.qid
         |  JOIN n nb ON nb.vec_id = c.nid)
         |SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, d2,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
         |  FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.pqKnn(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 100, m = 16, ksub = 8,
          dim = Dim, pqTrainRounds = 2)
        .orderBy("qid", "rank")
    },

    // ---- SCALAR-quantized (SQ8) ANN funnel — the FAISS ScalarQuantizer
    //      analog and the remaining classic member of the quantized
    //      family next to PQ (q179) and random projection (q139): train
    //      per-dimension [min, max] bounds (ONE two-phase agg, O(dim)
    //      driver-held artifact), encode every vector to dim uint8 codes
    //      in one narrow literal-bound map, rank stage-1 candidates by
    //      exact integer L2 on the CODES (8 bits/dim resident instead of
    //      64 — the 8× memory cut that makes a billion-vector index fit),
    //      exact-rerank only the survivors. The oracle replays bounds
    //      training, the div/clamp encode, the code-distance ranking with
    //      its tie-break, the candidate cut AND the rerank — all integer.
    //      Recall-vs-exact is spec-gated (VectorSpec), as for q139/q179. ----
    Q("q198_sq8_knn", Sq8OracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.sq8Knn(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 100, dim = Dim)
        .orderBy("qid", "rank")
    },

    // ---- HARD-NEGATIVE mining — the contrastive-training-pair generator
    //      (the data-prep step behind every embedding-model finetune):
    //      per query, the top-3 highest-cosine DIFFERENT-label neighbors
    //      (the negatives that actually move the loss) plus the top-1
    //      same-label positive. ONE scored pass over the corpus with the
    //      bounded query side broadcast; both role rankings come from a
    //      single window partitioned by (qid, same-label) — no second
    //      shuffle. At 100 TB the same body runs per IVF cell or LSH
    //      bucket (candidates from the equi-join, exactly q81/q109's
    //      skeleton) — the mining logic is unchanged. ----
    Q("q201_hard_negative_mining",
      s"""WITH $PreparedCte,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |s AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
         |        list_dot_product(q.qd, c.qd) / sqrt(q.nsq * c.nsq) AS cos,
         |        lq.label = lc.label AS same
         |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
         |      JOIN lab lq ON lq.vec_id = q.vec_id
         |      JOIN lab lc ON lc.vec_id = c.vec_id
         |      WHERE q.vec_id < 10),
         |r AS (SELECT qid, nid, cos, same,
         |        row_number() OVER (PARTITION BY qid, same ORDER BY cos DESC, nid) AS rank
         |      FROM s)
         |SELECT qid, CASE WHEN same THEN 'pos' ELSE 'hard_neg' END AS role,
         |  nid, cos, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE (same AND rank <= 1) OR (NOT same AND rank <= 3)
         |ORDER BY qid, role, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.{cosine, dot}
      val emb = Tables.t(s, d, "embeddings")
      val p = Similarity.prepared(emb, "vec_id", "embedding")
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
      val qp = p.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qq"),
          col("nsq").as("qnsq"), col("label").as("qlabel"))
      val w = Window.partitionBy("qid", "same")
        .orderBy(col("cos").desc, col("nid"))
      p.join(broadcast(qp), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"),
          cosine(dot(col("qq"), col("q")), col("qnsq"), col("nsq")).as("cos"),
          (col("qlabel") === col("label")).as("same"))
        .withColumn("rank", row_number().over(w))
        .filter((col("same") && col("rank") <= 1) ||
          (!col("same") && col("rank") <= 3))
        .select(col("qid"),
          when(col("same"), lit("pos")).otherwise(lit("hard_neg")).as("role"),
          col("nid"), col("cos"), col("rank"))
        .orderBy("qid", "role", "rank")
    },

    // ---- k-NN LABEL evaluation — the embedding-quality probe a pipeline
    //      runs before trusting vectors for dedup/retrieval: predict each
    //      sampled query's label by 5-NN majority vote (ties toward the
    //      smaller label), emit per-query verdicts. The vote is integer
    //      counting over the k·|sample| neighbor frame — the corpus pays
    //      ONE scored pass (bounded sample broadcast), every later stage
    //      is sample-sized. The oracle replays neighbor ranking, the vote
    //      histogram and the deterministic tie-break. ----
    Q("q202_knn_label_eval",
      s"""WITH $PreparedCte,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |kn AS (SELECT qid, nid FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS nid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.qd, c.qd) / sqrt(q.nsq * c.nsq) DESC, c.vec_id) AS rank
         |    FROM n q JOIN n c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 50) t WHERE rank <= 5),
         |votes AS (SELECT kn.qid, lab.label, count(*) AS v
         |          FROM kn JOIN lab ON lab.vec_id = kn.nid GROUP BY kn.qid, lab.label),
         |pick AS (SELECT qid, label AS pred_label, CAST(v AS BIGINT) AS votes,
         |           row_number() OVER (PARTITION BY qid ORDER BY v DESC, label) AS pr
         |         FROM votes)
         |SELECT p.qid, lq.label AS true_label, p.pred_label, p.votes,
         |  lq.label = p.pred_label AS correct
         |FROM pick p JOIN lab lq ON lq.vec_id = p.qid
         |WHERE p.pr = 1 ORDER BY p.qid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.t(s, d, "embeddings")
      val lab = emb.select(col("vec_id"), col("label"))
      val kn = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 50), emb,
          "vec_id", "embedding", 5)
        .select("qid", "nid")
      val wV = Window.partitionBy("qid")
        .orderBy(col("v").desc, col("label"))
      kn.join(lab.withColumnRenamed("vec_id", "nid"), Seq("nid"))
        .groupBy("qid", "label").agg(count(lit(1)).as("v"))
        .withColumn("pr", row_number().over(wV))
        .filter(col("pr") === 1)
        .select(col("qid"), col("label").as("pred_label"),
          col("v").as("votes"))
        .join(lab.withColumnRenamed("vec_id", "qid")
          .withColumnRenamed("label", "true_label"), Seq("qid"))
        .select(col("qid"), col("true_label"), col("pred_label"),
          col("votes"), (col("true_label") === col("pred_label")).as("correct"))
        .orderBy("qid")
    },

    // ---- MATRYOSHKA (MRL) two-stage kNN: candidates ranked on the
    //      FIRST 16 of 64 dims — the prefix-is-a-valid-embedding serving
    //      pattern modern embedding APIs expose — then exact rerank on
    //      the full dims. The third width-reduction route next to random
    //      projection (q139: no training, scrambled axes) and SQ8 (q198:
    //      all dims, lower precision): slicing is free and axis-aligned,
    //      and at scale the prefix-only index is resident in 1/4 the
    //      memory. Oracle replays the slice, prefix-L2 ranking with its
    //      tie-break, the cut and the rerank. ----
    Q("q206_matryoshka_rerank", MatryoshkaOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.matryoshkaKnn(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 100, prefixDim = 16)
        .orderBy("qid", "rank")
    },

    // ---- SQ8 index PERSISTENCE (round-13 verdict item 3 — the q189
    //      write_index/read_index split for the scalar-quantized
    //      variant): build the bounds + code table, save (codes parquet
    //      + dim-row bounds + params LAST with the on-disk count), load
    //      into a FRESH handle through the shared ArtifactParams
    //      validation, and serve the query batch from the LOADED
    //      handle. Gated against the SAME oracle instance as q198, so
    //      the hash proves load ≡ build ≡ inline — a deployment that
    //      picked SQ8 for its 8× memory cut now survives restart. ----
    Q("q251_sq8_save_load", Sq8OracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      // cached build (the q189 buildCached stance): the timed work is
      // the artifact round-trip + serve, not repeated bounds training
      val idx = Sq8Index.buildCached(emb, d, "vec_id", "embedding",
        dim = Dim)
      val dir = sq8Dir(d)
      idx.save(dir)
      val loaded = Sq8Index.load(s, dir, emb)
      val out = loaded.query(emb.filter(col("vec_id") < 10), k = 5,
          candidates = 100)
        .orderBy("qid", "rank")
      // materialize (bounded: k·|queries| rows) before release — the
      // artifact dir is overwritten by the NEXT invocation (q187 rule)
      val served = out.collect()
      loaded.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- MATRYOSHKA index persistence (the same split for prefix
    //      serving): the persisted table is the prefix slice — 1/4 the
    //      resident bytes — params-written-last with the on-disk count;
    //      the loaded handle serves with the exact full-dim rerank
    //      against the corpus binding. Same oracle instance as q206. ----
    Q("q252_matryoshka_save_load", MatryoshkaOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = MatryoshkaIndex.buildCached(emb, d, "vec_id", "embedding",
        prefixDim = 16)
      val dir = mryDir(d)
      idx.save(dir)
      val loaded = MatryoshkaIndex.load(s, dir, emb)
      val out = loaded.query(emb.filter(col("vec_id") < 10), k = 5,
          candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      loaded.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- SQ8 incremental APPEND (the q187 stance for the SQ8 family):
    //      bounds train on the BASE corpus only, the delta is encoded
    //      under the FROZEN bounds (FAISS's train-on-sample /
    //      add-everything split — no retraining, no base re-encode),
    //      and the appended handle serves base ∪ delta. The oracle
    //      restricts ONLY the bounds-training scan (the shared
    //      sq8Oracle body); encode/candidates/rerank see the union —
    //      exactly the semantic contract under test. ----
    // gated body builds the base FRESH (Verify exercises real bounds
    // training); bench body appends onto the cached base — the q187
    // withBench stance, ONE shared body so the two cannot drift
    Q.withBench("q254_sq8_append",
      sq8Oracle(trainFilter = s" WHERE vec_id < $AppendBase")) { (s, d) =>
      sq8AppendServe(s, d, cachedBuild = false)
    } { (s, d) =>
      sq8AppendServe(s, d, cachedBuild = true)
    },

    // ---- MATRYOSHKA incremental append: slicing has NO trained state,
    //      so an appended index must serve EXACTLY what a full build
    //      serves — gated against the SAME oracle instance as q206/q252
    //      (the strongest possible append contract: appended ≡ inline,
    //      not merely appended ≡ train-on-base). ----
    Q.withBench("q255_matryoshka_append", MatryoshkaOracleSql) { (s, d) =>
      mryAppendServe(s, d, cachedBuild = false)
    } { (s, d) =>
      mryAppendServe(s, d, cachedBuild = true)
    },

    // ---- SQ8 delete (the q219 stance: FAISS remove_ids for the SQ8
    //      family): one anti-join drops the code rows, the corpus
    //      binding drops the same ids for the rerank — no retraining
    //      (bounds describe a distribution, not a membership set). The
    //      oracle keeps bounds trained on EVERYTHING and filters only
    //      the corpus side of the candidate join — exactly the
    //      train-on-everything-serve-remaining contract. ----
    Q.withBench("q256_sq8_delete",
      sq8Oracle(adFilter = " AND b.vec_id % 10 <> 3")) { (s, d) =>
      sq8DeleteServe(s, d, cachedBuild = false)
    } { (s, d) =>
      sq8DeleteServe(s, d, cachedBuild = true)
    },

    // ---- SQ8 metadata-FILTERED serving (the q220 stance): the
    //      allow-list semi-joins the materialized codes BEFORE the
    //      candidate cut, so the whole candidate budget is spent on
    //      admissible vectors. ----
    Q("q257_sq8_filtered_search",
      sq8Oracle(adFilter = " AND b.vec_id IN" +
        " (SELECT vec_id FROM embeddings WHERE label < 5)")) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = Sq8Index.buildCached(emb, d, "vec_id", "embedding",
        dim = Dim)
      val out = idx.queryFiltered(emb.filter(col("vec_id") < 10),
          emb.filter(col("label") < 5).select("vec_id"),
          k = 5, candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- matryoshka delete + filtered serving (the same two cells for
    //      the prefix family — nothing trained, so delete needs no
    //      validity argument at all). ----
    Q.withBench("q258_matryoshka_delete",
      mryOracle(adFilter = " AND b.vec_id % 10 <> 3")) { (s, d) =>
      mryDeleteServe(s, d, cachedBuild = false)
    } { (s, d) =>
      mryDeleteServe(s, d, cachedBuild = true)
    },

    // ---- SQ8 / matryoshka STREAMING serve (the q193 cell for both new
    //      families): query vectors arrive as a REAL file stream in
    //      three micro-batches, each served from the ONE resident
    //      handle — gated against the SAME oracle instances as
    //      q198/q206, so the hash proves stream-served ≡ batch-served
    //      and the handle amortizes across arrivals exactly as in
    //      production. ----
    Q("q261_sq8_stream_serve", Sq8OracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = Sq8Index.buildCached(emb, d, "vec_id", "embedding",
        dim = Dim)
      val dir = sq8StreamDir(d)
      Seq((0L, 3L), (3L, 6L), (6L, 10L)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/b$i")
      }
      val schema = idx.query(emb.limit(0), k = 5, candidates = 100).schema
      val out = fileStreamDrain(s, emb.schema, s"$dir/b*", schema,
          Seq("qid", "rank")) { batch =>
        idx.query(batch, k = 5, candidates = 100).collect()
      }
      out
    },

    Q("q262_matryoshka_stream_serve", MatryoshkaOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = MatryoshkaIndex.buildCached(emb, d, "vec_id", "embedding",
        prefixDim = 16)
      val dir = mryStreamDir(d)
      Seq((0L, 3L), (3L, 6L), (6L, 10L)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/b$i")
      }
      val schema = idx.query(emb.limit(0), k = 5, candidates = 100).schema
      val out = fileStreamDrain(s, emb.schema, s"$dir/b*", schema,
          Seq("qid", "rank")) { batch =>
        idx.query(batch, k = 5, candidates = 100).collect()
      }
      out
    },

    // ---- SQ8 MIPS via the norm-augmentation reduction (the q249
    //      stance for the scalar-quantized family — metric generality
    //      with ZERO new operators): corpus += sqrt(maxNorm² − ‖x‖²),
    //      queries += 0, and the UNCHANGED SQ8 L2 funnel serves
    //      largest-dot neighbors. Bounds train on the augmented corpus;
    //      the oracle replays the shared augmentation CTEs + the shared
    //      SQ8 stage text with the query/corpus seam split. With q251
    //      (load ≡ build) this gives artifact-served MIPS by
    //      composition — the augmentation is an input transform, not
    //      index state. ----
    Q("q263_sq8_mips", Sq8MipsOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      // the augmented corpus's plan hash keys a SEPARATE cache entry
      // from the plain-L2 q251/q257 handle (the buildCached contract)
      val idx = Sq8Index.buildCached(mipsAugmented(emb), d, "vec_id",
        "embedding", dim = Dim + 1)
      val out = idx.query(
          mipsAugmentedZero(emb.filter(col("vec_id") < 10)),
          k = 5, candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- matryoshka MIPS (the q263 composition for the prefix
    //      family): the augmented component lands OUTSIDE the prefix,
    //      so candidates rank by the original direction and the exact
    //      augmented rerank decides by dot product. ----
    Q("q264_matryoshka_mips", MryMipsOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = MatryoshkaIndex.buildCached(mipsAugmented(emb), d,
        "vec_id", "embedding", prefixDim = 16)
      // candidates = 200 (vs the L2 family's 100): prefix-L2 routes by
      // the original direction, a weaker proxy for the DOT order than
      // for the L2 order, so MIPS buys recall with a wider stage-1 cut
      // (measured 0.72 → ≥0.9 recall@5 on the fixture) — still a
      // bounded per-query budget, never corpus-sized
      val out = idx.query(
          mipsAugmentedZero(emb.filter(col("vec_id") < 10)),
          k = 5, candidates = 200)
        .orderBy("qid", "rank")
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- SQ8 MIPS from the PERSISTED artifact (the q250 analog for
    //      the scalar-quantized family — what the q263 scaladoc
    //      promised "by composition", now gated): the SQ8 artifact is
    //      METRIC-FREE (bounds + codes over whatever geometry they were
    //      trained in), so a loaded augmented-space index serves inner
    //      product identically to the in-memory handle, across a
    //      process-restart boundary and with zero training or encode
    //      jobs on the load path. SAME oracle instance as q263:
    //      identical hash ⇒ load ≡ build, metric included. ----
    Q("q265_sq8_mips_from_artifact", Sq8MipsOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val corpusAug = mipsAugmented(emb)
      val idx = Sq8Index.buildCached(corpusAug, d, "vec_id", "embedding",
        dim = Dim + 1)
      val dir = sq8MipsDir(d)
      idx.save(dir)
      // the corpus binding on load is the SAME augmented frame the
      // saved index encoded (the IvfAdcIndex.load contract) — the
      // augmentation is an input transform, not index state, so the
      // restart story only has to re-derive a narrow map
      val loaded = Sq8Index.load(s, dir, corpusAug)
      val out = loaded.query(
          mipsAugmentedZero(emb.filter(col("vec_id") < 10)),
          k = 5, candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      loaded.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- matryoshka MIPS from the PERSISTED artifact (the q265
    //      composition for the prefix family): the persisted prefix
    //      slice is the FIRST 16 of the 65 augmented components — the
    //      augmented coordinate lands outside it — so the artifact is
    //      byte-identical to the L2 family's and only the rerank's
    //      corpus binding carries the metric. SAME oracle instance as
    //      q264, MIPS-widened candidates (200). ----
    Q("q266_matryoshka_mips_from_artifact", MryMipsOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val corpusAug = mipsAugmented(emb)
      val idx = MatryoshkaIndex.buildCached(corpusAug, d, "vec_id",
        "embedding", prefixDim = 16)
      val dir = mryMipsDir(d)
      idx.save(dir)
      val loaded = MatryoshkaIndex.load(s, dir, corpusAug)
      val out = loaded.query(
          mipsAugmentedZero(emb.filter(col("vec_id") < 10)),
          k = 5, candidates = 200)
        .orderBy("qid", "rank")
      val served = out.collect()
      loaded.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    Q("q259_matryoshka_filtered_search",
      mryOracle(adFilter = " AND b.vec_id IN" +
        " (SELECT vec_id FROM embeddings WHERE label < 5)")) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = MatryoshkaIndex.buildCached(emb, d, "vec_id", "embedding",
        prefixDim = 16)
      val out = idx.queryFiltered(emb.filter(col("vec_id") < 10),
          emb.filter(col("label") < 5).select("vec_id"),
          k = 5, candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- index INTROSPECTION: per-cell occupancy of the resident
    //      IVF-ADC index plus whole-index summary (total, max,
    //      imbalance in ppm of the uniform share) — the FAISS invlists
    //      stats a serving deployment monitors to know when per-list
    //      skew defeats the nprobe·(n/nlist) cost model and a retrain
    //      or compaction is due. Runs against the MEMOIZED q185 handle
    //      (one ≤ nlist-group agg over the materialized codes — zero
    //      training or encode); the oracle replays the coarse-quantizer
    //      training and cell assignment, so the gate pins that the
    //      SERVED index's list structure is exactly the trained
    //      assignment. ----
    Q("q207_ann_index_stats", {
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |g AS (SELECT CAST(cid AS BIGINT) AS cell, count(*) AS n FROM asg GROUP BY cid)
         |SELECT cell, CAST(n AS BIGINT) AS n_codes,
         |  CAST(sum(n) OVER () AS BIGINT) AS total_codes,
         |  CAST(max(n) OVER () AS BIGINT) AS max_codes,
         |  CAST((max(n) OVER ()) * 8 * 1000000 // (sum(n) OVER ()) AS BIGINT) AS imbalance_ppm
         |FROM g ORDER BY cell""".stripMargin
    }) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      idx.stats.orderBy("cell")
    },

    // ---- embedding DISTRIBUTION-drift monitor (χ² over base-derived
    //      norm deciles, exact integer ppm): the population-stability
    //      check ML-ops runs on every ingest batch, complementing q190's
    //      recall trigger — recall says the index DEGRADED, this says
    //      the DATA moved, before any query suffers. Decile thresholds
    //      come from the exact rank formula over the BASE reference
    //      (a drift monitor's reference is a bounded sample by
    //      construction — the q115 window rule), ship as one broadcast
    //      9-element array; bucketing is a narrow map on both sides;
    //      χ²_ppm = Σ (o·nb − e·nd)²·10⁶ div (e·nd·nb) is the textbook
    //      statistic in truncating integer math, judged against the
    //      df=9, α=0.05 critical value (16.919). The oracle replays
    //      thresholds, bucketing, every term and the verdict. ----
    Q("q210_embedding_drift_chi2",
      s"""WITH $PreparedCte,
         |base AS (SELECT vec_id, CAST(nsq AS BIGINT) AS v FROM n WHERE vec_id < 400),
         |delta AS (SELECT vec_id, CAST(nsq AS BIGINT) AS v FROM n WHERE vec_id >= 400),
         |${SimilarityOps.driftChi2TailSql("vec_id")}""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.normDriftChi2(
          emb.filter(col("vec_id") < 400),
          emb.filter(col("vec_id") >= 400),
          "vec_id", "embedding")
        .orderBy("bucket")
    },

    // ---- STREAMING drift gate: q210's χ² monitor as the ingest front
    //      door actually runs it — each arriving micro-batch is scored
    //      against the RESIDENT base reference and gets its own
    //      verdict row set. Three single-file arrivals
    //      (maxFilesPerTrigger=1, the q193 pattern) carved from the
    //      delta by vec_id % 3, so batch composition is an engine-
    //      replayable rule, not an accident of file order; the oracle
    //      replays all three per-batch χ² computations (thresholds from
    //      the base EVERY time — the reference is fixed, the batches
    //      move) via three copies of the shared tail. Per-batch cost is
    //      the batch-sized bucketing plus the base threshold pass —
    //      production holds the 9 thresholds resident instead of
    //      recomputing, which this gate deliberately does NOT cache so
    //      the hash pins the full derivation. ----
    Q("q213_stream_drift_gate", {
      val subs = (0 to 2).map { g =>
        s"""SELECT CAST($g AS INTEGER) AS grp, * FROM (WITH ${preparedCte()},
           |base AS (SELECT vec_id, CAST(nsq AS BIGINT) AS v FROM n WHERE vec_id < 400),
           |delta AS (SELECT vec_id, CAST(nsq AS BIGINT) AS v FROM n WHERE vec_id >= 400 AND vec_id % 3 = $g),
           |${SimilarityOps.driftChi2TailSql("vec_id")})""".stripMargin
      }
      subs.mkString("\n UNION ALL \n") + "\n ORDER BY grp, bucket"
    }) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < 400)
      val dir = streamDir(d)
      (0 to 2).foreach { g =>
        emb.filter(col("vec_id") >= 400 && col("vec_id") % 3 === g)
          .withColumn("grp", lit(g))
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/dg$g")
      }
      val outSchema = Similarity.normDriftChi2(base, emb.limit(0),
          "vec_id", "embedding")
        .withColumn("grp", lit(0))
        .select("grp", "bucket", "base_n", "delta_n",
          "chi2_term_ppm", "chi2_total_ppm", "drifted").schema
      fileStreamDrain(s, emb.withColumn("grp", lit(0)).schema,
          s"$dir/dg*", outSchema, Seq("grp", "bucket")) { batch =>
        val g = batch.select(min(col("grp"))).head().getInt(0)
        Similarity.normDriftChi2(base, batch, "vec_id", "embedding")
          .withColumn("grp", lit(g))
          .select("grp", "bucket", "base_n", "delta_n",
            "chi2_term_ppm", "chi2_total_ppm", "drifted")
          .collect()
      }
    },

    // ---- IVF-ADC: the COMPLETE billion-scale ANN architecture — q109's
    //      trained coarse quantizer routes each query to its 2 nearest
    //      of 8 Lloyd-trained cells, q179's PQ codes score the probed
    //      lists by asymmetric lookup distance, and only the top-50 ADC
    //      survivors get exact reranking. The materialized (nid, cell,
    //      codes) frame IS the IVFADC index, built in ONE narrow map
    //      (cell argmin + 16 code argmins against literal centroids,
    //      zero corpus shuffle); candidate generation is an equi-join on
    //      the cell id against the broadcast routed queries, so per-query
    //      cost tracks nprobe·(n/nlist) — never the corpus. The oracle
    //      replays the 2-round Lloyd training of the COARSE quantizer,
    //      the cell argmin, the per-subspace 2-round Lloyd training of
    //      the PQ codebook + encode, the ADC sum within probed lists,
    //      the candidate cut AND the rerank — a drift anywhere in the
    //      composed route breaks the hash. ----
    Q("q184_ivf_adc_knn", IvfAdcOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.ivfAdcKnn(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 50, nlist = 8,
          nprobe = 2, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
          pqTrainRounds = 2)
        .orderBy("qid", "rank")
    },

    // ---- IVF-RADC: residual encoding — the construction FAISS's
    //      IndexIVFPQ actually runs (Jégou et al. 2011 §IV): PQ encodes
    //      x − c(cell), so each codebook covers only within-cell spread
    //      and ADC error drops at the same code size. Query-side ADC
    //      tables become per-PROBED-CELL (the query residual differs per
    //      cell) — still bounded, still broadcast. The oracle replays
    //      residual computation (integer zip_with subtraction against
    //      the trained centroids), residual-PQ training (the pqCtes
    //      machinery re-pointed at the residual frame), the per-cell
    //      query tables and the cell-keyed ADC join; cut + rerank is
    //      the SAME shared AdcCutRerankSql tail as q184. ----
    Q("q223_ivf_radc_knn",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |resn AS MATERIALIZED (
         |  SELECT n.vec_id, a.cid AS cell,
         |    list_transform(range(1, ${Dim + 1}), i ->
         |      n.qd[CAST(i AS INTEGER)] - c.cqd[CAST(i AS INTEGER)]) AS qd
         |  FROM n JOIN asg a USING (vec_id) JOIN c ON c.cid = a.cid),
         |${pqCtes(qdtWhere = "FALSE", from = "resn")},
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd), c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 10),
         |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
         |qres AS (
         |  SELECT pr.qid, pr.cid AS cell,
         |    list_transform(range(1, ${Dim + 1}), i ->
         |      n.qd[CAST(i AS INTEGER)] - c.cqd[CAST(i AS INTEGER)]) AS rqd
         |  FROM pr JOIN n ON n.vec_id = pr.qid JOIN c ON c.cid = pr.cid),
         |qsn AS (
         |  SELECT qid, cell, ms.m,
         |    rqd[CAST(ms.m * 4 + 1 AS INTEGER):CAST(ms.m * 4 + 4 AS INTEGER)] AS sq
         |  FROM qres, ms),
         |rqdt AS (
         |  SELECT s.qid, s.cell, cq.m, cq.cid AS code_cid,
         |    CAST(list_dot_product(s.sq, s.sq) + cq.cnsq
         |      - 2 * list_dot_product(s.sq, cq.cq) AS BIGINT) AS pd
         |  FROM qsn s JOIN cbq cq ON cq.m = s.m),
         |ad AS (
         |  SELECT pr.qid, rx.vec_id AS nid, CAST(sum(t.pd) AS BIGINT) AS adist
         |  FROM pr
         |  JOIN resn rx ON rx.cell = pr.cid AND rx.vec_id <> pr.qid
         |  JOIN codes x ON x.vec_id = rx.vec_id
         |  JOIN rqdt t ON t.qid = pr.qid AND t.cell = pr.cid
         |    AND t.m = x.m AND t.code_cid = x.cid
         |  GROUP BY pr.qid, rx.vec_id),
         |$AdcCutRerankSql
         |SELECT qid, nid, d2, rank FROM appr ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.ivfRadcKnn(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 50, nlist = 8,
          nprobe = 2, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
          pqTrainRounds = 2)
        .orderBy("qid", "rank")
    },

    // ---- the same IVF-ADC query through the SERVING lifecycle: a
    //      production vector store builds its index ONCE (train
    //      quantizers, encode the corpus, persist the inverted lists)
    //      and answers every query batch against the materialized
    //      artifact — [[IvfAdcIndex]]. Gated against the SAME oracle as
    //      q184, so the hash proves handle-served ≡ inline rebuild; in
    //      Bench the memoized build amortizes across the timed passes,
    //      so q185's number is what serving actually costs (route + ADC
    //      + rerank, zero training/encode). ----
    Q("q185_ann_index_serve", IvfAdcOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      idx.query(emb.filter(col("vec_id") < 10), k = 5, candidates = 50,
          nprobe = 2)
        .orderBy("qid", "rank")
    },

    // ---- INCREMENTAL index maintenance (the nightly-delta pattern —
    //      FAISS's train-on-sample/add-everything split): quantizers
    //      train on the base corpus (vec_id < 400) and are then FROZEN;
    //      the delta is encoded with one narrow map and unioned into the
    //      inverted lists — no retraining, no re-encode of the base.
    //      The oracle restricts ONLY the training CTE reads (coarse
    //      Lloyd E/M + per-subspace PQ E/M) to the base and replays
    //      encode/route/ADC/rerank over the union, so the hash proves
    //      append ≡ train-on-base-encode-everything exactly. The body
    //      serves, materializes its BOUNDED top-k result (k·|queries|
    //      rows — the merge-list-collect class), then decommissions
    //      both handles: an appended index is snapshot-backed, so
    //      nothing may stay lazy past release() — q185 owns the
    //      resident-serving story. ----
    // Bench body: cached BASE build (the q190 withBench stance) — the
    // timed work is the APPEND (one narrow delta encode) + serve;
    // Verify gates the fresh-build run body.
    Q.withBench("q187_ann_index_append", ivfAdcOracle(
        trainLloyd = s"\n  WHERE n.vec_id < $AppendBase",
        trainPq = s"\n    AND s.vec_id < $AppendBase"))(
      (s, d) => ivfAppendServe(s, d, cachedBuild = false))(
      (s, d) => ivfAppendServe(s, d, cachedBuild = true)),

    // ---- index COMPACTION after append — the LSM merge completing the
    //      q187 lifecycle: the appended index's inverted lists live in
    //      one block set per union leg; compact() shuffles the codes
    //      ONCE by cell so each list is colocated, persists independent
    //      storage, and the fragmented source handle is released before
    //      serving. Gated against the SAME oracle as q187 — compaction
    //      is pure storage reorganization, so the hash proves
    //      compacted ≡ appended ≡ train-on-base-encode-everything.
    //      AnnIndexSpec pins row-for-row equality, storage
    //      independence (source released, compacted still serves) and
    //      release accounting. ----
    // Bench body: cached BASE build (the q190 withBench stance) — the
    // timed work is append + COMPACT + serve; Verify gates the
    // fresh-build run body.
    Q.withBench("q205_ann_index_compact", ivfAdcOracle(
        trainLloyd = s"\n  WHERE n.vec_id < $AppendBase",
        trainPq = s"\n    AND s.vec_id < $AppendBase"))(
      (s, d) => ivfCompactServe(s, d, cachedBuild = false))(
      (s, d) => ivfCompactServe(s, d, cachedBuild = true)),

    // ---- ANN recall CANARY: per-query recall@5 of the SERVED index
    //      against the exact squared-L2 top-5 on a sampled query set —
    //      the continuous quality monitor a production vector store
    //      schedules (quantizer drift after appends shows up HERE, as a
    //      falling recall, never as wrong exact-rerank results). The
    //      oracle replays the full IVF-ADC route (appr) AND the exact
    //      gold, then the left-join hit count — ratios are exact-int /
    //      small-int in DOUBLE, identical in both engines. Exact side is
    //      brute force BY DESIGN: the canary runs on k·|sample| rows,
    //      never the corpus against itself. Serves from the same
    //      memoized handle as q185 (no extra storage). ----
    Q("q188_ann_recall_canary",
      s"""WITH ${ivfAdcCtes()},
         |exact AS (
         |  SELECT qid, nid FROM (
         |    SELECT a.vec_id AS qid, b.vec_id AS nid,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |        CAST(a.nsq + b.nsq - 2 * list_dot_product(a.qd, b.qd) AS BIGINT),
         |        b.vec_id) AS rk
         |    FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id) t
         |  WHERE rk <= 5)
         |SELECT e.qid, CAST(count(a.nid) AS BIGINT) AS hits,
         |  CAST(count(a.nid) AS DOUBLE) / 5 AS recall
         |FROM exact e
         |LEFT JOIN appr a ON a.qid = e.qid AND a.nid = e.nid
         |GROUP BY e.qid ORDER BY e.qid""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      val appr = idx.query(queries, k = 5, candidates = 50, nprobe = 2)
        .select(col("qid"), col("nid"), lit(1).as("hit"))
      Similarity.exactL2Knn(queries, emb, "vec_id", "embedding", k = 5)
        .select("qid", "nid")
        .join(appr, Seq("qid", "nid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"))
        .select(col("qid"), col("hits"),
          (col("hits").cast("double") / 5).as("recall"))
        .orderBy("qid")
    },

    // ---- index PERSISTENCE (the FAISS write_index/read_index split —
    //      round-8 verdict item 2): the built index is saved as an
    //      on-disk artifact (codes parquet + tiny codebook/centroid/
    //      param tables), loaded back into a FRESH handle, and the
    //      loaded handle serves the query batch. Gated against the SAME
    //      oracle as q184/q185, so the hash proves load ≡ build ≡
    //      inline — the artifact round-trip loses nothing. The timed
    //      work is the round-trip itself (save + load + serve), the
    //      cost a deployment pays to survive process restart; zero
    //      training or encode jobs on the load path (AnnIndexSpec pins
    //      the loaded plan encode-free). ----
    Q("q189_ann_index_save_load", IvfAdcOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      val dir = idxDir(d)
      idx.save(dir)
      val loaded = IvfAdcIndex.load(s, dir, emb)
      val out = loaded.query(emb.filter(col("vec_id") < 10), k = 5,
          candidates = 50, nprobe = 2)
        .orderBy("qid", "rank")
      // materialize (bounded: k·|queries| rows) before release — the
      // artifact dir is overwritten by the NEXT invocation, so nothing
      // may stay lazy over this load's files (the q187 rule)
      val served = out.collect()
      loaded.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- metadata-FILTERED vector search ("WHERE label < 5" + top-k —
    //      the filtered-ANN feature every production store exposes):
    //      the allow-list semi-joins the materialized codes BEFORE the
    //      ADC candidate cut, so the candidate budget is spent entirely
    //      on admissible vectors (a post-filter over k results would
    //      starve the top-k under selective predicates). Serves from
    //      the q185 memoized handle — the filter is per-QUERY state,
    //      never baked into the index. The oracle filters the same
    //      inverted-list side (`ad`) by the label predicate, training/
    //      encode untouched, so the hash proves filtered-serve ≡
    //      train-on-all-rank-among-allowed. ----
    Q("q220_ann_filtered_search", ivfAdcOracle(
        adFilter = "\n    AND a.vec_id IN" +
          " (SELECT vec_id FROM embeddings WHERE label < 5)")) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      idx.queryFiltered(emb.filter(col("vec_id") < 10),
          emb.filter(col("label") < 5).select("vec_id"),
          k = 5, candidates = 50, nprobe = 2)
        .orderBy("qid", "rank")
    },

    // ---- nprobe/recall TUNING SWEEP: the operating-curve artifact a
    //      vector-store deployment publishes before picking its serving
    //      point — recall@5 vs exact gold at nprobe ∈ {1, 2, 4}, all
    //      three depths served from the SAME memoized handle (routing
    //      is rank-once-cut-thrice; no rebuild per depth). The oracle
    //      replays one shared route ranking and one cut+rerank chain
    //      PER depth (the suffixed AdcCutRerankSql), plus the exact
    //      gold and the per-depth hit join — monotonicity of the curve
    //      is data, not assumption. Cost: three bounded serves + one
    //      exact pass over the 10-query sample. ----
    Q("q224_ann_nprobe_sweep", {
      val perNp = Seq(1, 2, 4).map { np =>
        s"""pr_$np AS (SELECT qid, cid FROM qr WHERE crn <= $np),
           |ad_$np AS (
           |  SELECT pr_$np.qid, a.vec_id AS nid,
           |    CAST(sum(t.pd) AS BIGINT) AS adist
           |  FROM pr_$np
           |  JOIN asg a ON a.cid = pr_$np.cid AND a.vec_id <> pr_$np.qid
           |  JOIN codes x ON x.vec_id = a.vec_id
           |  JOIN qdt t ON t.qid = pr_$np.qid AND t.m = x.m AND t.cid = x.cid
           |  GROUP BY pr_$np.qid, a.vec_id),
           |${adcCutRerankSql(s"_$np")}""".stripMargin
      }.mkString(",\n")
      val recalls = Seq(1, 2, 4).map { np =>
        s"""SELECT $np AS nprobe,
           |  CAST(count(a.nid) AS BIGINT) AS hits,
           |  CAST(count(*) AS BIGINT) AS total,
           |  CAST(count(a.nid) AS DOUBLE) / count(*) AS recall
           |FROM exact e LEFT JOIN appr_$np a
           |  ON a.qid = e.qid AND a.nid = e.nid""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |${pqCtes()},
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd), c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 10),
         |$perNp,
         |exact AS (
         |  SELECT qid, nid FROM (
         |    SELECT a.vec_id AS qid, b.vec_id AS nid,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |        CAST(a.nsq + b.nsq - 2 * list_dot_product(a.qd, b.qd) AS BIGINT),
         |        b.vec_id) AS rk
         |    FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id) t
         |  WHERE rk <= 5)
         |SELECT * FROM ($recalls) ORDER BY nprobe""".stripMargin
    }) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      val queries = emb.filter(col("vec_id") < 10)
      val exact = Similarity.exactL2Knn(queries, emb, "vec_id",
          "embedding", 5)
        .select("qid", "nid")
      Seq(1, 2, 4).map { np =>
        val appr = idx.query(queries, k = 5, candidates = 50, nprobe = np)
          .select(col("qid"), col("nid"), lit(1).as("hit"))
        exact.join(appr, Seq("qid", "nid"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"),
            count(lit(1)).as("total"))
          .select(lit(np).as("nprobe"), col("hits"), col("total"),
            (col("hits").cast("double") / col("total")).as("recall"))
      }.reduce(_ union _)
        .orderBy("nprobe")
    },

    // ---- index DELETION (FAISS remove_ids — the lifecycle step q187/
    //      q205/q216 don't cover: corpus retractions / GDPR deletes):
    //      build on the FULL corpus, remove every vec_id ≡ 3 (mod 10),
    //      serve the survivors. One anti-join on the materialized codes;
    //      no retraining, no re-encode — the oracle keeps training and
    //      encode over EVERYTHING and filters only the inverted-list
    //      side (`ad`), so the hash proves delete ≡ train-on-all-serve-
    //      remaining, and that a deleted vector can never resurface as
    //      a candidate OR a rerank row. ----
    // Bench body: cached pre-delete build (the q190 withBench stance)
    // — the timed work is the DELETE (one anti-join over the codes) +
    // serve; Verify gates the fresh-build run body.
    Q.withBench("q219_ann_index_delete", ivfAdcOracle(
        adFilter = "\n    AND a.vec_id % 10 <> 3"))(
      (s, d) => ivfDeleteServe(s, d, cachedBuild = false))(
      (s, d) => ivfDeleteServe(s, d, cachedBuild = true)),

    // ---- PERSISTED lifecycle chain (round-9 advice item 3): q189 gates
    //      save/load on a freshly BUILT index; the nightly production
    //      path is load → append → compact → save → load → serve — every
    //      hop through the on-disk artifact. Night 0 builds on the base
    //      and saves; night 1 LOADS that artifact (zero training/encode),
    //      appends the delta under the frozen loaded quantizers, compacts,
    //      saves the new artifact, and serving happens from the RELOADED
    //      night-1 artifact. Gated against the SAME oracle as q187/q205
    //      (append ≡ train-on-base-encode-everything), so the hash proves
    //      the whole chain — including both artifact round-trips — loses
    //      nothing: a quantizer mis-serialized, a code row dropped by
    //      compaction, or a version skew anywhere breaks it. Each handle
    //      is released as soon as its successor is materialized (the
    //      q187 decommission rule). ----
    // Bench body: cached night-0 build (the q190 withBench stance) —
    // the timed work is the CHAIN (save → load → append → compact →
    // save → load → serve, both artifact round-trips); Verify gates
    // the fresh-build run body.
    Q.withBench("q216_ann_lifecycle_chain", ivfAdcOracle(
        trainLloyd = s"\n  WHERE n.vec_id < $AppendBase",
        trainPq = s"\n    AND s.vec_id < $AppendBase"))(
      (s, d) => ivfChainServe(s, d, cachedBuild = false))(
      (s, d) => ivfChainServe(s, d, cachedBuild = true)),

    // ---- ONLINE serving (the q82/q151 batch≡stream precedent applied
    //      to the vector store): query vectors ARRIVE as a real file
    //      stream — three single-file drops, maxFilesPerTrigger=1, so
    //      ≥3 genuine micro-batches — and every micro-batch is answered
    //      via foreachBatch against the RESIDENT memoized index (zero
    //      training/encode per batch; per-query top-k is independent of
    //      co-arriving queries, so the union over micro-batches must
    //      equal one batch serve). Gated against the SAME oracle as
    //      q184/q185/q189: the hash proves stream-served ≡ batch-served
    //      ≡ inline rebuild. Driver-side accumulation is bounded by
    //      definition (k·|queries| = 50 rows — the merge-list-collect
    //      class); AnnIndexSpec keeps the union-equality property test. ----
    Q("q193_ann_stream_serve", IvfAdcOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      // stage the 10 query vectors as three single-file arrivals; the
      // dir is cached per data dir (the idxDirs/rtDirs rule) so bench
      // passes overwrite rather than accumulate
      val dir = streamDir(d)
      Seq((0L, 3L), (3L, 6L), (6L, 10L)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/b$i")
      }
      val schema = idx.query(emb.limit(0), k = 5, candidates = 50,
        nprobe = 2).schema
      fileStreamDrain(s, emb.schema, s"$dir/b*", schema,
          Seq("qid", "rank")) { batch =>
        idx.query(batch, k = 5, candidates = 50, nprobe = 2).collect()
      }
    },

    // ---- HYBRID retrieval (RRF): the production RAG front door fuses
    //      the lexical ranker (q142's BM25 — the shared bm25Ctes body,
    //      so the term math cannot drift from its standalone gate) with
    //      the dense ANN route (q126's trained-IVF cosine) by
    //      reciprocal-rank fusion in integer PPM (1000000 div (60+r) —
    //      rank-discriminating for r ≤ 10, exact in both engines; no
    //      float sums). Each ranker contributes its top-10; the fused
    //      top-5 carries both source ranks as audit columns (0 = that
    //      ranker didn't surface the candidate). Scale shape: both
    //      rankers are already bounded-probe pipelines (probes/queries
    //      broadcast, corpus never self-joined); the fusion itself is a
    //      full-outer join of two k·|queries| frames — driver-free and
    //      tiny at any corpus size. ----
    Q("q194_hybrid_rrf",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd), c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 5),
         |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
         |dcand AS (
         |  SELECT pr.qid, a.vec_id AS nid
         |  FROM pr JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.qid),
         |dsc AS (
         |  SELECT qid, nid,
         |    list_dot_product(qn.qd, nn.qd) / sqrt(qn.nsq * nn.nsq) AS cos
         |  FROM dcand JOIN n qn ON qn.vec_id = qid JOIN n nn ON nn.vec_id = nid),
         |dtop AS (SELECT qid, nid, drank FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS drank
         |  FROM dsc) t WHERE drank <= 10),
         |${rrfFusionTailSql("dtop")}""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val dense = Similarity.ivfKnn(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 10, nlist = 8, nprobe = 2,
          trainRounds = 2)
        .select(col("qid"), col("nid"), col("rank").as("drank"))
      fuseRrf(s, d, dense)
    },

    // ---- DRIFT-TRIGGERED RETRAIN (the maintenance loop q187/q188/q184
    //      exist for): append a PLANTED-DRIFT delta (embeddings scaled
    //      by 2^-4 — exact in both engines' float math, and a real
    //      distribution shift: the collapsed delta defeats the frozen
    //      base-trained codebooks, see DriftMaintOracleSql) under
    //      frozen quantizers, run the recall canary against exact gold
    //      on a sample that straddles the drift boundary, and REBUILD
    //      with retrained quantizers because the canary trips (measured
    //      frozen recall sits well under the threshold at every SF).
    //      The oracle replays the ENTIRE loop — frozen route, gold,
    //      integer decision, retrained route — so the hash proves both
    //      the decision and the served rows. Decision audit columns
    //      ride on every row. ----
    Q.withBench("q190_ann_drift_retrain", DriftMaintOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < AppendBase)
        .select(col("vec_id"), col("embedding"))
      val delta = emb.filter(col("vec_id") >= AppendBase)
        .select(col("vec_id"),
          transform(col("embedding"), x => x * lit(0.0625f)).as("embedding"))
      val union = base.union(delta)
      val queries = union.filter(col("vec_id") < 5 ||
        (col("vec_id") >= AppendBase && col("vec_id") < AppendBase + 5))
      AnnMaintenance.appendServeWithCanary(base, delta, queries,
        "vec_id", "embedding", k = 5, candidates = 50, nprobe = 2,
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2, minRecallPct = DriftMinRecallPct)
        .orderBy("qid", "rank")
    } { (s, d) =>
      // bench body (round-9 advice item 7): both fixture builds ride the
      // memoized handle cache, so the timed work is the LOOP — append +
      // canary + decision + serve. Semantics identical (builds are
      // deterministic; MultimodalSpec-class equality is pinned by the
      // shared oracle); Verify gates the uncached body above.
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < AppendBase)
        .select(col("vec_id"), col("embedding"))
      val delta = emb.filter(col("vec_id") >= AppendBase)
        .select(col("vec_id"),
          transform(col("embedding"), x => x * lit(0.0625f)).as("embedding"))
      val union = base.union(delta)
      val queries = union.filter(col("vec_id") < 5 ||
        (col("vec_id") >= AppendBase && col("vec_id") < AppendBase + 5))
      val baseIdx = IvfAdcIndex.buildCached(base, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      val appended = baseIdx.append(delta)
      AnnMaintenance.canaryServeWith(appended, union, queries,
        "vec_id", "embedding", k = 5, candidates = 50, nprobe = 2,
        minRecallPct = DriftMinRecallPct,
        rebuilt = () => IvfAdcIndex.buildCached(union, d, "vec_id",
          "embedding", nlist = 8, trainRounds = 2, m = 16, ksub = 8,
          dim = Dim, pqTrainRounds = 2),
        releaseRebuilt = false)
        .orderBy("qid", "rank")
    },

    // ---- STREAMING maintenance front door (round-9 advice item 4): the
    //      q190 loop driven by a REAL file stream — the drifted delta
    //      arrives as three single-file micro-batches (vec_id % 3, the
    //      q213 carve so batch composition is an engine-replayable rule),
    //      each appended to the resident index under the frozen
    //      base-trained quantizers with its own per-batch canary verdict;
    //      the retrain decision fires once in the post-drain "nightly
    //      window" from the final state. Final state = base-trained
    //      quantizers over base ∪ all deltas regardless of arrival order,
    //      so the SAME q190 oracle replays the whole run — the hash
    //      proves stream-maintained ≡ one-shot maintained. AnnIndexSpec
    //      asserts the monitoring trail (≥3 per-batch verdicts). ----
    // Bench body (round-16 verdict item 6): staging memoized per data
    // dir (the q253 stagedDeltaBatches rule — the arrival files are the
    // FIXTURE) and the base index through buildCached (the q190
    // withBench stance), so the timed number is the stream run itself —
    // drain + per-batch appends + canaries + nightly decision + serve.
    // Verify gates the fresh-build, fresh-staging run body.
    Q.withBench("q217_ann_stream_maintain", DriftMaintOracleSql)({ (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < AppendBase)
        .select(col("vec_id"), col("embedding"))
      val delta = emb.filter(col("vec_id") >= AppendBase)
        .select(col("vec_id"),
          transform(col("embedding"), x => x * lit(0.0625f)).as("embedding"))
      val union = base.union(delta)
      val queries = union.filter(col("vec_id") < 5 ||
        (col("vec_id") >= AppendBase && col("vec_id") < AppendBase + 5))
      AnnMaintenance.streamMaintain(base, delta, maintDir(d), groups = 3,
        queries, "vec_id", "embedding", k = 5, candidates = 50, nprobe = 2,
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2, minRecallPct = DriftMinRecallPct)
        ._1.orderBy("qid", "rank")
    })({ (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < AppendBase)
        .select(col("vec_id"), col("embedding"))
      val delta = emb.filter(col("vec_id") >= AppendBase)
        .select(col("vec_id"),
          transform(col("embedding"), x => x * lit(0.0625f)).as("embedding"))
      val union = base.union(delta)
      val queries = union.filter(col("vec_id") < 5 ||
        (col("vec_id") >= AppendBase && col("vec_id") < AppendBase + 5))
      val stage = stagedMaintGroups(delta, d, groups = 3)
      val baseIdx = IvfAdcIndex.buildCached(base, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      AnnMaintenance.streamMaintainOn(baseIdx, releaseBase = false,
        base, delta, stage, groups = 3, queries, "vec_id", "embedding",
        k = 5, candidates = 50, nprobe = 2,
        minRecallPct = DriftMinRecallPct,
        rebuilt = () => IvfAdcIndex.buildCached(union, d, "vec_id",
          "embedding", nlist = 8, trainRounds = 2, m = 16, ksub = 8,
          dim = Dim, pqTrainRounds = 2),
        releaseRebuilt = false)
        ._1.orderBy("qid", "rank")
    }),

    // ---- ADAPTIVE-nlist IVF-ADC (the q83 occupancy-scaling precedent
    //      applied to the coarse quantizer): the cell count comes from
    //      the corpus size on BOTH sides — adaptiveNlist(count) in the
    //      body, the nl CTE's integer formula in the oracle — so
    //      inverted lists stay ~64 vectors at any SF (8 cells for the
    //      500-vector fixtures, 32 at sf0.1's 2000) and the gate keeps
    //      training/assignment/serving hash-exact as the cell count
    //      CHANGES across SFs, not just at one tuned constant. Power-
    //      of-two counts make the packing shift equal k — the property
    //      that lets a static SQL statement replay a dynamic-k Lloyd
    //      train bit-for-bit. ----
    Q("q192_ivf_adaptive_nlist", AdaptiveIvfAdcOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.ivfAdcKnnAdaptive(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, candidates = 50, nprobe = 2,
        trainRounds = 2, m = 16, ksub = 8, dim = Dim, pqTrainRounds = 2,
        targetCell = 64)
        .orderBy("qid", "rank")
    },

    // ---- embedding outliers: the 20 vectors farthest from their assigned
    //      k-means centroid (exact integer squared L2) — the anomaly /
    //      junk-embedding audit of a vector corpus. Same packed-argmin
    //      assignment as q107; the top-k lands in a TakeOrderedAndProject,
    //      never a full sort. ----
    Q("q119_kmeans_outliers",
      s"""WITH $PreparedCte,
         |${seedCte(8)},
         |${argminCte(8)}
         |${argminSelect(8)} ORDER BY dist_sq DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.kmeansAssign(Tables.t(s, d, "embeddings"), "vec_id", "embedding", 8)
        .orderBy(col("dist_sq").desc, col("vec_id"))
        .limit(20)
    },

    // ---- SemDeDup-shaped semantic dedup: near-dup pairs are searched
    //      only WITHIN each k-means cluster (cid equi-join — candidates
    //      never cross clusters, so the n² search collapses to
    //      Σ cluster_size²). Cells are Lloyd-TRAINED (2 rounds) — the
    //      Σ size² bound is only meaningful when cells stay balanced,
    //      which seeding alone doesn't guarantee on a skewed corpus. The
    //      oracle replays the training rounds, assignment packing AND the
    //      within-cluster exact cosine, so training, routing, pairing,
    //      and the threshold all break the hash. ----
    Q("q123_semantic_dedup",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |mm AS (SELECT n.vec_id, n.qd, n.nsq, asg.cid
         |      FROM n JOIN asg USING (vec_id)),
         |pr AS (
         |  SELECT a.cid, list_dot_product(a.qd, b.qd) / sqrt(a.nsq * b.nsq) AS cos
         |  FROM mm a JOIN mm b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |ps AS (SELECT cid, count(*) AS n_pairs,
         |       CAST(sum(CASE WHEN cos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |       max(cos) AS max_cos FROM pr GROUP BY cid),
         |mc AS (SELECT cid, count(*) AS n_members FROM asg GROUP BY cid)
         |SELECT mc.cid, CAST(mc.n_members AS BIGINT) AS n_members,
         |  CAST(coalesce(ps.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(ps.n_dup, 0) AS BIGINT) AS n_dup,
         |  coalesce(ps.max_cos, CAST(-2 AS DOUBLE)) AS max_cos
         |FROM mc LEFT JOIN ps ON mc.cid = ps.cid ORDER BY mc.cid""".stripMargin) { (s, d) =>
      Similarity.clusterNearDupStats(Tables.t(s, d, "embeddings"),
          "vec_id", "embedding", k = 8, tau = 0.35, trainRounds = 2)
        .orderBy("cid")
    },

    // ---- retrieval end-to-end (the RAG read path): IVF-routed top-3
    //      neighbors for each probe query, then the neighbor ids join
    //      BACK to the documents table for the payload. The tiny
    //      (queries × k) result is the BUILD side against the
    //      corpus-sized documents scan — at 100 TB the text store is
    //      never shuffled, each match is a broadcast-hash lookup. ----
    Q("q126_rag_retrieve",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.nsq + c.cnsq - 2 * list_dot_product(n.qd, c.cqd), c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 5),
         |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
         |cand AS (
         |  SELECT pr.qid, a.vec_id AS nid
         |  FROM pr JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.qid),
         |scored AS (
         |  SELECT qid, nid,
         |    list_dot_product(qn.qd, nn.qd) / sqrt(qn.nsq * nn.nsq) AS cos
         |  FROM cand JOIN n qn ON qn.vec_id = qid JOIN n nn ON nn.vec_id = nid),
         |topk AS (SELECT qid, nid, cos, rank FROM (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         |  FROM scored) t WHERE rank <= 3)
         |SELECT t.qid, CAST(t.rank AS INTEGER) AS rank, t.nid, t.cos,
         |  doc.lang, doc.source, md5(doc.text) AS text_md5
         |FROM topk t JOIN documents doc ON doc.doc_id = t.nid
         |ORDER BY t.qid, t.rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val topk = Similarity.ivfKnn(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2, trainRounds = 2)
      Tables.t(s, d, "documents")
        .join(broadcast(topk), col("doc_id") === col("nid"))
        .select(col("qid"), col("rank"), col("nid"), col("cos"),
          col("lang"), col("source"), md5(col("text")).as("text_md5"))
        .orderBy("qid", "rank")
    },

    // ---- MIPS: the inner-product metric for the IVF family (round-10
    //      verdict item 4 — retrieval models score dot products, not
    //      distances, and until now the index lifecycle was L2-only).
    //      Corpus vectors sit in the SAME L2-Lloyd Voronoi cells as
    //      every other family member (assignment is geometry, metric-
    //      free); QUERIES route by the metric — the nprobe cells with
    //      the LARGEST q·centroid — and in-list candidates score by
    //      exact integer dot product. The oracle replays training,
    //      assignment, the DESC-dot routing tie-break and the serve
    //      cut; dot is BIGINT so the hash is exact. VectorSpec pins
    //      MIPS recall vs the exact-IP gold. ----
    Q("q227_mips_ivf_serve",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_dot_product(n.qd, c.cqd) DESC, c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 10),
         |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
         |sc AS (
         |  SELECT pr.qid, a.vec_id AS nid,
         |    CAST(list_dot_product(qn.qd, nn.qd) AS BIGINT) AS dot
         |  FROM pr
         |  JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.qid
         |  JOIN n qn ON qn.vec_id = pr.qid
         |  JOIN n nn ON nn.vec_id = a.vec_id)
         |SELECT qid, nid, dot, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, dot,
         |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
         |  FROM sc) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.ivfIpKnn(emb.filter(col("vec_id") < 10), emb, "vec_id",
          "embedding", k = 5, nlist = 8, nprobe = 2, trainRounds = 2)
        .orderBy("qid", "rank")
    },

    // ---- graph ANN: NSW neighbor graph + greedy beam search (round-10
    //      verdict item 3 — the HNSW family, the high-recall/low-latency
    //      serving alternative to IVF routing). The oracle replays the
    //      WHOLE thing: LSH-bucketed seed k-NN edges, one NN-descent
    //      refinement round (edges ∪ reversed ∪ two-hop, re-ranked
    //      top-m), then three best-first beam hops from the min-id entry
    //      and the exact top-5 cut over the visited pool — deterministic
    //      integer d² with (d2, id) ties throughout, so one flipped edge
    //      or one mis-ranked frontier row anywhere breaks the hash.
    //      VectorSpec pins recall ≥ the IVF route at equal candidate
    //      budget. ----
    Q("q226_nsw_graph_knn", NswOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      // occupancy-scaled seed planes (the q83 rule at targetBucket=64):
      // a FIXED plane count makes the bucket self-join quadratic in the
      // corpus — measured 13.9× wall at a 10× probe before this; the
      // oracle derives the identical count from its own count(*) CTE
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      GraphAnn.nswSearch(emb.filter(col("vec_id") < 10), emb, "vec_id",
          "embedding", k = 5, m = 16, planes = planes, dim = Dim,
          refineRounds = 1, beamWidth = 8, searchRounds = 3)
        .orderBy("qid", "rank")
    },

    // ---- MIPS from the PERSISTED index artifact (q227's metric lifted
    //      to the lifecycle): codes/cells/codebooks are metric-free
    //      geometry, so the SAME memoized q185 handle serves inner
    //      product by swapping the lookup tables — IP routing (largest
    //      q·centroid), subspace-dot ADC tables, DESC candidate cut,
    //      exact-dot rerank. The oracle replays coarse + PQ training,
    //      encode, the IP tables and both DESC cuts; FAISS serves
    //      METRIC_INNER_PRODUCT from an IVFPQ artifact the same way. ----
    Q("q229_mips_adc_serve",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${asgCte(8)},
         |${pqCtes()},
         |qdtip AS (
         |  SELECT s.vec_id AS qid, c.m, c.cid,
         |    CAST(list_dot_product(s.sq, c.cq) AS BIGINT) AS pd
         |  FROM subn s JOIN cbq c ON c.m = s.m
         |  WHERE s.vec_id < 10),
         |qr AS (
         |  SELECT n.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_dot_product(n.qd, c.cqd) DESC, c.cid) AS crn
         |  FROM n, c WHERE n.vec_id < 10),
         |pr AS (SELECT qid, cid FROM qr WHERE crn <= 2),
         |adi AS (
         |  SELECT pr.qid, a.vec_id AS nid, CAST(sum(t.pd) AS BIGINT) AS adist
         |  FROM pr
         |  JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.qid
         |  JOIN codes x ON x.vec_id = a.vec_id
         |  JOIN qdtip t ON t.qid = pr.qid AND t.m = x.m AND t.cid = x.cid
         |  GROUP BY pr.qid, a.vec_id),
         |candi AS (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist DESC, nid) AS arank
         |  FROM adi) t WHERE arank <= 50),
         |scoredi AS (
         |  SELECT c2.qid, c2.nid,
         |    CAST(list_dot_product(na.qd, nb.qd) AS BIGINT) AS dot
         |  FROM candi c2
         |  JOIN n na ON na.vec_id = c2.qid
         |  JOIN n nb ON nb.vec_id = c2.nid)
         |SELECT qid, nid, dot, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, dot,
         |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
         |  FROM scoredi) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = IvfAdcIndex.buildCached(emb, d, "vec_id", "embedding",
        nlist = 8, trainRounds = 2, m = 16, ksub = 8, dim = Dim,
        pqTrainRounds = 2)
      idx.queryIp(emb.filter(col("vec_id") < 10), k = 5, candidates = 50,
          nprobe = 2)
        .orderBy("qid", "rank")
    },

    // ---- NSW graph artifact save → load → serve (the q189 pattern for
    //      the GRAPH family): the ORACLE IS q226's — the hash proves a
    //      handle loaded from the on-disk artifact serves exactly what
    //      the freshly built graph serves, with zero seed/NN-descent
    //      jobs on the load path. The timed work is the round-trip
    //      itself, the cost a deployment pays to survive restart. ----
    Q("q230_nsw_save_load", NswOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q189 buildCached stance): the timed work is
      // the artifact ROUND-TRIP (save + verified load + serve), not
      // per-call seed/NN-descent; the cache owns the handle
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val dir = nswDir(d)
      g.save(dir)
      val loaded = NswGraph.load(s, dir)
      // nswSearchOn materializes its bounded output into its OWN
      // snapshot, so the rows stay valid past the loaded handle's
      // release (the q187 rule is satisfied by construction)
      val out = GraphAnn.nswSearchOn(emb.filter(col("vec_id") < 10),
        loaded, emb, "vec_id", "embedding", k = 5, beamWidth = 8,
        searchRounds = 3)
      loaded.release()
      out.rows.orderBy("qid", "rank")
    },

    // ---- STREAMING NSW serving (the q193 arrival pattern for the
    //      graph family): query vectors arrive as a REAL file stream
    //      (three single-file micro-batches), each served via
    //      foreachBatch against ONE resident graph handle — zero
    //      seed/NN-descent work per batch, per-query search independent
    //      of co-arriving queries, so the union over micro-batches must
    //      equal one batch serve. Gated against the SAME oracle as
    //      q226/q230: the hash proves stream-served ≡ batch-served ≡
    //      built-and-served. Driver accumulation bounded at
    //      k·|queries| = 50 rows. ----
    Q("q231_nsw_stream_serve", NswOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q193 resident-index stance): the timed work
      // is the micro-batch drain served against ONE resident handle
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val dir = nswStreamDir(d)
      Seq((0L, 3L), (3L, 6L), (6L, 10L)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(s"$dir/b$i")
      }
      val out = fileStreamDrain(s, emb.schema, s"$dir/b*",
          GraphAnn.TopKSchema, Seq("qid", "rank")) { batch =>
        // nswSearchOn materializes its own bounded snapshot; release
        // it as soon as the rows are drained into the buffer
        val served = GraphAnn.nswSearchOn(batch, g, emb, "vec_id",
          "embedding", k = 5, beamWidth = 8, searchRounds = 3)
        val rows = served.rows.collect()
        served.release()
        rows
      }
      out
    },

    // ---- NSW deletion (the q219 remove_ids stance, graph-side): the
    //      surviving edges are exact distances between surviving
    //      vectors — geometry, not membership — so delete is two
    //      anti-joins on the edge table, no rebuild; every edge
    //      INCIDENT to a deleted node goes, or search would route
    //      through (and return) deleted vectors. The oracle builds the
    //      graph over EVERYTHING and filters only the serving side
    //      (edges + the hub list), so the hash proves delete ≡
    //      build-on-all-serve-survivors, and that deleted ids never
    //      appear as results OR as route hops. ----
    // The bench body builds the pre-delete graph through the cached
    // handle (the q190 withBench stance): the timed work is the DELETE
    // (two anti-joins) + serve, not per-pass seed/NN-descent; Verify
    // always gates the fresh-build run body, and the builds are
    // deterministic so the two bodies serve identical rows.
    Q.withBench("q232_nsw_delete",
      nswOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
        beamWidth = 8, searchRounds = 3, k = 5,
        delPred = Some("(%ID% >= 20 AND %ID% % 7 = 3)")))(
      (s, d) => nswDeleteServe(s, d, cachedBuild = false))(
      (s, d) => nswDeleteServe(s, d, cachedBuild = true)),

    // ---- NSW incremental append (the q187 nightly-delta stance for
    //      the graph family, HNSW insert batched): the base graph is
    //      built over ids < 400, each delta vector beam-searches it for
    //      its top-m insert edges, delta↔delta seeds with the sharded
    //      buckets, and every node re-ranks top-m over the pooled
    //      candidates — untouched base nodes keep their lists by
    //      construction. The oracle replays base construction, the
    //      per-delta insert search (base hubs), the delta seed, the
    //      pooled re-rank and the final serve over the appended graph
    //      with full-corpus hubs; one flipped edge anywhere in the
    //      insert path breaks the hash. ----
    // Bench body: cached BASE build (the q190 withBench stance) — the
    // timed work is the APPEND (insert search + delta seed + pooled
    // re-rank) + serve; Verify gates the fresh-build run body.
    Q.withBench("q233_nsw_append", NswAppendOracleSqlStd)(
      (s, d) => nswAppendServe(s, d, cachedBuild = false))(
      (s, d) => nswAppendServe(s, d, cachedBuild = true)),

    // ---- NSW maintenance loop (the q190 stance for the graph family):
    //      append under the existing graph, recall canary vs exact gold
    //      over base ∪ delta, rebuild ONLY when the canary trips, serve
    //      with audit columns. The oracle extends the q233 replay with
    //      the gold CTE, the recall division and the integer retrain
    //      decision; the fixture passes the canary (minRecallPct = 60
    //      against a measured ~0.9 appended recall), so the emitted
    //      rows are the appended route's on both engines. VectorSpec
    //      gates the OTHER branch: minRecallPct = 100 trips and the
    //      served rows become the full rebuild's. ----
    // Bench body: cached BASE build through appendServeWithCanaryOn
    // (the q190 canaryServeWith stance) — the timed work is the LOOP
    // (append + canary + decision + serve); Verify gates the
    // fresh-build run body.
    Q.withBench("q234_nsw_maintain",
      nswAppendOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
        beamWidth = 8, searchRounds = 3, k = 5,
        canaryMinPct = Some(60)))({ (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      GraphAnn.appendServeWithCanary(
          emb.filter(col("vec_id") < 400), emb.filter(col("vec_id") >= 400),
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, m = 16, dim = Dim, beamWidth = 8, searchRounds = 3,
          minRecallPct = 60)
        .orderBy("qid", "rank")
    })({ (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") < 400)
      val planesB = Similarity.adaptivePlanes(base.count(), targetBucket = 64)
      val g = GraphAnn.nswGraphCached(base, d, "vec_id", "embedding",
        m = 16, planes = planesB, dim = Dim, refineRounds = 1)
      GraphAnn.appendServeWithCanaryOn(g, base,
          emb.filter(col("vec_id") >= 400), emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, m = 16, dim = Dim, beamWidth = 8,
          searchRounds = 3, minRecallPct = 60)
        .orderBy("qid", "rank")
    }),

    // ---- NSW metadata-filtered search (round-11 verdict item 3 — the
    //      q220 allow-list stance for the graph family): only ids with
    //      vec_id % 5 = 1 (a 20 % predicate) may be returned, and the
    //      filter constrains BEAM EXPANSION, not just the final cut —
    //      the visited pool and every frontier hold allowed nodes only,
    //      entry hubs are the smallest allowed ids, and disallowed
    //      1-hop neighbors are bridged one more hop (route through,
    //      never a beam slot). The oracle builds the graph over
    //      EVERYTHING and filters the serving side (the q232 stance),
    //      replaying hubs, both expansion arms and every frontier cut;
    //      VectorSpec pins recall vs exact gold over the allowed set. ----
    Q("q236_nsw_filtered_knn", NswFilteredOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q220 filtered-search stance): the timed work
      // is the allow-list beam walk, not per-call construction
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val out = GraphAnn.nswSearchFilteredOn(emb.filter(col("vec_id") < 10),
        g, emb, emb.filter(col("vec_id") % 5 === 1).select("vec_id"),
        "vec_id", "embedding", k = 5, beamWidth = 8, searchRounds = 3)
      out.rows.orderBy("qid", "rank")
    },

    // ---- FILTERED search from the PERSISTED graph artifact (round-12
    //      verdict item 5 — the q220↔q189 analog for the graph family):
    //      the q236 allow-list serve composed with the q230 artifact
    //      round-trip — build, save, LOAD into a fresh handle, and run
    //      the metadata-filtered beam search from the LOADED graph, with
    //      zero seed/NN-descent jobs on the load path and the torn-
    //      artifact check honored on the way in. Gated against the SAME
    //      oracle instance as q236, so the hash proves
    //      load→filter→serve ≡ build→filter→serve — the artifact
    //      round-trip loses nothing the filtered walk (hubs, both
    //      expansion arms, every frontier cut) depends on. ----
    Q("q241_nsw_filtered_from_artifact", NswFilteredOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q189 buildCached stance): the timed work is
      // the artifact round-trip + filtered serve
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val dir = nswFilteredDir(d)
      g.save(dir)
      val loaded = NswGraph.load(s, dir)
      // nswSearchFilteredOn materializes its bounded output into its
      // OWN snapshot, so the rows stay valid past the loaded handle's
      // release (the q187 rule, satisfied by construction)
      val out = GraphAnn.nswSearchFilteredOn(emb.filter(col("vec_id") < 10),
        loaded, emb, emb.filter(col("vec_id") % 5 === 1).select("vec_id"),
        "vec_id", "embedding", k = 5, beamWidth = 8, searchRounds = 3)
      loaded.release()
      out.rows.orderBy("qid", "rank")
    },

    // ---- NSW graph INTROSPECTION (round-12 verdict item 3 — the q207
    //      invlists-stats analog for the graph family): out-degree
    //      histogram + edge total + reciprocity ppm + undirected
    //      component count, so a q234 canary failure becomes
    //      diagnosable (components > 1 = regions unreachable from the
    //      hub entry; falling reciprocity = one-way spokes from the
    //      insert path). The oracle replays the construction AND all
    //      three summaries — components via a RECURSIVE min-label
    //      closure, which agrees with the engine's pointer-jumping
    //      fixpoint because the fixpoint is unique. ----
    Q("q237_nsw_stats",
      nswStatsOracleSql(m = 16, targetBucket = 64, refineRounds = 1)) {
      (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q207 invlists-stats stance): the timed work
      // is the introspection pass, not per-call construction
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val out = GraphAnn.nswStats(g).orderBy("out_degree")
      // materialize (bounded: ≤ m distinct degree values) — the stats
      // frame reads the cached g.edges lazily
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    },

    // ---- NSW graph COMPACTION after append (round-12 verdict item 3 —
    //      the q205 LSM merge for the graph family): after nswAppend
    //      the edge table's blocks descend from base ∪ insert ∪ seed
    //      union legs; compact() shuffles ONCE by src so each node's
    //      out-edge list is colocated (sorted in the serving cut's
    //      (d2, dst) order), persists independent storage, and the
    //      fragmented source handle is released before serving. Gated
    //      against the SAME oracle instance as q233 — compaction is
    //      pure storage reorganization, so the hash proves compacted ≡
    //      appended; VectorSpec pins edge-set equality, src colocation
    //      and storage independence. ----
    // Bench body: cached BASE build (the q190 withBench stance) — the
    // timed work is append + COMPACT + serve; Verify gates the
    // fresh-build run body.
    Q.withBench("q238_nsw_compact", NswAppendOracleSqlStd)(
      (s, d) => nswCompactServe(s, d, cachedBuild = false))(
      (s, d) => nswCompactServe(s, d, cachedBuild = true)),

    // ---- HYBRID retrieval with the NSW dense leg (round-12 verdict
    //      item 4): q194's RRF front door was wired to the IVF route
    //      only, leaving the higher-recall graph family unreachable
    //      from production RAG. The fusion body is now single-owner
    //      (fuseRrf / rrfFusionTailSql — q194 and q239 share every
    //      fused character), and the dense leg PLUGS: here the top-10
    //      comes from the NSW beam walk over the built graph, fused
    //      with the same BM25 leg. The oracle substitutes the q236-
    //      style graph + search CTEs for q194's IVF CTEs and replays
    //      the shared fusion tail. ----
    Q("q239_hybrid_rrf_nsw",
      nswHybridOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
        beamWidth = 8, searchRounds = 3)) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q185 buildCached stance): the timed work is
      // the fused retrieval, not per-call construction
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val served = GraphAnn.nswSearchOn(emb.filter(col("vec_id") < 5),
        g, emb, "vec_id", "embedding", k = 10, beamWidth = 8,
        searchRounds = 3)
      // the served handle stays unreleased (convenience form): the
      // fused frame reads its bounded snapshot lazily downstream
      fuseRrf(s, d, served.rows
        .select(col("qid"), col("nid"), col("rank").as("drank")))
    },

    // ---- the GRAPH family's full nightly lifecycle chain (the q216
    //      analog, closing the quantized↔graph symmetry): build the
    //      base graph → save (night 0) → load into a fresh handle →
    //      append the delta under the LOADED graph → compact → save
    //      (night 1) → load → serve. Every post-append step is pure
    //      storage work, so the gate runs against the SAME oracle
    //      instance as q233/q238 — the hash proves the whole chain
    //      serves exactly what a one-shot append serves, across two
    //      process-restart boundaries and with every superseded handle
    //      released before the next step (storage independence by
    //      contract at each hop). ----
    // Bench body: cached night-0 build (the q190 withBench stance) —
    // the timed work is the CHAIN (save → load → append → compact →
    // save → load → serve, both artifact round-trips included); Verify
    // gates the fresh-build run body.
    Q.withBench("q247_nsw_lifecycle_chain", NswAppendOracleSqlStd)(
      (s, d) => nswChainServe(s, d, cachedBuild = false))(
      (s, d) => nswChainServe(s, d, cachedBuild = true)),

    // ---- beam-width/recall TUNING SWEEP (the q224 operating-curve
    //      stance for the graph family): recall@5 vs exact gold at
    //      beamWidth ∈ {2, 4, 8}, all three served from ONE built
    //      graph — serving is the cheap phase, so the curve costs
    //      three bounded beam walks + one exact pass over the 10-query
    //      sample, never three builds. The oracle replays one shared
    //      construction and a full search chain per width; curve
    //      monotonicity is data, not assumption. ----
    Q("q248_nsw_beam_sweep",
      nswSweepOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
        widths = Seq(2, 4, 8), searchRounds = 3, k = 5)) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q224 sweep stance): serving is the cheap
      // phase under test — three beam walks, never three builds, and
      // not a per-call construction either
      val g = GraphAnn.nswGraphCached(emb, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val queries = emb.filter(col("vec_id") < 10)
      val exact = Similarity.exactL2Knn(queries, emb, "vec_id",
          "embedding", 5)
        .select("qid", "nid")
      val rows = Seq(2, 4, 8).flatMap { bw =>
        val h = GraphAnn.nswSearchOn(queries, g, emb, "vec_id",
          "embedding", k = 5, beamWidth = bw, searchRounds = 3)
        val r = exact
          .join(h.rows.select(col("qid"), col("nid"), lit(1).as("hit")),
            Seq("qid", "nid"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"),
            count(lit(1)).as("total"))
          .select(lit(bw).as("beam_width"), col("hits"), col("total"),
            (col("hits").cast("double") / col("total")).as("recall"))
        // materialize (1 row) before this width's serve handle releases
        val out = r.collect().toSeq
        h.release()
        out
      }
      import s.implicits._
      rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toDF("beam_width", "hits", "total", "recall")
        .orderBy("beam_width")
    },

    // ---- MIPS for the GRAPH family (closing the metric-generality
    //      symmetry — the quantized family has q227/q229): the textbook
    //      norm-augmentation reduction composes MIPS onto the UNCHANGED
    //      L2 graph machinery — corpus vectors gain a sqrt(mx−‖x‖²)
    //      component, queries gain 0, and the augmented-L2 beam walk
    //      returns largest-dot neighbors. Spark-first: no new operator,
    //      a narrow augmentation map in front of the existing build and
    //      serve (preference (a) in the design rules). The oracle
    //      replays the augmentation in the quantized integer domain and
    //      the standard graph/search CTE owners; VectorSpec pins recall
    //      vs the exact-IP gold and that the IP order differs from L2. ----
    Q("q249_nsw_mips", NswMipsOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val corpusAug = mipsAugmented(emb)
      val queriesAug = mipsAugmentedZero(emb.filter(col("vec_id") < 10))
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // dim stays 64: the bucket hash reads the original components
      // only (the augmented one carries no direction); d2 scoring reads
      // the full augmented arrays
      // cached build over the augmented corpus (its own cache entry —
      // the key folds in the corpus plan hash): the timed work is the
      // MIPS beam walk, not per-call construction
      val g = GraphAnn.nswGraphCached(corpusAug, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val out = GraphAnn.nswSearchOn(queriesAug, g, corpusAug, "vec_id",
        "embedding", k = 5, beamWidth = 8, searchRounds = 3)
      out.rows.orderBy("qid", "rank")
    },

    // ---- MIPS from the PERSISTED graph artifact (the q229 analog —
    //      q229 serves IP from the saved ADC artifact): the graph
    //      artifact is METRIC-FREE (an edge table of integer d2 over
    //      whatever geometry it was built in), so a loaded
    //      augmented-space graph serves inner product identically to
    //      the in-memory handle, across a process-restart boundary and
    //      with zero seed/NN-descent on the load path. SAME oracle
    //      instance as q249: load ≡ build, metric included. ----
    Q("q250_nsw_mips_from_artifact", NswMipsOracleSqlStd) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val corpusAug = mipsAugmented(emb)
      val queriesAug = mipsAugmentedZero(emb.filter(col("vec_id") < 10))
      val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
      // cached build (the q189/q229 stance): the timed work is the
      // artifact round-trip + the MIPS serve from the loaded handle
      val g = GraphAnn.nswGraphCached(corpusAug, d, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
      val dir = nswMipsDir(d)
      g.save(dir)
      val loaded = NswGraph.load(s, dir)
      val out = GraphAnn.nswSearchOn(queriesAug, loaded, corpusAug,
        "vec_id", "embedding", k = 5, beamWidth = 8, searchRounds = 3)
      loaded.release()
      out.rows.orderBy("qid", "rank")
    },

    // ---- SEMANTIC split-leakage audit (the q281 stance for the vector
    //      modality): for every verified rule-(b) pair, would a
    //      vec-id-keyed train/eval split separate its endpoints, and
    //      does the component-keyed split keep them together? The
    //      cluster-keyed cross count is zero BY CONSTRUCTION (paired ⇒
    //      same component ⇒ same md5 hash) — a near-copy of an eval
    //      embedding in train is leakage even when no n-gram matches
    //      (the q270 argument applied to the SPLIT instead of the
    //      contamination report). Oracle: the shared routing/pair
    //      owners + the q74 label propagation re-pointed at the
    //      embeddings table + the shared split CASE. ----
    Q("q287_semantic_split_audit",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${argminCte(8)},
         |ag AS (${argminSelect(8)}),
         |$SemanticRuleCtes,
         |$SemanticSplitAuditTailSql""".stripMargin) { (s, d) =>
      semanticSplitAuditFrame(
        Similarity.semanticPairLabels(Tables.t(s, d, "embeddings"),
          "vec_id", "embedding", minCosine = 0.45, k = 8))
    },

    // ---- per-cell TIGHTNESS + outlier report (the embedding-curation
    //      prune signal next to q273's redundancy stats): per cell, the
    //      worst member's distance relative to the cell mean in exact
    //      integer thousandths, and the count beyond 2× the mean.
    //      High-dimensional concentration makes natural cells sit near
    //      1000 (measured 1064–1096 at sf0.01 — the ratio still varies
    //      per cell, which is what the gate hashes); a planted
    //      off-distribution vector spikes its cell's ratio and trips
    //      the outlier count — VectorSpec pins exactly that. ----
    Q("q289_semantic_outliers",
      s"""WITH $PreparedCte,
         |${lloydCte(8, 2)},
         |${argminCte(8)},
         |ag AS (${argminSelect(8)}),
         |st AS (SELECT cid, count(*) AS n_members,
         |         CAST(sum(dist_sq) AS BIGINT) AS sum_d,
         |         CAST(max(dist_sq) AS BIGINT) AS max_d
         |       FROM ag GROUP BY cid),
         |fl AS (SELECT ag.cid, st.n_members,
         |         CAST((1000 * st.max_d * st.n_members)
         |           // GREATEST(st.sum_d, 1) AS BIGINT) AS max_ratio_milli,
         |         CASE WHEN ag.dist_sq * st.n_members > 2 * st.sum_d
         |           THEN 1 ELSE 0 END AS o
         |       FROM ag JOIN st USING (cid))
         |SELECT cid, n_members, max_ratio_milli,
         |  CAST(sum(o) AS BIGINT) AS n_outliers
         |FROM fl GROUP BY cid, n_members, max_ratio_milli
         |ORDER BY cid""".stripMargin) { (s, d) =>
      Similarity.semanticOutliers(Tables.t(s, d, "embeddings"),
        "vec_id", "embedding", k = 8)
    },

    // ---- OCCUPANCY-SCALED incremental semantic dedup (the q268
    //      adaptive stance for q269's entry point — round-14 verdict
    //      item 1): the router k comes from adaptiveNlist(UNION count)
    //      capped by the base's power-of-two floor (training reads only
    //      the frozen base) — the same integer formula on both sides —
    //      so both the delta×base rule-(a) join and the delta×delta
    //      rule-(b) join stay Σ|cell|²-bounded at ANY snapshot size,
    //      where q269's fixed k=8 measured quadratic (67×) at the 100×
    //      probe. Rules replay through the SHARED SemanticDeltaTailSql,
    //      character for character: only the router sizing differs. ----
    Q("q292_semantic_dedup_delta_adaptive", SemanticDeltaAdaptiveOracleSql) {
      (s, d) =>
        val emb = Tables.t(s, d, "embeddings")
        val kl = Similarity.semanticDedupDeltaResultAdaptive(
          emb.filter(col("vec_id") < AppendBase),
          emb.filter(col("vec_id") >= AppendBase),
          "vec_id", "embedding", minCosine = 0.45)
        kl.keep.orderBy("vec_id")
    },

    // ---- OCCUPANCY-SCALED semantic split-leakage audit (the q268
    //      stance for q287's entry point — round-14 verdict item 1):
    //      the audit's pair list IS the dedup's rule-(b) pair list, so
    //      a fixed-k audit of a 1000× corpus pays the n² the dedup
    //      itself refuses; sizing the router by adaptiveNlist(count)
    //      keeps the audit inside the same Σ|cell|² budget (q287's
    //      100× probe measured 52×, the adaptive route's sibling
    //      measures sub-data-growth). Tail = the SHARED
    //      SemanticSplitAuditTailSql: label propagation and the split
    //      CASEs replay identically, only the router sizing differs. ----
    Q("q293_semantic_split_audit_adaptive",
      s"""WITH ${nlCte()},
         |$PreparedCte,
         |${lloydCteDyn(2)},
         |${asgCteDyn()},
         |ag AS (SELECT vec_id, CAST(key % (SELECT k FROM nl) AS BIGINT) AS cid,
         |  CAST(key // (SELECT k FROM nl) AS BIGINT) AS dist_sq FROM m),
         |$SemanticRuleCtes,
         |$SemanticSplitAuditTailSql""".stripMargin) { (s, d) =>
      semanticSplitAuditFrame(
        Similarity.semanticPairLabelsAdaptive(Tables.t(s, d, "embeddings"),
          "vec_id", "embedding", minCosine = 0.45))
    },

    // ---- BINARY (sign-bit) quantization ANN — the 1-bit end of the
    //      quantization ladder next to SQ8 (8 bits) and PQ (~bits/m):
    //      vectors compress 64× to 8 sign-bit words; candidates come
    //      from a MULTI-PROBED pigeonhole band equi-join on the words
    //      (each query band probes itself + its 8 one-bit flips, so
    //      hamming ≤ 15 ⇒ some probe hits — the q84 SimHash banding
    //      argument applied to the quantizer itself, widened one flip
    //      for recall 0.36 → 0.70), the hamming cut is Σ popcount(xor)
    //      in exact integers, and the final rank is the exact d2
    //      rerank every serving family ends with. Packing
    //      avoids bit 63 by construction (8-bit words) — DuckDB traps
    //      on 1<<63 where Java wraps, so the layout itself is the
    //      cross-engine-safe one. ----
    Q("q294_binary_hamming_knn", BinaryHammingOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.binaryHammingKnn(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, candidates = 100)
        .orderBy("qid", "rank")
    },

    // ---- GREEDY MMR diversified retrieval (λ = 1/2): the RAG read
    //      path's answer to redundant top-k — the exact top-20 get
    //      re-ranked so each pick maximizes relevance MINUS similarity
    //      to what's already picked (at λ = 1/2, argmax[min_sel d2 −
    //      d2_query] in pure integers, ties to the smaller id). The
    //      oracle unrolls the 5 greedy steps the way lloydCte unrolls
    //      Lloyd rounds — each step one min-join + one windowed argmax
    //      — so the sequential-looking algorithm is replayed
    //      deterministically by both engines. Scale: the greedy loop
    //      never touches the corpus — only the |queries|·candidates
    //      frame and its candidates² pair distances. ----
    Q("q295_mmr_rerank", MmrOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.mmrRerank(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, candidates = 20)
        .orderBy("qid", "step")
    },

    // ---- binary index ARTIFACT round-trip (the q251 cell for the
    //      fifth serving family): build → save → release → load →
    //      serve, gated by the SAME oracle instance as q294 — the hash
    //      proves load ≡ build ≡ inline across a process-restart
    //      boundary, with zero encode jobs on the load path. ----
    Q("q297_binary_save_load", BinaryHammingOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      // cached build (the q189 buildCached stance): the timed work is
      // the artifact round-trip + serve, not repeated sign-bit encodes
      val built = BinaryIndex.buildCached(emb, d, "vec_id", "embedding")
      val dir = binDir(d)
      built.save(dir)
      val idx = BinaryIndex.load(s, dir, emb)
      val out = idx.query(emb.filter(col("vec_id") < 10), k = 5,
          candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      idx.release()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- binary index APPEND (the q254 cell): the strongest form of
    //      the nightly-delta story — sign-bit encode has ZERO trained
    //      state, so an appended index serves EXACTLY what a full
    //      rebuild serves, and the gate is the UNRESTRICTED full-corpus
    //      oracle (no frozen-base seam to pin: there is nothing to
    //      freeze, hence nothing to drift). ----
    Q.withBench("q298_binary_append", BinaryHammingOracleSql) { (s, d) =>
      binAppendServe(s, d, cachedBuild = false)
    } { (s, d) =>
      binAppendServe(s, d, cachedBuild = true)
    },

    // ---- binary index DELETE (the q256 cell): one anti-join, no
    //      revalidation argument needed at all (nothing trained);
    //      deleted vectors can never resurface — candidates come from
    //      the filtered words, the rerank joins the filtered corpus. ----
    Q.withBench("q299_binary_delete",
      binaryOracle(adFilter = " AND c.vec_id % 10 <> 3")) { (s, d) =>
      binDeleteServe(s, d, cachedBuild = false)
    } { (s, d) =>
      binDeleteServe(s, d, cachedBuild = true)
    },

    // ---- binary metadata-FILTERED serving (the q220/q257 cell): the
    //      allow-list semi-joins the words BEFORE the candidate cut, so
    //      the whole candidate budget is spent on admissible vectors. ----
    Q("q300_binary_filtered_search",
      binaryOracle(adFilter = " AND c.vec_id IN" +
        " (SELECT vec_id FROM embeddings WHERE label < 5)")) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = BinaryIndex.buildCached(emb, d, "vec_id", "embedding")
      val out = idx.queryFiltered(emb.filter(col("vec_id") < 10),
          emb.filter(col("label") < 5).select("vec_id"),
          k = 5, candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- binary STREAMING serve from the PERSISTED artifact (the
    //      q261 cell, upgraded with the q250 load seam): query vectors
    //      arrive as a REAL file stream in three micro-batches, each
    //      served from ONE loaded artifact handle — stream-served ≡
    //      batch-served ≡ built, all under the q294 oracle instance. ----
    Q("q301_binary_stream_serve", BinaryHammingOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val built = BinaryIndex.buildCached(emb, d, "vec_id", "embedding")
      val dir = binStreamIdxDir(d)
      built.save(dir)
      val idx = BinaryIndex.load(s, dir, emb)
      val sdir = binStreamDir(d)
      Seq((0L, 3L), (3L, 6L), (6L, 10L)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(s"$sdir/b$i")
      }
      val schema = idx.query(emb.limit(0), k = 5, candidates = 100).schema
      val out = fileStreamDrain(s, emb.schema, s"$sdir/b*", schema,
          Seq("qid", "rank")) { batch =>
        idx.query(batch, k = 5, candidates = 100).collect()
      }
      idx.release()
      out
    },

    // ---- binary MIPS via the norm-augmentation reduction (the q263
    //      cell): corpus += sqrt(maxNorm² − ‖x‖²), queries += 0, and
    //      the UNCHANGED binary funnel serves largest-dot neighbors —
    //      the words hash only the first 64 components (the augmented
    //      one carries no direction), the exact rerank reads the full
    //      augmented arrays. All five serving families are now
    //      metric-general. ----
    Q("q302_binary_mips", BinaryMipsOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val idx = BinaryIndex.buildCached(mipsAugmented(emb), d, "vec_id",
        "embedding")
      val out = idx.query(
          mipsAugmentedZero(emb.filter(col("vec_id") < 10)),
          k = 5, candidates = 100)
        .orderBy("qid", "rank")
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- MMR over the IVF-ADC route (the composition q295's scale
    //      story promises): the trained router produces the top-20
    //      exact-reranked survivors, the SHARED greedy tail
    //      diversifies them — per-query cost tracks nprobe·(n/nlist) +
    //      candidates², never the corpus. Candidate generation and the
    //      greedy sequence are each replayed by their own single-owner
    //      CTE chain, so a drift in either breaks the hash. ----
    Q("q303_mmr_over_ivf", MmrOverIvfOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.mmrRerankOverIvf(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5, candidates = 20,
          adcCandidates = 50, nlist = 8, nprobe = 2, trainRounds = 2,
          m = 16, ksub = 8, dim = Dim)
        .orderBy("qid", "step")
    },

    // ---- binary band-bucket occupancy report (the q207/q237
    //      introspection cell for the fifth family): per band, distinct
    //      buckets, the largest bucket and Σ bucket² — the LAST is
    //      exactly the candidate volume the band equi-join pays per
    //      probe landing in that band, i.e. the number that says
    //      whether corpus drift is making sign-bit buckets hot (the
    //      mitigation is wider bands — there is nothing to retrain).
    //      Gated through the HANDLE so the report provably describes
    //      the structure the index serves from. ----
    Q("q305_binary_band_stats",
      s"""WITH $PreparedCte,
         |wd AS (SELECT vec_id, $BinaryWordsExpr AS wds FROM e),
         |bd AS (SELECT vec_id, unnest(range(0,8)) AS b, unnest(wds) AS v FROM wd),
         |g AS (SELECT b, v, count(*) AS n FROM bd GROUP BY b, v)
         |SELECT CAST(b AS INTEGER) AS band_idx, count(*) AS n_buckets,
         |  CAST(max(n) AS BIGINT) AS max_bucket,
         |  CAST(sum(n * n) AS BIGINT) AS sum_sq
         |FROM g GROUP BY b ORDER BY band_idx""".stripMargin) { (s, d) =>
      val idx = BinaryIndex.buildCached(Tables.t(s, d, "embeddings"),
        d, "vec_id", "embedding")
      val out = idx.stats
      val served = out.collect()
      s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
    },

    // ---- MMR λ sweep (the q224/q248/q304 knob-sweep cell for the
    //      diversified-retrieval family): pure relevance (λ=0 — must
    //      degenerate to ranked top-5), λ=1/2 (the q295 setting) and
    //      pure diversity (λ=1), all over ONE candidate set and ONE
    //      pairwise-distance pass — the table a RAG owner reads to
    //      place the relevance/diversity knob before fixing it. The
    //      greedy chains replay through the SHARED chain owner at
    //      integer weights, so the knob provably reaches the
    //      selection rule. ----
    Q("q306_mmr_lambda_sweep", MmrLambdaSweepOracleSql) { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      Similarity.mmrLambdaSweep(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, candidates = 20)
    }
  )

  // single-owner binary SQL pieces (the sq8CodeExpr discipline): the
  // sign-bit words lane is shared by every binary oracle — the q294
  // family, the lifecycle gates q297–q301 and the MIPS seam q302 — so
  // the packing text can never drift between them
  // lazy: referenced from the eagerly-built defs Seq above, which runs
  // before this object's later strict vals initialize
  private lazy val BinaryWordsExpr: String =
    """list_transform(range(0,8), b -> list_sum(list_transform(range(0,8),
      |    d -> CASE WHEN q[CAST(b AS INTEGER)*8 + CAST(d AS INTEGER) + 1] >= 0
      |      THEN (CAST(1 AS BIGINT) << CAST(d AS INTEGER)) ELSE 0 END)))""".stripMargin

  /** The binary route over prepared corpus CTEs (`e`, `n`) and a query
    * seam (`qE` int-code CTE, `qWhere` restriction, `qN` norms CTE):
    * words, multi-probed band candidates (`adFilter` narrows the
    * corpus side — the delete / allow-list gates), hamming cut, exact
    * rerank. The L2 gates read the query seam off the corpus chain;
    * the MIPS gate points it at the zero-augmented chain. */
  private def binaryOracleBody(qE: String, qWhere: String, qN: String,
      adFilter: String = ""): String =
    s"""wd AS (SELECT vec_id, $BinaryWordsExpr AS wds FROM e),
       |qwd AS (SELECT vec_id, $BinaryWordsExpr AS wds FROM $qE $qWhere),
       |bd AS (SELECT vec_id, unnest(range(0,8)) AS b, unnest(wds) AS v FROM wd),
       |qpr AS (SELECT vec_id, b, unnest(list_concat([v],
       |    list_transform(range(0,8),
       |      p -> xor(v, CAST(1 AS BIGINT) << CAST(p AS INTEGER))))) AS v
       |  FROM (SELECT vec_id, unnest(range(0,8)) AS b, unnest(wds) AS v
       |        FROM qwd) qb),
       |cand AS (SELECT DISTINCT qpr.vec_id AS qid, c.vec_id AS nid
       |  FROM qpr JOIN bd c
       |  ON c.b = qpr.b AND c.v = qpr.v AND c.vec_id <> qpr.vec_id$adFilter),
       |hm AS (SELECT cand.qid, cand.nid,
       |   CAST(list_sum(list_transform(range(0,8), i ->
       |     bit_count(xor(wa.wds[CAST(i AS INTEGER)+1],
       |                   wb.wds[CAST(i AS INTEGER)+1])))) AS BIGINT) AS ham
       |   FROM cand JOIN qwd wa ON wa.vec_id = cand.qid
       |   JOIN wd wb ON wb.vec_id = cand.nid),
       |hc AS (SELECT qid, nid FROM (SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY ham, nid) AS hrank
       |  FROM hm) t WHERE hrank <= 100),
       |sc AS (SELECT hc.qid, hc.nid,
       |    CAST(na.nsq + nb.nsq - 2*list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2
       |  FROM hc JOIN $qN na ON na.vec_id = hc.qid
       |  JOIN n nb ON nb.vec_id = hc.nid)
       |SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT qid, nid, d2,
       |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
       |  FROM sc) t
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** q294's oracle (and, unchanged, the q297 save/load, q298 append —
    * encode is stateless so append ≡ rebuild — and q301 stream-serve
    * gates): sign-bit packing into 8×8-bit words, multi-probed
    * pigeonhole band candidates, hamming cut at 50, exact top-5
    * rerank — every stage in integer arithmetic both engines replay
    * bit-for-bit. */
  private def binaryOracle(adFilter: String = ""): String =
    s"""WITH $PreparedCte,
       |${binaryOracleBody("e", "WHERE vec_id < 10", "n", adFilter)}""".stripMargin

  private lazy val BinaryHammingOracleSql: String = binaryOracle()

  /** The q302 oracle: the SAME augmentation CTEs as every other MIPS
    * gate ([[MipsAugCtesSql]] — single owner), then the SAME binary
    * chain with the query seam pointed at the zero-augmented `qe`/`nq`:
    * words hash the first 64 components on both sides (the augmented
    * component carries no direction — the NSW/matryoshka MIPS
    * argument), the exact rerank reads the full augmented arrays. */
  private lazy val BinaryMipsOracleSql: String =
    s"WITH $MipsAugCtesSql,\n" +
      binaryOracleBody("qe", "", "nq")

  /** q295's oracle: exact top-20 candidates (self excluded), pairwise
    * candidate distances, then the 5 greedy MMR steps UNROLLED — each
    * step's pick CTE is the windowed argmax of (min d2 to the selected
    * set − d2 to the query), the lloydCte unrolling discipline applied
    * to a greedy selection. */
  /** The greedy-MMR tail over a `cd(qid, nid, d2)` CTE (reads the
    * prepared `n` for the pairwise distances) — ONE owner for the
    * brute route (q295) and the IVF-ADC composition (q303), mirroring
    * [[Similarity.mmrFromCandidates]] exactly. */
  /** The candidate-pairwise-distance CTE the greedy chains share —
    * λ-independent, so the q306 sweep computes it ONCE for all three
    * weightings. */
  // lazy: referenced from the eagerly-built defs Seq (the BinaryWordsExpr rule)
  private lazy val MmrPpSql: String =
    """pp AS (SELECT a.qid, a.nid AS i, b.nid AS j,
      |    CAST(na.nsq + nb.nsq - 2*list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2
      |  FROM cd a JOIN cd b ON b.qid = a.qid AND b.nid != a.nid
      |  JOIN n na ON na.vec_id = a.nid JOIN n nb ON nb.vec_id = b.nid)""".stripMargin

  /** One greedy selection chain (`sel1$sfx` … `sel$k$sfx`) at integer
    * weights: each step argmaxes wDiv·(min d2 to selected) −
    * wRel·(d2 to query); step 1 is always the most relevant pick (the
    * MMR anchor — at wRel = 0 a first pick is otherwise undefined). */
  private def mmrSelChainSql(k: Int, wRel: Int, wDiv: Int,
      sfx: String = ""): String = {
    val steps = (2 to k).map { t =>
      s"""ms$t$sfx AS (SELECT cd.qid, cd.nid, cd.d2, min(pp.d2) AS msd
         |  FROM cd JOIN pp ON pp.qid = cd.qid AND pp.i = cd.nid
         |  JOIN sel${t - 1}$sfx s ON s.qid = pp.qid AND s.nid = pp.j
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1}$sfx x
         |    WHERE x.qid = cd.qid AND x.nid = cd.nid)
         |  GROUP BY cd.qid, cd.nid, cd.d2),
         |p$t$sfx AS (SELECT qid, nid FROM (SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY $wDiv * msd - $wRel * d2 DESC, nid) AS rn
         |  FROM ms$t$sfx) z WHERE rn = 1),
         |sel$t$sfx AS (SELECT qid, nid, step FROM sel${t - 1}$sfx
         |  UNION ALL SELECT qid, nid, $t FROM p$t$sfx)""".stripMargin
    }.mkString(",\n")
    s"""sel1$sfx AS (SELECT qid, nid, 1 AS step FROM (SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn FROM cd) z
       |  WHERE rn = 1),
       |$steps""".stripMargin
  }

  private def mmrTailSql(k: Int = 5): String =
    s"""$MmrPpSql,
       |${mmrSelChainSql(k, 1, 1)}
       |SELECT qid, nid, CAST(step AS INTEGER) AS step FROM sel$k
       |ORDER BY qid, step""".stripMargin

  private lazy val MmrOracleSql: String =
    s"""WITH $PreparedCte,
       |sc AS (SELECT qn.vec_id AS qid, cn.vec_id AS nid,
       |    CAST(qn.nsq + cn.nsq - 2*list_dot_product(qn.qd, cn.qd) AS BIGINT) AS d2
       |  FROM n qn JOIN n cn ON qn.vec_id < 10 AND cn.vec_id != qn.vec_id),
       |cd AS (SELECT qid, nid, d2 FROM (SELECT qid, nid, d2,
       |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn FROM sc) z
       |  WHERE rn <= 20),
       |${mmrTailSql(5)}""".stripMargin

  /** The q306 oracle: ONE candidate set and ONE pairwise-distance CTE
    * (both λ-independent), three suffixed greedy chains through the
    * SHARED chain owner at the three integer weightings. */
  private lazy val MmrLambdaSweepOracleSql: String =
    s"""WITH $PreparedCte,
       |sc AS (SELECT qn.vec_id AS qid, cn.vec_id AS nid,
       |    CAST(qn.nsq + cn.nsq - 2*list_dot_product(qn.qd, cn.qd) AS BIGINT) AS d2
       |  FROM n qn JOIN n cn ON qn.vec_id < 10 AND cn.vec_id != qn.vec_id),
       |cd AS (SELECT qid, nid, d2 FROM (SELECT qid, nid, d2,
       |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn FROM sc) z
       |  WHERE rn <= 20),
       |$MmrPpSql,
       |${mmrSelChainSql(5, 1, 0, "_a")},
       |${mmrSelChainSql(5, 1, 1, "_b")},
       |${mmrSelChainSql(5, 0, 1, "_c")}
       |SELECT CAST(0 AS INTEGER) AS lambda_pct, qid, nid,
       |  CAST(step AS INTEGER) AS step FROM sel5_a
       |UNION ALL SELECT CAST(50 AS INTEGER), qid, nid,
       |  CAST(step AS INTEGER) FROM sel5_b
       |UNION ALL SELECT CAST(100 AS INTEGER), qid, nid,
       |  CAST(step AS INTEGER) FROM sel5_c
       |ORDER BY lambda_pct, qid, step""".stripMargin

  /** The q303 oracle: the UNCHANGED IVF-ADC CTE owners produce the
    * top-20 exact-reranked survivors (`appr` with the rank cut at 20),
    * which become the MMR tail's `cd` — candidate generation and
    * greedy tail each replayed by their own single owner. */
  private lazy val MmrOverIvfOracleSql: String =
    s"""WITH ${ivfAdcCtes(rerankK = 20)},
       |cd AS (SELECT qid, nid, d2 FROM appr),
       |${mmrTailSql(5)}""".stripMargin


  // data dir -> the ONE NSW stream staging dir (the idxDirs reuse rule)
  private val nswStreamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nswStreamDir(d: String): String = dirFor(nswStreamDirs, "graft-nswstream", d)

  // data dir -> the ONE NSW artifact dir (the idxDirs reuse rule)
  private val nswDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nswDir(d: String): String = dirFor(nswDirs, "graft-nswidx", d)

  // data dir -> the ONE q241 filtered-serve artifact dir (own dir: q230
  // and q241 both overwrite-save inside their bodies, and sharing one
  // path would let a concurrently running suite read a half-overwritten
  // artifact)
  private val nswFilteredDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nswFilteredDir(d: String): String =
    dirFor(nswFilteredDirs, "graft-nswfidx", d)

  // data dir -> the ONE q247 lifecycle-chain artifact dir (night0 +
  // night1 live under it)
  private val nswChainDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nswChainDir(d: String): String =
    dirFor(nswChainDirs, "graft-nswchain", d)

  // data dir -> the ONE q250 MIPS-graph artifact dir
  private val nswMipsDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def nswMipsDir(d: String): String =
    dirFor(nswMipsDirs, "graft-nswmips", d)

  /** The ONE MIPS-graph oracle instance shared by q249 (build-and-serve)
    * and q250 (serve from the persisted artifact) — identical hash ⇒
    * the artifact round-trip is metric-free. */
  private lazy val NswMipsOracleSqlStd: String =
    nswMipsOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
      beamWidth = 8, searchRounds = 3, k = 5)

  /** The ONE filtered-NSW oracle instance shared by q236 (serve from the
    * live-built graph) and q241 (serve from the persisted artifact) —
    * identical hash ⇒ load→filter→serve ≡ build→filter→serve. */
  private lazy val NswFilteredOracleSqlStd: String =
    nswFilteredOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
      beamWidth = 8, searchRounds = 3, k = 5,
      allowPred = "(%ID% % 5 = 1)")

  /** The ONE RRF fusion body (q194/q239): full-outer join of the two
    * top-10 legs, reciprocal-rank fusion in integer PPM (1000000 div
    * (60+r) — rank-discriminating for r ≤ 10, exact in both engines),
    * fused top-5 with both source ranks as audit columns. The dense leg
    * is the PLUGGABLE part (q194 routes IVF, q239 routes NSW — round-12
    * verdict item 4); the sparse leg and every fused character live
    * here, single-owner, so the two gates differ ONLY in the dense
    * route — exactly the claim under test. */
  private def fuseRrf(s: org.apache.spark.sql.SparkSession, d: String,
      dense: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = TextOps.bm25Ranked(s, d, col("doc_id") < 5)
      .filter(col("rank") <= 10)
      .select(col("qid"), col("nid"), col("rank").as("brank"))
    val w = Window.partitionBy("qid").orderBy(col("rrf_ppm").desc, col("nid"))
    dense.join(sparse, Seq("qid", "nid"), "full_outer")
      .select(col("qid"), col("nid"),
        (coalesce(expr("1000000 div (60 + drank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + brank)"), lit(0L)))
          .cast("long").as("rrf_ppm"),
        coalesce(col("drank"), lit(0)).cast("int").as("dense_rank"),
        coalesce(col("brank"), lit(0)).cast("int").as("bm25_rank"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("nid"),
        col("rrf_ppm"), col("dense_rank"), col("bm25_rank"))
      .orderBy("qid", "rank")
  }

  /** The [[fuseRrf]] oracle twin: BM25 CTEs + fusion + final select,
    * parameterized over the dense-leg CTE (columns qid, nid, drank). */
  private def rrfFusionTailSql(dtop: String): String =
    s"""${TextOps.bm25Ctes("doc_id < 5")},
       |btop AS (SELECT qid, nid, rn AS brank FROM bmr WHERE rn <= 10),
       |fused AS (
       |  SELECT coalesce(d.qid, b.qid) AS qid, coalesce(d.nid, b.nid) AS nid,
       |    coalesce(1000000 // (60 + d.drank), 0)
       |      + coalesce(1000000 // (60 + b.brank), 0) AS rrf,
       |    coalesce(d.drank, 0) AS drank, coalesce(b.brank, 0) AS brank
       |  FROM $dtop d FULL OUTER JOIN btop b
       |    ON d.qid = b.qid AND d.nid = b.nid),
       |fr AS (SELECT qid, nid, rrf, drank, brank,
       |  row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, nid) AS rank
       |  FROM fused)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid,
       |  CAST(rrf AS BIGINT) AS rrf_ppm,
       |  CAST(drank AS INTEGER) AS dense_rank,
       |  CAST(brank AS INTEGER) AS bm25_rank
       |FROM fr WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The q239 oracle: graph construction + the q236-style beam walk for
    * the vec_id < 5 queries, its visited pool cut to a top-10 dense leg,
    * fused through the SHARED [[rrfFusionTailSql]]. */
  private def nswHybridOracleSql(m: Int, targetBucket: Int,
      refineRounds: Int, beamWidth: Int, searchRounds: Int): String =
    s"WITH $PreparedCte,\n" +
      nswGraphCtes("", "TRUE", m, targetBucket, refineRounds) + ",\n" +
      nswSearchCtes("", s"g$refineRounds", "vec_id < 5", "", beamWidth,
        searchRounds, 16) + s""",
         |dtop AS (SELECT qid, nid, rank AS drank FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
         |  FROM sv$searchRounds WHERE nid <> qid) t WHERE rank <= 10),
         |${rrfFusionTailSql("dtop")}""".stripMargin

  /** The q249 Spark-side corpus augmentation — the textbook MIPS→L2
    * reduction (Bachrach et al. 2014, the order-preserving transform
    * FAISS and ScaNN both ship): append sqrt(maxNorm² − ‖x‖²) to every
    * corpus vector and 0 to every query, and the augmented L2 order
    * equals the inner-product order (augmented ‖x‖² is ~constant, so
    * −2·q·x decides). Computed in the QUANTIZED integer domain the
    * whole vector family lives in: nsq is the exact integer norm, the
    * appended component is floor(sqrt(mx − nsq)) re-expressed as the
    * double (aug + 0.5)/1000 so [[graft.functions.VectorFunctions
    * .quantize]]'s floor(x·1000) recovers exactly `aug` (a bare
    * aug/1000 can round 1 ulp low and floor to aug−1) — every step is
    * correctly-rounded IEEE on identical inputs, so DuckDB replays the
    * augmentation bit-for-bit. The floor quantization makes the
    * reduction approximate at d2 ties (an index, not a gold), which is
    * why VectorSpec pins recall against [[Similarity.exactIpKnn]]. */
  /** Base index for the q187 bodies: fresh (gated run — Verify always
    * exercises the real build) or cached (bench — the q190 withBench
    * stance; the cache owns the handle, so only the fresh branch
    * releases). Builds are deterministic, so both branches serve
    * identical rows — the shared oracle is the proof. */
  private def ivfAppendServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val base = emb.filter(col("vec_id") < AppendBase)
    val baseIdx =
      if (cachedBuild) IvfAdcIndex.buildCached(base, d, "vec_id",
        "embedding", nlist = 8, trainRounds = 2, m = 16, ksub = 8,
        dim = Dim, pqTrainRounds = 2)
      else IvfAdcIndex.build(base, "vec_id", "embedding", nlist = 8,
        trainRounds = 2, m = 16, ksub = 8, dim = Dim, pqTrainRounds = 2)
    val idx = baseIdx.append(emb.filter(col("vec_id") >= AppendBase))
    if (!cachedBuild) baseIdx.release()
    val out = idx.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 50, nprobe = 2)
      .orderBy("qid", "rank")
    val served = out.collect()
    idx.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Base index + append + COMPACT + serve — the ONE q205 body (fresh
    * vs cached base build, the [[ivfAppendServe]] rule). */
  private def ivfCompactServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val base = emb.filter(col("vec_id") < AppendBase)
    val baseIdx =
      if (cachedBuild) IvfAdcIndex.buildCached(base, d, "vec_id",
        "embedding", nlist = 8, trainRounds = 2, m = 16, ksub = 8,
        dim = Dim, pqTrainRounds = 2)
      else IvfAdcIndex.build(base, "vec_id", "embedding", nlist = 8,
        trainRounds = 2, m = 16, ksub = 8, dim = Dim, pqTrainRounds = 2)
    val appended = baseIdx.append(emb.filter(col("vec_id") >= AppendBase))
    if (!cachedBuild) baseIdx.release()
    val idx = appended.compact()
    appended.release() // compacted storage is independent by contract
    val out = idx.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 50, nprobe = 2)
      .orderBy("qid", "rank")
    val served = out.collect()
    idx.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Pre-delete index + DELETE + serve — the ONE q219 body (fresh vs
    * cached build, the [[ivfAppendServe]] rule). */
  private def ivfDeleteServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val idx =
      if (cachedBuild) IvfAdcIndex.buildCached(emb, d, "vec_id",
        "embedding", nlist = 8, trainRounds = 2, m = 16, ksub = 8,
        dim = Dim, pqTrainRounds = 2)
      else IvfAdcIndex.build(emb, "vec_id", "embedding", nlist = 8,
        trainRounds = 2, m = 16, ksub = 8, dim = Dim, pqTrainRounds = 2)
    val pruned = idx.delete(emb.filter(col("vec_id") % 10 === 3),
      "vec_id")
    if (!cachedBuild) idx.release()
    val out = pruned.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 50, nprobe = 2)
      .orderBy("qid", "rank")
    val served = out.collect() // bounded (q187 rule: snapshot-backed)
    pruned.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** The ONE q216 body: night-0 build (fresh vs cached — the
    * [[ivfAppendServe]] rule) → save → load → append → compact → save
    * → load → serve, every post-build step identical between the gated
    * and bench variants. */
  private def ivfChainServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val base = emb.filter(col("vec_id") < AppendBase)
    val night0 = chainDir(d) + "/night0"
    val night1 = chainDir(d) + "/night1"
    val built =
      if (cachedBuild) IvfAdcIndex.buildCached(base, d, "vec_id",
        "embedding", nlist = 8, trainRounds = 2, m = 16, ksub = 8,
        dim = Dim, pqTrainRounds = 2)
      else IvfAdcIndex.build(base, "vec_id", "embedding", nlist = 8,
        trainRounds = 2, m = 16, ksub = 8, dim = Dim, pqTrainRounds = 2)
    built.save(night0)
    if (!cachedBuild) built.release()
    val loaded = IvfAdcIndex.load(s, night0, base)
    val appended = loaded.append(emb.filter(col("vec_id") >= AppendBase))
    loaded.release()
    val compacted = appended.compact()
    appended.release() // independent storage by contract (AnnIndexSpec)
    compacted.save(night1)
    compacted.release()
    val serving = IvfAdcIndex.load(s, night1, emb)
    val out = serving.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 50, nprobe = 2)
      .orderBy("qid", "rank")
    val served = out.collect() // bounded: k·|queries| rows (q187 rule)
    serving.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Pre-delete graph for the q232 bodies: fresh (gated run — Verify
    * always exercises the real construction) or cached (bench — the
    * q190 withBench stance; the cache owns the handle, so only the
    * fresh branch releases). Builds are deterministic, so both
    * branches serve identical rows — the shared oracle is the proof. */
  private def nswDeleteServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val planes = Similarity.adaptivePlanes(emb.count(), targetBucket = 64)
    val g =
      if (cachedBuild) GraphAnn.nswGraphCached(emb, d, "vec_id",
        "embedding", m = 16, planes = planes, dim = Dim, refineRounds = 1)
      else GraphAnn.nswGraphResult(emb, "vec_id", "embedding",
        m = 16, planes = planes, dim = Dim, refineRounds = 1)
    val isDel = col("vec_id") >= 20 && col("vec_id") % 7 === 3
    val g2 = GraphAnn.nswDelete(g, emb.filter(isDel).select("vec_id"),
      "vec_id")
    if (!cachedBuild) g.release()
    val out = GraphAnn.nswSearchOn(emb.filter(col("vec_id") < 10), g2,
      emb.filter(!isDel), "vec_id", "embedding", k = 5, beamWidth = 8,
      searchRounds = 3)
    g2.release()
    out.rows.orderBy("qid", "rank")
  }

  /** Base graph + append + serve — the ONE q233 body (fresh vs cached
    * base build, the [[nswDeleteServe]] rule). */
  private def nswAppendServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val planesB = Similarity.adaptivePlanes(base.count(), targetBucket = 64)
    val g =
      if (cachedBuild) GraphAnn.nswGraphCached(base, d, "vec_id",
        "embedding", m = 16, planes = planesB, dim = Dim, refineRounds = 1)
      else GraphAnn.nswGraphResult(base, "vec_id", "embedding",
        m = 16, planes = planesB, dim = Dim, refineRounds = 1)
    val appended = GraphAnn.nswAppend(g, base, delta, "vec_id",
      "embedding", m = 16, dim = Dim, beamWidth = 8, searchRounds = 3)
    if (!cachedBuild) g.release()
    val out = GraphAnn.nswSearchOn(emb.filter(col("vec_id") < 10),
      appended, emb, "vec_id", "embedding", k = 5, beamWidth = 8,
      searchRounds = 3)
    appended.release()
    out.rows.orderBy("qid", "rank")
  }

  /** Base graph + append + COMPACT + serve — the ONE q238 body (fresh
    * vs cached base build, the [[nswDeleteServe]] rule). */
  private def nswCompactServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val planesB = Similarity.adaptivePlanes(base.count(), targetBucket = 64)
    val g =
      if (cachedBuild) GraphAnn.nswGraphCached(base, d, "vec_id",
        "embedding", m = 16, planes = planesB, dim = Dim, refineRounds = 1)
      else GraphAnn.nswGraphResult(base, "vec_id", "embedding",
        m = 16, planes = planesB, dim = Dim, refineRounds = 1)
    val appended = GraphAnn.nswAppend(g, base, delta, "vec_id",
      "embedding", m = 16, dim = Dim, beamWidth = 8, searchRounds = 3)
    if (!cachedBuild) g.release()
    val compacted = appended.compact()
    appended.release() // compacted storage is independent by contract
    val out = GraphAnn.nswSearchOn(emb.filter(col("vec_id") < 10),
      compacted, emb, "vec_id", "embedding", k = 5, beamWidth = 8,
      searchRounds = 3)
    compacted.release()
    out.rows.orderBy("qid", "rank")
  }

  /** The ONE q247 body: night-0 build (fresh vs cached — the
    * [[nswDeleteServe]] rule) → save → load → append → compact → save
    * → load → serve, every post-build step identical between the gated
    * and bench variants. */
  private def nswChainServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val planesB = Similarity.adaptivePlanes(base.count(), targetBucket = 64)
    val night0 = nswChainDir(d) + "/n0"
    val night1 = nswChainDir(d) + "/n1"
    val built =
      if (cachedBuild) GraphAnn.nswGraphCached(base, d, "vec_id",
        "embedding", m = 16, planes = planesB, dim = Dim, refineRounds = 1)
      else GraphAnn.nswGraphResult(base, "vec_id", "embedding",
        m = 16, planes = planesB, dim = Dim, refineRounds = 1)
    built.save(night0)
    if (!cachedBuild) built.release()
    val loaded = NswGraph.load(s, night0)
    val appended = GraphAnn.nswAppend(loaded, base, delta, "vec_id",
      "embedding", m = 16, dim = Dim, beamWidth = 8, searchRounds = 3)
    loaded.release()
    val compacted = appended.compact()
    appended.release() // compacted storage is independent by contract
    compacted.save(night1)
    compacted.release()
    val serving = NswGraph.load(s, night1)
    val out = GraphAnn.nswSearchOn(emb.filter(col("vec_id") < 10),
      serving, emb, "vec_id", "embedding", k = 5, beamWidth = 8,
      searchRounds = 3)
    serving.release()
    out.rows.orderBy("qid", "rank")
  }

  /** Base SQ8 index + APPEND + serve — the ONE q254 body (fresh vs
    * cached base build, the [[ivfAppendServe]] rule). */
  private def sq8AppendServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val baseEmb = emb.filter(col("vec_id") < AppendBase)
    val base =
      if (cachedBuild) Sq8Index.buildCached(baseEmb, d, "vec_id",
        "embedding", dim = Dim)
      else Sq8Index.build(baseEmb, "vec_id", "embedding", dim = Dim)
    val idx = base.append(emb.filter(col("vec_id") >= AppendBase))
    if (!cachedBuild) base.release()
    val out = idx.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 100)
      .orderBy("qid", "rank")
    val served = out.collect()
    idx.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Full SQ8 index + DELETE + serve — the ONE q256 body (the
    * [[ivfDeleteServe]] rule). */
  private def sq8DeleteServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val idx =
      if (cachedBuild) Sq8Index.buildCached(emb, d, "vec_id", "embedding",
        dim = Dim)
      else Sq8Index.build(emb, "vec_id", "embedding", dim = Dim)
    val pruned = idx.delete(emb.filter(col("vec_id") % 10 === 3),
      "vec_id")
    if (!cachedBuild) idx.release()
    val out = pruned.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 100)
      .orderBy("qid", "rank")
    val served = out.collect()
    pruned.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Base matryoshka index + APPEND + serve — the ONE q255 body. */
  private def mryAppendServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val baseEmb = emb.filter(col("vec_id") < AppendBase)
    val base =
      if (cachedBuild) MatryoshkaIndex.buildCached(baseEmb, d, "vec_id",
        "embedding", prefixDim = 16)
      else MatryoshkaIndex.build(baseEmb, "vec_id", "embedding",
        prefixDim = 16)
    val idx = base.append(emb.filter(col("vec_id") >= AppendBase))
    if (!cachedBuild) base.release()
    val out = idx.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 100)
      .orderBy("qid", "rank")
    val served = out.collect()
    idx.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Full matryoshka index + DELETE + serve — the ONE q258 body. */
  private def mryDeleteServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val idx =
      if (cachedBuild) MatryoshkaIndex.buildCached(emb, d, "vec_id",
        "embedding", prefixDim = 16)
      else MatryoshkaIndex.build(emb, "vec_id", "embedding",
        prefixDim = 16)
    val pruned = idx.delete(emb.filter(col("vec_id") % 10 === 3),
      "vec_id")
    if (!cachedBuild) idx.release()
    val out = pruned.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 100)
      .orderBy("qid", "rank")
    val served = out.collect()
    pruned.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Base binary index + APPEND + serve — the ONE q298 body. */
  private def binAppendServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val baseEmb = emb.filter(col("vec_id") < AppendBase)
    val base =
      if (cachedBuild) BinaryIndex.buildCached(baseEmb, d, "vec_id",
        "embedding")
      else BinaryIndex.build(baseEmb, "vec_id", "embedding")
    val idx = base.append(emb.filter(col("vec_id") >= AppendBase))
    if (!cachedBuild) base.release()
    val out = idx.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 100)
      .orderBy("qid", "rank")
    val served = out.collect()
    idx.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  /** Full binary index + DELETE + serve — the ONE q299 body. */
  private def binDeleteServe(s: org.apache.spark.sql.SparkSession,
      d: String, cachedBuild: Boolean): org.apache.spark.sql.DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
    val idx =
      if (cachedBuild) BinaryIndex.buildCached(emb, d, "vec_id",
        "embedding")
      else BinaryIndex.build(emb, "vec_id", "embedding")
    val pruned = idx.delete(emb.filter(col("vec_id") % 10 === 3),
      "vec_id")
    if (!cachedBuild) idx.release()
    val out = pruned.query(emb.filter(col("vec_id") < 10), k = 5,
        candidates = 100)
      .orderBy("qid", "rank")
    val served = out.collect()
    pruned.release()
    s.createDataFrame(java.util.Arrays.asList(served: _*), out.schema)
  }

  private def mipsAugmented(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.VectorFunctions.{normSq, quantize}
    // nsq is recomputed INLINE (one codegen'd expression per row), never
    // fetched back through a vec_id self-join — at corpus scale that
    // join is a full shuffle the narrow form avoids; the only wide step
    // is the 1-row max broadcast
    val nsq = normSq(quantize(col("embedding")))
    val mx = emb.agg(max(nsq).as("mx"))
    emb.crossJoin(broadcast(mx))
      .select(col("vec_id"),
        concat(col("embedding"),
          array(((floor(sqrt((col("mx") - nsq).cast("double")))
            + lit(0.5)) / lit(1000.0)).cast("float"))).as("embedding"))
  }

  /** Query twin of [[mipsAugmented]]: a zero component — dot products
    * against augmented corpus vectors are then the ORIGINAL q·x. */
  private def mipsAugmentedZero(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.select(col("vec_id"),
      concat(col("embedding"), array(lit(0.0f))).as("embedding"))

  /** The q249 oracle: replay the augmentation (quantized norms, max,
    * floor(sqrt)), re-run the standard prepared chain over the
    * augmented corpus, build + search with the UNCHANGED graph/search
    * CTE owners (queries read the zero-augmented `nq` frame via the
    * qSrc seam), final cut. The LSH bucket hashing stays over the
    * first 64 components on both sides — the augmented component
    * carries no direction. */
  /** The MIPS→L2 augmentation as DuckDB CTEs — ONE owner shared by the
    * NSW (q249/q250) and SQ8 (q263) MIPS oracles: quantized norms, the
    * 1-row max, the floor(sqrt) augmented corpus (`augsrc` → the
    * standard prepared e/p/n chain over 65 dims) and the zero-augmented
    * query chain (`qaug`/`qe` int codes → `nq` (qd, nsq)). */
  private lazy val MipsAugCtesSql: String =
    s"""b0 AS (SELECT vec_id, embedding,
         |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS bq
         |  FROM embeddings),
         |b1 AS (SELECT vec_id, embedding,
         |  list_dot_product(list_transform(bq, x -> CAST(x AS DOUBLE)),
         |                   list_transform(bq, x -> CAST(x AS DOUBLE))) AS bnsq
         |  FROM b0),
         |bmx AS (SELECT max(bnsq) AS mx FROM b1),
         |augsrc AS (SELECT vec_id,
         |  list_append(embedding,
         |    CAST((floor(sqrt(mx - bnsq)) + 0.5) / 1000.0 AS FLOAT)) AS embedding
         |  FROM b1, bmx),
         |${preparedCte("augsrc")},
         |qaug AS (SELECT vec_id,
         |  list_append(embedding, CAST(0.0 AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id < 10),
         |qe AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM qaug),
         |qp2 AS (SELECT vec_id, list_transform(q, x -> CAST(x AS DOUBLE)) AS qd FROM qe),
         |nq AS (SELECT vec_id, qd, list_dot_product(qd, qd) AS nsq FROM qp2)""".stripMargin

  /** The q263 oracle: the SAME augmentation CTEs as the NSW MIPS gates
    * ([[MipsAugCtesSql]] — single owner), then the standard SQ8 chain
    * with the query/corpus seam split: bounds train on the AUGMENTED
    * corpus (65 dims), corpus codes from `e`, query codes from the
    * zero-augmented `qe` under the SAME bounds, code-distance
    * candidates, exact augmented-L2 rerank (query norms from `nq`). */
  private lazy val Sq8MipsOracleSql: String =
    s"WITH $MipsAugCtesSql,\n" +
      s"""dx AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM e),
         |st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM dx GROUP BY i),
         |sa AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM st),
         |c AS (SELECT vec_id, ${sq8CodeExpr(Dim + 1)} AS code FROM e, sa),
         |cq AS (SELECT vec_id, ${sq8CodeExpr(Dim + 1)} AS code FROM qe, sa),
         |cn AS (SELECT vec_id, code, $Sq8CnsqExpr AS cnsq FROM c),
         |cqn AS (SELECT vec_id, code, $Sq8CnsqExpr AS cnsq FROM cq),
         |ad AS (SELECT a.vec_id AS qid, b.vec_id AS nid, $Sq8AdistExpr AS adist
         |  FROM cqn a JOIN cn b ON b.vec_id <> a.vec_id),
         |cand AS (SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS arank FROM ad) t
         |  WHERE arank <= 100),
         |scored AS (SELECT cc.qid, cc.nid,
         |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2
         |  FROM cand cc JOIN nq na ON na.vec_id = cc.qid JOIN n nb ON nb.vec_id = cc.nid)
         |SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT qid, nid, d2, row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank FROM scored) t
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  private def nswMipsOracleSql(m: Int, targetBucket: Int,
      refineRounds: Int, beamWidth: Int, searchRounds: Int,
      k: Int): String = {
    val base = MipsAugCtesSql
    s"WITH $base,\n" +
      nswGraphCtes("", "TRUE", m, targetBucket, refineRounds) + ",\n" +
      nswSearchCtes("", s"g$refineRounds", "vec_id < 10", "", beamWidth,
        searchRounds, 16, qSrc = "nq") + "\n" +
      nswFinalSelect("", searchRounds, k)
  }

  /** The q248 oracle: ONE graph construction, then a full beam-search
    * CTE chain PER beam width (prefixes b2/b4/b8 — the suffixed
    * AdcCutRerankSql stance from q224), the exact-L2 gold, and a
    * per-width hit join — the operating curve is data, not assumption. */
  private def nswSweepOracleSql(m: Int, targetBucket: Int,
      refineRounds: Int, widths: Seq[Int], searchRounds: Int,
      k: Int): String = {
    val g = s"g$refineRounds"
    val perBw = widths.map { bw =>
      nswSearchCtes(s"b$bw", g, "vec_id < 10", "", bw, searchRounds, 16) +
        s""",
           |srv_$bw AS (SELECT qid, nid FROM (
           |  SELECT qid, nid,
           |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
           |  FROM b${bw}sv$searchRounds WHERE nid <> qid) t
           |  WHERE rank <= $k)""".stripMargin
    }.mkString(",\n")
    val recalls = widths.map { bw =>
      s"""SELECT $bw AS beam_width,
         |  CAST(count(a.nid) AS BIGINT) AS hits,
         |  CAST(count(*) AS BIGINT) AS total,
         |  CAST(count(a.nid) AS DOUBLE) / count(*) AS recall
         |FROM exact e LEFT JOIN srv_$bw a
         |  ON a.qid = e.qid AND a.nid = e.nid""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $PreparedCte,\n" +
      nswGraphCtes("", "TRUE", m, targetBucket, refineRounds) + ",\n" +
      perBw + s""",
         |exact AS (
         |  SELECT qid, nid FROM (
         |    SELECT a.vec_id AS qid, b.vec_id AS nid,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |        CAST(a.nsq + b.nsq - 2 * list_dot_product(a.qd, b.qd) AS BIGINT),
         |        b.vec_id) AS rk
         |    FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id) t
         |  WHERE rk <= $k)
         |SELECT * FROM ($recalls) ORDER BY beam_width""".stripMargin
  }

  /** The ONE append-replay oracle instance shared by q233 (append) and
    * q238 (append → compact) — identical hash ⇒ compaction is pure
    * storage reorganization. */
  private lazy val NswAppendOracleSqlStd: String =
    nswAppendOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
      beamWidth = 8, searchRounds = 3, k = 5)

  /** DuckDB replay of [[GraphAnn.nswGraphResult]] + [[GraphAnn.nswStats]]
    * (q237): graph CTEs, then the degree histogram, the reciprocity
    * EXISTS-count, and the undirected component count via a RECURSIVE
    * min-label closure — CC's fixpoint is unique (min id per component),
    * so the engine's pointer-jumping rounds and this transitive closure
    * agree bit-for-bit. The closure is Σ|component|² rows — fine at
    * oracle scale, and exactly why the ENGINE runs O(log d) pointer
    * jumping instead. */
  private def nswStatsOracleSql(m: Int, targetBucket: Int,
      refineRounds: Int): String = {
    val g = s"g$refineRounds"
    s"WITH RECURSIVE $PreparedCte,\n" +
      nswGraphCtes("", "TRUE", m, targetBucket, refineRounds) + s""",
         |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM $g
         |  UNION SELECT dst, src FROM $g),
         |reach AS (SELECT a AS v, a AS l FROM und
         |  UNION SELECT und.b AS v, reach.l AS l
         |  FROM reach JOIN und ON und.a = reach.v),
         |lab AS (SELECT v, min(l) AS comp FROM reach GROUP BY v),
         |ncomp AS (SELECT count(DISTINCT comp) AS nc FROM lab),
         |deg AS (SELECT src, count(*) AS od FROM $g GROUP BY src),
         |hist AS (SELECT od, count(*) AS n_nodes FROM deg GROUP BY od),
         |rec AS (SELECT count(*) AS nrec FROM $g x
         |  WHERE EXISTS (SELECT 1 FROM $g y
         |                WHERE y.src = x.dst AND y.dst = x.src)),
         |tot AS (SELECT count(*) AS ne FROM $g)
         |SELECT CAST(od AS BIGINT) AS out_degree,
         |  CAST(n_nodes AS BIGINT) AS n_nodes,
         |  CAST(ne AS BIGINT) AS n_edges,
         |  CAST(nrec AS BIGINT) AS reciprocal_edges,
         |  CAST(nrec * 1000000 // ne AS BIGINT) AS reciprocity_ppm,
         |  CAST(nc AS BIGINT) AS n_components
         |FROM hist, rec, tot, ncomp ORDER BY out_degree""".stripMargin
  }

  /** The ONE NSW oracle instance shared by q226 (build-and-serve) and
    * q230 (save/load round-trip) — identical hash ⇒ load ≡ build. */
  private lazy val NswOracleSqlStd: String =
    nswOracleSql(m = 16, targetBucket = 64, refineRounds = 1,
      beamWidth = 8, searchRounds = 3, k = 5)

  /** DuckDB twin of the md5-hash shard/sub assignment used by the NSW
    * seed ('0x'-parse ≡ Spark's conv — the bloom precedent). */
  private def nswMd5Mod(a: String, b: String): String =
    s"CAST(('0x' || substr(md5(CAST($a AS VARCHAR) || ':' || CAST($b AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** NSW graph-construction CTE chain, name-prefixed with `x` over the
    * node subset `nWhere` (a predicate on e.vec_id; "TRUE" = all) —
    * occupancy-scaled planes from the SUBSET's count, sharded hot
    * buckets, seed top-m, `refineRounds` sampled NN-descent rounds.
    * Final CTE: `${x}g$refineRounds`. One owner for q226/q230/q231/q232
    * (x = "") and the q233 append replay (x = "b" base / "d" delta). */
  private def nswGraphCtes(x: String, nWhere: String, m: Int,
      targetBucket: Int, refineRounds: Int): String = {
    val seedCap = GraphAnn.SeedCap
    val seed =
      s"""${x}gcnt AS (SELECT count(*) AS n FROM e WHERE $nWhere),
         |${x}gpl AS (SELECT GREATEST(2, COALESCE(
         |  (SELECT min(p) FROM range(0, 25) t(p), ${x}gcnt
         |   WHERE (CAST($targetBucket AS BIGINT) << CAST(p AS INTEGER)) >= n), 24)) AS planes),
         |${x}bk AS (SELECT vec_id, ${bucketSqlDuckDyn("planes")} AS bucket
         |  FROM e, ${x}gpl WHERE $nWhere),
         |${x}gn AS MATERIALIZED (SELECT n.vec_id, n.qd, n.nsq, ${x}bk.bucket
         |       FROM n JOIN ${x}bk USING (vec_id)),
         |${x}gbc AS (SELECT bucket,
         |  CAST((count(*) + ${seedCap - 1}) // $seedCap AS BIGINT) AS nsub
         |  FROM ${x}gn GROUP BY bucket),
         |${x}gns AS (SELECT ${x}gn.vec_id, ${x}gn.qd, ${x}gn.nsq, ${x}gn.bucket,
         |  ${nswMd5Mod(s"${x}gn.vec_id", s"${x}gn.bucket")} % ${x}gbc.nsub AS sub
         |  FROM ${x}gn JOIN ${x}gbc USING (bucket)),
         |${x}gp0 AS (SELECT vec_id, qd, nsq, unnest(list_concat([bucket],
         |  list_transform(range(0, planes),
         |    p -> xor(bucket, CAST(1 AS BIGINT) << CAST(p AS INTEGER))))) AS probe
         |  FROM ${x}gn, ${x}gpl),
         |${x}gp AS (SELECT ${x}gp0.vec_id, ${x}gp0.qd, ${x}gp0.nsq, ${x}gp0.probe,
         |  ${nswMd5Mod(s"${x}gp0.vec_id", s"${x}gp0.probe")} % ${x}gbc.nsub AS psub
         |  FROM ${x}gp0 JOIN ${x}gbc ON ${x}gbc.bucket = ${x}gp0.probe),
         |${x}g0 AS MATERIALIZED (SELECT src, dst, d2 FROM (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    CAST(a.nsq + b.nsq - 2 * list_dot_product(a.qd, b.qd) AS BIGINT) AS d2,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |      CAST(a.nsq + b.nsq - 2 * list_dot_product(a.qd, b.qd) AS BIGINT),
         |      b.vec_id) AS rk
         |  FROM ${x}gp a JOIN ${x}gns b ON a.probe = b.bucket AND a.psub = b.sub
         |    AND a.vec_id <> b.vec_id) t
         |  WHERE rk <= $m)""".stripMargin
    val refines = (1 to refineRounds).map { r =>
      s"""${x}gb$r AS MATERIALIZED (SELECT src, dst FROM ${x}g${r - 1} UNION SELECT dst, src FROM ${x}g${r - 1}),
         |${x}ghh$r AS (SELECT src, dst FROM (
         |  SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rk
         |  FROM ${x}g${r - 1}) t WHERE rk <= ${math.max(1, m / 2)}),
         |${x}gbh$r AS MATERIALIZED (SELECT src, dst FROM ${x}ghh$r
         |  UNION SELECT dst, src FROM ${x}ghh$r),
         |${x}gc$r AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM ${x}gb$r
         |    UNION
         |    SELECT x.src, y.dst FROM ${x}gb$r x JOIN ${x}gbh$r y
         |      ON x.dst = y.src AND y.dst <> x.src) u),
         |${x}g$r AS MATERIALIZED (SELECT src, dst, d2 FROM (
         |  SELECT c.src, c.dst,
         |    CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd) AS BIGINT) AS d2,
         |    row_number() OVER (PARTITION BY c.src ORDER BY
         |      CAST(na.nsq + nb.nsq - 2 * list_dot_product(na.qd, nb.qd) AS BIGINT),
         |      c.dst) AS rk
         |  FROM ${x}gc$r c JOIN n na ON na.vec_id = c.src
         |  JOIN n nb ON nb.vec_id = c.dst) t
         |  WHERE rk <= $m)""".stripMargin
    }
    (Seq(seed) ++ refines).mkString(",\n")
  }

  /** NSW hub-entry beam-search CTE chain, name-prefixed with `y`, over
    * edge CTE `graph`: queries from `n WHERE $qWhere`, hubs from
    * `n$hubWhere`. Final visited pool: `${y}sv$searchRounds`. */
  private def nswSearchCtes(y: String, graph: String, qWhere: String,
      hubWhere: String, beamWidth: Int, searchRounds: Int,
      hubCount: Int, qSrc: String = "n"): String = {
    val init =
      s"""${y}qv AS MATERIALIZED (SELECT vec_id AS qid, qd AS qqd, nsq AS qnsq FROM $qSrc WHERE $qWhere),
         |${y}hid AS (SELECT vec_id FROM n$hubWhere ORDER BY vec_id LIMIT $hubCount),
         |${y}hp AS (SELECT n.vec_id, n.qd, n.nsq FROM n JOIN ${y}hid USING (vec_id)),
         |${y}sv0 AS MATERIALIZED (SELECT ${y}qv.qid, ${y}hp.vec_id AS nid,
         |    CAST(${y}qv.qnsq + ${y}hp.nsq - 2 * list_dot_product(${y}qv.qqd, ${y}hp.qd) AS BIGINT) AS d2
         |  FROM ${y}qv, ${y}hp),
         |${y}bm0 AS (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
         |  FROM ${y}sv0) t WHERE rk <= $beamWidth)""".stripMargin
    val hops = (1 to searchRounds).map { r =>
      s"""${y}sx$r AS (
         |  SELECT DISTINCT b.qid, $graph.dst AS nid
         |  FROM ${y}bm${r - 1} b JOIN $graph ON $graph.src = b.nid),
         |${y}sd$r AS (
         |  SELECT s.qid, s.nid,
         |    CAST(${y}qv.qnsq + nn.nsq - 2 * list_dot_product(${y}qv.qqd, nn.qd) AS BIGINT) AS d2
         |  FROM ${y}sx$r s JOIN ${y}qv ON ${y}qv.qid = s.qid JOIN n nn ON nn.vec_id = s.nid),
         |${y}sv$r AS MATERIALIZED (SELECT DISTINCT qid, nid, d2 FROM
         |  (SELECT * FROM ${y}sv${r - 1} UNION ALL SELECT * FROM ${y}sd$r) u),
         |${y}bm$r AS MATERIALIZED (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
         |  FROM ${y}sv$r) t WHERE rk <= $beamWidth)""".stripMargin
    }
    (Seq(init) ++ hops).mkString(",\n")
  }

  /** Filtered NSW search CTE chain (the q236 replay of [[GraphAnn
    * .nswSearchFilteredOn]]): allowed-only visited pool, hubs from the
    * smallest ALLOWED ids, and per round the two expansion arms — direct
    * allowed out-neighbors plus the bridge through disallowed 1-hop
    * nodes to their allowed out-neighbors. `allowPred` is a predicate
    * over the placeholder %ID%. */
  private def nswFilteredSearchCtes(y: String, graph: String,
      qWhere: String, allowPred: String, beamWidth: Int,
      searchRounds: Int, hubCount: Int): String = {
    def allow(e: String): String = allowPred.replace("%ID%", e)
    val init =
      s"""${y}qv AS MATERIALIZED (SELECT vec_id AS qid, qd AS qqd, nsq AS qnsq FROM n WHERE $qWhere),
         |${y}hid AS (SELECT vec_id FROM n WHERE ${allow("vec_id")} ORDER BY vec_id LIMIT $hubCount),
         |${y}hp AS (SELECT n.vec_id, n.qd, n.nsq FROM n JOIN ${y}hid USING (vec_id)),
         |${y}sv0 AS MATERIALIZED (SELECT ${y}qv.qid, ${y}hp.vec_id AS nid,
         |    CAST(${y}qv.qnsq + ${y}hp.nsq - 2 * list_dot_product(${y}qv.qqd, ${y}hp.qd) AS BIGINT) AS d2
         |  FROM ${y}qv, ${y}hp),
         |${y}bm0 AS (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
         |  FROM ${y}sv0) t WHERE rk <= $beamWidth)""".stripMargin
    val hops = (1 to searchRounds).map { r =>
      s"""${y}sx$r AS (SELECT DISTINCT b.qid, ga.dst AS nid
         |  FROM ${y}bm${r - 1} b JOIN $graph ga ON ga.src = b.nid
         |  WHERE ${allow("ga.dst")}),
         |${y}sb$r AS (SELECT DISTINCT b.qid, gb.dst AS nid
         |  FROM ${y}bm${r - 1} b JOIN $graph gm ON gm.src = b.nid
         |  JOIN $graph gb ON gb.src = gm.dst
         |  WHERE NOT ${allow("gm.dst")} AND ${allow("gb.dst")}),
         |${y}sc$r AS (SELECT qid, nid FROM ${y}sx$r UNION SELECT qid, nid FROM ${y}sb$r),
         |${y}sd$r AS (
         |  SELECT s.qid, s.nid,
         |    CAST(${y}qv.qnsq + nn.nsq - 2 * list_dot_product(${y}qv.qqd, nn.qd) AS BIGINT) AS d2
         |  FROM ${y}sc$r s JOIN ${y}qv ON ${y}qv.qid = s.qid JOIN n nn ON nn.vec_id = s.nid),
         |${y}sv$r AS MATERIALIZED (SELECT DISTINCT qid, nid, d2 FROM
         |  (SELECT * FROM ${y}sv${r - 1} UNION ALL SELECT * FROM ${y}sd$r) u),
         |${y}bm$r AS MATERIALIZED (SELECT qid, nid FROM (
         |  SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
         |  FROM ${y}sv$r) t WHERE rk <= $beamWidth)""".stripMargin
    }
    (Seq(init) ++ hops).mkString(",\n")
  }

  /** DuckDB replay of build-over-everything + [[GraphAnn
    * .nswSearchFilteredOn]] (q236): graph CTEs over the full corpus,
    * filtered search CTEs, final cut. */
  private def nswFilteredOracleSql(m: Int, targetBucket: Int,
      refineRounds: Int, beamWidth: Int, searchRounds: Int, k: Int,
      allowPred: String, hubCount: Int = 16): String =
    s"WITH $PreparedCte,\n" +
      nswGraphCtes("", "TRUE", m, targetBucket, refineRounds) + ",\n" +
      nswFilteredSearchCtes("", s"g$refineRounds", "vec_id < 10",
        allowPred, beamWidth, searchRounds, hubCount) + "\n" +
      nswFinalSelect("", searchRounds, k)

  /** Final top-k cut over a search chain's visited pool. */
  private def nswFinalSelect(y: String, searchRounds: Int, k: Int): String =
    s"""SELECT qid, nid, d2, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT qid, nid, d2,
       |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
       |  FROM ${y}sv$searchRounds WHERE nid <> qid) t
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** DuckDB replay of [[GraphAnn.nswGraphResult]] + [[GraphAnn
    * .nswSearchOn]] for the STANDARD gates (q226/q230/q231, and with
    * `delPred`, q232): graph CTEs + vec_id<10 search CTEs + final cut,
    * assembled from the prefixed fragments the q233 append replay also
    * composes. Reads the [[PreparedCte]] `e`/`n` frames. */
  private def nswOracleSql(m: Int, targetBucket: Int, refineRounds: Int,
      beamWidth: Int, searchRounds: Int, k: Int,
      hubCount: Int = 16, delPred: Option[String] = None): String = {
    // delPred: a predicate over the placeholder %ID% (e.g.
    // "(%ID% >= 20 AND %ID% % 7 = 3)") marking DELETED ids — the q219
    // stance replayed graph-side: construction reads EVERYTHING, the
    // serving side filters (edges incident to deleted nodes, the hub
    // list, nothing else), so the hash proves delete ≡
    // build-on-all-serve-survivors
    def pred(idExpr: String): String =
      delPred.get.replace("%ID%", idExpr)
    val g = delPred match {
      case Some(_) => "gdel"
      case None => s"g$refineRounds"
    }
    val delCte = delPred.map { _ =>
      s"""gdel AS (SELECT * FROM g$refineRounds
         |  WHERE NOT ${pred("src")} AND NOT ${pred("dst")}),
         |""".stripMargin
    }.getOrElse("")
    val hidWhere = delPred.map(_ => s" WHERE NOT ${pred("vec_id")}").getOrElse("")
    s"WITH $PreparedCte,\n" +
      nswGraphCtes("", "TRUE", m, targetBucket, refineRounds) + ",\n" +
      delCte +
      nswSearchCtes("", g, "vec_id < 10", hidWhere, beamWidth,
        searchRounds, hubCount) + "\n" +
      nswFinalSelect("", searchRounds, k)
  }

  /** The q233 append replay: build the BASE graph (ids < baseMax), beam-
    * search every delta vector against it (entry hubs = base smallest
    * ids), take each delta node's top-m as insert edges, seed
    * delta↔delta with the sharded-bucket construction (refine 0), pool
    * base edges ∪ insert edges (both directions) ∪ delta seed (both
    * directions), re-rank EVERY node's top-m — untouched base nodes
    * keep their lists by construction — then serve the standard queries
    * over the appended graph with FULL-corpus hubs. */
  private def nswAppendOracleSql(m: Int, targetBucket: Int,
      refineRounds: Int, beamWidth: Int, searchRounds: Int, k: Int,
      hubCount: Int = 16, baseMax: Int = 400,
      canaryMinPct: Option[Int] = None): String = {
    val bg = s"bg$refineRounds"
    val insertAndPool =
      s"""asr AS (SELECT qid AS src, nid AS dst, d2 FROM (
         |  SELECT qid, nid, d2,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
         |  FROM asv$searchRounds WHERE nid <> qid) t WHERE rk <= $m)""".stripMargin
    val pool =
      s"""apool AS (SELECT DISTINCT src, dst, d2 FROM (
         |  SELECT src, dst, d2 FROM $bg
         |  UNION ALL SELECT src, dst, d2 FROM asr
         |  UNION ALL SELECT dst AS src, src AS dst, d2 FROM asr
         |  UNION ALL SELECT src, dst, d2 FROM dg0
         |  UNION ALL SELECT dst AS src, src AS dst, d2 FROM dg0) u),
         |ga AS MATERIALIZED (SELECT src, dst, d2 FROM (
         |  SELECT src, dst, d2,
         |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rk
         |  FROM apool) t WHERE rk <= $m)""".stripMargin
    s"WITH $PreparedCte,\n" +
      nswGraphCtes("b", s"vec_id < $baseMax", m, targetBucket,
        refineRounds) + ",\n" +
      nswSearchCtes("a", bg, s"vec_id >= $baseMax",
        s" WHERE vec_id < $baseMax", beamWidth, searchRounds,
        hubCount) + ",\n" +
      insertAndPool + ",\n" +
      nswGraphCtes("d", s"vec_id >= $baseMax", m, targetBucket, 0) + ",\n" +
      pool + ",\n" +
      nswSearchCtes("f", "ga", "vec_id < 10", "", beamWidth,
        searchRounds, hubCount) +
      (canaryMinPct match {
        case None => "\n" + nswFinalSelect("f", searchRounds, k)
        case Some(pct) =>
          // q234: the appended serve becomes a CTE (the nswFinalSelect
          // cut, un-ordered), joined against the exact gold for the
          // canary recall and the integer retrain decision — the q190
          // audit columns on every row. The fixture passes the canary,
          // so the emitted rows ARE the appended route's (the branch
          // the Spark side takes for the same integer compare).
          s""",
             |fsrv AS (SELECT qid, nid, d2, rank FROM (
             |  SELECT qid, nid, d2,
             |    row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rank
             |  FROM fsv$searchRounds WHERE nid <> qid) t
             |  WHERE rank <= $k),
             |ggold AS (SELECT qid, nid FROM (
             |  SELECT qa.vec_id AS qid, nb.vec_id AS nid,
             |    row_number() OVER (PARTITION BY qa.vec_id ORDER BY
             |      CAST(qa.nsq + nb.nsq - 2 * list_dot_product(qa.qd, nb.qd) AS BIGINT),
             |      nb.vec_id) AS rank
             |  FROM n qa JOIN n nb ON nb.vec_id <> qa.vec_id
             |  WHERE qa.vec_id < 10) t WHERE rank <= $k),
             |ghit AS (SELECT count(*) AS h FROM fsrv JOIN ggold USING (qid, nid)),
             |gtot AS (SELECT count(*) AS t FROM ggold)
             |SELECT fsrv.qid, fsrv.nid, fsrv.d2, CAST(fsrv.rank AS INTEGER) AS rank,
             |  CAST(h AS DOUBLE) / t AS mean_recall,
             |  h * 100 < $pct * t AS retrained
             |FROM fsrv, ghit, gtot ORDER BY fsrv.qid, fsrv.rank""".stripMargin
      })
  }
}
