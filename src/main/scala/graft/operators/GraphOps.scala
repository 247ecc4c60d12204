package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond the connected-components machinery in
  * [[Graph]]: damped, weighted PageRank in FIXED-POINT integer arithmetic.
  *
  * Why fixed-point: float PageRank accumulates contributions in a
  * nondeterministic order (Spark aggregation order is partition-dependent),
  * so no float formulation can be hash-gated cross-engine. Ranks here are
  * integer MILLIONTHS of probability mass; every per-edge contribution is
  * one truncating integer division (`rank * w div out_w` — Java `div` ==
  * DuckDB `//` on positives), and per-node sums are exact integer adds —
  * order-independent, so the result is bit-identical in any engine and
  * under any partitioning (the Lloyd-centroid rounding rule, Q.scala).
  *
  * Scale shape: one round = edges ⋈ ranks on the source key + groupBy
  * destination — the standard distributed PageRank join-aggregate; the
  * edge table shuffles by key, ranks stay a DataFrame (never collected —
  * node count is corpus-sized in general). The gated fixture bounds nodes
  * at the top-20 tokens so ranks broadcast; on a billion-node graph the
  * same body shuffle-joins, which is exactly the AQE decision point.
  */
object GraphOps {

  /** `rounds` damped PageRank iterations over `edges` (s, t, wt — positive
    * weights, both directions present for an undirected graph) restricted
    * to `nodes` (w). Returns (w, r) with r in millionths; dangling nodes
    * (no out-edges) keep the damping base term only. */
  def pagerank(nodes: DataFrame, edges: DataFrame, rounds: Int,
               dampMil: Int = 850): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of range")
    require(dampMil >= 0 && dampMil <= 1000, s"dampMil=$dampMil out of range")
    // node count is an O(1)-result action (the k-means `k` argument's
    // sibling); 1e6/n is the uniform start and the teleport base
    val n = nodes.count()
    require(n > 0, "pagerank over an empty node set")
    val baseMil = 1000000L / n
    val outw = edges.groupBy("s").agg(sum("wt").as("ow"))
    val e = edges.join(outw, "s")
    var ranks = nodes.select(col("w"), lit(baseMil).as("r"))
    for (_ <- 1 to rounds) {
      val contrib = e.join(ranks.withColumnRenamed("w", "s"), "s")
        .select(col("t"), expr("(r * wt) div ow").as("c"))
        .groupBy("t").agg(sum("c").as("cs"))
      ranks = nodes.join(contrib.withColumnRenamed("t", "w"), Seq("w"), "left")
        .select(col("w"),
          expr(s"($dampMil * coalesce(cs, 0L) + ${1000 - dampMil} * ${baseMil}L) div 1000")
            .as("r"))
    }
    ranks
  }

  val defs: Seq[Q] = Seq(

    // ---- token-graph PageRank, hash-gated: nodes = top-20 corpus tokens,
    //      edges = symmetrized adjacent-pair counts (self-loops dropped),
    //      3 damped rounds (0.85 in thousandths) in integer millionths.
    //      The oracle replays edge build and all three rounds; a single
    //      truncation or tie-break drift anywhere breaks the hash. The
    //      adjacency comes from a NARROW zip_with over each doc's token
    //      array — the oracle's positional self-join expresses the same
    //      pairs but would never scale; the engine never self-joins the
    //      corpus. ----
    Q("q150_token_pagerank",
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS w,
        |    unnest(range(len(string_split(text, ' ')))) AS p,
        |    doc_id
        |  FROM documents),
        |top AS (SELECT w FROM (
        |    SELECT w, count(*) AS c FROM tok GROUP BY w
        |    ORDER BY c DESC, w LIMIT 20)),
        |dir AS (
        |  SELECT a.w AS s, b.w AS t, count(*) AS wt
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |  WHERE a.w IN (SELECT w FROM top) AND b.w IN (SELECT w FROM top)
        |    AND a.w <> b.w
        |  GROUP BY 1, 2),
        |e0 AS (SELECT s, t, wt FROM dir
        |       UNION ALL SELECT t, s, wt FROM dir),
        |e AS (SELECT s, t, CAST(SUM(wt) AS BIGINT) AS wt FROM e0 GROUP BY s, t),
        |ow AS (SELECT s, SUM(wt) AS ow FROM e GROUP BY s),
        |nn AS (SELECT count(*) AS n FROM top),
        |r0 AS (SELECT w, 1000000 // (SELECT n FROM nn) AS r FROM top),
        |r1 AS (SELECT top.w,
        |         (850 * COALESCE(c.cs, 0) + 150 * (1000000 // (SELECT n FROM nn))) // 1000 AS r
        |       FROM top LEFT JOIN (
        |         SELECT e.t, SUM((r0.r * e.wt) // ow.ow) AS cs
        |         FROM e JOIN r0 ON e.s = r0.w JOIN ow ON ow.s = e.s
        |         GROUP BY e.t) c ON c.t = top.w),
        |r2 AS (SELECT top.w,
        |         (850 * COALESCE(c.cs, 0) + 150 * (1000000 // (SELECT n FROM nn))) // 1000 AS r
        |       FROM top LEFT JOIN (
        |         SELECT e.t, SUM((r1.r * e.wt) // ow.ow) AS cs
        |         FROM e JOIN r1 ON e.s = r1.w JOIN ow ON ow.s = e.s
        |         GROUP BY e.t) c ON c.t = top.w),
        |r3 AS (SELECT top.w,
        |         (850 * COALESCE(c.cs, 0) + 150 * (1000000 // (SELECT n FROM nn))) // 1000 AS r
        |       FROM top LEFT JOIN (
        |         SELECT e.t, SUM((r2.r * e.wt) // ow.ow) AS cs
        |         FROM e JOIN r2 ON e.s = r2.w JOIN ow ON ow.s = e.s
        |         GROUP BY e.t) c ON c.t = top.w)
        |SELECT w AS token, CAST(r AS BIGINT) AS rank_mil
        |FROM r3 ORDER BY rank_mil DESC, token""".stripMargin) { (s, d) =>
      val docs = Tables.t(s, d, "documents")
      val top = docs.select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(20).select("w")
      // adjacency as a narrow per-doc zip — the corpus is never self-joined
      val ts = docs.select(tokens(col("text")).as("ts"))
      val pairs = ts.select(explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("s"), b.as("t")))).as("pr"))
        .select(col("pr.s").as("s"), col("pr.t").as("t"))
        .filter(col("s") =!= col("t"))
      val dir = pairs
        .join(broadcast(top.select(col("w").as("s"))), "s")
        .join(broadcast(top.select(col("w").as("t"))), "t")
        .groupBy("s", "t").agg(count(lit(1)).as("wt"))
      val edges = dir.select(col("s"), col("t"), col("wt"))
        .unionByName(dir.select(col("t").as("s"), col("s").as("t"), col("wt")))
        .groupBy("s", "t").agg(sum("wt").cast("long").as("wt"))
      pagerank(top, edges, rounds = 3)
        .select(col("w").as("token"), col("r").cast("long").as("rank_mil"))
        .orderBy(col("rank_mil").desc, col("token"))
    }
  )
}
