package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Catalog/statistics surface (SURVEY.md §2.1 S5 — .dbinfo / file-size
  * reporting) plus the Readme's derived ratio stats (§2.5 A5) and the two
  * join shapes not yet covered (full outer; forced shuffle sort-merge). */
object StatsOps {

  val defs: Seq[Q] = Seq(

    // ---- S5: per-table row counts (the .dbinfo analog) ----
    Q("q49_table_stats", {
      val union = Tables.names
        .map(n => s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
        .mkString(" UNION ALL ")
      s"SELECT * FROM ($union) t ORDER BY table_name"
    }) { (s, d) =>
      Tables.names
        .map(n => Tables.t(s, d, n)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("table_name"), col("n_rows")))
        .reduce(_ union _)
        .orderBy("table_name")
    },

    // ---- A5: derived ratio over an aggregate (Readme.md:226) ----
    Q("q50_value_share",
      """SELECT CAST(count(CASE WHEN event_type IN ('purchase','signup') THEN 1 END) AS DOUBLE)
        |     / CAST(count(*) AS DOUBLE) AS share,
        |  count(*) AS total
        |FROM events""".stripMargin) { (s, d) =>
      Tables.t(s, d, "events")
        .agg(
          (count(when(col("event_type").isin("purchase", "signup"), 1)).cast("double") /
            count(lit(1)).cast("double")).as("share"),
          count(lit(1)).as("total"))
    },

    // ---- full outer join ----
    Q("q51_join_full_outer",
      """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nk,
        |  count(c.c_custkey) AS ncust, count(s.s_suppkey) AS nsupp
        |FROM (SELECT c_nationkey, c_custkey FROM customer) c
        |FULL OUTER JOIN (SELECT s_nationkey, s_suppkey FROM supplier) s
        |  ON c.c_nationkey = s.s_nationkey
        |GROUP BY 1 ORDER BY nk""".stripMargin) { (s, d) =>
      Tables.t(s, d, "customer").select("c_nationkey", "c_custkey")
        .join(Tables.t(s, d, "supplier").select("s_nationkey", "s_suppkey"),
          col("c_nationkey") === col("s_nationkey"), "full_outer")
        .groupBy(coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"))
        .agg(count(col("c_custkey")).as("ncust"), count(col("s_suppkey")).as("nsupp"))
        .orderBy("nk")
    },

    // ---- skew-safe salted aggregation: two-round exact counts. Output is
    //      salt-independent (partials combine exactly), so the oracle is
    //      the plain GROUP BY ----
    Q("q76_skew_salted_agg",
      """SELECT l_suppkey, count(*) AS n FROM lineitem
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, d) =>
      Skew.saltedCount(Tables.t(s, d, "lineitem"), "l_suppkey", 16)
        .orderBy("l_suppkey")
    },

    // ---- skew-safe salted join: small side replicated per salt, big side
    //      salted randomly — results are salt-independent (exact join), so
    //      the oracle is the plain join + aggregation ----
    Q("q87_skew_salted_join",
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
      Skew.saltedJoin(
          Tables.t(s, d, "lineitem").select("l_suppkey", "l_quantity"),
          Tables.t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          "l_suppkey", "s_suppkey", 16)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy("s_nationkey")
    },

    // ---- forced shuffle sort-merge join (the at-scale fact-fact path;
    //      broadcast would win at test SF, so pin the strategy) ----
    Q("q52_join_sortmerge",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.t(s, d, "lineitem")
        .join(Tables.t(s, d, "orders").hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"))
        .orderBy("l_returnflag")
    },

    // ---- join-key skew audit: the report to run BEFORE choosing a
    //      salting factor (q76/q87) or trusting AQE's skew-join split.
    //      One two-phase count per key (map-side combine makes the
    //      shuffled table key-sized), then O(1) scalars: the skew factor
    //      is max/mean — >> 1 means the hottest key serializes one task.
    //      heavy_key ties break to the smallest key. ----
    Q("q154_skew_report",
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |m AS (SELECT max(c) AS mx, count(*) AS nk, CAST(sum(c) AS BIGINT) AS nr
        |      FROM c),
        |h AS (SELECT min(user_id) AS heavy_key FROM c
        |      WHERE c = (SELECT mx FROM m))
        |SELECT m.nk AS n_keys, m.nr AS n_rows,
        |  CAST(m.mx AS BIGINT) AS max_per_key, h.heavy_key,
        |  CAST(m.nr AS DOUBLE) / CAST(m.nk AS DOUBLE) AS mean_per_key,
        |  CAST(m.mx AS DOUBLE) * CAST(m.nk AS DOUBLE) / CAST(m.nr AS DOUBLE)
        |    AS skew_factor
        |FROM m, h""".stripMargin) { (s, d) =>
      val counts = Tables.t(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).cast("long").as("n_rows"),
          max(col("c")).cast("long").as("max_per_key"),
          min_by(col("user_id"), struct(negate(col("c")), col("user_id")))
            .as("heavy_key"))
        .select(col("n_keys"), col("n_rows"), col("max_per_key"),
          col("heavy_key"),
          (col("n_rows").cast("double") / col("n_keys").cast("double"))
            .as("mean_per_key"),
          (col("max_per_key").cast("double") * col("n_keys").cast("double") /
            col("n_rows").cast("double")).as("skew_factor"))
    },

    // ---- DATASET CARD: the one-row corpus summary a pipeline publishes
    //      with every release (the HF dataset-card stats block): doc /
    //      source / language counts, token volume, exact-dedup uniqueness
    //      (q38's normalized fingerprint) and the duplicate rate in
    //      integer ppm. ONE logical pass over documents (the multi-
    //      distinct Aggregate plans as Spark's expand — 3 streams of one
    //      scan, no self-joins); every field integer-exact. ----
    Q("q209_dataset_card",
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_unique_norm,
        |  CAST((count(*) - count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))))
        |    * 1000000 // count(*) AS BIGINT) AS dup_ppm
        |FROM documents""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.{fingerprint, normalized}
      Tables.t(s, d, "documents")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
          sum(col("n_chars")).cast("long").as("n_chars"),
          countDistinct(fingerprint(normalized(col("text"))))
            .as("n_unique_norm"))
        .withColumn("dup_ppm",
          expr("(n_docs - n_unique_norm) * 1000000L div n_docs"))
    }
  )
}
