package graft.operators

import graft.{Q, Tables}

/** Oracle-checked profiling queries. */
object ProfileOps {

  private val OrderCols = Seq("o_custkey", "o_orderstatus", "o_totalprice")

  val defs: Seq[Q] = Seq(

    Q("q66_profile_columns", {
      val per = OrderCols.map { c =>
        s"""SELECT '$c' AS column_name,
           |  (SELECT count(*) FROM orders) AS n_rows,
           |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$per\n) t ORDER BY column_name"
    }) { (s, d) =>
      Profile.columnStats(Tables.t(s, d, "orders"), OrderCols)
        .orderBy("column_name")
    },

    // ---- the 100 TB profiling knob, gated: HLL distinct per column with
    //      an in-query tolerance verdict the oracle asserts ----
    Q("q96_profile_approx", {
      val per = OrderCols.map { c =>
        s"""SELECT '$c' AS column_name,
           |  (SELECT count(*) FROM orders) AS n_rows,
           |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  TRUE AS approx_ok
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$per\n) t ORDER BY column_name"
    }) { (s, d) =>
      Profile.columnStatsApprox(Tables.t(s, d, "orders"), OrderCols,
          withVerdict = true)
        .orderBy("column_name")
    },

    Q("q67_referential_integrity",
      """SELECT
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  (SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans""".stripMargin) { (s, d) =>
      Profile.fkViolations(
        Tables.t(s, d, "lineitem"), "l_orderkey",
        Tables.t(s, d, "orders"), "o_orderkey")
    },

    // ---- exact rank-formula percentiles of doc length per source: the
    //      integer rank math ((p*n+99) div 100) replays identically in
    //      DuckDB, unlike approx/interpolating quantile sketches ----
    Q("q115_length_percentiles",
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(max(CASE WHEN rn = (50*n + 99) // 100 THEN n_chars END) AS BIGINT) AS p50,
        |  CAST(max(CASE WHEN rn = (90*n + 99) // 100 THEN n_chars END) AS BIGINT) AS p90,
        |  CAST(max(CASE WHEN rn = (99*n + 99) // 100 THEN n_chars END) AS BIGINT) AS p99
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Profile.exactPercentiles(Tables.t(s, d, "documents"),
          "source", "n_chars", "doc_id", Seq(50, 90, 99))
        .orderBy("source")
    }
  )
}
