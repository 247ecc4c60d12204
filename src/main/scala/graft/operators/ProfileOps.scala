package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked profiling queries. */
object ProfileOps {

  /** DuckDB replica of [[Profile.hllRegisters]] over the documents token
    * stream — ONE definition shared by the q199 batch gate and the q203
    * streaming gate (WindowingOps), the shingleCteN single-owner rule. */
  private[operators] val HllOracleSql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |h AS (SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM tok),
      |r AS (SELECT CAST(h % 256 AS INTEGER) AS reg, h // 256 AS wv FROM h),
      |x AS (SELECT reg,
      |  CAST(CASE WHEN wv > 0 THEN 53 - length(bin(wv)) ELSE 53 END AS INTEGER) AS rho
      |FROM r)
      |SELECT reg, CAST(max(rho) AS INTEGER) AS maxrho, count(*) AS n_obs
      |FROM x GROUP BY reg ORDER BY reg""".stripMargin

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
    },

    // ---- the 100 TB percentile knob, gated exactly like q96: the
    //      percentile_approx sketch (one two-phase agg, NO per-group
    //      sort — the production path for q115's shape) runs next to the
    //      exact rank formula, and the query emits the exact values plus
    //      an in-query tolerance verdict the oracle asserts TRUE. ----
    Q("q133_percentiles_sketch",
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(max(CASE WHEN rn = (50*n + 99) // 100 THEN n_chars END) AS BIGINT) AS p50,
        |  CAST(max(CASE WHEN rn = (90*n + 99) // 100 THEN n_chars END) AS BIGINT) AS p90,
        |  CAST(max(CASE WHEN rn = (99*n + 99) // 100 THEN n_chars END) AS BIGINT) AS p99,
        |  TRUE AS sketch_ok
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Profile.percentilesApprox(Tables.t(s, d, "documents"),
          "source", "n_chars", "doc_id", Seq(50, 90, 99), withVerdict = true)
        .orderBy("source")
    },

    // ---- count-min sketch heavy-hitters: a DETERMINISTIC sketch (md5-
    //      derived bucket functions, depth 3 × width 64) built as a plain
    //      two-phase aggregation, then the top-20 true heavy hitters
    //      estimated from it. The oracle replays the identical sketch, so
    //      the gate pins bucket math AND the min-over-depth estimate —
    //      including real collisions (the overestimate property, asserted
    //      in ProfileSketchSpec, is visible in the fixture: some
    //      cms_estimate > true_count). At 100 TB the sketch is depth×width
    //      cells regardless of corpus size — THE broadcast-legal summary;
    //      the token stream is aggregated once map-side before any cell
    //      update, so the shuffle carries vocab rows, not token
    //      occurrences. ----
    Q("q128_countmin_heavyhitters", {
      val b = (d: String, w: String) =>
        s"CAST(('0x' || substr(md5(CAST($d AS VARCHAR) || ':' || $w), 1, 8)) AS BIGINT) % 64"
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |tf AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
         |rows_d AS (SELECT unnest(generate_series(0, 2)) AS d),
         |cells AS (
         |  SELECT d, ${b("d", "w")} AS b, sum(c) AS cnt
         |  FROM tf, rows_d GROUP BY 1, 2),
         |top AS (SELECT w, c FROM tf ORDER BY c DESC, w LIMIT 20),
         |est AS (
         |  SELECT top.w, top.c, min(cells.cnt) AS cms
         |  FROM top CROSS JOIN rows_d
         |  JOIN cells ON cells.d = rows_d.d
         |   AND cells.b = ${b("rows_d.d", "top.w")}
         |  GROUP BY top.w, top.c)
         |SELECT w AS token, CAST(c AS BIGINT) AS true_count,
         |  CAST(cms AS BIGINT) AS cms_estimate
         |FROM est ORDER BY true_count DESC, token""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.Column
      def bucket(dep: Column, w: Column): Column =
        conv(substring(md5(concat(dep.cast("string"), lit(":"), w)), 1, 8),
          16, 10).cast("long") % 64
      val tf = Tables.t(s, d, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val withDepth = tf.select(col("w"), col("c"),
        explode(sequence(lit(0), lit(2))).as("d"))
      val cells = withDepth
        .groupBy(col("d"), bucket(col("d"), col("w")).as("b"))
        .agg(sum(col("c")).as("cnt"))
      val top = tf.orderBy(col("c").desc, col("w")).limit(20)
      top.select(col("w"), col("c"), explode(sequence(lit(0), lit(2))).as("d"))
        .withColumn("b", bucket(col("d"), col("w")))
        .join(broadcast(cells), Seq("d", "b"))
        .groupBy(col("w"), col("c"))
        .agg(min(col("cnt")).as("cms"))
        .select(col("w").as("token"), col("c").as("true_count"),
          col("cms").as("cms_estimate"))
        .orderBy(col("true_count").desc, col("token"))
    },

    // ---- token-WEIGHTED percentiles of doc length per source: the
    //      q115 rank formula generalized to weights — "the median
    //      TOKEN sits in a doc of this length", which is what compute
    //      cost actually tracks (a corpus of many short + few huge docs
    //      has a token-weighted median far above the doc-weighted one;
    //      training-batch composition follows the former). Smallest
    //      value whose cumulative weight crosses p% of the source total,
    //      all integer (cw·100 ≥ p·W); the running sum shares the q115
    //      per-source window partitioning. ----
    Q("q212_weighted_percentiles",
      """WITH t AS (SELECT source, doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wt FROM documents),
        |r AS (SELECT source, n_chars, wt,
        |  sum(wt) OVER (PARTITION BY source ORDER BY n_chars, doc_id ROWS UNBOUNDED PRECEDING) AS cw,
        |  sum(wt) OVER (PARTITION BY source) AS w
        |  FROM t)
        |SELECT source, CAST(max(w) AS BIGINT) AS w_total,
        |  CAST(min(CASE WHEN cw*100 >= 50*w THEN n_chars END) AS BIGINT) AS wp50,
        |  CAST(min(CASE WHEN cw*100 >= 90*w THEN n_chars END) AS BIGINT) AS wp90
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("source")
      Tables.t(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("wt"))
        .withColumn("cw", sum("wt").over(wOrd))
        .withColumn("w", sum("wt").over(wAll))
        .groupBy("source")
        .agg(max("w").cast("long").as("w_total"),
          min(when(col("cw") * 100 >= col("w") * 50, col("n_chars")))
            .cast("long").as("wp50"),
          min(when(col("cw") * 100 >= col("w") * 90, col("n_chars")))
            .cast("long").as("wp90"))
        .orderBy("source")
    },

    // ---- DETERMINISTIC HyperLogLog registers over the token stream:
    //      the distinct-count sketch q96's approx_count_distinct uses
    //      internally, rebuilt from public math on md5 so BOTH engines
    //      derive identical registers — 60 hash bits split 8 (register
    //      index) + 52 (rank field), rho = 53 − bit_length(w), register
    //      = max rho. The gate pins the ENTIRE sketch state, not an
    //      estimate: hash split, rank rule, and the max-merge (which is
    //      what makes HLL distributive — partial registers from any
    //      partitioning max-merge to the same state, so the shuffle
    //      carries ≤ 256 rows per partition regardless of corpus size;
    //      the same property lets 1000 executors sketch 100 TB and merge
    //      driver-side). Estimate accuracy + mergeability are spec-gated
    //      (ProfileSketchSpec) — the float alpha correction has no
    //      cross-engine-exact form, the registers do. ----
    Q("q199_hll_registers", ProfileOps.HllOracleSql) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      Profile.hllRegisters(
          Tables.t(s, d, "documents")
            .select(explode(tokens(col("text"))).as("w")),
          col("w"))
        .orderBy("reg")
    },

    // ---- Benford first-digit profile: leading-digit counts of a
    //      positive measure — the fraud/synthetic-data smell test (real
    //      multiplicative data skews toward low digits; uniform synthetic
    //      data does not, WHICH IS ITSELF the fixture's signal). Integer
    //      extraction via string prefix of the floored value — no logs.
    //      One narrow map + one 9-row aggregation; the grand total is a
    //      window-sum OVER the 9-row digit aggregate (single-partition
    //      window over ≤9 rows — free), so the whole result is ONE plan
    //      with ONE orders scan and no eager driver-side count whose
    //      literal could go stale if the table changes between runs. ----
    Q("q170_benford_digits",
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        |    AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice >= 1)
        |SELECT digit, count(*) AS n,
        |  CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM d) AS DOUBLE)
        |    AS frac
        |FROM d GROUP BY digit ORDER BY digit""".stripMargin) { (s, d) =>
      val dd = Tables.t(s, d, "orders")
        .filter(col("o_totalprice") >= 1)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy(lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      dd.groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(wAll))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("total").cast("double")).as("frac"))
        .orderBy("digit")
    },

    // ---- join-coverage audit: what fraction of fact keys actually
    //      resolve against each dimension — the ETL health metric to
    //      check BEFORE an inner join silently drops rows. Left-join
    //      null counting per dimension, exact integers + one division.
    //      Both lineitem legs come off ONE fact scan (round-5 verdict):
    //      left-join orders AND part in sequence (each dim key unique,
    //      so row count is preserved), count both null keys in one agg,
    //      then stack() the pair into the two output rows — at 100 TB
    //      that's one lineitem scan instead of two (PlanSpec pins it),
    //      dims broadcast when small. ----
    Q("q171_join_coverage",
      """WITH l AS (
        |  SELECT 'lineitem->orders' AS leg, count(*) AS n_rows,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_miss
        |  FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem->part', count(*),
        |    sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |  FROM lineitem li LEFT JOIN part p ON li.l_partkey = p.p_partkey
        |  UNION ALL
        |  SELECT 'orders->customer', count(*),
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT leg, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_miss AS BIGINT) AS n_miss,
        |  CAST(n_rows - n_miss AS DOUBLE) / CAST(n_rows AS DOUBLE) AS coverage
        |FROM l ORDER BY leg""".stripMargin) { (s, d) =>
      def leg(name: String, fact: org.apache.spark.sql.DataFrame, fk: String,
              dim: org.apache.spark.sql.DataFrame, pk: String) =
        fact.select(col(fk)).join(dim.select(col(pk)), col(fk) === col(pk), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col(pk).isNull, 1).otherwise(0)).cast("long").as("n_miss"))
          .select(lit(name).as("leg"), col("n_rows"), col("n_miss"))
      val li = Tables.t(s, d, "lineitem")
      val ords = Tables.t(s, d, "orders")
      val liLegs = li.select(col("l_orderkey"), col("l_partkey"))
        .join(ords.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(Tables.t(s, d, "part").select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left")
        .agg(count(lit(1)).as("nr"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long")
            .as("miss_o"),
          sum(when(col("p_partkey").isNull, 1).otherwise(0)).cast("long")
            .as("miss_p"))
        .selectExpr("stack(2, 'lineitem->orders', nr, miss_o, " +
          "'lineitem->part', nr, miss_p) AS (leg, n_rows, n_miss)")
      liLegs
        .unionByName(leg("orders->customer", ords, "o_custkey",
          Tables.t(s, d, "customer"), "c_custkey"))
        .select(col("leg"), col("n_rows"), col("n_miss"),
          ((col("n_rows") - col("n_miss")).cast("double") /
            col("n_rows").cast("double")).as("coverage"))
        .orderBy("leg")
    },

    // ---- equi-width histogram in exact integer CENTS: the profiling
    //      staple q66 lacks. Two passes — one tiny min/max agg (broadcast
    //      as a 1-row bound frame, the Profile.scala pattern), one
    //      bucketing scan. All boundary arithmetic is integer (floor to
    //      cents first, then div) — a float (x-min)/(max-min) bucket
    //      formula is 1-ulp fragile at bucket edges across engines, the
    //      classic histogram drift. ----
    Q("q156_histogram", {
      val B = 20
      s"""WITH c AS (
         |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem),
         |m AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
         |w AS (SELECT lo, (hi - lo) // $B + 1 AS width FROM m),
         |b AS (SELECT (cents - w.lo) // w.width AS bucket FROM c, w)
         |SELECT bucket, count(*) AS n,
         |  (SELECT lo FROM w) + bucket * (SELECT width FROM w) AS lo_cents,
         |  (SELECT lo FROM w) + (bucket + 1) * (SELECT width FROM w) - 1 AS hi_cents
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, d) =>
      val B = 20
      val cents = Tables.t(s, d, "lineitem")
        .select(floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val bounds = cents.agg(min("cents").as("lo"), max("cents").as("hi"))
        .select(col("lo"), expr(s"(hi - lo) div $B + 1").as("width"))
      cents.crossJoin(broadcast(bounds))
        .select(expr("(cents - lo) div width").as("bucket"),
          col("lo"), col("width"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          (first("lo") + col("bucket") * first("width")).as("lo_cents"),
          (first("lo") + (col("bucket") + 1) * first("width") - 1).as("hi_cents"))
        .orderBy("bucket")
    }
  )
}
