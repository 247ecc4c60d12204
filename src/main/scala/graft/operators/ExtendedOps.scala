package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Extended operator coverage: as-of join, CUBE grouping sets, wider
  * string/array function surface, and sketch-based approximate distinct
  * (rows-only gate — HLL internals aren't oracle-reproducible; accuracy is
  * asserted in SketchSpec instead). */
object ExtendedOps {

  val defs: Seq[Q] = Seq(

    // ---- as-of join: latest prior click per purchase ----
    Q("q53_asof_join",
      """SELECT a.event_id, a.user_id, b.event_id AS click_id, b.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY a.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.t(s, d, "events")
      AsOfJoin.asOf(
        ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "click"),
        keyL = "user_id", keyR = "user_id", tsL = "ts", tsR = "ts",
        rightPayload = Seq("event_id" -> "click_id", "ts" -> "click_ts"))
        .select("event_id", "user_id", "click_id", "click_ts")
        .orderBy("event_id")
    },

    // ---- FORWARD as-of: the next click AT OR AFTER each purchase —
    //      next-event attribution, the mirror of q53's most-recent-prior.
    //      Same single-shuffle union+window shape with the frame flipped
    //      to current..unbounded-following.
    //      TIE-BREAK ASSUMPTION (round-5 advice): among right rows with
    //      identical (user_id, ts) the engine pins the struct-MIN payload,
    //      but DuckDB's ASOF tie-break for duplicate match timestamps is
    //      unspecified — this hash gate holds because the events fixture
    //      has at most one click per (user_id, ts) (event ts carries
    //      microsecond precision; ExtendedOpsSpec pins the fixture
    //      property so a regenerated fixture that breaks it fails
    //      loudly). ----
    Q("q169_asof_forward",
      """SELECT a.event_id, a.user_id, b.event_id AS next_click_id,
        |  b.ts AS next_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND a.ts <= b.ts
        |ORDER BY a.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.t(s, d, "events")
      AsOfJoin.asOfForward(
        ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "click"),
        keyL = "user_id", keyR = "user_id", tsL = "ts", tsR = "ts",
        rightPayload = Seq("event_id" -> "next_click_id", "ts" -> "next_click_ts"))
        .select("event_id", "user_id", "next_click_id", "next_click_ts")
        .orderBy("event_id")
    },

    // ---- as-of join on the custom PHYSICAL operator (same semantics and
    //      oracle as q53; plan is AsOfMergeJoinExec via the injected
    //      strategy instead of the composed window) ----
    Q("q91_asof_merge_join",
      """SELECT a.event_id, a.user_id, b.event_id AS click_id, b.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY a.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.t(s, d, "events")
      AsOfJoin.asOfMerge(
          ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
          ev.filter(col("event_type") === "click"),
          keyL = "user_id", keyR = "user_id", tsL = "ts", tsR = "ts",
          rightPayload = Seq("event_id" -> "click_id", "ts" -> "click_ts"))
        .select("event_id", "user_id", "click_id", "click_ts")
        .orderBy("event_id")
    },

    // ---- CUBE grouping sets ----
    Q("q54_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- wider string-function surface ----
    Q("q55_string_funcs2",
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS padded,
        |  reverse(p_name) AS rev,
        |  translate(p_name, 'aeiou', '12345') AS tr,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  repeat(p_type, 2) AS doubled
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.t(s, d, "part")
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          reverse(col("p_name")).as("rev"),
          translate(col("p_name"), "aeiou", "12345").as("tr"),
          split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          repeat(col("p_type"), 2).as("doubled"))
        .orderBy("p_partkey")
    },

    // ---- array-function surface (scalar outputs for stable compare) ----
    Q("q56_array_funcs",
      """WITH a AS (
        |  SELECT p_partkey, [p_size, p_size * 2, 7, 1] AS arr FROM part)
        |SELECT p_partkey,
        |  array_to_string(list_sort(arr), ',') AS sorted_csv,
        |  list_contains(arr, 7) AS has7,
        |  CAST(len(arr) AS INTEGER) AS alen,
        |  CAST(list_sum(arr) AS BIGINT) AS asum
        |FROM a ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.t(s, d, "part")
        .select(col("p_partkey"),
          array(col("p_size"), col("p_size") * 2, lit(7), lit(1)).as("arr"))
        .select(
          col("p_partkey"),
          array_join(sort_array(col("arr")), ",").as("sorted_csv"),
          array_contains(col("arr"), 7).as("has7"),
          size(col("arr")).as("alen"),
          aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("asum"))
        .orderBy("p_partkey")
    },

    // ---- collect aggregation (ObjectHashAggregate path), stabilized ----
    Q("q60_collect_agg",
      """SELECT c_mktsegment,
        |  array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations_csv,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(
          array_join(array_sort(collect_set(col("c_nationkey"))), ",").as("nations_csv"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // ---- non-equi range join (banded lookup) ----
    Q("q61_range_join",
      """WITH bands AS (
        |  SELECT r_regionkey AS band_id,
        |    r_regionkey * 400.0 AS lo, (r_regionkey + 1) * 400.0 AS hi
        |  FROM region)
        |SELECT band_id, count(*) AS n,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM part JOIN bands
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin) { (s, d) =>
      val bands = Tables.t(s, d, "region")
        .select(
          col("r_regionkey").as("band_id"),
          (col("r_regionkey") * 400.0).as("lo"),
          ((col("r_regionkey") + 1) * 400.0).as("hi"))
      Tables.t(s, d, "part")
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast("decimal(18,4)")).cast("double").as("total"))
        .orderBy("band_id")
    },

    // ---- rank-family window functions (tie-deterministic: they depend
    //      only on key values, not row order) ----
    Q("q80_rank_family",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cd
        |FROM lineitem WHERE l_orderkey <= 100
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      Tables.t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cd"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- regexp_extract_all + per-row match counts ----
    Q("q78_regexp_extract_all",
      """SELECT p_partkey,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INTEGER) AS vowel_runs,
        |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS word_runs
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.t(s, d, "part")
        .select(
          col("p_partkey"),
          size(expr("regexp_extract_all(p_name, '[aeiou]+', 0)")).as("vowel_runs"),
          array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), "|").as("word_runs"))
        .orderBy("p_partkey")
    },

    // ---- filtered distinct aggregation ----
    Q("q79_filtered_distinct",
      """SELECT
        |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS buyers,
        |  count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS clickers,
        |  count(DISTINCT user_id) AS all_users
        |FROM events""".stripMargin) { (s, d) =>
      Tables.t(s, d, "events")
        .agg(
          countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("buyers"),
          countDistinct(when(col("event_type") === "click", col("user_id"))).as("clickers"),
          countDistinct(col("user_id")).as("all_users"))
    },

    // ---- correlated scalar subquery through the SQL-text surface (EP3);
    //      Catalyst decorrelates it into a join ----
    Q("q73_correlated_subquery",
      """SELECT o_orderkey, o_orderpriority,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items,
        |  (SELECT CAST(coalesce(SUM(CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE)
        |   FROM lineitem WHERE l_orderkey = o_orderkey) AS total_qty
        |FROM orders WHERE o_orderkey <= 500
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      graft.Tables.registerViews(s, d)
      s.sql(
        """SELECT o_orderkey, o_orderpriority,
          |  (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items,
          |  (SELECT CAST(coalesce(SUM(CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE)
          |   FROM lineitem WHERE l_orderkey = o_orderkey) AS total_qty
          |FROM orders WHERE o_orderkey <= 500
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- time-range window frame: rolling 1h per-user event features ----
    Q("q70_window_time_range",
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS events_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.t(s, d, "events")
        .selectExpr(
          "event_id", "user_id",
          """count(*) OVER (PARTITION BY user_id ORDER BY ts
            |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS events_1h""".stripMargin,
          """CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts
            |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_1h""".stripMargin)
        .orderBy("event_id")
    },

    // ---- first/last value over explicit frames ----
    Q("q71_window_first_last",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.t(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(ordered).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- ntile bucketing ----
    Q("q72_window_ntile",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS price_quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.t(s, d, "orders")
        .select(
          col("o_orderkey"),
          ntile(4).over(Window.orderBy("o_totalprice", "o_orderkey")).as("price_quartile"))
        .orderBy("o_orderkey")
    },

    // ---- null handling: nullif / coalesce / null-aware aggregation ----
    Q("q69_null_handling",
      """WITH o AS (
        |  SELECT o_orderkey,
        |    nullif(o_orderstatus, 'O') AS status_or_null,
        |    CASE WHEN o_totalprice < 50000.0 THEN NULL ELSE o_totalprice END AS big_price
        |  FROM orders)
        |SELECT coalesce(status_or_null, 'OPEN') AS status_norm,
        |  count(*) AS n_rows, count(big_price) AS n_big,
        |  count(*) - count(big_price) AS n_null_price,
        |  CAST(coalesce(SUM(CAST(big_price AS DECIMAL(18,4))), 0) AS DOUBLE) AS sum_big
        |FROM o GROUP BY 1 ORDER BY status_norm""".stripMargin) { (s, d) =>
      Tables.t(s, d, "orders")
        .select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          when(col("o_totalprice") < 50000.0, lit(null)).otherwise(col("o_totalprice"))
            .as("big_price"))
        .groupBy(coalesce(col("status_or_null"), lit("OPEN")).as("status_norm"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("big_price")).as("n_big"),
          (count(lit(1)) - count(col("big_price"))).as("n_null_price"),
          coalesce(sum(col("big_price").cast("decimal(18,4)")), lit(0))
            .cast("double").as("sum_big"))
        .orderBy("status_norm")
    },

    // ---- date arithmetic ----
    Q("q62_date_arith",
      """SELECT o_orderkey,
        |  CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_ref,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow, -- duckdb: Sun=0; spark: Sun=1
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.t(s, d, "orders")
        .filter(col("o_orderkey") <= 200)
        .select(
          col("o_orderkey"),
          datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate")).as("days_to_ref"),
          date_add(col("o_orderdate"), 30).as("due_date"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"))
        .orderBy("o_orderkey")
    },

    // ---- exact percentiles. Bit-exact vs quantile_cont: l_quantity is an
    //      integer-valued DOUBLE, so lo/hi and (hi-lo) are exact and the
    //      dyadic fractions 0.25/0.5/0.75 make every interpolation step a
    //      correctly-rounded op on exactly-representable inputs — identical
    //      in both engines regardless of formula order. ----
    Q("q63_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  min(l_quantity) AS min_q, max(l_quantity) AS max_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, array(0.25, 0.75))").as("iqr"),
          min("l_quantity").as("min_q"), max("l_quantity").as("max_q"))
        .select(col("l_returnflag"), col("median_qty"),
          col("iqr")(0).as("q25"), col("iqr")(1).as("q75"),
          col("min_q"), col("max_q"))
        .orderBy("l_returnflag")
    },

    // ---- approx quantiles (KLL-style rank sketch), tolerance-gated like
    //      q57: rank error <= 1/accuracy of n rows, and l_quantity sits on
    //      an integer grid, so the sketch median must land within 1.0 of
    //      the exact median — the oracle asserts that verdict. ----
    Q("q89_approx_quantiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS exact_median,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_median"),
          expr("percentile(l_quantity, 0.5)").as("exact_median"))
        .select(col("l_returnflag"), col("exact_median"),
          (abs(col("approx_median") - col("exact_median")) <= 1.0).as("approx_ok"))
        .orderBy("l_returnflag")
    },

    // ---- HLL sketch distinct, range-gated: the sketch estimate itself is
    //      engine-specific (can't cross-hash), so the query emits the exact
    //      count plus a WITHIN-TOLERANCE flag the oracle asserts true —
    //      a wildly-off sketch now fails the hash compare. ----
    Q("q57_approx_distinct",
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.t(s, d, "events")
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.05).as("approx_ok"))
        .orderBy("event_type")
    },

    // ---- typed top-k aggregator, oracle-gated (the §2.12
    //      Aggregator[IN,BUF,OUT] slot was spec-only until here): per
    //      group the k highest (value, id) pairs via a SIZE-BOUNDED
    //      buffer merged associatively — each partition reduces to ≤k
    //      pairs BEFORE the shuffle, so the exchange carries k rows per
    //      group per partition instead of the full candidate set
    //      (TakeOrderedAndProject's win, applied per group; the scalable
    //      alternative to window+row_number when k ≪ group size). The
    //      oracle IS the window form, so the two must agree exactly,
    //      tie-breaks included. ----
    Q("q163_topk_typed_agg",
      """WITH r AS (SELECT event_type, value, event_id,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY value DESC, event_id) AS rn
        |FROM events)
        |SELECT event_type, CAST(rn AS INTEGER) AS rank, event_id, value
        |FROM r WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      val topk = new graft.functions.TopKAggregator(3).toColumn
      Tables.t(s, d, "events")
        .select(col("event_type"), col("value"), col("event_id"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(topk.name("top"))
        .toDF("event_type", "top")
        .select(col("event_type"), posexplode(col("top")).as(Seq("i", "p")))
        .select(col("event_type"), (col("i") + 1).cast("int").as("rank"),
          col("p._2").as("event_id"), col("p._1").as("value"))
        .orderBy("event_type", "rank")
    },

    // ---- UNPIVOT (melt): wide attribute columns to (attr, val) rows —
    //      the inverse of q26's pivot, and the shape every EAV export
    //      takes (the reference's *_tags tables ARE this form). The
    //      engine runs the REAL unpivot operator (one narrow generator,
    //      no shuffle); the oracle expresses the identical semantics as
    //      a UNION ALL, which is what unpivot desugars to. ----
    Q("q157_unpivot",
      """SELECT p_partkey, 'p_brand' AS attr, p_brand AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_type' AS attr, p_type AS val FROM part
        |ORDER BY p_partkey, attr""".stripMargin) { (s, d) =>
      Tables.t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_brand"), col("p_type")), "attr", "val")
        .orderBy("p_partkey", "attr")
    },

    // ---- GROUPING SETS (arbitrary grouping combos beyond rollup/cube's
    //      fixed lattices — q25/q54): per-type, per-hour, and grand
    //      total in ONE pass (one shuffle, each input row expanded per
    //      matching set map-side). NULL group keys mark the aggregate
    //      levels; ordering pins NULLS FIRST because the engines'
    //      default null order differs. ----
    Q("q158_grouping_sets",
      """SELECT event_type, hr, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM (SELECT event_type, hour(ts) AS hr, value FROM events) t
        |GROUP BY GROUPING SETS ((event_type), (hr), ())
        |ORDER BY event_type NULLS FIRST, hr NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.t(s, d, "events")
        .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("hr")), Seq()),
          col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
        .orderBy(col("event_type").asc_nulls_first, col("hr").asc_nulls_first)
    },

    // ---- blocked fuzzy join (entity resolution): candidate pairs come
    //      ONLY from the (brand, type, size) blocking equi-join — the
    //      relational sibling of the LSH band join — then the edit-
    //      distance verify runs on candidates alone. Never an all-pairs
    //      name comparison: candidates ∝ Σ block², and the blocking key
    //      is chosen so blocks stay small (a 1-key block like "last name
    //      token" degenerates — 8 blocks here — which is exactly the
    //      q154 skew audit's job to catch). levenshtein is the standard
    //      DP edit distance in both engines, integer-exact. ----
    Q("q155_fuzzy_blocked_join",
      """WITH t AS (
        |  SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part)
        |SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        |  a.p_name AS a_name, b.p_name AS b_name,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM t a JOIN t b
        |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        |  AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY dist, a_key, b_key""".stripMargin) { (s, d) =>
      val t = Tables.t(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"))
      val a = t.select(col("p_partkey").as("a_key"), col("p_name").as("a_name"),
        col("p_brand").as("blk_b"), col("p_type").as("blk_t"),
        col("p_size").as("blk_s"))
      val b = t.select(col("p_partkey").as("b_key"), col("p_name").as("b_name"),
        col("p_brand").as("blk_b"), col("p_type").as("blk_t"),
        col("p_size").as("blk_s"))
      a.join(b, Seq("blk_b", "blk_t", "blk_s"))
        .filter(col("a_key") < col("b_key"))
        .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
        .filter(col("dist") <= 3)
        .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"),
          col("dist"))
        .orderBy("dist", "a_key", "b_key")
    },

    // ---- CDC MERGE apply (the `MERGE INTO` family): upserts + deletes
    //      from a changes table applied to a base snapshot. Base keeps
    //      its rows that no change touches (left ANTI join on the key),
    //      upserts contribute their NEW payload, deletes vanish — the
    //      latest-snapshot compaction every incremental pipeline runs as
    //      its write step. Fixture is self-derived from events so the
    //      oracle replays it exactly: base = ids % 3 != 0, changes =
    //      even ids (overlap = updates, rest = inserts), every 10th id a
    //      delete, updated payload = value + 1. Scale: one equi-join
    //      family on the key + a union — no window, no sort; AQE
    //      broadcasts the changes side when a micro-batch is small,
    //      shuffle-joins when a backfill is not. ----
    Q("q148_cdc_merge",
      """WITH b AS (
        |  SELECT event_id, user_id, event_type, value FROM events
        |  WHERE event_id % 3 <> 0),
        |c AS (
        |  SELECT event_id, user_id, event_type, value + 1 AS value,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM events WHERE event_id % 2 = 0)
        |SELECT event_id, user_id, event_type, value FROM b
        |WHERE event_id NOT IN (SELECT event_id FROM c)
        |UNION ALL
        |SELECT event_id, user_id, event_type, value FROM c WHERE op = 'U'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val base = ev.filter(col("event_id") % 3 =!= 0)
      val changes = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          (col("value") + 1).as("value"),
          when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"))
      base.join(changes.select("event_id"), Seq("event_id"), "left_anti")
        .unionByName(changes.filter(col("op") === "U").drop("op"))
        .orderBy("event_id")
    },

    // ---- SCD2 dimension history: per-user event_type transition
    //      intervals. Consecutive repeats of the same state compress to
    //      one row (lag filter); each surviving transition is valid from
    //      its own ts until the NEXT transition's ts (lead), the last
    //      open-ended (NULL valid_to). The anchor event_id rides along
    //      for a total order under same-ts ties. Scale: both windows
    //      partition by user_id — per-key state, no global sort; the
    //      second window runs over the already-compressed transition
    //      rows. ----
    Q("q149_scd2_history",
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_id, ts, event_type FROM o
        |      WHERE prev IS NULL OR event_type <> prev),
        |f AS (SELECT user_id, event_id, event_type, ts AS valid_from,
        |        lead(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS valid_to
        |      FROM c)
        |SELECT user_id, event_id, event_type, valid_from, valid_to
        |FROM f ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changed = Tables.t(s, d, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("event_type") =!= col("prev"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      changed
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from", "event_id")
    }
  )
}
