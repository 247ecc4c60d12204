package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic data profiling — the reference's manual data-quality audit
  * (Readme.md:13–33) as reusable operators: per-column null/distinct/
  * min-max stats and referential-integrity checks between tables.
  *
  * Profile runs ONE pass over the table (all per-column aggregates in a
  * single Aggregate node — no per-column jobs), then unpivots driver-side:
  * at 100 TB the scan dominates, so one scan for the whole profile is the
  * only acceptable shape. */
object Profile {

  /** Shared single-pass profile scaffold: all per-column aggregates in one
    * Aggregate node, then a stack unpivot to one row per column. `perCol`
    * supplies the suffixed aggregate columns per input column; `fields`
    * names the unpivoted (suffix -> output field) mapping in order. */
  private def profiled(df: DataFrame, cols: Seq[String],
                       perCol: String => Seq[Column],
                       fields: Seq[(String, String)]): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ cols.flatMap(perCol)
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      (s"'$c'" +: fields.map { case (suffix, _) => s"${c}__$suffix" })
        .mkString(", ")).mkString(", ")
    val outFields = fields.map(_._2).mkString(", ")
    row.selectExpr("_n",
        s"stack(${cols.size}, $stackArgs) AS (column_name, $outFields)")
      .select(col("column_name") +: col("_n").as("n_rows") +:
        fields.map { case (_, f) => col(f) }: _*)
  }

  /** Per-column stats: (column_name, n_rows, n_nulls, n_distinct, min_str,
    * max_str). min/max rendered as strings so heterogeneous columns fit one
    * result schema. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame =
    profiled(df, cols,
      c => Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")),
      Seq("nulls" -> "n_nulls", "distinct" -> "n_distinct",
        "min" -> "min_str", "max" -> "max_str"))

  /** The 100 TB profiling variant: HLL sketch distinct per column — exact
    * countDistinct multiplies the aggregation's expand factor by the number
    * of distinct aggs, the sketch keeps the profile one cheap pass.
    * Default (`withVerdict = false`) is the production shape: sketch only,
    * (column_name, n_rows, n_nulls, n_distinct_approx). With
    * `withVerdict = true` it ALSO computes the exact count and a
    * within-`tol` verdict — the gate-check shape (q96, same pattern as the
    * q57/q89 sketch gates), which deliberately pays the exact cost. */
  def columnStatsApprox(df: DataFrame, cols: Seq[String],
                        rsd: Double = 0.02, tol: Double = 0.05,
                        withVerdict: Boolean = false): DataFrame =
    if (!withVerdict)
      profiled(df, cols,
        c => Seq(
          count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
          approx_count_distinct(col(c), rsd).as(s"${c}__approx")),
        Seq("nulls" -> "n_nulls", "approx" -> "n_distinct_approx"))
    else {
      // gate-check mode: exact + sketch as TWO separate single-pass
      // aggregations joined on column_name — mixing the HLL imperative
      // buffer into the multi-countDistinct Expand forces a sort-based
      // aggregate over the expanded rows (measured ~3x slower than the
      // two clean passes combined)
      val exact = profiled(df, cols,
        c => Seq(
          count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__exact")),
        Seq("nulls" -> "n_nulls", "exact" -> "n_distinct"))
      val approx = profiled(df, cols,
        c => Seq(approx_count_distinct(col(c), rsd).as(s"${c}__approx")),
        Seq("approx" -> "n_approx"))
        .select(col("column_name"), col("n_approx"))
      exact.join(broadcast(approx), "column_name")
        .select(col("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
          (abs(col("n_approx") - col("n_distinct"))
            <= col("n_distinct") * tol).as("approx_ok"))
    }

  /** Referential integrity: count of child rows whose key has no parent
    * (anti join), plus totals. */
  /** Exact per-group percentiles of an integer column by rank formula:
    * the value at row_number ceil(p·n/100) when ordered by (value, tie) —
    * pure integer math (`(p*n + 99) div 100`), so any engine replays it
    * bit-for-bit; no approx-percentile sketch semantics to reconcile.
    *
    * One shuffle keyed by the group column (both window functions share
    * the partitioning), then a two-phase agg picks the ranked rows. Exact
    * rank needs the per-group sort; at 100 TB you'd reach for the q96-style
    * sketch when groups are huge, but the exact form is the oracle. */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, percents: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieCol))
    val ranked = df.select(col(groupCol), col(valueCol), col(tieCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val picks = percents.map(p =>
      max(when(col("rn") === expr(s"($p * n + 99) div 100"), col(valueCol)))
        .cast("long").as(s"p$p"))
    ranked.groupBy(col(groupCol))
      .agg(max(col("n")).cast("long").as("n_rows"), picks: _*)
  }

  /** The 100 TB percentile path for [[exactPercentiles]]'s shape: per-group
    * `percentile_approx` sketch — ONE two-phase aggregation, no per-group
    * sort, so the dominant group never lands in a single task (the exact
    * rank formula shuffles the whole corpus into |groups| partitions and
    * sorts the biggest one in one task — q115's documented scale caveat).
    *
    * Default (`withVerdict = false`) is the production shape:
    * (group, n_rows, p<P>_approx...). With `withVerdict = true` it ALSO
    * runs the exact rank formula and emits a per-group tolerance verdict —
    * the q57/q89/q96 gate-check pattern, which deliberately pays the exact
    * cost. The sketch's rank error is ≤ n/accuracy; the verdict allows
    * `tol` relative value slack (generous for that rank error on any
    * non-degenerate distribution, so the verdict is stable at every SF). */
  def percentilesApprox(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, percents: Seq[Int], accuracy: Int = 10000,
      tol: Double = 0.05, withVerdict: Boolean = false): DataFrame = {
    val pcts = array(percents.map(p => lit(p / 100.0)): _*)
    val approx = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows_approx"),
        percentile_approx(col(valueCol), pcts, lit(accuracy)).as("ap"))
    val apCols = percents.zipWithIndex.map { case (p, i) =>
      element_at(col("ap"), i + 1).cast("long").as(s"p${p}_approx")
    }
    if (!withVerdict)
      approx.select(col(groupCol) +: col("n_rows_approx").as("n_rows") +: apCols: _*)
    else {
      val ok = percents.map { p =>
        abs(col(s"p${p}_approx") - col(s"p$p")) <=
          greatest(lit(1.0), col(s"p$p").cast("double") * tol)
      }.reduce(_ && _)
      exactPercentiles(df, groupCol, valueCol, tieCol, percents)
        .join(broadcast(approx.select(col(groupCol) +: apCols: _*)), groupCol)
        .select(col(groupCol) +: col("n_rows") +:
          percents.map(p => col(s"p$p")) :+ ok.as("sketch_ok"): _*)
    }
  }

  /** Deterministic HyperLogLog register table over a string key column:
    * md5-hash 60 bits → 8-bit register index + 52-bit rank field,
    * rho = 53 − bit_length(field) (position of the leftmost 1-bit),
    * register value = max rho. One narrow map + one 256-group two-phase
    * agg — partial registers max-merge per partition, so the shuffle
    * carries ≤ 256 rows per partition at ANY cardinality; that same
    * max-merge distributivity (asserted in ProfileSketchSpec) is what
    * lets per-executor sketches of a 100 TB stream combine driver-side.
    * n_obs (observations per register) rides along for auditability.
    * Estimation from the registers is [[hllEstimate]] — float math kept
    * OUT of the gated register state. */
  def hllRegisters(keyed: DataFrame, key: Column): DataFrame =
    keyed
      .select(conv(substring(md5(key), 1, 15), 16, 10).cast("long").as("h"))
      .select((col("h") % 256).cast("int").as("reg"),
        expr("h div 256").as("wv"))
      .select(col("reg"),
        when(col("wv") > 0, lit(53) - length(conv(col("wv"), 10, 2)))
          .otherwise(lit(53)).cast("int").as("rho"))
      .groupBy("reg")
      .agg(max("rho").as("maxrho"), count(lit(1)).as("n_obs"))

  /** Standard HLL estimator (Flajolet et al. 2007) over a driver-collected
    * register map — m = 256, alpha correction + small-range linear
    * counting. Driver-side by design: the register table is 256 rows. */
  def hllEstimate(registers: Map[Int, Int], m: Int = 256): Double = {
    val s = (0 until m).map(j => math.pow(2.0, -registers.getOrElse(j, 0))).sum
    val alpha = 0.7213 / (1 + 1.079 / m)
    val e = alpha * m * m / s
    val v = (0 until m).count(j => !registers.contains(j))
    if (e <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else e
  }

  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans)
  }
}
