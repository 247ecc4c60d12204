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

  /** Per-column stats: (column_name, n_rows, n_nulls, n_distinct, min_str,
    * max_str). min/max rendered as strings so heterogeneous columns fit one
    * result schema. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per column (stack is a single Generate)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    row.selectExpr("_n",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct, min_str, max_str)")
      .select(col("column_name"), col("_n").as("n_rows"),
        col("n_nulls"), col("n_distinct"), col("min_str"), col("max_str"))
  }

  /** The 100 TB variant of [[columnStats]]: exact countDistinct triples the
    * aggregation's expand factor (one row per distinct-agg per input row);
    * HLL sketches keep the profile a single cheap pass. Emits the exact
    * count alongside a within-`tol` verdict so the sketch is itself
    * gate-checkable (same pattern as the q57/q89 sketch gates). */
  def columnStatsApprox(df: DataFrame, cols: Seq[String],
                        rsd: Double = 0.02, tol: Double = 0.05): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__exact"),
        approx_count_distinct(col(c), rsd).as(s"${c}__approx"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__exact, ${c}__approx").mkString(", ")
    row.selectExpr("_n",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct, n_approx)")
      .select(col("column_name"), col("_n").as("n_rows"),
        col("n_nulls"), col("n_distinct"),
        (abs(col("n_approx") - col("n_distinct"))
          <= col("n_distinct") * tol).as("approx_ok"))
  }

  /** Referential integrity: count of child rows whose key has no parent
    * (anti join), plus totals. */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans)
  }
}
