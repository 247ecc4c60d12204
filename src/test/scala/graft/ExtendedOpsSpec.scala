package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** As-of join semantics + sketch accuracy. */
class ExtendedOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf: picks the latest prior right row, ties match, no-prior is null") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")) // user 2 has no prior click
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // tie with p1 -> matches (>=)
      (1L, ts("2024-01-01 11:00:00"), 102L),
      (2L, ts("2024-01-01 23:00:00"), 103L)) // after p3 -> not matched
      .toDF("user_id", "ts", "click_id")
    val out = AsOfJoin.asOf(left, right, "user_id", "user_id", "ts", "ts",
        Seq("click_id" -> "click_id"))
      .orderBy("name")
      .collect().map(r => (r.getAs[String]("name"), Option(r.get(r.fieldIndex("click_id")))))
    assert(out.toSeq === Seq(
      ("p1", Some(101L)), ("p2", Some(102L)), ("p3", None)))
  }

  test("asOf plan: exactly one exchange (single shuffle by key)") {
    val ev = Tables.t(spark, Sf, "events")
    val df = AsOfJoin.asOf(
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "click"),
      "user_id", "user_id", "ts", "ts", Seq("event_id" -> "click_id"))
    df.collect()
    // AQE's toString echoes the plan twice (Final + Initial) — count only
    // the final plan section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, p)
  }

  test("approx_count_distinct lands within 5% of exact on events") {
    val rows = SparkEntry.queries("q57_approx_distinct")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
    }
  }
}
