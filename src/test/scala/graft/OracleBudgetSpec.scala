package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The oracle-cost gate (round-15 verdict item 1/2): the driver's DuckDB
  * compare has a hard time budget (~600 s by round-15 timestamp evidence),
  * and in round 15 three un-timed oracles cost 840 s of a 997 s total —
  * the driver wrote `CORRECTNESS_r15.json = {}` and the round's entire
  * hard correctness signal vanished. Nothing in the repo bounded
  * oracle-side runtime, so a 575 s oracle sailed through three builder
  * compare runs unnoticed.
  *
  * This spec gates on `bench/ORACLE_TIMES.json`, the committed output of
  * a FULL `tools/compare.py` run at sf0.01 (compare.py writes
  * `<out>/oracle_times.json`; the round workflow copies it here):
  *
  *  - every oracle in the CURRENT contract must appear in the ledger —
  *    a new query fails the build until its oracle has been timed;
  *  - a ledger key not in the contract (renamed/deleted query) fails —
  *    the ledger must be re-cut, not reinterpreted;
  *  - any single oracle > 15 s at sf0.01 fails (q303's pre-fix 575.8 s
  *    vs post-fix 0.2 s shows the fix is always structural, usually a
  *    missing `AS MATERIALIZED` — see [[Q.materializeSharedCtes]]);
  *  - ledger total > 300 s fails (≥2× margin under the driver window).
  */
class OracleBudgetSpec extends AnyFunSuite {

  private val ledgerPath = Paths.get("bench", "ORACLE_TIMES.json")
  private val MaxSingleSec = 15.0
  private val MaxTotalSec = 300.0

  private def ledger(): Map[String, Double] = {
    val s = new String(Files.readAllBytes(ledgerPath), "UTF-8")
    // entries are `"qNN_name": seconds` — every query name matches ^q\d
    // (the repo-wide convention), which cleanly excludes the total_sec /
    // per_query envelope keys
    """"(q\d[^"]*)":\s*([0-9.eE+-]+)""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  test("every contract oracle is timed, each within 15s, total within 300s") {
    assert(Files.exists(ledgerPath),
      "bench/ORACLE_TIMES.json missing — run the full tools/compare.py at " +
        "sf0.01 and copy <out>/oracle_times.json there")
    val times = ledger()
    val contract = SparkEntry.oracleSql.keySet

    val untimed = contract -- times.keySet
    assert(untimed.isEmpty,
      s"oracles never timed in DuckDB (run the full compare, re-cut the " +
        s"ledger): ${untimed.toSeq.sorted}")

    val orphans = times.keySet -- contract
    assert(orphans.isEmpty,
      s"ledger keys not in the contract (renamed/deleted — re-cut the " +
        s"ledger): ${orphans.toSeq.sorted}")

    val over = times.filter(_._2 > MaxSingleSec)
    assert(over.isEmpty,
      s"oracles over the ${MaxSingleSec}s single-query budget at sf0.01 " +
        s"(round-15 failure class — materialize shared CTEs or restructure " +
        s"the oracle): ${over.toSeq.sortBy(-_._2)}")

    val total = times.values.sum
    assert(total <= MaxTotalSec,
      f"oracle ledger total $total%.1fs exceeds the ${MaxTotalSec}s budget " +
        "(driver compare window is ~600s; keep >=2x margin)")
  }

  // --- the structural fix itself: Q.materializeSharedCtes unit pins ---

  test("materializeSharedCtes rewrites multiply-referenced CTEs only") {
    val sql =
      """WITH big AS (SELECT a FROM t),
        |once AS (SELECT a FROM big),
        |fin AS (SELECT x.a FROM big x JOIN big y ON x.a = y.a)
        |SELECT * FROM fin JOIN once USING (a)""".stripMargin
    val out = Q.materializeSharedCtes(sql)
    assert(out.contains("big AS MATERIALIZED ("))
    assert(out.contains("once AS (") && !out.contains("once AS MATERIALIZED"))
    // fin: defined once, referenced once -> untouched
    assert(out.contains("fin AS (") && !out.contains("fin AS MATERIALIZED"))
  }

  test("materializeSharedCtes never touches named-window definitions") {
    val sql =
      """WITH o AS (SELECT user_id, lag(ts) OVER w AS p
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT * FROM o), u AS (SELECT * FROM o)
        |SELECT * FROM s JOIN u USING (user_id)""".stripMargin
    val out = Q.materializeSharedCtes(sql)
    assert(out.contains("WINDOW w AS (PARTITION"))
    assert(out.contains("o AS MATERIALIZED ("))
  }

  test("materializeSharedCtes skips names defined in more than one scope") {
    // nested WITH redefining `p` — DuckDB rejects duplicate MATERIALIZED
    // names across scopes ("Duplicate alias", hit by q275's two `p`s)
    val sql =
      """WITH p AS (SELECT 1 AS x), u AS (
        |  SELECT * FROM (WITH p AS (SELECT 2 AS x)
        |    SELECT a.x FROM p a JOIN p b ON a.x = b.x) t)
        |SELECT * FROM u JOIN p USING (x)""".stripMargin
    val out = Q.materializeSharedCtes(sql)
    assert(!out.contains("p AS MATERIALIZED"))
  }

  test("materializeSharedCtes is idempotent and a no-op on plain SQL") {
    val plain = "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1"
    assert(Q.materializeSharedCtes(plain) == plain)
    val sql = "WITH a AS (SELECT 1 AS x) SELECT * FROM a JOIN a b ON a.x = b.x"
    val once = Q.materializeSharedCtes(sql)
    assert(Q.materializeSharedCtes(once) == once)
  }
}
