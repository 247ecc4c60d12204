package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** The bench coverage gate, placed where the gap can actually occur
  * (round-12 advice): an IN-PROCESS compare of measured keys vs the
  * contract is tautological — both derive from `SparkEntry.queries` in
  * the same JVM. The recurring one-query-gap class (r10 q224, r11 q234)
  * is a PERSISTED "definitive" bench record going stale after a new
  * query lands. So this spec compares the newest curated
  * `bench/BENCH_r*_full.json` against the CURRENT contract:
  *
  *  - a contract query missing from the record must be explicitly
  *    declared in `bench/UNBENCHED.txt` (a conscious, reviewed act) —
  *    silently-unmeasured queries fail the build;
  *  - a stale UNBENCHED entry (query now measured, or renamed away)
  *    also fails — the ledger can only shrink to truth;
  *  - a record key not in the contract (renamed/deleted query) fails —
  *    the curated record must be re-cut, not reinterpreted.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val benchDir = Paths.get("bench")

  private def newestRecord(): Option[java.nio.file.Path] = {
    if (!Files.isDirectory(benchDir)) return None
    val rs = Files.list(benchDir).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("BENCH_r") && n.endsWith("_full.json")
      }.toSeq
    // sort by the NUMERIC round (round-13 advice: lexicographic order
    // breaks at round 100 — "r100" sorts before "r99" — and would
    // silently validate against a stale record)
    val round = "BENCH_r(\\d+)_full\\.json".r
    rs.sortBy { p =>
      p.getFileName.toString match {
        case round(n) => n.toInt
        case _        => -1
      }
    }.lastOption
  }

  private def recordKeys(p: java.nio.file.Path): Set[String] = {
    val s = new String(Files.readAllBytes(p), "UTF-8")
    val start = s.indexOf("\"queries\":{")
    require(start >= 0, s"$p has no queries object")
    // keys only — values are plain numbers, so the object ends at the
    // first '}' after the opening brace
    val body = s.substring(start + "\"queries\":{".length,
      s.indexOf('}', start))
    "\"([^\"]+)\":".r.findAllMatchIn(body).map(_.group(1)).toSet
  }

  private def unbenched(): Set[String] = {
    val p = benchDir.resolve("UNBENCHED.txt")
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
  }

  test("newest curated bench record covers the current query contract, " +
    "modulo the explicit UNBENCHED ledger") {
    val rec = newestRecord()
    assert(rec.isDefined, "no curated bench/BENCH_r*_full.json record")
    val measured = recordKeys(rec.get)
    val contract = SparkEntry.queries.keySet
    val ledger = unbenched()

    val silentGap = (contract -- measured) -- ledger
    assert(silentGap.isEmpty,
      s"queries in the contract but not in ${rec.get.getFileName} and not " +
        s"declared in bench/UNBENCHED.txt: ${silentGap.toSeq.sorted} — " +
        "bench them (curate a new record) or declare them unbenched")

    val staleLedger = ledger.filter(q => measured.contains(q) || !contract.contains(q))
    assert(staleLedger.isEmpty,
      s"stale bench/UNBENCHED.txt entries (already measured, or not in " +
        s"the contract): ${staleLedger.toSeq.sorted}")

    val orphans = measured -- contract
    assert(orphans.isEmpty,
      s"keys in ${rec.get.getFileName} not in the contract (renamed or " +
        s"deleted queries — re-cut the record): ${orphans.toSeq.sorted}")
  }
}
