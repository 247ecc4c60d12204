package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every engine query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warmup pass (count per table) runs first so session/JIT/codegen
  * startup cost doesn't land on whichever query happens to run first;
  * queries then run in stable name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // ambient load BEFORE this process does any work: loadavg_before is
    // read after the (all-core) warmup passes, so its 1-minute field
    // reflects the bench's own warmup, not the box — this field is the
    // one that adjudicates "was the box idle when the run started"
    val loadAtStartFields =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ")
        .take(3).toSeq
      catch { case _: Throwable => Seq.empty[String] }
    val loadAtStart = loadAtStartFields.mkString("[", ",", "]")
    // CONTAMINATION FLAG, not a refusal (the driver artifact must always
    // exist): a 1-minute loadavg above this at process start means the
    // box was already busy before any warmup ran, so every number below
    // carries external noise — BENCH_r14.json was captured at loadavg
    // ~3.5 and read 1.41× the baseline while the idle-box run read
    // 1.04×. The flag travels IN the JSON so the contaminated run can
    // never masquerade as the honest one (round-14 verdict).
    val LoadWarnThreshold = 2.0
    val loadWarning = loadAtStartFields.headOption
      .flatMap(_.toDoubleOption).exists(_ > LoadWarnThreshold)
    if (loadWarning)
      System.err.println(s"[bench] WARNING: loadavg at start " +
        s"${loadAtStartFields.headOption.getOrElse("?")} > " +
        s"$LoadWarnThreshold — numbers below carry external load; " +
        "re-run on an idle box for the curated record")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev-only subset filter (regex on query names) for drift bisection;
    // the driver never sets it, so the contract run is always the full
    // suite — BenchRecordSpec rejects a filtered record as the curated
    // one anyway (missing keys)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the suite has ~100 queries x several codegen stages; the default
      // 100-entry generated-class cache thrashes under ROUND-ROBIN pass
      // order (every run would pay Janino compilation again, ~+30% total),
      // defeating the warmup pass. Static conf - must be set here.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // the 250-query suite holds many memoized fixture caches resident
      // (index handles, release pipeline snapshots, BPE merge lists);
      // under the default storageFraction=0.5 half the unified region is
      // PROTECTED for those blocks, so the shuffle-heavy timed queries
      // (the q195/q214 substring-run family crept +70-87% r10->r13 with
      // unchanged code; isolated fresh-JVM probe r14: 2.4-2.8 s vs 3.5-3.8
      // in-suite) spill instead. Lower the protected share: execution can
      // evict fixture blocks to disk (MEMORY_AND_DISK persist), which is
      // the right trade — a fixture re-read is one sequential scan, a
      // shuffle spill is paid per timed pass.
      .config("spark.memory.storageFraction", "0.3")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    // Warm the whole-stage-codegen cache: run every query once against the
    // smallest fixture (identical generated code for any data dir), so the
    // timed runs measure execution, not Janino compilation + JIT.
    val warmDir = new java.io.File("/root/testdata/sf0.001")
    if (warmDir.isDirectory && warmDir.toString != sfDir)
      // the warmup honors the dev-only subset filter too: a filtered
      // bisection run shouldn't pay ~300 unfiltered warmup queries it
      // will never time (the driver never sets the filter, so the
      // contract run still warms everything)
      SparkEntry.allQueries
        .filter(q => filter.forall(_.findFirstIn(q.name).isDefined))
        .foreach { q =>
        try q.bench(spark, warmDir.toString).count()
        catch { case e: Throwable =>
          // a query that ONLY fails at the warmup SF would otherwise never
          // surface anywhere — warn, but keep warming (the timed pass below
          // still decides pass/fail at the bench SF)
          System.err.println(s"[bench] warmup ${q.name} FAILED: ${e.getMessage}")
        }
      }
    // Queries with a dedicated bench body read pre-materialized fixture
    // caches; prime those caches for the BENCH SF too (the warmup above
    // only primes the warmup SF), so no timed pass pays the one-off
    // materialization.
    SparkEntry.allQueries.filter(_.benchRun.isDefined)
      .filter(q => filter.forall(_.findFirstIn(q.name).isDefined))
      .foreach { q =>
      try q.bench(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] prime ${q.name} FAILED: ${e.getMessage}")
      }
    }
    // Median of 3 timed runs per query (plus the min for context), with the
    // passes run ROUND-ROBIN across the whole suite (pass 1 of every query,
    // then pass 2, then pass 3) instead of back-to-back per query: a
    // multi-minute external load spike on a shared box then lands on at
    // most one of a query's three runs, so the median defends against it —
    // back-to-back runs all fit inside one spike and the median is
    // fabricated (this is exactly what contaminated BENCH_r03).
    val Runs = 3
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3)
        .mkString("[", ",", "]")
      catch { case _: Throwable => "[]" }
    val loadBefore = loadavg()
    val tStart = System.currentTimeMillis()
    val ordered = SparkEntry.allQueries.sortBy(_.name)
      .filter(q => filter.forall(_.findFirstIn(q.name).isDefined))
    val timed: Seq[Seq[Option[Double]]] = {
      val acc = Array.fill(ordered.size)(Vector.empty[Option[Double]])
      for (pass <- 1 to Runs; (q, qi) <- ordered.zipWithIndex) {
        val t0 = System.nanoTime()
        // q.bench, not q.run: identical semantics, but decode-family
        // queries read pre-materialized payloads so the timed number is
        // scan + decode, not per-run fixture synthesis (the prime loop
        // above already paid every one-off materialization, so all three
        // timed passes measure steady-state work)
        val t = try { q.bench(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            // visible in the driver log; the JSON marks it failed too so a
            // broken query can't masquerade as a fast one
            System.err.println(s"[bench] ${q.name} FAILED (pass $pass): ${e.getMessage}")
            None
        }
        acc(qi) :+= t
      }
      acc.toSeq
    }
    val loadAfter = loadavg()
    val tEnd = System.currentTimeMillis()
    val results = ordered.zip(timed).map { case (q, runs) =>
      val times = runs.flatten
      val ok = times.size == Runs
      val median = if (ok) times.sorted.apply(Runs / 2) else -1.0
      val min = if (ok) times.min else -1.0
      (q.name, median, min, ok)
    }
    // NOTE: coverage is NOT enforced here — an in-process compare of the
    // measured keys against SparkEntry.queries is tautological (both
    // derive from the same contract in the same JVM; round-12 advice).
    // The one-query-gap class (r10 q224, r11 q234) is a PERSISTED record
    // going stale after a query lands, so the gate lives where the gap
    // can occur: BenchRecordSpec compares the newest curated
    // bench/BENCH_r*_full.json key set against the current contract,
    // with bench/UNBENCHED.txt as the explicit not-yet-measured ledger.
    val qs = results
      .map { case (k, med, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsMin = results
      .map { case (k, _, min, _) => "\"" + k + "\":" + min }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, med, _, true) => med }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$Runs,""" +
        s""""pass_order":"round_robin","loadavg_at_start":$loadAtStart,""" +
        s""""loadavg_warning":$loadWarning,""" +
        s""""loadavg_before":$loadBefore,""" +
        s""""loadavg_after":$loadAfter,"wall_start_ms":$tStart,"wall_end_ms":$tEnd,""" +
        s""""queries":$qs,"queries_min":$qsMin,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // also durable on disk: the driver's log tail can truncate stdout
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
