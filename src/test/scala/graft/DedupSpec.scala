package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup behavior tests on the fixture corpus (which carries planted
  * near-duplicate pairs at 3-gram Jaccard ≈ 0.98). */
class DedupSpec extends SparkTestBase {

  private lazy val docs = Tables.t(spark, Sf, "documents").cache()

  private lazy val truePairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

  test("planted near-dup pairs exist and are symmetric-free (a<b)") {
    assert(truePairs.nonEmpty)
    assert(truePairs.forall { case (a, b) => a < b })
  }

  test("probe-scoped jaccard equals the uncapped all-pairs form on the probe set") {
    // the gated q39 shape: partners of doc_id < 50, exact against the whole
    // corpus. Must equal the (spec-tested) uncapped all-pairs result
    // restricted to pairs touching the probe set, oriented probe-first —
    // with BOTH directions when both endpoints are probes.
    val probe = Dedup.ngramJaccardProbePairs(docs, "doc_id", "text", 3, 0.8,
        probePred = col("doc_id") < 50)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val expected = truePairs.flatMap { case (a, b) =>
      (if (a < 50) Seq((a, b)) else Nil) ++ (if (b < 50) Seq((b, a)) else Nil)
    }
    assert(probe === expected)
    assert(probe.nonEmpty, "probe window must cover planted pairs at this SF")
  }

  test("MinHash-LSH candidates achieve full recall on 0.98-Jaccard pairs") {
    val cands = Dedup.minhashLshCandidates(docs, "doc_id", "text", 3, 16, 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val missed = truePairs -- cands
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
    // and the band join prunes: far fewer candidates than the ~125k pairs
    assert(cands.size < 5000, s"candidate set too large: ${cands.size}")
  }

  test("hot-shingle df cap: loose cap is exact, tight cap only lowers jac") {
    // cap above the max shingle df: identical to the exact result
    val loose = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
        maxShingleDf = Some(1000000))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(loose === truePairs)
    // tight cap: jac becomes a lower bound, so emitted pairs are a subset
    // of the exact >=0.8 pairs (precision preserved, recall traded)
    val tight = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
        maxShingleDf = Some(3))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(tight.subsetOf(truePairs), s"cap invented pairs: ${tight -- truePairs}")
  }

  test("SimHash: near-dup pairs collide or sit within hamming distance 2") {
    val sig = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val far = truePairs.filter { case (a, b) =>
      java.lang.Long.bitCount(sig(a) ^ sig(b)) > 2
    }
    assert(far.isEmpty, s"near-dups at hamming>2: $far")
  }

  test("SimHash banding has full recall within its designed radius (pigeonhole)") {
    val sig = Dedup.simhash(docs, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the operator GUARANTEES recall only at hamming <= bands-1 = 3; planted
    // pairs beyond that radius are legitimately out of scope
    val inRadius = truePairs.filter { case (a, b) =>
      java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 3
    }
    val cand = Dedup.simhashCandidatePairs(docs, "doc_id", "text", 32, 4, 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inRadius.nonEmpty)
    val missed = inRadius -- cand
    assert(missed.isEmpty, s"banding missed in-radius pairs: $missed")
    // most planted 0.98-Jaccard pairs sit within the radius
    assert(inRadius.size * 10 >= truePairs.size * 8,
      s"only ${inRadius.size}/${truePairs.size} pairs within radius")
    // and the 32-bit signature prunes: candidates stay near the true-pair
    // count instead of the hot-bucket blowup a 16-bit signature produces
    assert(cand.size < 5000, s"candidate set too large: ${cand.size}")
  }

  test("exact dedup: corpus has no exact duplicates, dedup keeps all docs") {
    val n = docs.count()
    assert(docs.select(md5(col("text"))).distinct().count() === n)
    assert(docs.dropDuplicates("text").count() === n)
  }

  test("jaccard pairs are reflexively consistent with shingle counts") {
    val withCounts = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .filter(col("jac") > 1.0 || col("inter") <= 0)
    assert(withCounts.count() === 0)
  }

  test("charWindowRows: window count follows the stride formula; short docs emit nothing") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "x" * 39),            // shorter than the window: zero rows
      (2L, "y" * 40),            // exactly one window
      (3L, "z" * 100)            // floor((100-40)/10)+1 = 7 windows
    ).toDF("doc_id", "text")
    val counts = Dedup.charWindowRows(fixture, "doc_id", "text", 40, 10)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(2L -> 1L, 3L -> 7L))
  }

  test("substringDupStats: a planted shared passage is caught, unique text is not") {
    import spark.implicits._
    val passage = ("shared passage " * 5).trim // 74 chars, spans windows
    // windows start at stride multiples, so two docs only share a window
    // string when the passage sits at offsets congruent mod the stride —
    // pad doc 2's prefix to restore that alignment
    val pre1 = "alpha unique prefix one "
    val pre2raw = "beta different start here "
    val pad = ((pre1.length - pre2raw.length) % 10 + 10) % 10
    val pre2 = pre2raw + ("#" * pad)
    val fixture = Seq(
      (1L, pre1 + passage),
      (2L, pre2 + passage),
      (3L, "gamma " + ("unique filler text with no repeats " * 3))
    ).toDF("doc_id", "text")
    val stats = Dedup.substringDupStats(fixture, "doc_id", "text", 40, 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_windows"), r.getAs[Long]("n_windows"))).toMap
    // both passage carriers share the aligned fully-inside-passage windows;
    // doc 3's intra-doc repeats do NOT count (dup = >= 2 distinct docs)
    assert(stats(1L)._1 >= 1, stats)
    assert(stats(2L)._1 >= 1, stats)
    assert(stats(3L)._1 === 0, stats)
    assert(stats.values.forall { case (d, n) => d <= n }, stats)
  }

  test("crossSnapshotCarryover: only new docs carrying old-snapshot text are flagged") {
    import spark.implicits._
    val passage = "0123456789" * 8 // 80 chars, window-aligned at any offset mod 10
    val fixture = Seq(
      // 40-char prefix (≡ 0 mod stride) so old and new sample the
      // passage at the same internal offsets
      (1L, "old", s"ancient filler text before the body abc $passage"),
      (2L, "old", "other old content with nothing shared anywhere here at all"),
      (3L, "new", passage + " plus novel trailing content in the new crawl"),
      (4L, "new", "entirely fresh text never seen in the previous snapshot ok"),
      (5L, "new", "short") // < windowLen: counted in totals, never carryover
    ).toDF("doc_id", "src", "text")
    val out = Dedup.crossSnapshotCarryover(fixture, "doc_id", "text", "src",
        oldPred = col("src") === "old", windowLen = 40, stride = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_new_docs"), r.getAs[Long]("n_carryover_docs"))).toMap
    assert(out === Map("new" -> ((3L, 1L))), out)
  }

  test("substringDupStats equals a driver-side reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val (win, stride) = (20, 5)
    // random lowercase docs; every third PAIR shares a passage planted at
    // stride-aligned offsets in both docs so detection is guaranteed
    def s(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val passages: IndexedSeq[String] = (0 until 8).map(_ => s(35))
    val docs = (0 until 24).map { i =>
      if (i % 3 != 0) { // docs 3k+1 and 3k+2 share the 35-char passage k
        (i.toLong, s(stride * rnd.nextInt(4)) + passages(i / 3) + s(rnd.nextInt(15)))
      } else (i.toLong, s(30 + rnd.nextInt(40)))
    }
    val got = Dedup.substringDupStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", win, stride)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows")))).toMap
    // driver-side reference: identical window extraction + cross-doc dup set
    val windows: Map[Long, Seq[String]] = docs.map { case (id, t) =>
      id -> (if (t.length < win) Seq.empty[String]
             else (0 to t.length - win by stride).map(p => t.substring(p, p + win)))
    }.toMap
    val dupSet = windows.toSeq.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    for ((id, ws) <- windows if ws.nonEmpty) {
      assert(got(id) === ((ws.size.toLong, ws.count(dupSet).toLong)), s"doc $id")
    }
    assert(got.keySet === windows.filter(_._2.nonEmpty).keySet)
    // the planted pairs really produced cross-doc dups somewhere
    assert(got.values.map(_._2).sum > 0)
  }

  test("substringRunCut: the planted shared span is cut from the shorter " +
    "doc only, interval union across pairs, untouched docs not emitted") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"S$i").mkString(" ") // 10-token shared run
    val span2 = (1 to 9).map(i => s"T$i").mkString(" ")
    // token counts: d1=18 d2=14 d3=14 d4=14 d5=10 d6=22 d7=23 d8=24
    val corpus = Seq(
      (1L, s"a1 a2 a3 $span a4 a5 a6 a7 a8"),
      (2L, s"b1 b2 $span b3 b4"),
      // pair (3, 4): equal token counts -> larger id (4) is the victim
      (3L, s"c1 c2 c3 c4 $span2 c5"),
      (4L, s"d1 d2 d3 d4 $span2 d5"),
      // doc 5 shares NOTHING >= threshold: never emitted
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      // doc 6 carries BOTH spans and is shorter than 7 and 8 -> it loses
      // both intervals (union across victimizing pairs)
      (6L, s"e1 $span e2 $span2 e3"),
      (7L, s"f1 f2 f3 $span f4 f5 f6 f7 f8 f9 f10 f11 f12 f13"),
      (8L, s"g1 g2 g3 $span2 g4 g5 g6 g7 g8 g9 g10 g11 g12 g13 g14 g15")
    ).toDF("doc_id", "text")
    val cut = Dedup.substringRunCut(corpus, "doc_id", "text",
        k = 4, dfCap = 8, minRunTokens = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[String]("text")))).toMap
    // victims: 2 (vs 1/6/7), 1 (vs 6/7), 3 (vs 6/8), 4 (tie vs 3; vs 6/8),
    // 6 (vs 7 and vs 8 — two DIFFERENT intervals); never 5, 7, 8
    assert(cut.keySet === Set(1L, 2L, 3L, 4L, 6L))
    assert(cut(1L) === ((18L, 8L, "a1 a2 a3 a4 a5 a6 a7 a8")))
    assert(cut(2L) === ((14L, 4L, "b1 b2 b3 b4")))
    assert(cut(3L) === ((14L, 5L, "c1 c2 c3 c4 c5")))
    assert(cut(4L) === ((14L, 5L, "d1 d2 d3 d4 d5")))
    // doc 6 loses BOTH planted spans (two victimizing pairs)
    assert(cut(6L) === ((22L, 3L, "e1 e2 e3")))
  }

  test("q304 band sweep: finer banding never loses candidates or " +
    "verified pairs, and every verified count is bounded by its " +
    "candidate count (the knob's meaning — the hash gate can't see it)") {
    val out = SparkEntry.queries("q304_lsh_band_sweep")(spark, Sf)
      .collect()
      .map(r => r.getAs[Int]("rows_per_band") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_verified"))))
      .toMap
    assert(out.keySet === Set(2, 4, 8))
    out.foreach { case (rpb, (nc, nv)) =>
      assert(nv <= nc, s"rpb=$rpb verified $nv exceeds candidates $nc")
    }
    // fewer rows per band ⇒ more bands AND a looser per-band match ⇒
    // a superset of band-collisions: candidate/verified counts are
    // monotone non-increasing in rows_per_band... candidates strictly
    // depend on geometry; verified pairs are capped by the true
    // near-dup count, so equality is allowed
    assert(out(2)._1 >= out(4)._1 && out(4)._1 >= out(8)._1,
      s"candidate counts not monotone: $out")
    assert(out(2)._2 >= out(4)._2 && out(4)._2 >= out(8)._2,
      s"verified counts not monotone: $out")
    assert(out(2)._2 > 0, "finest setting found no verified pairs")
  }
}
