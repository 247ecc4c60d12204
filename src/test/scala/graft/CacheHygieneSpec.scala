package graft

/** Storage-hygiene gate: a long-lived session (the 100 TB serving shape)
  * calls gated queries repeatedly, so no query may leave a Dataset cache
  * resident after it has been materialized. Operators may cache internally
  * only if they unpersist before returning (the keep-list pattern) — a
  * cache that survives the query accretes executor storage on every call.
  *
  * One DELIBERATE exception: q185's operator IS a resident artifact (the
  * [[graft.operators.IvfAdcIndex]] build-once/query-many handle). The
  * hazard this gate exists to catch is per-call ACCRETION, which the
  * companion test pins for q185 directly: repeated calls share one
  * memoized index, adding zero storage.
  */
class CacheHygieneSpec extends SparkTestBase {

  private val ResidentByDesign = Set("q185_ann_index_serve")

  test("no gated query leaves a resident Dataset cache after running") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val leaks = SparkEntry.allQueries
      .filterNot(q => ResidentByDesign(q.name))
      .flatMap { q =>
        q.run(spark, Sf).count()
        if (cm.isEmpty) None
        else { cm.clearCache(); Some(q.name) }
      }
    assert(leaks.isEmpty, s"queries leaking caches: $leaks")
  }

  test("q185's resident index is bounded: a second call accretes no storage") {
    val run = SparkEntry.queries("q185_ann_index_serve")
    run(spark, Sf).count()
    val after1 = spark.sparkContext.getPersistentRDDs.keySet
    run(spark, Sf).count()
    val after2 = spark.sparkContext.getPersistentRDDs.keySet
    assert(after2 === after1,
      s"second q185 call accreted storage: ${after2 -- after1}")
    // release semantics (handle ≡ inline, release frees the blocks) are
    // AnnIndexSpec's gates; the suite-shared session keeps the memoized
    // handle — by design, it is the serving artifact
  }
}
