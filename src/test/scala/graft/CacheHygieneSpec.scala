package graft

/** Storage-hygiene gate: a long-lived session (the 100 TB serving shape)
  * calls gated queries repeatedly, so no query may leave a Dataset cache
  * resident after it has been materialized. Operators may cache internally
  * only if they unpersist before returning (the keep-list pattern) — a
  * cache that survives the query accretes executor storage on every call.
  */
class CacheHygieneSpec extends SparkTestBase {

  test("no gated query leaves a resident Dataset cache after running") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val leaks = SparkEntry.allQueries.flatMap { q =>
      q.run(spark, Sf).count()
      if (cm.isEmpty) None
      else { cm.clearCache(); Some(q.name) }
    }
    assert(leaks.isEmpty, s"queries leaking caches: $leaks")
  }
}
