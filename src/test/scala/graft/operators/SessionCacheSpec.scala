package graft.operators

import graft.SparkSpec

/** The cache-scope law the round-10 verdict pinned: `getOrBuild`'s
  * scope key must carry the collision-safe [[SessionCache.sessionId]]
  * (minted once per live session, never recycled after GC), NOT
  * `identityHashCode` — two sessions over the same dir must never
  * share a cache row even when the corpus signature matches, and the
  * same session must keep hitting its own row. */
class SessionCacheSpec extends SparkSpec {

  test("sessionId is stable per session and distinct across sessions") {
    val a = SessionCache.sessionId(spark)
    assert(a == SessionCache.sessionId(spark))
    val s2 = spark.newSession()
    val b = SessionCache.sessionId(s2)
    assert(a != b)
    assert(b == SessionCache.sessionId(s2))
  }

  test("same session + same signature hits the cache; a second session " +
    "over the same dir rebuilds (no cross-session row sharing)") {
    val cache = SessionCache.mkFrames()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.read.parquet(s"$sf001/region.parquet")
    }
    val f1 = cache.getOrBuild(spark, sf001, "region.parquet")(build(spark))
    val f1b = cache.getOrBuild(spark, sf001, "region.parquet")(build(spark))
    assert(builds == 1)
    assert(f1 eq f1b) // cached instance served, not a rebuild
    // a NEW session over the SAME dir and UNCHANGED signature must get
    // its own build — the scope key separates sessions
    val s2 = spark.newSession()
    val f2 = cache.getOrBuild(s2, sf001, "region.parquet")(build(s2))
    assert(builds == 2)
    assert(!(f2 eq f1))
    // and each session keeps hitting its OWN row afterwards
    assert(cache.getOrBuild(spark, sf001, "region.parquet")(
      build(spark)) eq f1)
    assert(cache.getOrBuild(s2, sf001, "region.parquet")(build(s2)) eq f2)
    assert(builds == 2)
  }
}
