package graft

import org.apache.spark.sql.functions._

import graft.operators.ScopedCache

/** Pins the workload-scoped cache policy the lazy-returning dedup operators
  * rely on: warm across same-plan repeats, evicted once the session's
  * workload moves on (after [[ScopedCache.GraceMisses]] CONSECUTIVE foreign
  * actions — one interleaved neighbor must not sweep a repeat's warm
  * cache), never evicted before first use.
  */
class ScopedCacheSpec extends SparkTestBase {

  import spark.implicits._

  private def isCached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE

  /** Release runs on the async listener bus: poll until the condition
    * holds or the deadline passes.
    */
  private def eventually(timeoutMs: Long = 10000)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  /** For MUST-NOT-happen assertions: give the bus a moment to drain. */
  private def settle(): Unit = Thread.sleep(400)

  /** Runs enough unrelated actions to exhaust the grace budget. */
  private def foreignActions(n: Int = ScopedCache.GraceMisses): Unit =
    (1 to n).foreach { i => ((1 to 3).toDF(s"f$i").count()); settle() }

  test("cache survives repeated consumption of the same plan, then is " +
    "evicted once the grace budget of unrelated actions is spent") {
    val base = (1 to 100).toDF("x").filter(col("x") % 2 === 0)
    val c = ScopedCache.cache(base.select(col("x"), (col("x") * col("x")).as("y")))
    // two consuming actions: both must see the cache (warm repeats)
    assert(c.count() == 50)
    settle()
    assert(isCached(c), "cache must stay warm across same-plan repeats")
    assert(c.agg(sum("y")).head().getLong(0) > 0)
    settle()
    assert(isCached(c), "still warm: the consuming actions reference it")
    // ONE unrelated action is within the grace budget: an interleaved
    // neighbor in a multi-query sweep must NOT sweep the warm cache
    (1 to 10).toDF("z").count()
    settle()
    assert(isCached(c), "one foreign action is absorbed by the grace counter")
    // a referencing action in between RESETS the counter
    assert(c.count() == 50)
    settle()
    (1 to 10).toDF("z2").count()
    settle()
    assert(isCached(c), "a hit must reset the miss counter")
    // spending the full grace budget confirms the workload moved on
    (1 to 10).toDF("z3").count()
    assert(eventually()(!isCached(c)),
      "consecutive foreign actions past the grace budget must evict")
  }

  test("a never-consumed cache is not evicted by unrelated actions") {
    val c = ScopedCache.cache(
      (1 to 10).toDF("a").select((col("a") + 7).as("b")))
    foreignActions() // unrelated, complete first — full grace budget spent
    settle()
    // the entry was never consumed: it must survive (its owner has not
    // run yet — CacheManager keeps a lazy entry, so presence == survival)
    assert(isCached(c), "unconsumed entry must survive unrelated actions")
    assert(c.count() == 10) // first consumption
    foreignActions()
    assert(eventually()(!isCached(c)),
      "after consumption, foreign actions past the grace budget evict")
  }

  test("re-registration resets protection for a new consumer") {
    def make() = ScopedCache.cache(
      (1 to 20).toDF("n").select((col("n") * 3).as("m")))
    val r1 = make()
    assert(r1.count() == 20) // consumed
    settle()
    // new run re-registers the same canonical plan (fresh DataFrame)
    val r2 = make()
    // unrelated PRELIMINARY actions of the new run must NOT evict the
    // warm entry before r2 has used it — even past the grace budget
    foreignActions()
    settle()
    assert(isCached(r2), "re-registration must protect the warm entry")
    assert(r2.count() == 20)
    foreignActions()
    assert(eventually()(!isCached(r2)))
  }
}
