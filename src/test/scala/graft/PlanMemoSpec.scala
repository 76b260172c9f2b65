package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.operators.PlanMemo

/** [[PlanMemo]] contract: memo hit on same (session, key), isolation
  * across sessions, FIFO eviction with onEvict, and — the ADVICE-driven
  * regression — computation of DIFFERENT keys never serializes behind an
  * unrelated in-flight computation (the old computeIfAbsent-under-bin-lock
  * defect).
  */
class PlanMemoSpec extends SparkTestBase {

  test("same session + same key computes once; different key recomputes") {
    val memo = new PlanMemo[Int, String]()
    val n = new AtomicInteger
    def get(k: Int) = memo.getOrCompute(spark, k) { n.incrementAndGet(); s"v$k" }
    assert(get(1) == "v1")
    assert(get(1) == "v1")
    assert(n.get == 1)
    assert(get(2) == "v2")
    assert(n.get == 2)
  }

  test("sessions are isolated: same key in a sibling session recomputes") {
    val memo = new PlanMemo[Int, String]()
    val n = new AtomicInteger
    val other = spark.newSession()
    memo.getOrCompute(spark, 7) { n.incrementAndGet(); "a" }
    memo.getOrCompute(other, 7) { n.incrementAndGet(); "b" }
    assert(n.get == 2)
    // and each session keeps seeing its own value
    assert(memo.getOrCompute(spark, 7)("x") == "a")
    assert(memo.getOrCompute(other, 7)("x") == "b")
  }

  test("FIFO eviction beyond the bound calls onEvict on the oldest") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val memo = new PlanMemo[Int, String](max = 3,
      onEvict = v => evicted.synchronized { evicted += v })
    (1 to 5).foreach(k => memo.getOrCompute(spark, k)(s"v$k"))
    assert(memo.size == 3)
    assert(evicted.toSet == Set("v1", "v2"))
    // survivors still served from the memo
    assert(memo.getOrCompute(spark, 5)("recomputed") == "v5")
  }

  test("onEvict failures are swallowed and the sweep continues") {
    val memo = new PlanMemo[Int, String](max = 1,
      onEvict = _ => sys.error("no block manager"))
    memo.getOrCompute(spark, 1)("a")
    memo.getOrCompute(spark, 2)("b") // evicts 1; onEvict throws — absorbed
    memo.getOrCompute(spark, 3)("c")
    assert(memo.size == 1)
  }

  test("different keys compute concurrently (no bin-lock serialization)") {
    val memo = new PlanMemo[Int, String]()
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() =>
      memo.getOrCompute(spark, 101) {
        slowStarted.countDown()
        release.await(30, TimeUnit.SECONDS)
        "slow"
      })
    slow.start()
    assert(slowStarted.await(10, TimeUnit.SECONDS), "slow compute never started")
    // While key 101 is mid-computation, an UNRELATED key must complete.
    // Under the old computeIfAbsent-under-lock design this could block
    // until `release` fires (bin collision), failing the timeout below.
    val fastDone = new CountDownLatch(1)
    val fast = new Thread(() => {
      memo.getOrCompute(spark, 202)("fast")
      fastDone.countDown()
    })
    fast.start()
    assert(fastDone.await(10, TimeUnit.SECONDS),
      "unrelated key serialized behind an in-flight computation")
    release.countDown()
    slow.join(30000); fast.join(30000)
    assert(memo.getOrCompute(spark, 101)("x") == "slow")
  }

  test("eviction during an in-flight compute releases the late value once") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val memo = new PlanMemo[Int, String](max = 1,
      onEvict = v => evicted.synchronized { evicted += v })
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() =>
      memo.getOrCompute(spark, 1) {
        slowStarted.countDown()
        release.await(30, TimeUnit.SECONDS)
        "late"
      })
    slow.start()
    assert(slowStarted.await(10, TimeUnit.SECONDS), "slow compute never started")
    // Two fresh keys push key 1 (oldest, still computing) out — its peek
    // is None at eviction time, so before the r12 ADVICE fix onEvict
    // never fired for it and the late value leaked pinned forever.
    memo.getOrCompute(spark, 2)("b")
    memo.getOrCompute(spark, 3)("c")
    assert(evicted.synchronized(!evicted.contains("late")),
      "eviction must not block on / trigger the in-flight compute")
    release.countDown()
    slow.join(30000)
    assert(evicted.synchronized(evicted.count(_ == "late")) == 1,
      "late-finishing evicted value must be released exactly once")
    // the key was evicted, so the next call recomputes — no stale serve
    assert(memo.getOrCompute(spark, 1)("recomputed") == "recomputed")
  }

  test("same key concurrent callers compute once and share the result") {
    val memo = new PlanMemo[Int, String]()
    val n = new AtomicInteger
    val threads = (1 to 8).map(_ => new Thread(() =>
      memo.getOrCompute(spark, 55) {
        Thread.sleep(50); n.incrementAndGet(); "shared"
      }))
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(n.get == 1)
  }
}
