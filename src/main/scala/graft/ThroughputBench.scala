package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Concurrent-stream throughput: the full query surface drained by K worker
  * threads sharing one SparkSession (the multi-tenant shape — Spark's
  * scheduler interleaves jobs from concurrent sessions/threads). Prints
  * wall seconds, aggregate query-seconds, the effective concurrency
  * (aggregate/wall), and per-query latency percentiles — sequential Bench
  * measures latency, this measures how much of it is scheduler-serializable
  * overhead.
  *
  * SPARK_GRAFT_SCHEDULER=FAIR switches from the default FIFO job scheduler
  * to FAIR with one pool per stream (each undeclared pool gets equal weight,
  * so K concurrent streams share the cluster evenly instead of queueing
  * behind whichever stream submitted first). FIFO maximizes throughput on a
  * drain-the-backlog shape; FAIR bounds per-stream tail latency in the
  * serve-many-tenants shape — the p95/max fields make the trade measurable.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_STREAMS=8 \
  *   [SPARK_GRAFT_SCHEDULER=FAIR] sbt "runMain graft.ThroughputBench"
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val streams = sys.env.getOrElse("SPARK_GRAFT_STREAMS", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors() - 2).toString)
    val scheduler = sys.env.getOrElse("SPARK_GRAFT_SCHEDULER", "FIFO").toUpperCase
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", scheduler)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm the table plans once so per-stream cost is query work, not listing
    Tables.names.foreach { n =>
      // NonFatal only (missing table at this SF is fine; an OOM is not)
      try Tables.load(spark, sfDir, n).limit(1).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }

    val work = new ConcurrentLinkedQueue[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach(q => work.add(q))
    val nQueries = work.size
    val aggregateNanos = new AtomicLong(0L)
    val latenciesNanos = new ConcurrentLinkedQueue[java.lang.Long]()
    val failures = new ConcurrentLinkedQueue[String]()

    val t0 = System.nanoTime()
    val threads = (1 to streams).map { id =>
      new Thread(() => {
        // one pool per stream: under FAIR mode, pools (not jobs) share the
        // cluster equally, so no stream starves behind another's backlog.
        // Local properties are inherited per thread; harmless under FIFO.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"stream-$id")
        var next = work.poll()
        while (next != null) {
          val (name, fn) = next
          val s0 = System.nanoTime()
          // NonFatal only: an OOM or JVM error must abort the bench, not
          // degrade into a low failure count under a misleading headline
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch {
            case scala.util.control.NonFatal(t) =>
              failures.add(s"$name:${t.getClass.getSimpleName}")
          }
          val took = System.nanoTime() - s0
          aggregateNanos.addAndGet(took)
          latenciesNanos.add(took)
          next = work.poll()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    val agg = aggregateNanos.get() / 1e9
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val lat = latenciesNanos.toArray(Array.empty[java.lang.Long])
      .map(_.longValue / 1e9).sorted
    def pct(p: Double) =
      if (lat.isEmpty) 0.0 else lat(math.min(lat.length - 1, (p * lat.length).toInt))
    println(s"""{"metric":"throughput","wall_sec":${f(wall)},"aggregate_query_sec":${f(agg)},""" +
      s""""effective_concurrency":${f(agg / wall)},"streams":$streams,""" +
      s""""scheduler":"$scheduler","p50_sec":${f(pct(0.50))},"p95_sec":${f(pct(0.95))},""" +
      s""""max_sec":${f(if (lat.isEmpty) 0.0 else lat.last)},""" +
      s""""n_queries":$nQueries,"failures":${failures.size},"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
