package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All query entry points receive `(spark, sfDir)` and read only these
  * tables — never synthesized inputs — so the DuckDB oracle sees byte-identical
  * source data. Column pruning + filter pushdown reach the parquet scan
  * automatically because everything downstream is declarative DataFrame API.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The testdata parquet files are written as a single row group, so the
    * scan cannot split — every downstream per-row operator would run on one
    * task no matter how many cores the session has. When the scan's
    * parallelism is far below the session's, redistribute once up front.
    * (On a real lake with many splits this no-ops; disable with
    * spark.graft.repartitionSmallScans=false.)
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    val enabled = spark.conf.getOption("spark.graft.repartitionSmallScans")
      .forall(_.toBoolean)
    if (enabled && df.rdd.getNumPartitions * 4 <= want) df.repartition(want) else df
  }

  /** Loaded frames are memoized per (session, dir, table): building one
    * costs a fresh file listing, footer read, and — for the `spread`
    * decision — a logical→physical conversion (`.rdd`), a few hundred ms
    * that every query would otherwise re-pay per referenced table. The
    * cached value is just an immutable plan; no data is pinned.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // coarse bound: long-lived JVMs cycling many sessions must not pin
    // every session's plans (plans hold session references)
    if (cache.size > 256) cache.clear()
    cache.computeIfAbsent((System.identityHashCode(spark), dir, name),
      _ => spread(spark, loadRaw(spark, dir, name)))
  }

  private def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
      // rejects. Read it as a nanos long and truncate to microseconds — the
      // same value DuckDB (no ns timestamp at read in 1.x) presents to the
      // oracle. Integer DIV keeps the 1e18-scale nanos exact (a double round
      // trip would lose precision past 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
