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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
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
