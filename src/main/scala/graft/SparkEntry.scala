package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.noise.Noise
import graft.queries.{NoiseQueries, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface lives in graft.queries.Registry; every entry pairs a
  * Spark DataFrame implementation with (where ANSI-SQL-expressible) a DuckDB
  * oracle over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full reference pipeline core (SURVEY.md §3.3): grid × derived
    * aircraft sources → haversine cutoff → attenuation → power-domain sum.
    */
  def entry(spark: SparkSession): DataFrame =
    Noise.groundNoise(
      Noise.grid(spark, Noise.NantesLat, Noise.NantesLon, 500.0, 30),
      NoiseQueries.sources(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get the driver's weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
