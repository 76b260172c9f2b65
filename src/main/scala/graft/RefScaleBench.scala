package graft

import org.apache.spark.sql.SparkSession

/** Benchmark at the REFERENCE's own demo scale (reference
  * scripts/functions.py:281: genCoords(Nantes, 200, 500) → 1,002,001 grid
  * cells, dense |grid|x|sources| haversine matrix in driver NumPy).
  *
  * Runs the distributed flagship at that exact scale — broadcast plan and
  * geo-cell-bucketed plan — and prints one JSON line. The bucketed plan
  * additionally prunes cell pairs beyond the 20 km cutoff before any
  * haversine is computed, which the reference's dense matrix cannot do
  * (BASELINE.md: ~97% of its grid is out of reach of any source).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RefScaleBench"
  */
object RefScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors() - 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val grid = noise.Noise.grid(spark, noise.Noise.NantesLat, noise.Noise.NantesLon, 200.0, 500)
    val sources = queries.NoiseQueries.sources(spark, sfDir).cache()
    val nSources = sources.count()

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = df.count()
      (label, (System.nanoTime() - t0) / 1e9, rows)
    }

    val broadcastRun = time("broadcast")(noise.Noise.groundNoise(grid, sources))
    val bucketedRun = time("bucketed")(noise.Noise.groundNoiseBucketed(grid, sources))
    // same naive query, bucketed automatically by the optimizer rule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ plans.BucketedRangeJoinRule
    val ruleRun = time("rule_rewritten")(noise.Noise.groundNoise(grid, sources))
    val results = Seq(broadcastRun, bucketedRun, ruleRun)
    val qs = results.map { case (k, v, n) => s""""$k":{"sec":$v,"rows":$n}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"refscale_noise","grid_cells":1002001,"sources":$nSources,"variants":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
