package graft

import graft.noise.Noise
import graft.plans.BucketedRangeJoinRule

/** The optimizer rule must turn the NAIVE cross-join noise query into a
  * bucketed equi-join — identical results, no quadratic join between grid
  * and sources.
  */
class BucketedRangeJoinRuleSpec extends SparkTestBase {

  private def naiveNoise() = Noise.groundNoise(
    Noise.grid(spark, Noise.NantesLat, Noise.NantesLon, 1000.0, 10),
    queries.NoiseQueries.sources(spark, "/root/testdata/sf0.001"))

  test("rewrites cross join + haversine cutoff into a cell equi-join, results unchanged") {
    val before = naiveNoise().orderBy("g_lat", "g_lon").collect()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BucketedRangeJoinRule
    try {
      val df = naiveNoise()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__cell_i"), optimized)
      val after = df.orderBy("g_lat", "g_lon").collect()
      assert(after.sameElements(before))
      // the grid-sources pairing became an equi-join on the cell key
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("__cell_i"), phys)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BucketedRangeJoinRule)
    }
  }

  test("rewrites with the sides swapped (sources cross grid)") {
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFunctions._
    val grid = Noise.grid(spark, Noise.NantesLat, Noise.NantesLon, 1000.0, 10)
    val src = queries.NoiseQueries.sources(spark, "/root/testdata/sf0.001")
    def swapped() = src.crossJoin(grid)
      .filter(haversineMeters(col("g_lat"), col("g_lon"), col("s_lat"), col("s_lon")) <= RMaxM)
      .groupBy("g_lat", "g_lon").agg(count(lit(1)).as("n"))
    val before = swapped().orderBy("g_lat", "g_lon").collect()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BucketedRangeJoinRule
    try {
      val df = swapped()
      assert(df.queryExecution.optimizedPlan.toString.contains("__cell_i"))
      assert(df.orderBy("g_lat", "g_lon").collect().sameElements(before))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BucketedRangeJoinRule)
    }
  }

  test("does not fire on joins without a haversine range predicate") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BucketedRangeJoinRule
    try {
      val d = queries.Registry.all.find(_.name == "q03_segment_revenue").get
        .run(spark, "/root/testdata/sf0.001")
      assert(!d.queryExecution.optimizedPlan.toString.contains("__cell_i"))
      assert(d.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BucketedRangeJoinRule)
    }
  }
}
