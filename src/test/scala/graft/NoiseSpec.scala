package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._
import graft.noise.Noise

/** Unit + property tests for the noise pipeline (SURVEY.md §5.2 items 4-5):
  * grid counts vs the closed form (2n+1)^2, haversine against a known city
  * pair, the classification truth table with boundary values, attenuation on
  * a hand-computed example, and haversine metric properties (seeded random
  * sampling — the scalatest/scalacheck bridge artifact isn't available in
  * the offline dependency cache).
  */
class NoiseSpec extends SparkTestBase {

  private def haversineOf(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val df = spark.range(1).select(
      haversineMeters(lit(lat1), lit(lon1), lit(lat2), lit(lon2)).as("d"))
    df.head().getDouble(0)
  }

  test("grid has (2n+1)^2 cells and spans the expected bbox") {
    val n = 20
    val g = Noise.grid(spark, Noise.NantesLat, Noise.NantesLon, 200.0, n)
    assert(g.count() == (2 * n + 1).toLong * (2 * n + 1))
    val r = g.agg(min("g_lat"), max("g_lat"), min("g_lon"), max("g_lon")).head()
    val b = Noise.bbox(Noise.NantesLat, Noise.NantesLon, 200.0, n)
    assert(math.abs(r.getDouble(0) - b.laMin) < 1e-5)
    assert(math.abs(r.getDouble(1) - b.laMax) < 1e-5)
    assert(math.abs(r.getDouble(2) - b.loMin) < 1e-5)
    assert(math.abs(r.getDouble(3) - b.loMax) < 1e-5)
  }

  test("haversine matches the known Paris-London distance") {
    // Paris (48.8566, 2.3522) to London (51.5074, -0.1278): ~343.5 km
    val d = haversineOf(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(d - 343.5e3) < 1.5e3, s"got $d")
  }

  test("classification truth table incl. +-1.5 m/s boundaries") {
    import spark.implicits._
    val rows = Seq(
      // (lat, lon, on_ground, vertical_rate, geo_alt) -> expected (db, alt)
      (1.0, 1.0, true, Some(5.0), Some(300.0), 80.0, 27.0),   // ground wins
      (1.0, 1.0, false, Some(-2.0), Some(300.0), 110.0, 300.0), // descending
      (1.0, 1.0, false, Some(2.0), Some(300.0), 130.0, 300.0),  // climbing
      (1.0, 1.0, false, Some(-1.5), Some(300.0), 90.0, 300.0),  // boundary = cruise
      (1.0, 1.0, false, Some(1.5), Some(300.0), 90.0, 300.0),   // boundary = cruise
      (1.0, 1.0, false, None, Some(300.0), 90.0, 300.0),        // null vr = cruise
      (1.0, 1.0, false, Some(0.0), None, 90.0, 27.0))           // null alt = ref alt
    val df = rows.map(r => (r._1, r._2, r._3, r._4, r._5))
      .toDF("latitude", "longitude", "on_ground", "vertical_rate", "geo_altitude")
    val out = Noise.classifySource(df).collect()
    rows.zip(out).foreach { case (exp, got) =>
      assert(got.getDouble(2) == exp._6, s"db for $exp")
      assert(got.getDouble(3) == exp._7, s"alt for $exp")
    }
  }

  test("rows with null position or on_ground are dropped") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(1.0), Some(false), Some(0.0), Some(10.0)),
      (None, Some(1.0), Some(false), Some(0.0), Some(10.0)),
      (Some(1.0), None, Some(false), Some(0.0), Some(10.0)),
      (Some(1.0), Some(1.0), None, Some(0.0), Some(10.0)))
      .toDF("latitude", "longitude", "on_ground", "vertical_rate", "geo_altitude")
    assert(Noise.classifySource(df).count() == 1)
  }

  test("ground noise on a hand-computed 2-source example") {
    import spark.implicits._
    // one grid cell at origin; two sources at exactly 1 km and 10 km due north
    val grid = Seq((0.0, 0.0)).toDF("g_lat", "g_lon")
    val dLat1km = 1000.0 / EarthRadiusM * (180.0 / math.Pi)
    val sources = Seq(
      (dLat1km, 0.0, 100.0, 27.0),
      (10 * dLat1km, 0.0, 100.0, 27.0)).toDF("s_lat", "s_lon", "s_db", "s_alt")
    val db = Noise.groundNoise(grid, sources).head().getDouble(2)
    // contributions: 100 - 20*log10(1000) = 40 dB; 100 - 20*log10(10000) = 20 dB
    val expected = 10 * math.log10(math.pow(10, 4.0) + math.pow(10, 2.0))
    assert(math.abs(db - expected) < 0.02, s"got $db want ~$expected")
  }

  test("bucketed ground noise equals broadcast ground noise") {
    val g = Noise.grid(spark, Noise.NantesLat, Noise.NantesLon, 1000.0, 10)
    val s = graft.queries.NoiseQueries.sources(spark, "/root/testdata/sf0.001")
    val a = Noise.groundNoise(g, s).orderBy("g_lat", "g_lon").collect()
    val b = Noise.groundNoiseBucketed(g, s).orderBy("g_lat", "g_lon").collect()
    assert(a.sameElements(b))
  }

  test("haversine properties: symmetry, identity, bounded by pi*R") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(60)((
      -80.0 + 160.0 * rnd.nextDouble(), -179.0 + 358.0 * rnd.nextDouble(),
      -80.0 + 160.0 * rnd.nextDouble(), -179.0 + 358.0 * rnd.nextDouble()))
    val df = pts.toDF("lat1", "lon1", "lat2", "lon2").select(
      haversineMeters(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("dab"),
      haversineMeters(col("lat2"), col("lon2"), col("lat1"), col("lon1")).as("dba"),
      haversineMeters(col("lat1"), col("lon1"), col("lat1"), col("lon1")).as("daa"))
    df.collect().foreach { r =>
      val (dab, dba, daa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(dab - dba) <= 1e-6 * math.max(1.0, dab))
      assert(dab >= 0 && dab <= math.Pi * EarthRadiusM + 1.0)
      assert(daa == 0.0)
    }
  }

  test("attenuation is monotone in distance and clamps below 1 m") {
    val df = spark.range(1).select(
      attenuatedDb(lit(100.0), lit(0.5)).as("near"),
      attenuatedDb(lit(100.0), lit(100.0)).as("mid"),
      attenuatedDb(lit(100.0), lit(10000.0)).as("far")).head()
    assert(df.getDouble(0) == 100.0) // clamped: no amplification below 1 m
    assert(df.getDouble(1) > df.getDouble(2))
  }
}
