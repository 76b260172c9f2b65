package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column builders (compositions of codegen'd built-ins — no UDFs).
  *
  * Mirrors the reference's NumPy math (reference scripts/functions.py:130-276)
  * as Catalyst expressions so the whole pipeline stays inside whole-stage
  * codegen and distributes across executors instead of running on the driver.
  */
object GeoFunctions {

  /** Mean Earth radius in metres (reference functions.py:130). */
  val EarthRadiusM: Double = 6371000.0

  /** Noise cutoff radius in metres (reference functions.py:131). */
  val RMaxM: Double = 20000.0

  /** Reference ground altitude in metres (reference functions.py:132). */
  val RefAltM: Double = 27.0

  /** Great-circle haversine distance in metres between two (lat, lon) pairs
    * given in degrees (reference functions.py:229-237).
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2d
    val dLon = radians(lon2 - lon1) / 2d
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2d * EarthRadiusM) * asin(sqrt(a))
  }

  /** 3-D slant distance: haversine ground distance combined with the vertical
    * offset above the reference ground altitude (reference functions.py:194-211
    * — dead code there, implemented here as the flagged "intended physics"
    * variant; SURVEY.md §7.4 Q2).
    */
  def slantDistanceMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                          altM: Column): Column = {
    val ground = haversineMeters(lat1, lon1, lat2, lon2)
    sqrt(pow(ground, 2) + pow(altM - lit(RefAltM), 2))
  }

  /** Inverse-square free-field attenuation: dB lost over `distM` metres
    * (reference functions.py:263). Distance is clamped to >= 1 m so that a
    * source sitting exactly on a grid cell cannot produce log10(0) = -inf
    * (documented deviation, SURVEY.md §7.4 Q3).
    */
  def attenuatedDb(sourceDb: Column, distM: Column): Column =
    sourceDb - lit(20d) * log10(greatest(distM, lit(1.0d)))

  /** Power-domain sum of dB contributions, back to dB, rounded to 2 decimals
    * (reference functions.py:268-271). Aggregate expression: apply inside
    * `groupBy(...).agg(...)`. The per-cell sum accumulates in exact decimal
    * (Det.dsum) so partition order cannot perturb the result (SURVEY.md §7.4
    * Q6), and the final rounding is the deterministic floor-based half-up.
    */
  def dbPowerSum(contribDb: Column): Column =
    Det.rdet(lit(10d) * log10(Det.dsum(pow(lit(10d), contribDb / 10d))), 2)
}
