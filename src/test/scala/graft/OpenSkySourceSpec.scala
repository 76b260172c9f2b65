package graft

import org.apache.spark.sql.functions._

/** DSv2 source tests: schema, values vs the OpenSkyParser on the same
  * payload, bbox filter pushdown (visible in the physical plan and applied
  * source-side), and column pruning.
  */
class OpenSkySourceSpec extends SparkTestBase {
  import spark.implicits._

  private val payload =
    """{ "time": 1757059200,
      |  "states": [
      |    ["39c4a1", "AFR123  ", "France", 1757059190, 1757059195,
      |     -1.6100, 47.1600, 310.5, false, 82.3, 184.2, 4.2, null,
      |     335.2, "1000", false, 0],
      |    ["4ca7b3", "RYR45Q  ", "Ireland", 1757059188, 1757059195,
      |     -1.5800, 47.1400, null, true, 4.1, 90.0, 0.0, "[1,2]",
      |     27.0, "7000", false, 0],
      |    ["ffeedd", "FAR01   ", "Spain", 1757059100, 1757059101,
      |     2.5000, 40.0000, 100.0, false, 10.0, 0.0, 0.0, null,
      |     120.0, "2000", false, 0] ] }""".stripMargin.replace("\n", " ")

  private def src = spark.read
    .format("graft.sources.OpenSkyTableProvider")
    .option("payload", payload)
    .load()

  test("reads the typed 17-column schema with parser-identical values") {
    val viaSource = src.orderBy("icao24")
      .select("icao24", "callsign", "latitude", "on_ground", "sensors", "geo_altitude")
      .collect().map(_.toString)
    val viaParser = ingest.OpenSkyParser.parse(Seq(payload).toDS()).orderBy("icao24")
      .select("icao24", "callsign", "latitude", "on_ground", "sensors", "geo_altitude")
      .collect().map(_.toString)
    assert(viaSource.toSeq == viaParser.toSeq)
    assert(src.schema == graft.sources.OpenSkySnapshot.schema)
  }

  test("bbox filters push into the source scan") {
    val boxed = src.filter($"latitude" > 47.0 && $"latitude" < 48.0 &&
      $"longitude" > -2.0 && $"longitude" < 0.0)
    val plan = boxed.queryExecution.executedPlan.toString
    // bbox predicates consumed by the source: only null-checks remain in the
    // residual Filter, and the scan description reports them as pushed
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(latitude,47.0)"), plan)
    // the residual Filter above the scan must not re-apply the bbox bounds
    assert(!plan.split("BatchScan").head.contains("47.0"), plan)
    assert(boxed.select("icao24").as[String].collect().sorted.toSeq ==
      Seq("39c4a1", "4ca7b3")) // Spain row filtered source-side
  }

  test("column pruning reaches the scan") {
    val pruned = src.select("icao24")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<icao24:string>"), plan)
    assert(plan.contains("BatchScan opensky_snapshot[icao24#"), plan)
    assert(pruned.count() == 3)
  }

  test("empty and null states produce an empty frame") {
    val empty = spark.read.format("graft.sources.OpenSkyTableProvider")
      .option("payload", """{"time": 1, "states": null}""").load()
    assert(empty.count() == 0)
  }
}
