package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

import graft.model.StateVector

/** OpenSky `/api/states/all` payload parser — the reference's ingest stage
  * (scripts/functions.py:56-114) as a pure, network-free transformation over
  * a Dataset of raw JSON bodies.
  *
  * Differences from the reference, all deliberate (SURVEY.md §7.4):
  *   - explicit payload schema instead of inference (deterministic typing);
  *   - `states: null` → empty output instead of sys.exit (functions.py:64-69);
  *   - callsigns arrive right-padded with spaces → trimmed at ingest (Q7).
  *
  * The HTTP/OAuth half of the reference (functions.py:23-50) is driver-side
  * I/O, not a query operator; a live source would wrap this parser in a
  * foreachBatch poller or DSv2 MicroBatchStream (SURVEY.md §7.6) — kept out
  * so CI never touches the network.
  */
object OpenSkyParser {

  /** Parse raw JSON response bodies into the 17-column typed state-vector
    * frame (one row per aircraft).
    */
  def parse(raw: Dataset[String]): DataFrame = {
    val parsed = raw.sparkSession.read.schema(StateVector.payloadSchema).json(raw)
    val exploded = parsed
      .filter(col("states").isNotNull)
      .select(col("time"), explode(col("states")).as("state"))
    // try_cast throughout: Spark 4 runs ANSI mode by default, where a plain
    // cast on a malformed slot would fail the whole job; the reference's
    // semantics (and any sane ingest of third-party data) is cast-to-null.
    val cols = StateVector.slots.zipWithIndex.map { case ((name, dt), idx) =>
      val c = col("state").getItem(idx)
      name match {
        // "[1,2,3]"-style string → array<int> (reference functions.py:98-107)
        case "sensors" =>
          when(c.isNull, lit(null).cast(ArrayType(IntegerType)))
            .otherwise(split(regexp_replace(c, "[\\[\\]\\s]", ""), ",")
              .try_cast(ArrayType(IntegerType)))
            .as(name)
        case "callsign" => trim(c).try_cast(dt).as(name)
        case _ => c.try_cast(dt).as(name)
      }
    }
    exploded.select(cols: _*)
  }

  /** Parity helper: rows usable by the noise pipeline — position present and
    * on_ground known (the reference crashes on such nulls, SURVEY.md §7.4 Q5).
    */
  def usableForNoise(states: DataFrame): DataFrame =
    states.filter(col("latitude").isNotNull && col("longitude").isNotNull &&
      col("on_ground").isNotNull)
}
