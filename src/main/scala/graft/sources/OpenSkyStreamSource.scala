package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 MicroBatchStream source replaying OpenSky snapshots as micro-batches
  * (SURVEY.md §7.6: the live-poller extension, kept network-free).
  *
  * `option("paths", "a.json,b.json,...")` names one payload file per
  * snapshot; each trigger serves the next snapshot, so a replay behaves
  * exactly like a rate-limited live poller — a live implementation would
  * replace [[OpenSkySnapshotLog]] with the OAuth2 + GET pair and an
  * unbounded offset. Offsets are plain snapshot counts, so restarts resume
  * from the checkpointed position.
  *
  * Usage: `spark.readStream.format("graft.sources.OpenSkyStreamProvider")
  *   .option("paths", ...).load()` → the 17-column state-vector schema.
  */
class OpenSkyStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OpenSkySnapshot.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new OpenSkyStreamTable(properties.asScala.toMap)
}

class OpenSkyStreamTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "opensky_stream"
  override def schema(): StructType = OpenSkySnapshot.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new OpenSkyStreamScan(options ++ opts.asScala)
    }
}

class OpenSkyStreamScan(options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = OpenSkySnapshot.schema
  override def description(): String = "opensky_stream"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OpenSkyMicroBatchStream(SnapshotFeed.fromOptions(options))
}

/** Where micro-batches come from: a fixed replay log (`paths`) or the live
  * endpoint (`mode=live`, one authenticated poll per offset step).
  */
sealed trait SnapshotFeed {
  /** The offset the stream may advance to from `start` on this trigger. */
  def nextOffset(start: Long, drainAll: Boolean): Long
  def parse(i: Int): Array[Array[String]]
}

object SnapshotFeed {
  def fromOptions(options: Map[String, String]): SnapshotFeed =
    if (options.get("mode").contains("live")) OpenSkyLiveFeed(options)
    else OpenSkySnapshotLog(options.getOrElse("paths",
        throw new IllegalArgumentException(
          "opensky stream requires option 'paths' or mode=live"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
}

/** The snapshot log a replay run drains; each path is one micro-batch. */
final case class OpenSkySnapshotLog(paths: Seq[String]) extends SnapshotFeed {
  override def nextOffset(start: Long, drainAll: Boolean): Long =
    if (drainAll) paths.size.toLong else math.min(start + 1, paths.size.toLong)
  override def parse(i: Int): Array[Array[String]] =
    OpenSkySnapshot.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(paths(i)))).toArray
}

/** Live poller: offset n = the n-th authenticated snapshot fetch
  * (graft.ingest.OpenSkyLive — the reference's OAuth2 + GET pair). The feed
  * is unbounded; under Trigger.AvailableNow it serves exactly one poll and
  * stops. A restart re-polls rather than replaying history — the API serves
  * only the current state vector set, so offsets mark poll COUNTS, not
  * reproducible data (exactly the reference's snapshot semantics; a replayed
  * pipeline should persist raw payloads via foreachBatch and re-run from the
  * `paths` log instead).
  *
  * Streaming planning has no filter-pushdown channel, so the bbox rides in as
  * OPTIONS (`lamin`/`lamax`/`lomin`/`lomax` — OpenSkyLive.fetch merges them
  * into the query string); without them every poll downloads the full global
  * state vector set and Spark filters downstream.
  */
final case class OpenSkyLiveFeed(options: Map[String, String]) extends SnapshotFeed {
  override def nextOffset(start: Long, drainAll: Boolean): Long = start + 1
  override def parse(i: Int): Array[Array[String]] =
    OpenSkySnapshot.parse(
      graft.ingest.OpenSkyLive.fetch(options, Array.empty)).toArray
}

final case class SnapshotOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** One snapshot per trigger via the admission-control API: the next offset
  * derives from the engine-supplied `start` (the last committed/planned
  * end), so restarts are correct BY CONSTRUCTION — there is no in-memory
  * cursor to regress. Each batch reads the snapshots in (start, end] as one
  * partition per snapshot. Under Trigger.AvailableNow the engine announces
  * the drain intent first and latestOffset jumps to the end of the log, so
  * the run processes everything and stops (the one-step poll cadence would
  * otherwise drain exactly one snapshot).
  */
class OpenSkyMicroBatchStream(log: SnapshotFeed) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private var drainAll = false
  // AvailableNow must CONVERGE: the drain target is captured on the first
  // latestOffset call and pinned — an unbounded live feed would otherwise
  // keep advancing (start+1 forever) and the drain would never terminate.
  private var drainTarget: Option[Long] = None

  override def initialOffset(): Offset = SnapshotOffset(0L)

  override def prepareForTriggerAvailableNow(): Unit = drainAll = true

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapshotOffset].n
    val next =
      if (drainAll) {
        if (drainTarget.isEmpty) drainTarget = Some(log.nextOffset(s, drainAll = true))
        drainTarget.get
      } else log.nextOffset(s, drainAll = false)
    SnapshotOffset(next)
  }

  override def deserializeOffset(json: String): Offset = SnapshotOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].n.toInt
    val e = end.asInstanceOf[SnapshotOffset].n.toInt
    (s until e).map(i => OpenSkyPartition(log.parse(i)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OpenSkyReaderFactory(OpenSkySnapshot.schema, Array.empty)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
