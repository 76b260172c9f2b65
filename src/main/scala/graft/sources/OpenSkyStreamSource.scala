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
    new OpenSkyMicroBatchStream(OpenSkySnapshotLog.fromOptions(options))
}

/** The snapshot log a live poller would append to; here a fixed file list. */
final case class OpenSkySnapshotLog(paths: Seq[String]) {
  def size: Int = paths.size
  def parse(i: Int): Array[Array[String]] =
    OpenSkySnapshot.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(paths(i)))).toArray
}

object OpenSkySnapshotLog {
  def fromOptions(options: Map[String, String]): OpenSkySnapshotLog =
    OpenSkySnapshotLog(options.getOrElse("paths",
        throw new IllegalArgumentException("opensky stream requires option 'paths'"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
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
class OpenSkyMicroBatchStream(log: OpenSkySnapshotLog) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private var drainAll = false

  override def initialOffset(): Offset = SnapshotOffset(0L)

  override def prepareForTriggerAvailableNow(): Unit = drainAll = true

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapshotOffset].n
    SnapshotOffset(if (drainAll) log.size.toLong
                   else math.min(s + 1, log.size.toLong))
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
