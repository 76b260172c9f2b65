package graft.operators

import scala.util.control.NonFatal

/** ICEBERG TABLE METADATA — the JSON layer ABOVE the Avro manifests
  * ([[IcebergManifests]]): per the public Apache Iceberg table spec, a
  * table version is one `vN.metadata.json` document holding the
  * format version, table uuid, the snapshot list (each snapshot names
  * its manifest-list file, sequence number, timestamp, and summary
  * operation), and `current-snapshot-id`. A reader resolves the
  * CURRENT snapshot here and only then descends into Avro — so this
  * completes the chain: metadata.json → manifest list → manifest →
  * data/delete files ([[IcebergManifests.replayV2]]).
  *
  * Strictness (enforced, not assumed): format-version must be 1 or 2,
  * snapshot ids must be unique, `current-snapshot-id` must name a
  * listed snapshot, every snapshot needs a non-empty `manifest-list`,
  * and sequence numbers may not DECREASE in snapshot-list order (the
  * spec's commit order). Violations — or unparseable JSON — yield
  * None, never a fabricated table state.
  */
object IcebergMetadata {

  final case class SnapshotRef(id: Long, sequenceNumber: Long,
      timestampMs: Long, manifestList: String, operation: String)

  final case class TableMeta(formatVersion: Int, uuid: String,
      location: String, currentSnapshotId: Long,
      snapshots: Vector[SnapshotRef]) {
    def current: Option[SnapshotRef] =
      snapshots.find(_.id == currentSnapshotId)
  }

  def parseMetadata(json: String): Option[TableMeta] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper
      val root = om.readTree(json)
      if (root == null || !root.isObject) return None
      val fv = root.path("format-version").asInt(-1)
      if (fv != 1 && fv != 2) return None
      val uuid = root.path("table-uuid").asText("")
      if (uuid.isEmpty) return None
      val loc = root.path("location").asText("")
      val curId = root.path("current-snapshot-id")
      if (!curId.isNumber) return None
      val snapsNode = root.path("snapshots")
      if (!snapsNode.isArray || snapsNode.size() == 0) return None
      val snaps = (0 until snapsNode.size()).map { i =>
        val s = snapsNode.get(i)
        val id = s.path("snapshot-id")
        val ml = s.path("manifest-list").asText("")
        if (!id.isNumber || ml.isEmpty) return None
        SnapshotRef(id.asLong(), s.path("sequence-number").asLong(0L),
          s.path("timestamp-ms").asLong(0L), ml,
          s.path("summary").path("operation").asText(""))
      }.toVector
      if (snaps.map(_.id).distinct.length != snaps.length) return None
      if (snaps.sliding(2).exists {
        case Vector(a, b) => b.sequenceNumber < a.sequenceNumber
        case _ => false
      }) return None
      val meta = TableMeta(fv, uuid, loc, curId.asLong(), snaps)
      if (meta.current.isEmpty) return None
      Some(meta)
    } catch { case NonFatal(_) => None }

  /** Full-chain replay of the CURRENT snapshot: parse the metadata
    * JSON, resolve its manifest list through `resolve`, and fold the
    * v2 state ([[IcebergManifests.replayV2]] — positional deletes and
    * all manifest arithmetic enforced down-chain).
    */
  def replayCurrent(json: String,
      resolve: String => Option[Array[Byte]])
      : Option[(TableMeta, IcebergManifests.TableStateV2)] = {
    val meta = parseMetadata(json).getOrElse(return None)
    val cur = meta.current.getOrElse(return None)
    val listBytes = resolve(cur.manifestList).getOrElse(return None)
    IcebergManifests.replayV2(listBytes, resolve).map((meta, _))
  }

  /** Synthesize a valid metadata document (Jackson-built, so escaping
    * is the real thing, not string splicing).
    */
  def synthMetadata(uuid: String, location: String,
      snapshots: Seq[SnapshotRef], currentId: Long): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    val root = om.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", uuid)
    root.put("location", location)
    root.put("current-snapshot-id", currentId)
    val arr = root.putArray("snapshots")
    snapshots.foreach { s =>
      val n = arr.addObject()
      n.put("snapshot-id", s.id)
      n.put("sequence-number", s.sequenceNumber)
      n.put("timestamp-ms", s.timestampMs)
      n.put("manifest-list", s.manifestList)
      n.putObject("summary").put("operation", s.operation)
    }
    om.writeValueAsString(root)
  }
}
