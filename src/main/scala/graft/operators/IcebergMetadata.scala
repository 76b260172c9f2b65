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
      timestampMs: Long, manifestList: String, operation: String,
      schemaId: Option[Int] = None)

  /** One schema field. Field IDs are the spec's stable identity —
    * renames keep the id, adds mint a new one — which is what makes
    * column evolution resolvable without rewriting data files.
    */
  final case class Field(id: Int, name: String, ftype: String,
      required: Boolean)

  final case class Schema(schemaId: Int, fields: Vector[Field])

  /** A named ref per the v2 spec's `refs` map: a BRANCH (a mutable head
    * `current-snapshot-id` tracks when named `main`) or a TAG (an
    * immutable bookmark for time travel), each with its optional
    * retention knobs. `min-snapshots-to-keep` is branch-only by spec.
    */
  final case class NamedRef(name: String, snapshotId: Long,
      isBranch: Boolean, maxRefAgeMs: Option[Long] = None,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None)

  final case class TableMeta(formatVersion: Int, uuid: String,
      location: String, currentSnapshotId: Long,
      snapshots: Vector[SnapshotRef],
      schemas: Vector[Schema] = Vector.empty,
      currentSchemaId: Option[Int] = None,
      refs: Vector[NamedRef] = Vector.empty) {
    def current: Option[SnapshotRef] =
      snapshots.find(_.id == currentSnapshotId)
    def schemaOf(id: Int): Option[Schema] =
      schemas.find(_.schemaId == id)
    def currentSchema: Option[Schema] =
      currentSchemaId.flatMap(schemaOf)
    def ref(name: String): Option[NamedRef] = refs.find(_.name == name)
    /** The snapshot a ref resolves to (refs are validated at parse). */
    def snapshotFor(name: String): Option[SnapshotRef] =
      ref(name).flatMap(r => snapshots.find(_.id == r.snapshotId))
  }

  /** Field-level diff between two schema versions, keyed by the STABLE
    * field id (the only correct join key under renames). Legal type
    * changes are the spec's promotions (int → long, float → double);
    * any other same-id type change means the document describes an
    * evolution Iceberg forbids — decline, never report it as a widen.
    */
  final case class SchemaDiff(added: Vector[Field], dropped: Vector[Field],
      renamed: Vector[(Field, Field)], widened: Vector[(Field, Field)],
      unchanged: Vector[Field])

  def schemaDiff(from: Schema, to: Schema): Option[SchemaDiff] = {
    val a = from.fields.map(f => f.id -> f).toMap
    val b = to.fields.map(f => f.id -> f).toMap
    if (a.size != from.fields.size || b.size != to.fields.size) return None
    val added = to.fields.filterNot(f => a.contains(f.id))
    val dropped = from.fields.filterNot(f => b.contains(f.id))
    val renamed = Vector.newBuilder[(Field, Field)]
    val widened = Vector.newBuilder[(Field, Field)]
    val unchanged = Vector.newBuilder[Field]
    def promotes(x: String, y: String): Boolean =
      (x == "int" && y == "long") || (x == "float" && y == "double")
    from.fields.foreach { f =>
      b.get(f.id).foreach { g =>
        val typeOk = f.ftype == g.ftype || promotes(f.ftype, g.ftype)
        if (!typeOk) return None // illegal narrowing/retype
        val isRename = f.name != g.name
        val isWiden = f.ftype != g.ftype
        if (isWiden) widened += ((f, g))
        if (isRename) renamed += ((f, g))
        if (!isRename && !isWiden) unchanged += f
      }
    }
    Some(SchemaDiff(added, dropped, renamed.result(), widened.result(),
      unchanged.result()))
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
        val sidNode = s.path("schema-id")
        val sid =
          if (sidNode.isMissingNode || sidNode.isNull) None
          else if (sidNode.isNumber) Some(sidNode.asInt())
          else return None
        SnapshotRef(id.asLong(), s.path("sequence-number").asLong(0L),
          s.path("timestamp-ms").asLong(0L), ml,
          s.path("summary").path("operation").asText(""), sid)
      }.toVector
      if (snaps.map(_.id).distinct.length != snaps.length) return None
      if (snaps.sliding(2).exists {
        case Vector(a, b) => b.sequenceNumber < a.sequenceNumber
        case _ => false
      }) return None
      // schema layer (optional — a metadata doc may omit it; if present
      // it must be coherent)
      val schemasNode = root.path("schemas")
      val schemas =
        if (schemasNode.isMissingNode || schemasNode.isNull) Vector.empty[Schema]
        else {
          if (!schemasNode.isArray) return None
          (0 until schemasNode.size()).map { i =>
            val sc = schemasNode.get(i)
            val sid = sc.path("schema-id")
            val fieldsNode = sc.path("fields")
            if (!sid.isNumber || !fieldsNode.isArray) return None
            val fields = (0 until fieldsNode.size()).map { j =>
              val f = fieldsNode.get(j)
              val fid = f.path("id")
              val name = f.path("name").asText("")
              val tpe = f.path("type").asText("")
              if (!fid.isNumber || name.isEmpty || tpe.isEmpty) return None
              Field(fid.asInt(), name, tpe, f.path("required").asBoolean(false))
            }.toVector
            if (fields.map(_.id).distinct.length != fields.length) return None
            Schema(sid.asInt(), fields)
          }.toVector
        }
      if (schemas.map(_.schemaId).distinct.length != schemas.length) return None
      val curSchemaNode = root.path("current-schema-id")
      val curSchemaId =
        if (curSchemaNode.isMissingNode || curSchemaNode.isNull) None
        else if (curSchemaNode.isNumber) Some(curSchemaNode.asInt())
        else return None
      curSchemaId.foreach { cs =>
        if (!schemas.exists(_.schemaId == cs)) return None
      }
      snaps.foreach(_.schemaId.foreach { sid =>
        if (!schemas.exists(_.schemaId == sid)) return None
      })
      // refs layer (optional): every ref must name a listed snapshot
      // with a legal type; `main` (if present) must agree with
      // current-snapshot-id (the spec ties the main branch head to it);
      // min-snapshots-to-keep is meaningless on a tag and declines
      val refsNode = root.path("refs")
      val refs =
        if (refsNode.isMissingNode || refsNode.isNull)
          Vector.empty[NamedRef]
        else {
          if (!refsNode.isObject) return None
          val it = refsNode.fields()
          val out = Vector.newBuilder[NamedRef]
          while (it.hasNext) {
            val e = it.next()
            val r = e.getValue
            val sid = r.path("snapshot-id")
            if (!sid.isNumber) return None
            val isBranch = r.path("type").asText("") match {
              case "branch" => true
              case "tag" => false
              case _ => return None
            }
            def optLong(k: String): Option[Long] = {
              val n = r.path(k)
              if (n.isMissingNode || n.isNull) None
              else if (n.isNumber) Some(n.asLong())
              else return None
            }
            val minKeep = {
              val n = r.path("min-snapshots-to-keep")
              if (n.isMissingNode || n.isNull) None
              else if (n.isNumber) Some(n.asInt())
              else return None
            }
            if (minKeep.isDefined && !isBranch) return None
            out += NamedRef(e.getKey, sid.asLong(), isBranch,
              optLong("max-ref-age-ms"), minKeep,
              optLong("max-snapshot-age-ms"))
          }
          out.result()
        }
      refs.foreach { r =>
        if (!snaps.exists(_.id == r.snapshotId)) return None
      }
      refs.find(_.name == "main").foreach { m =>
        if (!m.isBranch || m.snapshotId != curId.asLong()) return None
      }
      val meta = TableMeta(fv, uuid, loc, curId.asLong(), snaps, schemas,
        curSchemaId, refs)
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
      snapshots: Seq[SnapshotRef], currentId: Long,
      schemas: Seq[Schema] = Nil,
      currentSchemaId: Option[Int] = None,
      refs: Seq[NamedRef] = Nil): String = {
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
      s.schemaId.foreach(n.put("schema-id", _))
      n.putObject("summary").put("operation", s.operation)
    }
    if (schemas.nonEmpty) {
      val sarr = root.putArray("schemas")
      schemas.foreach { sc =>
        val n = sarr.addObject()
        n.put("schema-id", sc.schemaId)
        n.put("type", "struct")
        val farr = n.putArray("fields")
        sc.fields.foreach { f =>
          val fn = farr.addObject()
          fn.put("id", f.id)
          fn.put("name", f.name)
          fn.put("type", f.ftype)
          fn.put("required", f.required)
        }
      }
    }
    currentSchemaId.foreach(root.put("current-schema-id", _))
    if (refs.nonEmpty) {
      val rn = root.putObject("refs")
      refs.foreach { r =>
        val n = rn.putObject(r.name)
        n.put("snapshot-id", r.snapshotId)
        n.put("type", if (r.isBranch) "branch" else "tag")
        r.maxRefAgeMs.foreach(n.put("max-ref-age-ms", _))
        r.minSnapshotsToKeep.foreach(n.put("min-snapshots-to-keep", _))
        r.maxSnapshotAgeMs.foreach(n.put("max-snapshot-age-ms", _))
      }
    }
    om.writeValueAsString(root)
  }
}
