package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AvroOcf._
import graft.operators.{AvroOcf, IcebergManifests}
import graft.operators.IcebergManifests._

/** Iceberg manifest-list + manifest decode over the nested Avro reader:
  * round trips under all three codecs, the spec's redundant manifest
  * arithmetic enforced, and the hostile sweep. Also pins the nested
  * AvroOcf scope itself (records/arrays/optional unions) since this is
  * its consumer.
  */
class IcebergManifestsSpec extends AnyFunSuite {

  private val partType = TRecord("r102", Vector("bucket" -> TInt))

  private def entry(status: Int, i: Int, rows: Long = 0L): ManifestEntry =
    ManifestEntry(status, if (i % 2 == 0) Some(7000L + i) else None,
      DataFile(0, s"data/f$i.parquet", "PARQUET",
        Vector("bucket" -> (i % 4).toLong),
        if (rows != 0) rows else 100L + i, 1000L + 13L * i))

  private def table(codec: String = "null"):
      (Array[Byte], Map[String, Array[Byte]]) = {
    val m0entries = (0 until 4).map(entry(1, _)) // all added
    val m1entries = Seq(entry(0, 10), entry(1, 11), entry(2, 12),
      entry(2, 13))
    val m0 = synthManifest(m0entries, partType, codec, 3)
    val m1 = synthManifest(m1entries, partType, codec, 4)
    def counts(es: Seq[ManifestEntry], s: Int) =
      (es.count(_.status == s),
        es.filter(_.status == s).map(_.dataFile.recordCount).sum)
    def mf(path: String, bytes: Array[Byte], es: Seq[ManifestEntry]) = {
      val (a, ar) = counts(es, 1); val (e, er) = counts(es, 0)
      val (d, dr) = counts(es, 2)
      ManifestFile(path, bytes.length.toLong, 0, 9001L, a, e, d, ar, er, dr,
        Some(Vector(FieldSummary(containsNull = false,
          Some(es.map(_.dataFile.partition.head._2).min.toString),
          Some(es.map(_.dataFile.partition.head._2).max.toString)))))
    }
    val list = synthManifestList(
      Seq(mf("meta/m0.avro", m0, m0entries), mf("meta/m1.avro", m1, m1entries)),
      codec, 5)
    (list, Map("meta/m0.avro" -> m0, "meta/m1.avro" -> m1))
  }

  test("replay folds live/deleted per status under all three codecs") {
    Seq("null", "deflate", "snappy").foreach { codec =>
      val (list, manifests) = table(codec)
      val st = IcebergManifests.replay(list, manifests.get).get
      assert(st.nManifests == 2)
      assert(st.live.map(_.path).sorted == Vector(
        "data/f0.parquet", "data/f1.parquet", "data/f10.parquet",
        "data/f11.parquet", "data/f2.parquet", "data/f3.parquet"))
      assert(st.deleted.map(_.path) ==
        Vector("data/f12.parquet", "data/f13.parquet"))
      assert(st.liveRows == (100 + 0) + 101 + 102 + 103 + 110 + 111)
      assert(st.liveBytes == 6 * 1000L + 13L * (0 + 1 + 2 + 3 + 10 + 11))
      assert(st.live.forall(_.format == "PARQUET"))
    }
  }

  test("manifest list decodes its own schema: fields, bounds, counts") {
    val (list, _) = table()
    val mfs = IcebergManifests.readManifestList(list).get
    assert(mfs.map(_.path) == Vector("meta/m0.avro", "meta/m1.avro"))
    assert(mfs(0).addedFiles == 4 && mfs(0).deletedFiles == 0)
    assert(mfs(1).addedFiles == 1 && mfs(1).existingFiles == 1 &&
      mfs(1).deletedFiles == 2)
    assert(mfs(0).addedRows == 100L + 101 + 102 + 103)
    val ps = mfs(1).partitions.get
    assert(ps == Vector(FieldSummary(containsNull = false,
      Some("0"), Some("3"))))
    assert(mfs.forall(_.addedSnapshotId == 9001L))
  }

  test("manifest arithmetic is enforced: tampered counts reject") {
    val (_, manifests) = table()
    val m1 = manifests("meta/m1.avro")
    val es = IcebergManifests.readManifest(m1).get
    assert(es.map(_.status) == Vector(0, 1, 2, 2))
    assert(es(0).snapshotId.contains(7010L) && es(1).snapshotId.isEmpty)
    def listWith(f: ManifestFile => ManifestFile): Array[Byte] = {
      val base = ManifestFile("meta/m1.avro", m1.length.toLong, 0, 9001L,
        1, 1, 2, 111L, 110L, 112L + 113L, None)
      synthManifestList(Seq(f(base)), "null", 6)
    }
    val ok = listWith(identity)
    assert(IcebergManifests.replay(ok, manifests.get).isDefined)
    // wrong manifest_length
    assert(IcebergManifests.replay(
      listWith(_.copy(length = m1.length + 1L)), manifests.get).isEmpty)
    // wrong added-files count
    assert(IcebergManifests.replay(
      listWith(_.copy(addedFiles = 2)), manifests.get).isEmpty)
    // wrong deleted-rows sum
    assert(IcebergManifests.replay(
      listWith(_.copy(deletedRows = 999L)), manifests.get).isEmpty)
    // unresolvable manifest path
    assert(IcebergManifests.replay(
      listWith(_.copy(path = "meta/nope.avro")), manifests.get).isEmpty)
  }

  test("v2 positional deletes: merge-on-read fold, dedup across delete " +
    "files, and every enforcement rule") {
    // data manifest: 3 files of 10/20/30 rows
    val dataEntries = Seq(entry(1, 0, 10), entry(1, 1, 20), entry(1, 2, 30))
    val dm = synthManifest(dataEntries, partType, "null", 21)
    // two delete files: overlapping positions on f0, one on f2
    val del0 = synthPosDeletes(
      Seq(("data/f0.parquet", 1L), ("data/f0.parquet", 3L),
        ("data/f2.parquet", 29L)), "deflate", 22)
    val del1 = synthPosDeletes(
      Seq(("data/f0.parquet", 3L), ("data/f0.parquet", 5L)), "null", 23)
    def delEntry(path: String, bytes: Array[Byte], nRows: Long) =
      ManifestEntry(1, None, DataFile(1, path, "AVRO",
        Vector("bucket" -> 0L), nRows, bytes.length.toLong))
    val delEntries = Seq(delEntry("del/d0.avro", del0, 3L),
      delEntry("del/d1.avro", del1, 2L))
    val dmDel = synthManifest(delEntries, partType, "null", 24)
    def mf(path: String, bytes: Array[Byte], es: Seq[ManifestEntry],
        content: Int) = {
      def c(st: Int) = es.count(_.status == st)
      def rc(st: Int) =
        es.filter(_.status == st).map(_.dataFile.recordCount).sum
      ManifestFile(path, bytes.length.toLong, 0, 9001L, c(1), c(0), c(2),
        rc(1), rc(0), rc(2), None, content)
    }
    val resolve = Map("meta/dm.avro" -> dm, "meta/dmdel.avro" -> dmDel,
      "del/d0.avro" -> del0, "del/d1.avro" -> del1)
    def list(f: Seq[ManifestFile] => Seq[ManifestFile] = identity) =
      synthManifestList(f(Seq(mf("meta/dm.avro", dm, dataEntries, 0),
        mf("meta/dmdel.avro", dmDel, delEntries, 1))), "null", 25)
    val st = IcebergManifests.replayV2(list(), resolve.get).get
    assert(st.base.live.map(_.recordCount).sum == 60)
    // f0 loses distinct {1,3,5} (3 appears in BOTH delete files — once),
    // f2 loses {29}
    assert(st.deletedPositions == Map("data/f0.parquet" -> 3L,
      "data/f2.parquet" -> 1L))
    assert(st.effectiveRows == 60 - 4)
    // v1 replay refuses a list carrying a delete manifest
    assert(IcebergManifests.replay(list(), resolve.get).isEmpty)
    // enforcement: position beyond the target's record_count
    val badPos = synthPosDeletes(Seq(("data/f1.parquet", 20L)), "null", 26)
    val badPosEntries = Seq(delEntry("del/bad.avro", badPos, 1L))
    val badPosM = synthManifest(badPosEntries, partType, "null", 27)
    val r2 = resolve ++ Map("del/bad.avro" -> badPos,
      "meta/bad.avro" -> badPosM)
    assert(IcebergManifests.replayV2(
      synthManifestList(Seq(mf("meta/dm.avro", dm, dataEntries, 0),
        mf("meta/bad.avro", badPosM, badPosEntries, 1)), "null", 28),
      r2.get).isEmpty)
    // enforcement: delete targeting an unknown file
    val unk = synthPosDeletes(Seq(("data/nope.parquet", 0L)), "null", 29)
    val unkEntries = Seq(delEntry("del/unk.avro", unk, 1L))
    val unkM = synthManifest(unkEntries, partType, "null", 30)
    val r3 = resolve ++ Map("del/unk.avro" -> unk, "meta/unk.avro" -> unkM)
    assert(IcebergManifests.replayV2(
      synthManifestList(Seq(mf("meta/dm.avro", dm, dataEntries, 0),
        mf("meta/unk.avro", unkM, unkEntries, 1)), "null", 31),
      r3.get).isEmpty)
    // enforcement: record_count lying about the decoded position count
    val lieEntries = Seq(delEntry("del/d0.avro", del0, 99L))
    val lieM = synthManifest(lieEntries, partType, "null", 32)
    val r4 = resolve ++ Map("meta/lie.avro" -> lieM)
    assert(IcebergManifests.replayV2(
      synthManifestList(Seq(mf("meta/dm.avro", dm, dataEntries, 0),
        mf("meta/lie.avro", lieM, lieEntries, 1)), "null", 33),
      r4.get).isEmpty)
    // enforcement: a data manifest smuggling delete-content files
    assert(IcebergManifests.replayV2(
      synthManifestList(Seq(mf("meta/dm.avro", dm, dataEntries, 0),
        mf("meta/dmdel.avro", dmDel, delEntries, 0)), "null", 34),
      resolve.get).isEmpty)
  }

  test("v2 EQUALITY deletes: metadata fold, row-count/byte enforcement, " +
    "and the field-135 contract") {
    val dataEntries = Seq(entry(1, 0, 10), entry(1, 1, 20))
    val dm = synthManifest(dataEntries, partType, "null", 41)
    val eq0 = IcebergManifests.synthEqDeletes("doc_id",
      Seq(3L, 7L, 11L), "deflate", 42)
    val eq1 = IcebergManifests.synthEqDeletes("doc_id",
      Seq(20L), "null", 43)
    def eqEntry(path: String, bytes: Array[Byte], nRows: Long,
        ids: Option[Vector[Int]] = Some(Vector(2))) =
      ManifestEntry(1, None, DataFile(2, path, "AVRO",
        Vector("bucket" -> 0L), nRows, bytes.length.toLong, ids))
    val eqEntries = Seq(eqEntry("del/e0.avro", eq0, 3L),
      eqEntry("del/e1.avro", eq1, 1L))
    val em = synthManifest(eqEntries, partType, "null", 44)
    def mf(path: String, bytes: Array[Byte], es: Seq[ManifestEntry],
        content: Int) = {
      def c(st: Int) = es.count(_.status == st)
      def rc(st: Int) =
        es.filter(_.status == st).map(_.dataFile.recordCount).sum
      ManifestFile(path, bytes.length.toLong, 0, 9001L, c(1), c(0), c(2),
        rc(1), rc(0), rc(2), None, content)
    }
    val resolve = Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
      "del/e0.avro" -> eq0, "del/e1.avro" -> eq1)
    def list(es: Seq[ManifestEntry], emBytes: Array[Byte],
        rs: Map[String, Array[Byte]]) =
      IcebergManifests.replayV2(
        synthManifestList(Seq(mf("meta/dm.avro", dm, dataEntries, 0),
          mf("meta/em.avro", emBytes, es, 1)), "null", 45),
        rs.get)
    val st = list(eqEntries, em, resolve).get
    assert(st.base.liveRows == 30 && st.effectiveRows == 30)
    assert(st.eqDeletes.size == 2 && st.eqDeleteRows == 4)
    assert(st.minEffectiveRows == 26)
    assert(st.eqDeletes.forall(_.equalityIds.contains(Vector(2))))
    // an equality entry WITHOUT equality_ids declines (field 135)
    val noIds = Seq(eqEntry("del/e0.avro", eq0, 3L, ids = None))
    val noIdsM = synthManifest(noIds, partType, "null", 46)
    assert(list(noIds, noIdsM,
      resolve + ("meta/em.avro" -> noIdsM)).isEmpty)
    // a POSITION entry WITH equality_ids declines
    val posWithIds = Seq(ManifestEntry(1, None, DataFile(1, "del/e0.avro",
      "AVRO", Vector("bucket" -> 0L), 3L, eq0.length.toLong,
      Some(Vector(2)))))
    val pwM = synthManifest(posWithIds, partType, "null", 47)
    assert(list(posWithIds, pwM,
      resolve + ("meta/em.avro" -> pwM)).isEmpty)
    // record_count lying about the decoded row count declines
    val lie = Seq(eqEntry("del/e0.avro", eq0, 99L))
    val lieM = synthManifest(lie, partType, "null", 48)
    assert(list(lie, lieM, resolve + ("meta/em.avro" -> lieM)).isEmpty)
    // a data file carrying equality_ids declines
    val badData = Seq(ManifestEntry(1, None, DataFile(0, "data/fx.parquet",
      "PARQUET", Vector("bucket" -> 0L), 5L, 50L, Some(Vector(2)))))
    val bdM = synthManifest(badData, partType, "null", 49)
    assert(IcebergManifests.replayV2(
      synthManifestList(Seq(mf("meta/bd.avro", bdM, badData, 0)),
        "null", 50),
      (resolve + ("meta/bd.avro" -> bdM)).get).isEmpty)
  }

  test("table metadata: current-snapshot resolution, strictness rules, " +
    "full-chain replay, and real JSON escaping") {
    import graft.operators.IcebergMetadata
    import graft.operators.IcebergMetadata.SnapshotRef
    val (list, manifests) = table()
    val snaps = Seq(
      SnapshotRef(10L, 1L, 1700000000000L, "meta/old.avro", "append"),
      SnapshotRef(11L, 2L, 1700000001000L, "meta/list.avro", "overwrite"))
    // a location with JSON-hostile characters must round-trip (Jackson
    // escaping on both sides, not string splicing)
    val loc = "warehouse/\"quoted\"\\path\nnewline"
    val json = IcebergMetadata.synthMetadata("tbl-1", loc, snaps, 11L)
    val meta = IcebergMetadata.parseMetadata(json).get
    assert(meta.formatVersion == 2 && meta.uuid == "tbl-1")
    assert(meta.location == loc)
    assert(meta.current.get.manifestList == "meta/list.avro")
    assert(meta.current.get.operation == "overwrite")
    // full chain: metadata -> manifest list -> manifests
    val resolve = manifests + ("meta/list.avro" -> list)
    val (m2, st) = IcebergMetadata.replayCurrent(json, resolve.get).get
    assert(m2.currentSnapshotId == 11L)
    assert(st.base.live.size == 6 && st.effectiveRows == st.base.liveRows)
    // strictness: duplicate snapshot ids
    assert(IcebergMetadata.parseMetadata(IcebergMetadata.synthMetadata(
      "t", "w", Seq(snaps.head, snaps.head), 10L)).isEmpty)
    // current-snapshot-id naming no listed snapshot
    assert(IcebergMetadata.parseMetadata(IcebergMetadata.synthMetadata(
      "t", "w", snaps, 99L)).isEmpty)
    // DECREASING sequence numbers violate commit order
    assert(IcebergMetadata.parseMetadata(IcebergMetadata.synthMetadata(
      "t", "w", Seq(snaps(1), snaps(0)), 10L)).isEmpty)
    // unknown format version, junk JSON, empty snapshot list
    assert(IcebergMetadata.parseMetadata(
      json.replace("\"format-version\":2", "\"format-version\":3")).isEmpty)
    assert(IcebergMetadata.parseMetadata("not json at all").isEmpty)
    assert(IcebergMetadata.parseMetadata(
      """{"format-version":2,"table-uuid":"t","current-snapshot-id":1,
        |"snapshots":[]}""".stripMargin).isEmpty)
    // an unresolvable current manifest list declines the chain
    assert(IcebergMetadata.replayCurrent(json, manifests.get).isEmpty)
  }

  test("refs layer: branch/tag resolution and every strictness rule") {
    import graft.operators.IcebergMetadata
    import graft.operators.IcebergMetadata.{NamedRef, SnapshotRef}
    val snaps = Seq(
      SnapshotRef(10L, 1L, 1700000000000L, "meta/l0.avro", "append"),
      SnapshotRef(11L, 2L, 1700000001000L, "meta/l1.avro", "overwrite"))
    def mk(refs: Seq[NamedRef]) = IcebergMetadata.parseMetadata(
      IcebergMetadata.synthMetadata("t", "w", snaps, 11L, refs = refs))
    val good = mk(Seq(
      NamedRef("main", 11L, isBranch = true),
      NamedRef("v1", 10L, isBranch = false, maxRefAgeMs = Some(1000L)),
      NamedRef("dev", 10L, isBranch = true,
        minSnapshotsToKeep = Some(3)))).get
    assert(good.refs.size == 3)
    assert(good.snapshotFor("v1").get.sequenceNumber == 1L)
    assert(good.snapshotFor("dev").get.id == 10L)
    assert(good.ref("v1").get.maxRefAgeMs.contains(1000L))
    // a ref naming an unlisted snapshot declines
    assert(mk(Seq(NamedRef("x", 99L, isBranch = false))).isEmpty)
    // main must be a BRANCH and must agree with current-snapshot-id
    assert(mk(Seq(NamedRef("main", 10L, isBranch = true))).isEmpty)
    assert(mk(Seq(NamedRef("main", 11L, isBranch = false))).isEmpty)
    // min-snapshots-to-keep is branch-only
    assert(mk(Seq(NamedRef("v1", 10L, isBranch = false,
      minSnapshotsToKeep = Some(2)))).isEmpty)
    // an illegal ref type string declines
    val json = IcebergMetadata.synthMetadata("t", "w", snaps, 11L,
      refs = Seq(NamedRef("v1", 10L, isBranch = false)))
    assert(IcebergMetadata.parseMetadata(
      json.replace("\"type\":\"tag\"", "\"type\":\"bookmark\"")).isEmpty)
    // a refs-free document still parses (the layer is optional)
    assert(mk(Nil).isDefined)
  }

  test("schema pinning: a non-manifest nested file declines cleanly") {
    // a valid nested container that is NOT a manifest list / manifest
    val other = TRecord("thing", Vector("a" -> TLong,
      "b" -> TOpt(TString), "c" -> TArray(TInt)))
    val bytes = AvroOcf.synthNested(other, Seq(Vector(LongCell(1L),
      StrCell("x"), ArrCell(Vector(LongCell(2L), LongCell(3L))))),
      Seq(1), "null", 8)
    assert(AvroOcf.probeNested(bytes).isDefined) // the reader widens
    assert(IcebergManifests.readManifestList(bytes).isEmpty)
    assert(IcebergManifests.readManifest(bytes).isEmpty)
    // the FLAT probe still declines nested schemas (scope unchanged)
    assert(AvroOcf.probe(bytes).isEmpty)
  }

  test("nested reader round trip: optional branches, empty arrays, " +
    "deep nesting; hostile bytes never throw") {
    val t = TRecord("outer", Vector(
      "id" -> TLong,
      "opt_rec" -> TOpt(TRecord("inner", Vector("s" -> TString,
        "d" -> TDouble))),
      "list" -> TArray(TRecord("item", Vector("k" -> TInt,
        "flag" -> TBool)))))
    val rows = Seq(
      Vector[Cell](LongCell(1L),
        RecCell(Vector(StrCell("hi"), DoubleCell(2.5))),
        ArrCell(Vector(RecCell(Vector(LongCell(4L), BoolCell(true)))))),
      Vector[Cell](LongCell(2L), NullCell, ArrCell(Vector.empty)))
    val b = AvroOcf.synthNested(t, rows, Seq(2), "deflate", 11)
    val info = AvroOcf.probeNested(b).get
    assert(info.root == t && info.nRecords == 2)
    assert(info.rows(0)(1) ==
      RecCell(Vector(StrCell("hi"), DoubleCell(2.5))))
    assert(info.rows(1)(1) == NullCell)
    assert(info.rows(1)(2) == ArrCell(Vector.empty))
    // hostile sweep: every single-byte flip yields Option, never a throw
    b.indices.foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x33).toByte
      AvroOcf.probeNested(c)
    }
    assert(AvroOcf.probeNested(b.dropRight(5)).isEmpty)
  }

  test("empty-field nested record (void partition spec) round-trips; " +
    "planScan keeps legacy files unprunable") {
    // legal Avro: a record with zero fields — the Iceberg unpartitioned
    // partition tuple before a spec evolution (q312)
    val t = TRecord("outer", Vector(
      "id" -> TLong, "part" -> TRecord("r102", Vector())))
    val rows = Seq(
      Vector[Cell](LongCell(7L), RecCell(Vector.empty)),
      Vector[Cell](LongCell(8L), RecCell(Vector.empty)))
    val b = AvroOcf.synthNested(t, rows, Seq(2), "snappy", 5)
    val info = AvroOcf.probeNested(b).get
    assert(info.root == t && info.nRecords == 2)
    assert(info.rows(0)(1) == RecCell(Vector.empty))
    // a manifest of spec-0 entries (no partition field) plans as
    // scanned-and-matched regardless of the predicate range
    val es = (0 until 3).map(i => ManifestEntry(1, Some(1L),
      DataFile(0, s"f$i", "PARQUET", Vector(), 10L + i, 100L + i)))
    val mb = IcebergManifests.synthManifest(es, TRecord("r102", Vector()),
      "null", 3)
    val mf = ManifestFile("m.avro", mb.length.toLong, 0, 1L,
      3, 0, 0, es.map(_.dataFile.recordCount).sum, 0L, 0L, None)
    val list = IcebergManifests.synthManifestList(Seq(mf), "null", 4)
    val plan = IcebergManifests.planScan(list, Map("m.avro" -> mb).get,
      0, 1000L, 2000L).get
    assert(plan.filesScanned == 3 && plan.filesMatched == 3)
    assert(plan.rowsMatched == 33L && plan.bytesMatched == 303L)
    // but a manifest that PUBLISHES bounds while holding field-less
    // files is malformed: decline
    val lying = IcebergManifests.synthManifestList(Seq(mf.copy(
      partitions = Some(Vector(FieldSummary(containsNull = false,
        Some("0"), Some("5")))))), "null", 4)
    assert(IcebergManifests.planScan(lying, Map("m.avro" -> mb).get,
      0, 0L, 5L).isEmpty)
  }

  // ------------------------------------------------------------------
  // planScan (q285): manifest-level partition pruning
  // ------------------------------------------------------------------

  test("planScan skips excluded manifests WITHOUT resolving them") {
    // m0 buckets 0..3 (from entry()), m1 buckets 0..3 too — rebuild m1
    // with shifted buckets so the ranges are disjoint
    val m0entries = (0 until 3).map(entry(1, _)) // buckets 0,1,2
    val m1entries = (0 until 3).map { i =>
      val e = entry(1, 10 + i)
      e.copy(dataFile = e.dataFile.copy(
        partition = Vector("bucket" -> (8L + i))))
    }
    val m0 = synthManifest(m0entries, partType, "null", 3)
    val m1 = synthManifest(m1entries, partType, "null", 4)
    def mf(path: String, bytes: Array[Byte], es: Seq[ManifestEntry]) =
      ManifestFile(path, bytes.length.toLong, 0, 9001L,
        es.count(_.status == 1), 0, 0,
        es.map(_.dataFile.recordCount).sum, 0L, 0L,
        Some(Vector(FieldSummary(containsNull = false,
          Some(es.map(_.dataFile.partition.head._2).min.toString),
          Some(es.map(_.dataFile.partition.head._2).max.toString)))))
    val list = synthManifestList(
      Seq(mf("meta/m0.avro", m0, m0entries),
        mf("meta/m1.avro", m1, m1entries)), "null", 5)
    // a resolver that THROWS on the manifest the planner must prune
    val resolve = (p: String) =>
      if (p == "meta/m1.avro") sys.error("pruned manifest was resolved")
      else Some(m0)
    val plan = IcebergManifests.planScan(list, resolve, 0, 1L, 2L).get
    assert(plan == ScanPlan(2, 1, 3, 2, m0entries.tail.map(
      _.dataFile.recordCount).sum,
      m0entries.tail.map(_.dataFile.fileSizeBytes).sum))
  }

  test("planScan opens a manifest with no summary; a lying summary declines") {
    val es = (0 until 3).map(entry(1, _)) // buckets 0,1,2
    val m0 = synthManifest(es, partType, "null", 3)
    def mf(summary: Option[Vector[FieldSummary]]) =
      ManifestFile("meta/m0.avro", m0.length.toLong, 0, 9001L,
        3, 0, 0, es.map(_.dataFile.recordCount).sum, 0L, 0L, summary)
    // no summary: cannot prune even for a non-intersecting predicate
    var resolved = 0
    val list1 = synthManifestList(Seq(mf(None)), "null", 5)
    val p1 = IcebergManifests.planScan(list1,
      p => { resolved += 1; Some(m0) }, 0, 50L, 60L).get
    assert(resolved == 1 && p1.manifestsPruned == 0 &&
      p1.filesScanned == 3 && p1.filesMatched == 0)
    // lying summary (declares 1..1 but entries hold 0 and 2): decline
    val list2 = synthManifestList(Seq(mf(Some(Vector(FieldSummary(
      containsNull = false, Some("1"), Some("1")))))), "null", 5)
    assert(IcebergManifests.planScan(list2, _ => Some(m0), 0, 0L, 9L).isEmpty)
    // non-numeric bound on a numeric predicate: decline
    val list3 = synthManifestList(Seq(mf(Some(Vector(FieldSummary(
      containsNull = false, Some("aa"), Some("zz")))))), "null", 5)
    assert(IcebergManifests.planScan(list3, _ => Some(m0), 0, 0L, 9L).isEmpty)
    // inverted predicate: decline
    assert(IcebergManifests.planScan(list1, _ => Some(m0), 0, 9L, 0L).isEmpty)
  }

  // ------------------------------------------------------------------
  // planScanV2 (q329): equality deletes participating in plan-time pruning
  // ------------------------------------------------------------------

  private val emptyPart = TRecord("r103", Vector())

  private def eqPruneFixture() = {
    // 4 data files, partitions bucket=0..3, rows 10+i / bytes 100+i, seq 9001
    val dataEntries = (0 until 4).map { i =>
      ManifestEntry(1, Some(9001L),
        DataFile(0, s"data/f$i.parquet", "PARQUET",
          Vector("bucket" -> i.toLong), 10L + i, 100L + i))
    }
    val dm = synthManifest(dataEntries, partType, "null", 1)
    def mfV2(path: String, bytes: Array[Byte], es: Seq[ManifestEntry],
        content: Int) =
      ManifestFile(path, bytes.length.toLong, 0, 9001L,
        es.count(_.status == 1), 0, 0,
        es.map(_.dataFile.recordCount).sum, 0L, 0L, None, content)
    (dataEntries, dm, mfV2 _)
  }

  private def delEntry(path: String, b: Array[Byte], rc: Long, snap: Long,
      part: Vector[(String, Long)], ids: Vector[Int]) =
    ManifestEntry(1, Some(snap),
      DataFile(2, path, "AVRO", part, rc, b.length.toLong, Some(ids)))

  test("planScanV2: domain prune + partition scope + stale sequence compose") {
    val (dataEntries, dm, mfV2) = eqPruneFixture()
    // A: GLOBAL delete on the partition-source column (id 2), values {1,2},
    //    seq 9002 — the value domain confines it to files 1 and 2
    val aB = IcebergManifests.synthEqDeletes("bucket", Seq(1L, 2L), "null", 2)
    // B: global, same column, FULL domain 0..3, but seq 9000 — STALE: an
    //    equality delete only applies to strictly older data files
    val bB = IcebergManifests.synthEqDeletes("bucket", 0L to 3L, "null", 3)
    // C: scoped to partition bucket=3, a DIFFERENT column (id 7) — no
    //    domain knowledge, so scope+sequence alone assign it to file 3
    val cB = IcebergManifests.synthEqDeletes("other", Seq(99L), "null", 4)
    val delA = delEntry("del/a.avro", aB, 2L, 9002L, Vector.empty, Vector(2))
    val delB = delEntry("del/b.avro", bB, 4L, 9000L, Vector.empty, Vector(2))
    val delC = delEntry("del/c.avro", cB, 1L, 9003L,
      Vector("bucket" -> 3L), Vector(7))
    val em1 = synthManifest(Seq(delA, delB), emptyPart, "null", 5)
    val em2 = synthManifest(Seq(delC), partType, "null", 6)
    val list = synthManifestList(Seq(
      mfV2("meta/dm.avro", dm, dataEntries, 0),
      mfV2("meta/e1.avro", em1, Seq(delA, delB), 1),
      mfV2("meta/e2.avro", em2, Seq(delC), 1)), "null", 7)
    val byPath = Map("meta/dm.avro" -> dm, "meta/e1.avro" -> em1,
      "meta/e2.avro" -> em2, "del/a.avro" -> aB, "del/b.avro" -> bB,
      "del/c.avro" -> cB)
    val p = IcebergManifests.planScanV2(list, byPath.get, 0, 0L, 3L, 2).get
    assert(p == IcebergManifests.ScanPlanV2(3, 0, 4, 4, 46L, 406L,
      3, 3, 1, 10L), p)
  }

  test("planScanV2: a far domain prunes EVERYTHING; an other-column global delete prunes NOTHING") {
    val (dataEntries, dm, mfV2) = eqPruneFixture()
    // domain [50, 60] cannot intersect any partition: all files delete-free
    val farB = IcebergManifests.synthEqDeletes("bucket", Seq(50L, 60L), "null", 2)
    val far = delEntry("del/far.avro", farB, 2L, 9002L, Vector.empty, Vector(2))
    val em = synthManifest(Seq(far), emptyPart, "null", 3)
    val list = synthManifestList(Seq(
      mfV2("meta/dm.avro", dm, dataEntries, 0),
      mfV2("meta/em.avro", em, Seq(far), 1)), "null", 4)
    val byPath = Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
      "del/far.avro" -> farB)
    val p = IcebergManifests.planScanV2(list, byPath.get, 0, 0L, 3L, 2).get
    assert(p.filesAffected == 0 && p.filesDeleteFree == 4 &&
      p.rowsDeleteFree == 46L, p)
    // a global delete on ANOTHER column (no domain knowledge): every
    // matched file must conservatively run merge-on-read
    val othB = IcebergManifests.synthEqDeletes("x", Seq(1L), "null", 5)
    val oth = delEntry("del/o.avro", othB, 1L, 9002L, Vector.empty, Vector(9))
    val em2 = synthManifest(Seq(oth), emptyPart, "null", 6)
    val list2 = synthManifestList(Seq(
      mfV2("meta/dm.avro", dm, dataEntries, 0),
      mfV2("meta/e2.avro", em2, Seq(oth), 1)), "null", 7)
    val byPath2 = Map("meta/dm.avro" -> dm, "meta/e2.avro" -> em2,
      "del/o.avro" -> othB)
    val p2 = IcebergManifests.planScanV2(list2, byPath2.get, 0, 0L, 3L, 2).get
    assert(p2.filesAffected == 4 && p2.filesDeleteFree == 0 &&
      p2.rowsDeleteFree == 0L, p2)
  }

  test("planScanV2 enforcement: record-count drift and field-135 violations decline") {
    val (dataEntries, dm, mfV2) = eqPruneFixture()
    val aB = IcebergManifests.synthEqDeletes("bucket", Seq(1L, 2L), "null", 2)
    // declared record_count 3, file holds 2 rows
    val bad = delEntry("del/a.avro", aB, 3L, 9002L, Vector.empty, Vector(2))
    val em = synthManifest(Seq(bad), emptyPart, "null", 3)
    val list = synthManifestList(Seq(
      mfV2("meta/dm.avro", dm, dataEntries, 0),
      mfV2("meta/em.avro", em, Seq(bad), 1)), "null", 4)
    val byPath = Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
      "del/a.avro" -> aB)
    assert(IcebergManifests.planScanV2(list, byPath.get, 0, 0L, 3L, 2).isEmpty)
    // an equality-delete entry WITHOUT equality_ids
    val noIds = ManifestEntry(1, Some(9002L),
      DataFile(2, "del/a.avro", "AVRO", Vector.empty, 2L, aB.length.toLong))
    val em2 = synthManifest(Seq(noIds), emptyPart, "null", 5)
    val list2 = synthManifestList(Seq(
      mfV2("meta/dm.avro", dm, dataEntries, 0),
      mfV2("meta/e2.avro", em2, Seq(noIds), 1)), "null", 6)
    val byPath2 = Map("meta/dm.avro" -> dm, "meta/e2.avro" -> em2,
      "del/a.avro" -> aB)
    assert(IcebergManifests.planScanV2(list2, byPath2.get, 0, 0L, 3L, 2).isEmpty)
  }

  test("schema evolution: id-keyed diff, promotion rules, coherence") {
    import graft.operators.IcebergMetadata
    import graft.operators.IcebergMetadata.{Field, Schema, SnapshotRef}
    val s0 = Schema(0, Vector(
      Field(1, "a", "int", required = true),
      Field(2, "b", "string", required = false),
      Field(3, "c", "float", required = false)))
    // rename AND widen the same field: counts in both vectors, not in
    // unchanged
    val s1 = Schema(1, Vector(
      Field(1, "a_wide", "long", required = true),
      Field(2, "b", "string", required = false),
      Field(9, "fresh", "double", required = false)))
    val d = IcebergMetadata.schemaDiff(s0, s1).get
    assert(d.added.map(_.id) == Vector(9))
    assert(d.dropped.map(_.id) == Vector(3))
    assert(d.renamed.map(_._1.id) == Vector(1))
    assert(d.widened.map(_._1.id) == Vector(1))
    assert(d.unchanged.map(_.id) == Vector(2))
    // illegal narrowing declines
    val narrow = Schema(2, Vector(Field(1, "a", "int", required = true)))
    assert(IcebergMetadata.schemaDiff(
      Schema(0, Vector(Field(1, "a", "long", required = true))),
      narrow).isEmpty)
    // illegal retype declines
    assert(IcebergMetadata.schemaDiff(
      Schema(0, Vector(Field(1, "a", "string", required = true))),
      Schema(1, Vector(Field(1, "a", "double", required = true)))).isEmpty)
    // duplicate field ids decline
    assert(IcebergMetadata.schemaDiff(
      Schema(0, Vector(Field(1, "a", "int", required = true),
        Field(1, "b", "int", required = false))), s1).isEmpty)
    // metadata coherence: current-schema-id and snapshot schema-id must
    // name listed schemas; duplicate schema ids reject
    def meta(schemas: Seq[Schema], cur: Option[Int],
        snapSid: Option[Int]) =
      IcebergMetadata.parseMetadata(IcebergMetadata.synthMetadata(
        "u", "s3://t",
        Seq(SnapshotRef(1L, 1L, 0L, "ml/a.avro", "append", snapSid)),
        1L, schemas, cur))
    assert(meta(Seq(s0, s1), Some(1), Some(0)).isDefined)
    assert(meta(Seq(s0), Some(7), None).isEmpty)
    assert(meta(Seq(s0), None, Some(7)).isEmpty)
    assert(meta(Seq(s0, s0), Some(0), None).isEmpty)
    // round trip carries the schema layer
    val m = meta(Seq(s0, s1), Some(1), Some(0)).get
    assert(m.currentSchema.get == s1)
    assert(m.snapshots.head.schemaId.contains(0))
  }

  test("replayV3: puffin DV merge-on-read, every v3 rule enforced") {
    import graft.operators.{DeletionVectors, Puffin}
    // two live data files; one puffin DV deleting positions {1,4,7} of f1
    val dataEntries = Seq(entry(1, 0, rows = 10L), entry(1, 1, rows = 10L))
    val dm = synthManifest(dataEntries, partType, "null", 3)
    val dvPos = Array(1L, 4L, 7L)
    val blob = DeletionVectors.serializeDvBlob(dvPos) // v3 framed form
    val puffin = Puffin.write(Seq("deletion-vector-v1" -> blob), 9L, 1L,
      Map.empty, compressFooter = false)
    def dvEntry(rc: Long = 3L, target: String = "data/f1.parquet",
        off: Long = 4L, sz: Long = blob.length.toLong,
        eq: Option[Vector[Int]] = None) =
      ManifestEntry(1, Some(9002L), DataFile(1, "del/dv.puffin", "PUFFIN",
        Vector("bucket" -> 0L), rc, puffin.length.toLong, eq,
        Some(target), Some(off), Some(sz)))
    def listFor(de: ManifestEntry): (Array[Byte], Map[String, Array[Byte]]) = {
      val em = synthManifestV3(Seq(de), partType, "null", 5)
      val mfs = Seq(
        ManifestFile("meta/dm.avro", dm.length.toLong, 0, 9001L, 2, 0, 0,
          20L, 0L, 0L, None, 0),
        ManifestFile("meta/em.avro", em.length.toLong, 0, 9001L, 1, 0, 0,
          de.dataFile.recordCount, 0L, 0L, None, 1))
      (synthManifestList(mfs, "null", 7),
        Map("meta/dm.avro" -> dm, "meta/em.avro" -> em,
          "del/dv.puffin" -> puffin))
    }
    val (list, byPath) = listFor(dvEntry())
    val st = IcebergManifests.replayV3(list, byPath.get).get
    assert(st.v2.base.liveRows == 20L)
    assert(st.v2.deletedPositions == Map("data/f1.parquet" -> 3L))
    assert(st.v2.effectiveRows == 17L)
    assert(st.dvEntries.map(_.referencedDataFile.get) ==
      Vector("data/f1.parquet"))
    def declines(de: ManifestEntry): Unit = {
      val (l, bp) = listFor(de)
      assert(IcebergManifests.replayV3(l, bp.get).isEmpty)
    }
    declines(dvEntry(rc = 2L))                       // cardinality lies
    declines(dvEntry(target = "data/nope.parquet"))  // unknown target
    declines(dvEntry(off = 5L))                      // offset != footer blob
    declines(dvEntry(sz = blob.length.toLong - 1))   // size != footer blob
    declines(dvEntry(eq = Some(Vector(2))))          // DV with equality_ids
    // a PUFFIN entry missing the reference fields declines
    val noRef = ManifestEntry(1, Some(9002L), DataFile(1, "del/dv.puffin",
      "PUFFIN", Vector("bucket" -> 0L), 3L, puffin.length.toLong))
    declines(noRef)
    // a DATA file carrying DV fields declines (fresh list so the byte
    // lengths stay truthful and the FIELD rule is what declines)
    val badData = entry(1, 0, rows = 10L)
    val dm2 = synthManifestV3(Seq(badData.copy(dataFile = badData.dataFile
      .copy(referencedDataFile = Some("x"))), entry(1, 1, rows = 10L)),
      partType, "null", 3)
    val l2 = synthManifestList(Seq(
      ManifestFile("meta/dm2.avro", dm2.length.toLong, 0, 9001L, 2, 0, 0,
        20L, 0L, 0L, None, 0)), "null", 7)
    assert(IcebergManifests.replayV3(l2,
      Map("meta/dm2.avro" -> dm2).get).isEmpty)
    // a BARE (unframed) bitmap in the puffin blob declines — the v3
    // spec's length/magic/CRC envelope is load-bearing, not decoration
    val bare = DeletionVectors.serializeRoaring64(dvPos)
    val puffinBare = Puffin.write(Seq("deletion-vector-v1" -> bare), 9L, 1L,
      Map.empty, compressFooter = false)
    val deBare = ManifestEntry(1, Some(9002L), DataFile(1, "del/dv.puffin",
      "PUFFIN", Vector("bucket" -> 0L), 3L, puffinBare.length.toLong, None,
      Some("data/f1.parquet"), Some(4L), Some(bare.length.toLong)))
    val (lb, bpb) = listFor(deBare)
    assert(IcebergManifests.replayV3(lb,
      (bpb + ("del/dv.puffin" -> puffinBare)).get).isEmpty)
    // positions past the target's row count decline
    val bigPos = DeletionVectors.serializeDvBlob(Array(99L))
    val puffin2 = Puffin.write(Seq("deletion-vector-v1" -> bigPos), 9L, 1L,
      Map.empty, compressFooter = false)
    val de2 = ManifestEntry(1, Some(9002L), DataFile(1, "del/dv.puffin",
      "PUFFIN", Vector("bucket" -> 0L), 1L, puffin2.length.toLong, None,
      Some("data/f1.parquet"), Some(4L), Some(bigPos.length.toLong)))
    val (l3, bp3) = listFor(de2)
    assert(IcebergManifests.replayV3(l3,
      (bp3 + ("del/dv.puffin" -> puffin2)).get).isEmpty)
  }

  test("planScan never scans DELETED entries; arithmetic still enforced") {
    val es = Seq(entry(1, 0), entry(1, 1), entry(2, 12)) // f12 deleted
    val m0 = synthManifest(es, partType, "null", 3)
    val mf0 = ManifestFile("meta/m0.avro", m0.length.toLong, 0, 9001L,
      2, 0, 1, es.filter(_.status == 1).map(_.dataFile.recordCount).sum,
      0L, es.filter(_.status == 2).map(_.dataFile.recordCount).sum,
      None)
    val list = synthManifestList(Seq(mf0), "null", 5)
    val p = IcebergManifests.planScan(list, _ => Some(m0), 0, 0L, 9L).get
    assert(p.filesScanned == 2 && p.filesMatched == 2)
    // tampered row arithmetic declines in planScan too
    val bad = mf0.copy(addedRows = mf0.addedRows + 1)
    val list2 = synthManifestList(Seq(bad), "null", 5)
    assert(IcebergManifests.planScan(list2, _ => Some(m0), 0, 0L, 9L).isEmpty)
  }
}
