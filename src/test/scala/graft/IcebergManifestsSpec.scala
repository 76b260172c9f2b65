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
}
