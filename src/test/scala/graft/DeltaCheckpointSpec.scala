package graft

import org.apache.spark.sql.functions._

import graft.operators.{DeltaReplay, ParquetFooter, ParquetPages, ParquetSynth}
import graft.operators.ParquetPages.{PBin, PLong}
import graft.operators.ParquetSynth.CkptRow

/** The delta checkpoint read path (q281): the parquet checkpoint-state
  * writer/reader round trip, and the algebraic identity the whole path
  * rests on — checkpoint(prefix ≤ V) + tail(> V) re-folded equals the
  * full-log replay.
  */
class DeltaCheckpointSpec extends SparkTestBase {

  private def addLine(path: String, size: Long) =
    s"""{"add":{"path":"$path","size":$size,"dataChange":true}}"""
  private def removeLine(path: String) =
    s"""{"remove":{"path":"$path","deletionTimestamp":1}}"""

  test("synthCheckpoint bytes decode back to the exact state rows") {
    val rows = Seq(
      CkptRow("part-0", isAdd = true, Some(100L), 3L),
      CkptRow("part-1", isAdd = false, None, 7L),
      CkptRow("part-2", isAdd = true, Some(2L), 49L))
    for (snappy <- Seq(false, true)) {
      val bytes = ParquetSynth.synthCheckpoint(rows, snappy)
      val f = ParquetFooter.probe(bytes).getOrElse(fail("footer probe"))
      assert(f.numRows === 3L && f.nRowGroups === 1)
      def read(name: String) = ParquetPages.readColumn(bytes,
        f.firstGroupChunks.find(_.pathInSchema == name).get).get
      assert(read("path").map(_.collect { case b: PBin => b.str }) ===
        Vector(Some("part-0"), Some("part-1"), Some("part-2")))
      assert(read("is_add").map(_.collect { case PLong(x) => x }) ===
        Vector(Some(1L), Some(0L), Some(1L)))
      assert(read("size").map(_.collect { case PLong(x) => x }) ===
        Vector(Some(100L), None, Some(2L)))
      assert(read("version").map(_.collect { case PLong(x) => x }) ===
        Vector(Some(3L), Some(7L), Some(49L)))
    }
  }

  test("checkpoint + tail re-fold equals the full-log replay") {
    import spark.implicits._
    // a log with adds, removes, resurrections, and same-version ties
    val full = Seq(
      (1L, addLine("a", 10L)), (1L, addLine("b", 20L)),
      (2L, removeLine("a")),
      (3L, addLine("c", 30L)),
      (4L, removeLine("b")), (4L, addLine("b", 25L)), // add-wins tie
      // ---- checkpoint boundary V = 4 ----
      (5L, removeLine("c")),
      (6L, addLine("a", 11L)),
      (7L, addLine("d", 40L)))
    val fullDf = full.toDF("version", "line")
    val want = DeltaReplay.replay(fullDf)
      .orderBy("path").collect().map(_.toSeq)
    // the checkpoint IS the fold of the prefix; tombstones retained
    val ckpt = DeltaReplay.replay(fullDf.filter(col("version") <= 4))
      .select(col("path"), col("is_live").as("is_add"),
        col("size"), col("last_version").as("version"))
    val tail = fullDf.filter(col("version") > 4)
    val got = DeltaReplay.replayFromCheckpoint(ckpt, tail)
      .orderBy("path").collect().map(_.toSeq)
    assert(got === want)
  }

  test("a stale tail action older than the checkpoint state cannot regress it") {
    import spark.implicits._
    val ckpt = Seq(("a", true, Some(10L), 9L)).toDF(
      "path", "is_add", "size", "version")
    val tail = Seq((5L, removeLine("a"))).toDF("version", "line")
    val st = DeltaReplay.replayFromCheckpoint(ckpt, tail).collect()
    assert(st.length === 1)
    assert(st(0).getBoolean(1) === true) // still live
    assert(st(0).getLong(3) === 9L)
  }

  test("diff classifies all seven change kinds from one log") {
    import spark.implicits._
    val log = Seq(
      // unchanged: add before vLow, nothing after
      (1L, addLine("same", 5L)),
      // resized: live at both endpoints, size changed
      (1L, addLine("grew", 10L)), (6L, addLine("grew", 20L)),
      // removed: live at vLow, tombstoned by vHigh
      (2L, addLine("dead", 7L)), (5L, removeLine("dead")),
      // added: absent at vLow, live at vHigh
      (6L, addLine("new", 3L)),
      // transient: appeared and died inside the window
      (5L, addLine("blip", 9L)), (7L, removeLine("blip")),
      // restored: tombstoned at vLow, live at vHigh
      (1L, addLine("back", 4L)), (2L, removeLine("back")),
      (8L, addLine("back", 6L)),
      // still_dead: tombstoned at both endpoints
      (1L, addLine("rip", 2L)), (3L, removeLine("rip")),
      // beyond vHigh: must be invisible to the diff
      (99L, removeLine("same"))).toDF("version", "line")
    val got = graft.operators.DeltaReplay.diff(log, vLow = 4L, vHigh = 10L)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got("same") == (("unchanged", 5L, 5L)))
    assert(got("grew") == (("resized", 10L, 20L)))
    assert(got("dead") == (("removed", 7L, -1L)))
    assert(got("new") == (("added", -1L, 3L)))
    assert(got("blip") == (("transient", -1L, -1L)))
    assert(got("back") == (("restored", -1L, 6L)))
    assert(got("rip") == (("still_dead", -1L, -1L)))
  }

  test("a checkpoint-only tombstone stays dead through an empty-effect tail") {
    import spark.implicits._
    val ckpt = Seq(
      ("gone", false, None: Option[Long], 4L),
      ("kept", true, Some(7L): Option[Long], 3L)).toDF(
      "path", "is_add", "size", "version")
    val tail = Seq((6L, """{"commitInfo":{"operation":"WRITE"}}"""))
      .toDF("version", "line")
    val st = DeltaReplay.replayFromCheckpoint(ckpt, tail)
      .orderBy("path").collect()
    assert(st.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq(("gone", false), ("kept", true)))
  }

  test("tableInfo: last-writer-wins, version gate, and the no-metadata log") {
    import spark.implicits._
    val log = Seq(
      (0L, """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""),
      (0L, """{"metaData":{"id":"m1","schemaString":"{\"fields\":[{\"name\":\"a\"}]}","partitionColumns":["lang"]}}"""),
      (2L, """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}"""),
      (1L, """{"add":{"path":"p","size":1,"dataChange":true}}"""))
      .toDF("version", "line")
    val r = DeltaReplay.tableInfo(log).collect().head
    // the LATER protocol wins and gates the reader out honestly
    assert(r.getAs[Int]("min_reader") == 3)
    assert(!r.getAs[Boolean]("reader_supported"))
    assert(r.getAs[String]("meta_id") == "m1")
    assert(r.getAs[Int]("n_schema_fields") == 1)
    assert(r.getAs[Int]("n_part_cols") == 1)
    assert(r.getAs[String]("first_part_col") == "lang")
    // a log with neither action yields nulls, never a fabricated gate
    val bare = Seq((0L, """{"add":{"path":"p","size":1,"dataChange":true}}"""))
      .toDF("version", "line")
    val b = DeltaReplay.tableInfo(bare).collect().head
    assert(b.isNullAt(b.fieldIndex("min_reader")))
    assert(b.isNullAt(b.fieldIndex("reader_supported")))
    assert(b.isNullAt(b.fieldIndex("first_part_col")))
    // empty partitionColumns: get() nulls instead of ANSI-throwing
    val noPart = Seq(
      (0L, """{"metaData":{"id":"m2","schemaString":"{\"fields\":[]}","partitionColumns":[]}}"""))
      .toDF("version", "line")
    val np = DeltaReplay.tableInfo(noPart).collect().head
    assert(np.getAs[Int]("n_part_cols") == 0)
    assert(np.isNullAt(np.fieldIndex("first_part_col")))
  }
}
