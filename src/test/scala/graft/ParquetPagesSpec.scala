package graft

import java.nio.file.{Files, Paths}

import graft.operators.{ParquetFooter, ParquetPages}
import graft.operators.ParquetPages.{PBin, PLong}

/** Parquet data-page decode: the pure-JVM value read path checked
  * against TWO real writers — the pyarrow-written testdata lake files
  * and Spark's parquet-mr output — across snappy/uncompressed codecs
  * and dictionary/plain encodings, plus the hostile sweep.
  */
class ParquetPagesSpec extends SparkTestBase {

  private def chunk(b: Array[Byte], col: String) =
    ParquetFooter.probe(b).get.firstGroupChunks.find(_.pathInSchema == col).get

  test("decodes the real pyarrow lake file value for value") {
    val b = Files.readAllBytes(
      Paths.get("/root/testdata/sf0.001/documents.parquet"))
    val ids = ParquetPages.readColumn(b, chunk(b, "doc_id")).get
    assert(ids.length == 500)
    assert(ids.flatten.collect { case PLong(v) => v } == (0L until 500L).toVector)
    val langs = ParquetPages.readColumn(b, chunk(b, "lang")).get
      .flatten.collect { case p: PBin => p.str }
    // cross-check against the engine's own scan of the same file
    val want = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("lang").collect().map(_.getString(0)).toVector
    assert(langs == want)
    val nchars = ParquetPages.readColumn(b, chunk(b, "n_chars")).get
      .flatten.collect { case PLong(v) => v }
    val wantN = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).toVector
    assert(nchars == wantN)
  }

  private def writeOne(df: org.apache.spark.sql.DataFrame,
      opts: Map[String, String] = Map.empty): Array[Byte] = {
    val dir = Files.createTempDirectory("pqpages").toString
    var w = df.coalesce(1).write.mode("overwrite")
    opts.foreach { case (k, v) => w = w.option(k, v) }
    w.parquet(dir)
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    Files.readAllBytes(Paths.get(part.getPath))
  }

  test("decodes Spark's writer: dictionary pages, snappy, nulls") {
    import spark.implicits._
    val df = (0 until 300).map(i =>
      (if (i % 7 == 0) None else Some(i.toLong * 3), s"w${i % 5}"))
      .toDF("x", "w")
    val b = writeOne(df)
    val xs = ParquetPages.readColumn(b, chunk(b, "x")).get
    assert(xs.length == 300)
    (0 until 300).foreach { i =>
      if (i % 7 == 0) assert(xs(i).isEmpty)
      else assert(xs(i).contains(PLong(i.toLong * 3)))
    }
    // the low-cardinality string column is dictionary-encoded: 5 values
    val ws = ParquetPages.readColumn(b, chunk(b, "w")).get
      .flatten.collect { case p: PBin => p.str }
    assert(ws == (0 until 300).map(i => s"w${i % 5}").toVector)
  }

  test("decodes PLAIN uncompressed pages (dictionary disabled)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"str_$i")).toDF("a", "s")
    val b = writeOne(df, Map(
      "compression" -> "none", "parquet.enable.dictionary" -> "false"))
    val f = ParquetFooter.probe(b).get
    assert(f.firstGroupChunks.forall(c => f.codecName(c.codec) == "UNCOMPRESSED"))
    val as = ParquetPages.readColumn(b, chunk(b, "a")).get
      .flatten.collect { case PLong(v) => v }
    assert(as == (0L until 100L).toVector)
    val ss = ParquetPages.readColumn(b, chunk(b, "s")).get
      .flatten.collect { case p: PBin => p.str }
    assert(ss == (0 until 100).map(i => s"str_$i").toVector)
  }

  test("v2 data pages decode: DELTA_BINARY_PACKED ints, DELTA_BYTE_ARRAY strings") {
    import spark.implicits._
    // dictionary off forces the v2 writer onto the DELTA encodings
    val df = (0 until 700).map(i =>
      (if (i % 11 == 3) None else Some(i.toLong * 7 - 2000),
        s"prefix_shared_$i", i % 13)).toDF("x", "s", "g")
    val b = writeOne(df, Map(
      "parquet.writer.version" -> "v2",
      "parquet.enable.dictionary" -> "false"))
    val xs = ParquetPages.readColumn(b, chunk(b, "x")).get
    assert(xs.length == 700)
    (0 until 700).foreach { i =>
      if (i % 11 == 3) assert(xs(i).isEmpty, s"row $i")
      else assert(xs(i).contains(PLong(i.toLong * 7 - 2000)), s"row $i")
    }
    // front-coded strings share the long prefix
    val ss = ParquetPages.readColumn(b, chunk(b, "s")).get
      .flatten.collect { case p: PBin => p.str }
    assert(ss == (0 until 700).map(i => s"prefix_shared_$i").toVector)
    // int32 column under DELTA too
    val gs = ParquetPages.readColumn(b, chunk(b, "g")).get
      .flatten.collect { case PLong(v) => v }
    assert(gs == (0 until 700).map(i => (i % 13).toLong).toVector)
  }

  test("v2 pages with dictionaries still decode (RLE_DICTIONARY under v2)") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, s"w${i % 6}")).toDF("a", "w")
    val b = writeOne(df, Map("parquet.writer.version" -> "v2"))
    val ws = ParquetPages.readColumn(b, chunk(b, "w")).get
      .flatten.collect { case p: PBin => p.str }
    assert(ws == (0 until 400).map(i => s"w${i % 6}").toVector)
    val as = ParquetPages.readColumn(b, chunk(b, "a")).get
      .flatten.collect { case PLong(v) => v }
    assert(as == (0L until 400L).toVector)
  }

  test("BYTE_STREAM_SPLIT float/double pages decode value for value " +
    "(real parquet-mr writer, both codecs)") {
    import graft.operators.ParquetSynth
    import graft.operators.ParquetSynth.BssRow
    import graft.operators.ParquetPages.PDouble
    val rows = (0 until 200).map { i =>
      BssRow(i.toLong * 7,
        if (i % 5 == 0) None else Some(i * 0.25),
        if (i % 6 == 0) None else Some(i * 0.5f))
    }
    Seq(false, true).foreach { snappy =>
      val b = ParquetSynth.synthBss(rows, snappy)
      val f = ParquetFooter.probe(b).get
      // the encoding must actually be BYTE_STREAM_SPLIT (enum 9) on the
      // float columns — a silent PLAIN fallback would void the test
      assert(chunk(b, "d").encodings.contains(9), chunk(b, "d").encodings)
      assert(chunk(b, "f").encodings.contains(9))
      assert(!chunk(b, "id").encodings.contains(9))
      assert(f.numRows == 200)
      val ids = ParquetPages.readColumn(b, chunk(b, "id")).get
        .flatten.collect { case PLong(v) => v }
      assert(ids == (0 until 200).map(_.toLong * 7).toVector)
      val ds = ParquetPages.readColumn(b, chunk(b, "d")).get
      val fs = ParquetPages.readColumn(b, chunk(b, "f")).get
      (0 until 200).foreach { i =>
        if (i % 5 == 0) assert(ds(i).isEmpty)
        else assert(ds(i).contains(PDouble(i * 0.25)), s"d at $i: ${ds(i)}")
        if (i % 6 == 0) assert(fs(i).isEmpty)
        else assert(fs(i).contains(PDouble((i * 0.5f).toDouble)))
      }
    }
  }

  test("hostile bytes: page-region corruption rejects or decodes, never throws") {
    import spark.implicits._
    val b = writeOne(Seq((1L, "x"), (2L, "y")).toDF("a", "s"))
    val c = chunk(b, "a")
    // walk the whole chunk span, flipping bytes
    val from = c.dictPageOffset.getOrElse(c.dataPageOffset).toInt
    val until = (c.dataPageOffset + c.compressedBytes).toInt min b.length
    (from until until).foreach { i =>
      val m = b.clone(); m(i) = (m(i) ^ 0x5a).toByte
      ParquetPages.readColumn(m, c) // any Option, never a throw
    }
    // a chunk pointing past the file rejects cleanly
    assert(ParquetPages.readColumn(b,
      c.copy(dataPageOffset = b.length.toLong + 10)).isEmpty)
    assert(ParquetPages.readColumn(Array.emptyByteArray, c).isEmpty)
  }
}
