package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.ParquetFooter

/** Parquet footer probe: the Thrift compact decode cross-checked
  * against Spark's own parquet writer (parquet-mr — a DIFFERENT
  * writer than the pyarrow files the oracle gate covers), plus the
  * hostile-byte sweep.
  */
class ParquetFooterSpec extends SparkTestBase {

  private def writeOne(df: org.apache.spark.sql.DataFrame): Array[Byte] = {
    val dir = Files.createTempDirectory("pqfooter").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    Files.readAllBytes(Paths.get(part.getPath))
  }

  test("round trip against Spark's writer: rows, schema, codec, stats") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong * 3, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
    val b = writeOne(df)
    val f = ParquetFooter.probe(b).get
    assert(f.numRows == 1000)
    assert(f.columnNames == Vector("id", "name", "grp"))
    assert(f.nRowGroups == 1)
    val chunks = f.firstGroupChunks
    assert(chunks.map(_.pathInSchema) == Vector("id", "name", "grp"))
    // Spark's default codec for this repo's sessions
    assert(chunks.forall(c => f.codecName(c.codec) == "SNAPPY"))
    assert(chunks.forall(_.numValues == 1000))
    assert(chunks.forall(_.nullCount == 0))
    // id stats: INT64 little-endian plain encoding
    val idChunk = chunks(0)
    assert(ParquetFooter.intStat(idChunk.statMin.get).contains(0L))
    assert(ParquetFooter.intStat(idChunk.statMax.get).contains(2997L))
    // grp is INT32: 4-byte stats decode via the same helper
    val grpChunk = chunks(2)
    assert(ParquetFooter.intStat(grpChunk.statMin.get).contains(0L))
    assert(ParquetFooter.intStat(grpChunk.statMax.get).contains(6L))
    assert(f.createdBy.contains("parquet-mr"))
  }

  test("multiple row groups are counted; first group's chunks returned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqfooter_rg").toString
    (0 until 5000).map(i => (i.toLong, i.toString)).toDF("k", "s")
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "4096") // tiny groups force several
      .parquet(dir)
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    val f = ParquetFooter.probe(Files.readAllBytes(Paths.get(part.getPath))).get
    assert(f.numRows == 5000)
    assert(f.nRowGroups > 1)
    assert(f.firstGroupChunks.map(_.pathInSchema) == Vector("k", "s"))
    assert(f.firstGroupChunks.head.numValues < 5000)
  }

  test("nulls land in the statistics null counts") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, null))
      .toDF("x", "y")
    val f = ParquetFooter.probe(writeOne(df)).get
    assert(f.numRows == 3)
    assert(f.firstGroupChunks(0).nullCount == 1)
    assert(f.firstGroupChunks(1).nullCount == 1)
  }

  test("hostile bytes: every malformation rejects, never throws") {
    import spark.implicits._
    val b = writeOne(Seq((1L, "z")).toDF("a", "b"))
    assert(ParquetFooter.probe(Array.emptyByteArray).isEmpty)
    assert(ParquetFooter.probe(b.take(11)).isEmpty)
    def mut(f: Array[Byte] => Unit) = { val c = b.clone(); f(c); ParquetFooter.probe(c) }
    assert(mut(_(0) = 'Q'.toByte).isEmpty) // leading magic
    assert(mut(c => c(c.length - 1) = 'Q'.toByte).isEmpty) // trailing magic
    // footer length overrunning the file
    assert(mut(c => c(c.length - 5) = 0x7f.toByte).isEmpty)
    // zero footer length
    assert(mut { c =>
      (1 to 8).take(4).foreach(i => c(c.length - 4 - i) = 0)
    }.isEmpty)
    // corrupt the thrift stream wholesale: every byte of the footer
    // region xored, probe must stay a clean None each time
    val n = b.length
    val flen = (b(n - 8) & 0xff) | ((b(n - 7) & 0xff) << 8) |
      ((b(n - 6) & 0xff) << 16) | ((b(n - 5) & 0xff) << 24)
    val start = n - 8 - flen
    (start until n - 8 by 7).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x55).toByte
      ParquetFooter.probe(c) // any result, but never a throw
    }
  }

  test("concurrent mixed synth writers keep their own encodings (the " +
    "shared DEFAULT_VALUES_WRITER_FACTORY race)") {
    // parquet-mr's default ValuesWriterFactory is a process-global
    // singleton that keeps the LAST writer's properties: before
    // ParquetSynth serialized writer lifecycles, 16 threads mixing BSS
    // and non-BSS writers lost BYTE_STREAM_SPLIT on ~1/3 of files
    // (q276 failed under ThroughputBench's concurrent streams).
    import graft.operators.ParquetSynth
    import graft.operators.ParquetSynth.{BssRow, CkptRow}
    val fails = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        (0 until 25).foreach { i =>
          if (i % 3 == 0) ParquetSynth.synthPaged(0L until 50L, 40)
          if (i % 5 == 0) ParquetSynth.synthCheckpoint(
            Seq(CkptRow("p", isAdd = true, Some(1L), 1L)), snappy = true)
          val rows = (0 until 40).map(j => BssRow(j.toLong,
            if (j == 2) None else Some(j * 0.25),
            if (j == 3) None else Some(j * 0.5f)))
          val f = ParquetFooter.probe(
            ParquetSynth.synthBss(rows, snappy = true)).get
          def enc(n: String) = f.firstGroupChunks
            .find(_.pathInSchema == n).get.encodings
          if (!enc("d").contains(9) || !enc("f").contains(9))
            fails.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(fails.get == 0)
  }

  test("synth writers survive an EXTERNAL ValuesWriterFactory thief " +
    "(Spark datasource writes in the same JVM)") {
    // writerLock serializes synths against each other, but Spark's own
    // parquet writes construct ParquetProperties too — re-initializing
    // the global singleton with THEIR encodings from executor threads the
    // lock can't see (r16: q276 failed under ThroughputBench once the
    // sim64-index write path landed). This thief loops the exact racing
    // call; the verify-and-rebuild in ParquetSynth must absorb it.
    import graft.operators.ParquetSynth
    import graft.operators.ParquetSynth.BssRow
    import org.apache.parquet.column.ParquetProperties
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val thief = new Thread(() => {
      while (!stop.get()) {
        ParquetProperties.builder()
          .withDictionaryEncoding(true)
          .withByteStreamSplitEncoding(false)
          .build() // initialize(thiefProps) on the global singleton
      }
    })
    thief.setDaemon(true)
    thief.start()
    try {
      val rows = (0 until 40).map(j => BssRow(j.toLong,
        if (j == 2) None else Some(j * 0.25),
        if (j == 3) None else Some(j * 0.5f)))
      (0 until 200).foreach { _ =>
        val f = ParquetFooter.probe(
          ParquetSynth.synthBss(rows, snappy = true)).get
        def enc(n: String) = f.firstGroupChunks
          .find(_.pathInSchema == n).get.encodings
        assert(enc("d").contains(9) && enc("f").contains(9))
        assert(!enc("id").contains(9))
      }
    } finally {
      stop.set(true)
      thief.join()
    }
  }

  test("pageIndex: exact page grid from withPageRowCountLimit, true stats") {
    import graft.operators.ParquetSynth
    // 100 sorted values, limit 40 -> pages of 40/40/20 at rows 0/40/80
    val sorted = (0L until 100L).map(_ * 3L)
    val b = ParquetSynth.synthPaged(sorted, pageRowLimit = 40)
    val pi = ParquetFooter.pageIndex(b, "val").get
    assert(pi.map(p => (p.page, p.firstRow, p.nRows)) ==
      Vector((0, 0L, 40L), (1, 40L, 40L), (2, 80L, 20L)))
    assert(pi.map(p => (p.min.get, p.max.get)) ==
      Vector((0L, 117L), (120L, 237L), (240L, 297L)))
    assert(pi.forall(p => !p.nullPage && p.nullCount == 0L))
    // UNSORTED values: ColumnIndex stats are true per-page min/max, not
    // the page's first/last values
    val shuffled = Seq(50L, 7L, 99L, 1L, 60L)
    val b2 = ParquetSynth.synthPaged(shuffled, pageRowLimit = 3)
    val pi2 = ParquetFooter.pageIndex(b2, "val").get
    assert(pi2.map(p => (p.firstRow, p.nRows, p.min.get, p.max.get)) ==
      Vector((0L, 3L, 7L, 99L), (3L, 2L, 1L, 60L)))
    // contract surface: unknown column, truncated file, hostile footer
    assert(ParquetFooter.pageIndex(b, "nope").isEmpty)
    assert(ParquetFooter.pageIndex(b.dropRight(9), "val").isEmpty)
    val n2 = b.length
    (0 until n2 by 11).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x55).toByte
      ParquetFooter.pageIndex(c, "val") // any result, never a throw
    }
  }
}
