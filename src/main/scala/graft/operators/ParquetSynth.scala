package graft.operators

import org.apache.parquet.column.ParquetProperties
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.{OutputFile, PositionOutputStream}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** In-memory parquet synthesis via the REAL parquet-mr writer (the
  * library Spark itself writes with) — the q261 protocol applied to
  * parquet: the reference implementation produces the bytes, the
  * hand-rolled reader ([[ParquetFooter]] + [[ParquetPages]]) decodes
  * them, and a closed-form oracle checks the values. Exists because
  * Spark's DataFrame writer exposes no BYTE_STREAM_SPLIT switch
  * (parquet-mr 1.16 has only the builder API
  * `withByteStreamSplitEncoding`), so exercising that encoding needs a
  * direct writer — and an in-memory [[OutputFile]] keeps the per-doc
  * synthesis off the filesystem.
  */
object ParquetSynth {

  /** Serializes every synth writer's WHOLE lifecycle (build → write →
    * close). parquet-mr's `ParquetProperties.Builder` defaults every
    * writer onto ONE process-global `DEFAULT_VALUES_WRITER_FACTORY`
    * singleton whose `initialize(props)` stores the LAST caller's
    * properties — two concurrent writers with different encoding
    * settings steal each other's (measured: 16 threads mixing
    * [[synthBss]] with [[synthPaged]]/[[synthCheckpoint]] lost
    * BYTE_STREAM_SPLIT on 1109/3200 files; surfaced as q276 failing
    * under ThroughputBench's 8 concurrent streams). The lock fixed the
    * synth-vs-synth race; [[withPrivateFactory]] (r16) removes the
    * global state entirely — but the lock stays: writer CONSTRUCTION
    * also serializes on parquet-mr's global codec/conf locks, the files
    * are in-memory and milliseconds each, so it costs noise.
    */
  private val writerLock = new Object

  /** Build-and-VERIFY backstop: [[withPrivateFactory]] makes encoding
    * theft structurally impossible on parquet 1.16; this wrapper turns
    * "impossible" into "loud" — every synth probes its own in-memory
    * footer, and an encoding that didn't engage (a parquet upgrade
    * moving the factory internals, a future builder path forgetting the
    * private factory) fails after bounded rebuilds instead of shipping a
    * file whose downstream closed-form oracle would mysteriously
    * mismatch. Before the private factory, a CONTINUOUS external thief
    * (any Spark datasource parquet write constructing
    * `ParquetProperties`) could beat all 16 rebuilds — measured by the
    * thief spec in `ParquetFooterSpec` — which is why retry alone was
    * not the fix.
    */
  private def verified(what: String)(ok: ParquetFooter.FooterInfo => Boolean)(
      mk: => Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 16) {
      val bytes = mk
      if (ParquetFooter.probe(bytes).exists(ok)) return bytes
      i += 1
    }
    sys.error(s"ParquetSynth: $what not achieved after 16 rebuilds " +
      "(global ValuesWriterFactory contention)")
  }

  private def noDictionary(f: ParquetFooter.FooterInfo): Boolean =
    f.firstGroupChunks.forall(c =>
      !c.encodings.contains(2) && !c.encodings.contains(8))

  /** Give a writer builder its OWN `DefaultV1ValuesWriterFactory` so its
    * encoding decisions never consult process-global state. The public
    * default chain is global twice over: `ParquetProperties.Builder`
    * defaults to the `DEFAULT_VALUES_WRITER_FACTORY` singleton, and even a
    * fresh `new DefaultValuesWriterFactory()` delegates to STATIC
    * `DEFAULT_V1/V2_WRITER_FACTORY` singletons — so any concurrent
    * `ParquetProperties` construction anywhere in the JVM (every Spark
    * datasource parquet write) re-initializes the state our column writers
    * read. `DefaultV1ValuesWriterFactory` itself keeps its props
    * per-instance and has a public constructor; `ParquetProperties.Builder
    * .withValuesWriterFactory` is public API — only the
    * `encodingPropsBuilder` hop inside `ParquetWriter.Builder` needs
    * reflection (no setter exposed; pinned to the bundled parquet 1.16).
    * All synth writers are PARQUET_1_0, matching the V1 factory.
    */
  private def withPrivateFactory[B <: org.apache.parquet.hadoop.ParquetWriter.Builder[_, _]](
      b: B): B = {
    val f = classOf[org.apache.parquet.hadoop.ParquetWriter.Builder[_, _]]
      .getDeclaredField("encodingPropsBuilder")
    f.setAccessible(true)
    f.get(b).asInstanceOf[ParquetProperties.Builder]
      .withValuesWriterFactory(
        new org.apache.parquet.column.values.factory.DefaultV1ValuesWriterFactory())
    b
  }

  /** A parquet OutputFile over a byte array — no filesystem. */
  private final class MemOutputFile extends OutputFile {
    val bos = new java.io.ByteArrayOutputStream()
    private def stream: PositionOutputStream = new PositionOutputStream {
      override def getPos: Long = bos.size().toLong
      override def write(b: Int): Unit = bos.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        bos.write(b, off, len)
    }
    override def create(blockSizeHint: Long): PositionOutputStream = stream
    override def createOrOverwrite(blockSizeHint: Long): PositionOutputStream = stream
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
  }

  /** One row of the BYTE_STREAM_SPLIT probe schema. */
  final case class BssRow(id: Long, d: Option[Double], f: Option[Float])

  private val BssSchema: MessageType = MessageTypeParser.parseMessageType(
    """message doc {
      |  required int64 id;
      |  optional double d;
      |  optional float f;
      |}""".stripMargin)

  /** Write `rows` as a real parquet file with BYTE_STREAM_SPLIT enabled
    * for the floating-point columns (dictionaries off so the encoding
    * actually engages; v1 pages; uncompressed or snappy).
    */
  def synthBss(rows: Seq[BssRow], snappy: Boolean): Array[Byte] =
    verified("BYTE_STREAM_SPLIT on d/f only") { f =>
      def enc(n: String) = f.firstGroupChunks.find(_.pathInSchema == n)
        .map(_.encodings).getOrElse(Vector.empty)
      noDictionary(f) && enc("d").contains(9) && enc("f").contains(9) &&
        !enc("id").contains(9)
    } (writerLock.synchronized {
    val out = new MemOutputFile
    val w = withPrivateFactory(ExampleParquetWriter.builder(out)
      .withType(BssSchema)
      .withDictionaryEncoding(false)
      .withByteStreamSplitEncoding(true)
      .withWriterVersion(ParquetProperties.WriterVersion.PARQUET_1_0)
      .withCompressionCodec(
        if (snappy) CompressionCodecName.SNAPPY
        else CompressionCodecName.UNCOMPRESSED))
      .build()
    try rows.foreach { r =>
      val g = new SimpleGroup(BssSchema)
      g.add("id", r.id)
      r.d.foreach(g.add("d", _))
      r.f.foreach(g.add("f", _))
      w.write(g)
    } finally w.close()
    out.bos.toByteArray
  })

  /** One row of a delta-style CHECKPOINT-STATE file: the per-path
    * last-writer-wins fold at the checkpoint version — a live add
    * (`isAdd = true`, size present) or a remove tombstone (`isAdd =
    * false`, size absent). The real Delta checkpoint nests these under
    * `add`/`remove` structs; this flattened single-row-per-path form
    * carries the same state (PROTOCOL.md's checkpoint is exactly the
    * replay fold materialized).
    */
  final case class CkptRow(path: String, isAdd: Boolean,
      size: Option[Long], version: Long)

  private val CkptSchema: MessageType = MessageTypeParser.parseMessageType(
    """message ckpt {
      |  required binary path (UTF8);
      |  required int64 is_add;
      |  optional int64 size;
      |  required int64 version;
      |}""".stripMargin)

  /** Write a checkpoint-state slice as a real parquet-mr file
    * (dictionaries off so the byte-level reader sees PLAIN pages; v1
    * pages; snappy optional). One call per PARTITION, never per row —
    * the q276 lesson: parquet-mr writer construction serializes on
    * global codec-pool/conf locks, so per-row writers invert
    * parallelism at 32 threads. Multi-part checkpoints are themselves
    * spec-real (`V.checkpoint.<part>.<of>.parquet`), so
    * partition-sliced checkpoint files mirror the wire layout.
    */
  def synthCheckpoint(rows: Seq[CkptRow], snappy: Boolean): Array[Byte] =
    verified("dictionary-free checkpoint pages")(noDictionary)(
      writerLock.synchronized {
    val out = new MemOutputFile
    val w = withPrivateFactory(ExampleParquetWriter.builder(out)
      .withType(CkptSchema)
      .withDictionaryEncoding(false)
      .withWriterVersion(ParquetProperties.WriterVersion.PARQUET_1_0)
      .withCompressionCodec(
        if (snappy) CompressionCodecName.SNAPPY
        else CompressionCodecName.UNCOMPRESSED))
      .build()
    try rows.foreach { r =>
      val g = new SimpleGroup(CkptSchema)
      g.add("path", r.path)
      g.add("is_add", if (r.isAdd) 1L else 0L)
      r.size.foreach(g.add("size", _))
      g.add("version", r.version)
      w.write(g)
    } finally w.close()
    out.bos.toByteArray
  })

  private val PagedSchema: MessageType = MessageTypeParser.parseMessageType(
    """message paged {
      |  required int64 val;
      |}""".stripMargin)

  /** Write a single required-INT64 column with an EXACT page row-count
    * limit: parquet-mr's `withPageRowCountLimit` flushes the page the
    * moment it holds `pageRowLimit` rows (the row-count check is
    * per-record, unlike the size check's sampling), so page p holds rows
    * [p·limit, (p+1)·limit) — the controlled layout the page-index
    * pruning probe's closed-form oracle depends on. Dictionaries off so
    * the data pages are PLAIN; uncompressed; v1 pages. The writer emits
    * the ColumnIndex/OffsetIndex structures this layout is read back
    * through ([[ParquetFooter.pageIndex]]).
    */
  def synthPaged(values: Seq[Long], pageRowLimit: Int): Array[Byte] =
    verified("dictionary-free PLAIN pages")(noDictionary)(
      writerLock.synchronized {
    val out = new MemOutputFile
    val w = withPrivateFactory(ExampleParquetWriter.builder(out)
      .withType(PagedSchema)
      .withDictionaryEncoding(false)
      .withPageRowCountLimit(pageRowLimit)
      // the writer's FIRST size check fires at minRowCountForPageSizeCheck
      // (default 100) regardless of the row-count limit — pin it to the
      // limit or files under 100 rows/page come back as one oversized page
      .withMinRowCountForPageSizeCheck(pageRowLimit)
      .withMaxRowCountForPageSizeCheck(pageRowLimit)
      .withWriterVersion(ParquetProperties.WriterVersion.PARQUET_1_0)
      .withCompressionCodec(CompressionCodecName.UNCOMPRESSED))
      .build()
    try values.foreach { v =>
      val g = new SimpleGroup(PagedSchema)
      g.add("val", v)
      w.write(g)
    } finally w.close()
    out.bos.toByteArray
  })
}
