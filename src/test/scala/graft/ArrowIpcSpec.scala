package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArrowIpc
import graft.operators.ArrowIpc.{ALong, AStr}

/** Arrow IPC file reader: the hand-rolled flatbuffers decode proven
  * against real files written by the Arrow Java library itself —
  * multiple batches, nulls, both int widths — plus the hostile sweep.
  */
class ArrowIpcSpec extends AnyFunSuite {

  import org.apache.arrow.memory.RootAllocator
  import org.apache.arrow.vector.{BigIntVector, IntVector, VarCharVector, VectorSchemaRoot}
  import org.apache.arrow.vector.ipc.ArrowFileWriter
  import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

  private def writeFile(batches: Seq[Seq[(Option[Long], Option[String], Option[Int])]]): Array[Byte] = {
    val alloc = new RootAllocator()
    val schema = new Schema(java.util.Arrays.asList(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("name", FieldType.nullable(new ArrowType.Utf8()), null),
      new Field("grp", FieldType.nullable(new ArrowType.Int(32, true)), null)))
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(out))
    w.start()
    batches.foreach { rows =>
      root.allocateNew()
      val idv = root.getVector("id").asInstanceOf[BigIntVector]
      val nv = root.getVector("name").asInstanceOf[VarCharVector]
      val gv = root.getVector("grp").asInstanceOf[IntVector]
      rows.zipWithIndex.foreach { case ((id, nm, g), i) =>
        id.fold(idv.setNull(i))(v => idv.setSafe(i, v))
        nm.fold(nv.setNull(i))(s => nv.setSafe(i, s.getBytes("UTF-8")))
        g.fold(gv.setNull(i))(v => gv.setSafe(i, v))
      }
      root.setRowCount(rows.length)
      w.writeBatch()
    }
    w.end(); w.close(); root.close(); alloc.close()
    out.toByteArray
  }

  test("decodes real Arrow Java files: batches, nulls, both int widths") {
    val b = writeFile(Seq(
      (0 until 50).map(i => (Some(i.toLong * 3), Some(s"s$i"), Some(i % 7))),
      Seq((None, Some("x"), Some(1)), (Some(99L), None, None))))
    val info = ArrowIpc.probe(b).get
    assert(info.fields.map(f => (f.name, f.ftype)) ==
      Vector(("id", "int64"), ("name", "utf8"), ("grp", "int32")))
    assert(info.nBatches == 2 && info.batchRows == Vector(50L, 2L))
    assert(info.nRows == 52)
    val ids = info.columns(0)
    assert(ids.take(50).flatten == (0 until 50).map(i => ALong(i.toLong * 3)))
    assert(ids(50).isEmpty && ids(51).contains(ALong(99L)))
    val names = info.columns(1)
    assert(names(0).contains(AStr("s0")) && names(49).contains(AStr("s49")))
    assert(names(50).contains(AStr("x")) && names(51).isEmpty)
    val grps = info.columns(2)
    assert(grps(3).contains(ALong(3L)) && grps(51).isEmpty)
  }

  test("compressed bodies decode: LZ4_FRAME and ZSTD, real-library written") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.compression.CompressionUtil
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.ipc.message.IpcOption
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    def writeCompressed(codec: CompressionUtil.CodecType): Array[Byte] = {
      val alloc = new RootAllocator()
      val schema = new Schema(java.util.Arrays.asList(
        new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
        new Field("txt", FieldType.nullable(new ArrowType.Utf8()), null)))
      val root = VectorSchemaRoot.create(schema, alloc)
      val out = new java.io.ByteArrayOutputStream()
      val w = new ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(out),
        new java.util.HashMap[String, String](), IpcOption.DEFAULT,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE,
        codec)
      w.start()
      root.allocateNew()
      val idv = root.getVector("id").asInstanceOf[BigIntVector]
      val tv = root.getVector("txt").asInstanceOf[VarCharVector]
      (0 until 500).foreach { i =>
        if (i == 7) idv.setNull(i) else idv.setSafe(i, i.toLong * 11)
        tv.setSafe(i, s"repetitive text $i".getBytes("UTF-8"))
      }
      root.setRowCount(500)
      w.writeBatch()
      w.end(); w.close(); root.close(); alloc.close()
      out.toByteArray
    }
    for (codec <- Seq(CompressionUtil.CodecType.LZ4_FRAME,
      CompressionUtil.CodecType.ZSTD)) {
      val b = writeCompressed(codec)
      val info = ArrowIpc.probe(b).get
      assert(info.nRows == 500, codec.toString)
      val ids = info.columns(0)
      assert(ids(7).isEmpty)
      assert(ids(499).contains(ALong(499L * 11)))
      val txts = info.columns(1).flatten.collect { case AStr(s) => s }
      assert(txts == (0 until 500).map(i => s"repetitive text $i").toVector,
        codec.toString)
    }
  }

  test("dictionary-encoded columns decode: real Arrow Java provider, " +
    "indices resolve through the delivered dictionary") {
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryEncoder, DictionaryProvider}
    import org.apache.arrow.vector.types.pojo.DictionaryEncoding
    val alloc = new RootAllocator()
    val out = new java.io.ByteArrayOutputStream()
    try {
      // dictionary: 3 distinct strings under id 7, int32 indices
      val dictVec = new VarCharVector("dictvals", alloc)
      dictVec.allocateNew()
      Seq("red", "green", "blue").zipWithIndex.foreach { case (s, i) =>
        dictVec.setSafe(i, s.getBytes("UTF-8"))
      }
      dictVec.setValueCount(3)
      val encoding = new DictionaryEncoding(7L, false,
        new ArrowType.Int(32, true))
      val dict = new Dictionary(dictVec, encoding)
      val provider = new DictionaryProvider.MapDictionaryProvider(dict)
      // raw column with a null, then dictionary-encode it
      val raw = new VarCharVector("color", alloc)
      raw.allocateNew()
      val colors = Seq(Some("blue"), Some("red"), None, Some("red"),
        Some("green"), Some("blue"))
      colors.zipWithIndex.foreach {
        case (Some(s), i) => raw.setSafe(i, s.getBytes("UTF-8"))
        case (None, i) => raw.setNull(i)
      }
      raw.setValueCount(colors.length)
      val encoded = DictionaryEncoder.encode(raw, dict)
      val idv = new BigIntVector("id", alloc)
      idv.allocateNew()
      colors.indices.foreach(i => idv.setSafe(i, i.toLong * 11))
      idv.setValueCount(colors.length)
      val root = new VectorSchemaRoot(
        java.util.Arrays.asList(idv.getField, encoded.getField),
        java.util.Arrays.asList(idv,
          encoded.asInstanceOf[org.apache.arrow.vector.FieldVector]))
      root.setRowCount(colors.length)
      val w = new ArrowFileWriter(root, provider,
        java.nio.channels.Channels.newChannel(out))
      w.start(); w.writeBatch(); w.end(); w.close()
      root.close(); raw.close(); dictVec.close()
    } finally alloc.close()
    val b = out.toByteArray
    val info = ArrowIpc.probe(b).get
    assert(info.fields.map(f => (f.name, f.ftype, f.dict)) ==
      Vector(("id", "int64", false), ("color", "utf8", true)))
    assert(info.nRows == 6)
    assert(info.columns(0).flatten == (0 until 6).map(i => ALong(i.toLong * 11)))
    assert(info.columns(1) == Vector(Some(AStr("blue")), Some(AStr("red")),
      None, Some(AStr("red")), Some(AStr("green")), Some(AStr("blue"))))
    // hostile sweep over the dictionary region too: never a throw
    b.indices.by(7).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x2a).toByte
      ArrowIpc.probe(c)
    }
  }

  test("a batch declaring nulls without a validity bitmap rejects") {
    // byte surgery on a real-library file: zero the id column's validity
    // BUFFER LENGTH while its FieldNode still declares nullCount=1 — a
    // malformed batch that must reject, not decode with fabricated
    // non-null values where the writer planted a null
    val b = writeFile(Seq(Seq(
      (Some(10L), Some("a"), Some(1)),
      (None, Some("b"), Some(2)),
      (Some(30L), Some("c"), Some(3)),
      (Some(40L), Some("d"), Some(4)),
      (Some(50L), Some("e"), Some(5)))))
    assert(ArrowIpc.probe(b).isDefined)
    def le32(a: Array[Byte], o: Int): Long =
      (a(o) & 0xffL) | ((a(o + 1) & 0xffL) << 8) |
        ((a(o + 2) & 0xffL) << 16) | ((a(o + 3) & 0xffL) << 24)
    def le64(a: Array[Byte], o: Int): Long =
      le32(a, o) | (le32(a, o + 4) << 32)
    // locate the record batch's Buffers flatbuffer vector: element count 7
    // (id 2 + name 3 + grp 2), first entry = id validity (offset 0, a
    // small unpadded length)
    var at = -1
    var i = 0
    while (at < 0 && i + 20 <= b.length) {
      if (le32(b, i) == 7 && le64(b, i + 4) == 0L) {
        val len = le64(b, i + 12)
        if (len >= 1 && len <= 8) at = i
      }
      i += 1
    }
    assert(at > 0, "buffers vector not located in the message metadata")
    val c = b.clone()
    (0 until 8).foreach(j => c(at + 12 + j) = 0)
    assert(ArrowIpc.probe(c).isEmpty,
      "declared nulls with an empty validity buffer must reject")
  }

  test("an empty batch list and non-arrow bytes reject") {
    assert(ArrowIpc.probe(Array.emptyByteArray).isEmpty)
    assert(ArrowIpc.probe("PAR1not arrow at all PAR1".getBytes).isEmpty)
  }

  test("hostile bytes: corruption rejects or decodes cleanly, never throws") {
    val b = writeFile(Seq(Seq((Some(1L), Some("a"), Some(2)))))
    assert(ArrowIpc.probe(b).isDefined)
    assert(ArrowIpc.probe(b.dropRight(3)).isEmpty) // truncated magic
    def mut(i: Int, x: Int): Option[ArrowIpc.ArrowInfo] = {
      val c = b.clone(); c(i) = (c(i) ^ x).toByte; ArrowIpc.probe(c)
    }
    assert(mut(0, 0x01).isEmpty) // leading magic
    // footer length overrun
    assert(mut(b.length - 9, 0x7f).isEmpty)
    // sweep the whole footer + tail region
    ((b.length - 200).max(0) until b.length).foreach { i =>
      mut(i, 0x2a) // any Option, never a throw
    }
    // sweep the header/message region too
    (0 until 120.min(b.length)).foreach { i =>
      mut(i, 0x15)
    }
  }
}
