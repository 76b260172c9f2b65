package graft.operators

import scala.util.control.NonFatal

/** ARROW IPC FILE reader — the in-memory-analytics interchange format
  * (the public Arrow columnar spec: File.fbs / Message.fbs /
  * Schema.fbs), decoded with a hand-rolled FLATBUFFERS reader: vtable
  * field resolution (soffset to the vtable, u16 slot table, absent
  * fields = 0), relative u32 offsets to tables/strings/vectors,
  * INLINE struct vectors (Block 24 bytes, FieldNode/Buffer 16), and
  * the union tag+value pairing for Message headers and Field types.
  * Spark ships the Arrow JARS but no Arrow file SOURCE — this reader
  * is the missing scan half, and the spec/query prove it against real
  * files written by the Arrow Java library itself.
  *
  * Layout walked: `ARROW1\0\0` magic, encapsulated messages
  * (0xFFFFFFFF continuation, u32 metadata length, Message
  * flatbuffer, 8-aligned body), the Footer flatbuffer at the tail
  * (schema + record-batch Blocks) framed by its u32 length and the
  * closing `ARROW1`. Record batches decode flat Int(64/32)
  * and Utf8 columns — validity bitmaps (LSB bit order) honored per
  * FieldNode null counts, utf8 via the i32 offsets buffer.
  *
  * Scope: flat schemas of signed Int and Utf8 fields; record-batch
  * bodies decode UNCOMPRESSED and under both spec codecs — LZ4_FRAME
  * (commons-compress) and ZSTD (zstd-jni), each buffer's 8-byte
  * uncompressed-length prefix honored incl. the -1 stored-raw escape.
  * DICTIONARY-encoded fields decode (round 11): the footer's
  * dictionaries vector is walked, each DictionaryBatch's values column
  * decodes under the field's VALUE type, and record batches store
  * indices (the declared index type, default int32) resolved through
  * the id → values map — out-of-range indices, delta dictionaries,
  * replacements, and an undelivered dictionary all decline. Nested
  * types remain explicit declines. Hostile-byte posture: [[probe]]
  * never throws — bad magic, a footer overrunning the file,
  * vtable/offset malformations, a non-RecordBatch block, or buffers
  * overrunning the body all yield None.
  */
object ArrowIpc {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  // ---------------- minimal flatbuffers reader ----------------

  private final class Flat(b: Array[Byte]) {
    def u8(p: Int): Int = { if (p < 0 || p >= b.length) fail(); b(p) & 0xff }
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def i32(p: Int): Int =
      u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)
    def i64(p: Int): Long =
      (i32(p) & 0xffffffffL) | (i32(p + 4).toLong << 32)

    final case class Tab(pos: Int) {
      private val vt = pos - i32(pos) // soffset is signed
      private val vtSize = u16(vt)
      def fieldOff(id: Int): Int = {
        val slot = 4 + 2 * id
        if (slot + 1 >= vtSize) 0 else u16(vt + slot)
      }
      def i8f(id: Int, dflt: Int): Int = {
        val o = fieldOff(id); if (o == 0) dflt else u8(pos + o)
      }
      def i32f(id: Int, dflt: Int): Int = {
        val o = fieldOff(id); if (o == 0) dflt else i32(pos + o)
      }
      def i64f(id: Int, dflt: Long): Long = {
        val o = fieldOff(id); if (o == 0) dflt else i64(pos + o)
      }
      def boolf(id: Int, dflt: Boolean): Boolean = {
        val o = fieldOff(id); if (o == 0) dflt else u8(pos + o) != 0
      }
      def table(id: Int): Option[Tab] = {
        val o = fieldOff(id)
        if (o == 0) None else Some(Tab(pos + o + i32(pos + o)))
      }
      def string(id: Int): Option[String] = {
        val o = fieldOff(id)
        if (o == 0) None
        else {
          val sp = pos + o + i32(pos + o)
          val len = i32(sp)
          if (len < 0 || sp + 4 + len > b.length) fail()
          Some(new String(b, sp + 4, len, "UTF-8"))
        }
      }
      /** (element count, first element position) of a vector field. */
      def vector(id: Int): Option[(Int, Int)] = {
        val o = fieldOff(id)
        if (o == 0) None
        else {
          val vp = pos + o + i32(pos + o)
          val len = i32(vp)
          if (len < 0) fail()
          Some((len, vp + 4))
        }
      }
      /** Table-vector element i (u32 offsets). */
      def tableAt(vecPos: Int, i: Int): Tab = {
        val ep = vecPos + 4 * i
        Tab(ep + i32(ep))
      }
    }

    def root(from: Int): Tab = Tab(from + i32(from))
  }

  // ---------------- Arrow mapping ----------------

  sealed trait AValue
  final case class ALong(v: Long) extends AValue
  final case class AStr(v: String) extends AValue

  /** `dict` marks a dictionary-encoded field: `ftype` is the VALUE type
    * (what [[ArrowInfo.columns]] carries after index resolution); the
    * batch itself stores indices of the field's declared index type.
    */
  final case class ArrowField(name: String, ftype: String, nullable: Boolean,
      dict: Boolean = false)

  /** Decoded file: schema fields, per-batch row counts, and the
    * columns concatenated across batches (None = null slot).
    */
  final case class ArrowInfo(fields: Vector[ArrowField],
      batchRows: Vector[Long], columns: Vector[Vector[Option[AValue]]]) {
    def nBatches: Int = batchRows.length
    def nRows: Long = batchRows.sum
  }

  def probe(b: Array[Byte]): Option[ArrowInfo] =
    try {
      val magic = "ARROW1".getBytes("US-ASCII")
      if (b.length < 8 + 10 + 6) return None
      if (!magic.indices.forall(i => b(i) == magic(i))) return None
      if (!magic.indices.forall(i => b(b.length - 6 + i) == magic(i))) return None
      val f = new Flat(b)
      val footerLen = f.i32(b.length - 10)
      if (footerLen <= 0 || footerLen > b.length - 18) return None
      val footer = f.root(b.length - 10 - footerLen)
      // Footer: version(0), schema(1), dictionaries(2), recordBatches(3)
      val schema = footer.table(1).getOrElse(return None)
      val fieldsVec = schema.vector(1).getOrElse(return None)
      // per field: (public field, STORAGE type in the batch, dictionary id)
      val fieldInfo = (0 until fieldsVec._1).map { i =>
        val ft = schema.tableAt(fieldsVec._2, i)
        val name = ft.string(0).getOrElse(return None)
        val nullable = ft.boolf(1, dflt = false)
        // Field: type_type(2) union tag, type(3), dictionary(4),
        // children(5); Int=2, Utf8=5
        val tag = ft.i8f(2, 0)
        if (ft.vector(5).exists(_._1 > 0)) return None // nested children
        val vtype = tag match {
          case 2 =>
            val it = ft.table(3).getOrElse(return None)
            val bits = it.i32f(0, 0)
            val signed = it.boolf(1, dflt = false)
            if (!signed || (bits != 64 && bits != 32)) return None
            s"int$bits"
          case 5 => "utf8"
          case _ => return None // other types: out of scope
        }
        // DictionaryEncoding: id(0), indexType(1), isOrdered(2)
        ft.table(4) match {
          case Some(dt) =>
            val storage = dt.table(1) match {
              case Some(it) =>
                val bits = it.i32f(0, 0)
                val signed = it.boolf(1, dflt = false)
                if (!signed || (bits != 64 && bits != 32)) return None
                s"int$bits"
              case None => "int32" // the spec's default index type
            }
            (ArrowField(name, vtype, nullable, dict = true), storage,
              Some(dt.i64f(0, 0L)))
          case None => (ArrowField(name, vtype, nullable), vtype, None)
        }
      }.toVector
      val fields = fieldInfo.map(_._1)
      if (fields.isEmpty) return None
      // dictionary id -> VALUE type; two fields sharing an id must agree
      val dictType = scala.collection.mutable.Map.empty[Long, String]
      fieldInfo.foreach {
        case (fd, _, Some(id)) =>
          dictType.get(id) match {
            case Some(t) if t != fd.ftype => return None
            case _ => dictType(id) = fd.ftype
          }
        case _ => ()
      }

      // ---- encapsulated message block at a footer Block struct ----
      // Block: offset@0 i64, metaDataLength@8 i32, bodyLength@16 i64;
      // at offset: optional 0xFFFFFFFF continuation, u32 metadata length,
      // Message flatbuffer, 8-aligned body of bodyLength bytes
      def readBlockMsg(bp: Int): (f.Tab, Long) = {
        val off = f.i64(bp)
        val bodyLen = f.i64(bp + 16)
        if (off < 0 || off + 8 > b.length) fail()
        var mp = off.toInt
        if (f.i32(mp) == -1) mp += 4
        val msgLen = f.i32(mp)
        if (msgLen <= 0 || mp + 4 + msgLen > b.length) fail()
        val msg = f.root(mp + 4)
        val bodyStart = off + (if (f.i32(off.toInt) == -1) 8 else 4) + msgLen
        val bodyAligned = ((bodyStart + 7) / 8) * 8
        if (bodyAligned + bodyLen > b.length) fail()
        (msg, bodyAligned)
      }

      // ---- one RecordBatch table decoded under STORAGE types ----
      def decodeBatch(rb: f.Tab, bodyAligned: Long,
          storages: Vector[String]): (Long, Vector[Vector[Option[AValue]]]) = {
        // RecordBatch: length(0), nodes(1), buffers(2), compression(3)
        // BodyCompression: codec(0) i8 (0 = LZ4_FRAME, 1 = ZSTD),
        // method(1) must be BUFFER — each non-empty buffer then carries
        // an 8-byte LE uncompressed length (-1 = stored raw)
        val compression: Option[Int] = rb.table(3).map { bc =>
          if (bc.i8f(1, 0) != 0) fail() // non-BUFFER method
          bc.i8f(0, 0)
        }
        val nRows = rb.i64f(0, -1L)
        if (nRows < 0) fail()
        val nodes = rb.vector(1).getOrElse(fail())
        val buffers = rb.vector(2).getOrElse(fail())
        if (nodes._1 != storages.length) fail()
        var bufIdx = 0
        def nextBuf(): Array[Byte] = {
          if (bufIdx >= buffers._1) fail()
          val bp = buffers._2 + 16 * bufIdx
          bufIdx += 1
          val bOff = f.i64(bp)
          val bLen = f.i64(bp + 8)
          if (bLen == 0) return Array.emptyByteArray
          val from = bodyAligned + bOff
          if (bOff < 0 || bLen < 0 || from + bLen > b.length) fail()
          compression match {
            case None =>
              java.util.Arrays.copyOfRange(b, from.toInt, (from + bLen).toInt)
            case Some(codec) =>
              if (bLen < 8) fail()
              var ulen = 0L
              (0 until 8).foreach(i =>
                ulen |= (b(from.toInt + i) & 0xffL) << (8 * i))
              val body = java.util.Arrays.copyOfRange(b, from.toInt + 8,
                (from + bLen).toInt)
              if (ulen == -1L) body
              else if (ulen < 0 || ulen > (64L << 20)) fail() // bomb guard
              else codec match {
                case 0 => // LZ4 frame (commons-compress, shipped w/ Spark)
                  val in = new org.apache.commons.compress.compressors.lz4
                    .FramedLZ4CompressorInputStream(
                      new java.io.ByteArrayInputStream(body))
                  try {
                    val out = new java.io.ByteArrayOutputStream(ulen.toInt)
                    val tmp = new Array[Byte](8192)
                    var n2 = in.read(tmp)
                    while (n2 >= 0) {
                      out.write(tmp, 0, n2)
                      if (out.size() > ulen) fail()
                      n2 = in.read(tmp)
                    }
                    if (out.size() != ulen) fail()
                    out.toByteArray
                  } finally in.close()
                case 1 => // ZSTD (zstd-jni, shipped w/ Spark)
                  val out = com.github.luben.zstd.Zstd.decompress(body,
                    ulen.toInt)
                  if (out.length != ulen) fail()
                  out
                case _ => fail() // unknown codec
              }
          }
        }
        val cols = storages.zipWithIndex.map { case (st, ci) =>
          val np = nodes._2 + 16 * ci
          val nodeLen = f.i64(np)
          val nullCount = f.i64(np + 8)
          if (nodeLen != nRows) fail()
          val validity = nextBuf()
          // a batch DECLARING nulls must carry a full validity bitmap:
          // an empty/short buffer with nullCount > 0 is malformed, and
          // treating it as all-present would fabricate values where the
          // writer planted nulls — hostile bytes decline, never invent
          if (nullCount > 0 && validity.length < (nRows + 7) / 8) fail()
          def bit(i: Int): Boolean = {
            if (i / 8 >= validity.length) fail()
            ((validity(i / 8) >> (i % 8)) & 1) == 1
          }
          def isSet(i: Int): Boolean =
            nullCount == 0 || validity.isEmpty || bit(i)
          def le32(a: Array[Byte], o: Int): Int = {
            if (o < 0 || o + 4 > a.length) fail()
            (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
              ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
          }
          val out = Vector.newBuilder[Option[AValue]]
          st match {
            case "utf8" =>
              val offsets = nextBuf()
              val data = nextBuf()
              if (offsets.length < 4 * (nRows + 1) && nRows > 0) fail()
              (0 until nRows.toInt).foreach { i =>
                if (isSet(i)) {
                  val s = le32(offsets, 4 * i)
                  val e = le32(offsets, 4 * (i + 1))
                  if (s < 0 || e < s || e > data.length) fail()
                  out += Some(AStr(new String(data, s, e - s, "UTF-8")))
                } else out += None
              }
            case t =>
              val data = nextBuf()
              val w = if (t == "int64") 8 else 4
              (0 until nRows.toInt).foreach { i =>
                if (isSet(i)) {
                  val o = w * i
                  if (o + w > data.length) fail()
                  var v = 0L
                  (0 until w).foreach(k => v |= (data(o + k) & 0xffL) << (8 * k))
                  if (w == 4) v = v.toInt.toLong // sign-extend int32
                  out += Some(ALong(v))
                } else out += None
              }
          }
          out.result()
        }
        (nRows, cols)
      }

      // ---- dictionary batches (footer dictionaries vector) ----
      val dictVals = scala.collection.mutable.Map.empty[Long, Vector[Option[AValue]]]
      footer.vector(2).foreach { case (nd, pos) =>
        (0 until nd).foreach { di =>
          val (msg, bodyAligned) = readBlockMsg(pos + 24 * di)
          // Message: version(0), header_type(1), header(2); 2 = DictionaryBatch
          if (msg.i8f(1, 0) != 2) return None
          val db = msg.table(2).getOrElse(return None)
          // DictionaryBatch: id(0), data(1) RecordBatch, isDelta(2)
          val id = db.i64f(0, 0L)
          if (db.boolf(2, dflt = false)) return None // delta dicts: declines
          if (dictVals.contains(id)) return None // replacements: declines
          val vt = dictType.getOrElse(id, return None) // unreferenced id
          val rb = db.table(1).getOrElse(return None)
          dictVals(id) = decodeBatch(rb, bodyAligned, Vector(vt))._2(0)
        }
      }
      // a dict-encoded field with no delivered dictionary cannot decode
      if (!dictType.keySet.subsetOf(dictVals.keySet)) return None

      // ---- record batches ----
      val storages = fieldInfo.map(_._2)
      val batchesVec = footer.vector(3).getOrElse(return None)
      val batchRows = Vector.newBuilder[Long]
      val cols = Array.fill(fields.length)(
        Vector.newBuilder[Option[AValue]])
      (0 until batchesVec._1).foreach { bi =>
        val (msg, bodyAligned) = readBlockMsg(batchesVec._2 + 24 * bi)
        if (msg.i8f(1, 0) != 3) return None // must be a RecordBatch
        val rb = msg.table(2).getOrElse(return None)
        val (nRows, raw) = decodeBatch(rb, bodyAligned, storages)
        fieldInfo.zipWithIndex.foreach { case ((_, _, dictId), ci) =>
          val resolved = dictId match {
            case None => raw(ci)
            case Some(id) =>
              val dv = dictVals(id)
              raw(ci).map {
                case None => None
                case Some(ALong(ix)) =>
                  if (ix < 0 || ix >= dv.length) return None // index range
                  dv(ix.toInt)
                case _ => return None
              }
          }
          cols(ci) ++= resolved
        }
        batchRows += nRows
      }
      Some(ArrowInfo(fields, batchRows.result(),
        cols.map(_.result()).toVector))
    } catch { case NonFatal(_) => None }
}
