package graft.operators

import scala.util.control.NonFatal

/** PUFFIN — Iceberg's statistics-and-deletion-vector container (the
  * public puffin-spec at iceberg.apache.org; v3 deletion vectors and
  * theta sketches ship in these files): `PFA1` magic, raw blob bytes
  * back to back, then a footer = magic | JSON payload (optionally
  * LZ4-frame compressed — the spec's footer codec) | payload size
  * (i32 LE) | 4 flag bytes (byte 0 bit 0 = payload compressed) |
  * magic. Blob boundaries live ONLY in the footer JSON
  * (`blobs`: type/fields/snapshot-id/sequence-number/offset/length) —
  * a reader seeks the footer, then fetches exactly the blobs it wants,
  * which is why a 100 TB table's stats stay one ranged GET per sketch.
  *
  * Writer builds deterministic JSON (insertion order fixed); prober
  * never throws — short files, bad magics, overrunning sizes, payload
  * JSON that isn't an object, blobs escaping the data region (bounds
  * checked in subtraction form so a hostile offset+length cannot wrap
  * a Long past the guard), or overlapping blobs all yield None.
  */
object Puffin {

  final case class BlobMeta(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, offset: Long, length: Long)

  final case class PuffinFile(blobs: Vector[BlobMeta],
      properties: Map[String, String], compressedFooter: Boolean)

  private val Magic = Array[Byte]('P', 'F', 'A', '1')

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Write a Puffin file from (type, payload) blobs. */
  def write(blobs: Seq[(String, Array[Byte])], snapshotId: Long,
      sequenceNumber: Long, properties: Map[String, String],
      compressFooter: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val metas = blobs.map { case (tpe, bytes) =>
      val off = out.size().toLong
      out.write(bytes)
      BlobMeta(tpe, Seq(1), snapshotId, sequenceNumber, off, bytes.length.toLong)
    }
    val payload = {
      val bs = metas.map { m =>
        s"""{"type":${jsonStr(m.blobType)},"fields":[${m.fields.mkString(",")}],""" +
          s""""snapshot-id":${m.snapshotId},"sequence-number":${m.sequenceNumber},""" +
          s""""offset":${m.offset},"length":${m.length}}"""
      }.mkString(",")
      val ps = properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }.mkString(",")
      s"""{"blobs":[$bs],"properties":{$ps}}""".getBytes("UTF-8")
    }
    val coded =
      if (!compressFooter) payload
      else {
        // LZ4 frame — the puffin-spec's footer-compression codec, which
        // requires the frame's content-size field present (FLG.CONTENT_SIZE),
        // so the knownSize constructor is mandatory: the 2-arg one leaves
        // the bit clear and spec-conformant readers relying on the declared
        // size would reject the footer. Writer uses lz4-java (JNI; the
        // pure-Java commons-compress encoder costs ~3 ms per instance —
        // q343 writes one footer per row); the prober below reads with
        // commons-compress, so every written footer is a
        // cross-implementation interop check.
        val b = new java.io.ByteArrayOutputStream()
        val lz = new net.jpountz.lz4.LZ4FrameOutputStream(b,
          net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB,
          payload.length.toLong,
          net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE,
          net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.CONTENT_SIZE)
        lz.write(payload); lz.close()
        b.toByteArray
      }
    out.write(Magic)
    out.write(coded)
    val n = coded.length
    out.write(n & 0xff); out.write((n >>> 8) & 0xff)
    out.write((n >>> 16) & 0xff); out.write((n >>> 24) & 0xff)
    out.write(if (compressFooter) 1 else 0)
    out.write(0); out.write(0); out.write(0)
    out.write(Magic)
    out.toByteArray
  }

  private def hasMagic(b: Array[Byte], off: Int): Boolean =
    off >= 0 && off + 4 <= b.length && (0 until 4).forall(i => b(off + i) == Magic(i))

  /** Probe a Puffin image: footer walk, optional LZ4-frame decode, JSON decode,
    * blob-region coherence (within the data region, non-overlapping).
    */
  def probe(b: Array[Byte]): Option[PuffinFile] =
    try {
      if (b.length < 20) return None
      if (!hasMagic(b, 0) || !hasMagic(b, b.length - 4)) return None
      val flagsOff = b.length - 8
      val compressed = (b(flagsOff) & 1) == 1
      if ((b(flagsOff) & 0xfe) != 0 || b(flagsOff + 1) != 0 ||
        b(flagsOff + 2) != 0 || b(flagsOff + 3) != 0) return None
      val szOff = flagsOff - 4
      val n = (b(szOff) & 0xff) | ((b(szOff + 1) & 0xff) << 8) |
        ((b(szOff + 2) & 0xff) << 16) | ((b(szOff + 3) & 0xff) << 24)
      if (n < 2 || n > szOff - 8) return None
      val payloadOff = szOff - n
      if (!hasMagic(b, payloadOff - 4)) return None
      val raw = java.util.Arrays.copyOfRange(b, payloadOff, payloadOff + n)
      val payload =
        if (!compressed) raw
        else {
          val gz = new org.apache.commons.compress.compressors.lz4
            .FramedLZ4CompressorInputStream(
              new java.io.ByteArrayInputStream(raw))
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var r = gz.read(buf)
          var total = 0
          while (r > 0) {
            total += r
            if (total > (16 << 20)) return None // decompression bomb guard
            o.write(buf, 0, r); r = gz.read(buf)
          }
          o.toByteArray
        }
      val dataEnd = (payloadOff - 4).toLong
      import org.json4s._
      val root = org.json4s.jackson.JsonMethods.parse(
        new String(payload, "UTF-8"))
      val obj = root match { case o: JObject => o; case _ => return None }
      def longOf(v: JValue): Option[Long] = v match {
        case JInt(i) => Some(i.toLong)
        case JLong(l) => Some(l)
        case _ => None
      }
      val blobs = (obj \ "blobs") match {
        case JArray(bs) => bs.map {
          case bo: JObject =>
            val tpe = (bo \ "type") match {
              case JString(s) if s.nonEmpty => s
              case _ => return None
            }
            val fields = (bo \ "fields") match {
              case JArray(fs) => fs.map(f => longOf(f).getOrElse(return None).toInt)
              case JNothing => Nil
              case _ => return None
            }
            val off = longOf(bo \ "offset").getOrElse(return None)
            val len = longOf(bo \ "length").getOrElse(return None)
            // subtraction form: off + len would wrap negative for a
            // hostile length near Long.MaxValue and sail past the guard
            if (off < 4 || len < 0 || off > dataEnd - len) return None
            BlobMeta(tpe, fields,
              longOf(bo \ "snapshot-id").getOrElse(-1L),
              longOf(bo \ "sequence-number").getOrElse(-1L), off, len)
          case _ => return None
        }.toVector
        case JNothing => Vector.empty
        case _ => return None
      }
      // non-overlapping data regions in offset order
      val sorted = blobs.sortBy(_.offset)
      sorted.sliding(2).foreach {
        case Seq(a, c) => if (a.length > c.offset - a.offset) return None
        case _ => ()
      }
      val props = (obj \ "properties") match {
        case JObject(kvs) => kvs.collect { case (k, JString(v)) => k -> v }.toMap
        case JNothing => Map.empty[String, String]
        case _ => return None
      }
      Some(PuffinFile(blobs, props, compressed))
    } catch { case NonFatal(_) => None }

  /** Blob payload bytes for a probed entry. */
  def blobBytes(b: Array[Byte], m: BlobMeta): Array[Byte] =
    java.util.Arrays.copyOfRange(b, m.offset.toInt, (m.offset + m.length).toInt)
}
