package graft.operators

import scala.util.control.NonFatal

/** DELETION VECTORS — the Delta-protocol row-level delete encoding
  * (PROTOCOL.md "Deletion Vectors", delta.io; public spec): a 64-bit
  * RoaringBitmapArray of deleted row positions, serialized in the
  * PORTABLE format and — for small vectors — carried INLINE in the add
  * action's `deletionVector` descriptor as a Z85 string (ZeroMQ RFC 32).
  * This is merge-on-read for Delta the way positional deletes are for
  * Iceberg v2 (operators/IcebergManifests.scala): the data file is
  * immutable, the delete is a sidecar, and the reader subtracts
  * positions at scan time.
  *
  * Layout implemented here, all public:
  *  - portable RoaringBitmapArray: magic 1681511377 (i32 LE), number of
  *    32-bit bitmaps (i64 LE), then per bitmap in increasing key order:
  *    key (i32 LE, the positions' high 32 bits) + a standard 32-bit
  *    roaring bitmap;
  *  - 32-bit roaring (RoaringFormatSpec): cookie 12346
  *    (SERIAL_COOKIE_NO_RUNCONTAINER, i32 LE) + container count (i32
  *    LE); descriptive header (u16 key, u16 cardinality−1 per
  *    container); offset header (i32 LE byte offset of each container
  *    from the cookie); containers in key order — sorted u16 arrays at
  *    cardinality ≤ 4096, 8 KiB bitsets above;
  *  - Z85: 4 big-endian bytes → 5 chars over the RFC 32 alphabet; the
  *    inline descriptor zero-pads the blob to a multiple of 4 and keeps
  *    the true length in `sizeInBytes` (the Delta codec's convention).
  *
  * Decode never throws — hostile bytes (bad magic, foreign cookie, run
  * containers, overrunning counts, non-canonical container choice,
  * unsorted keys) all yield None; the encoder refuses out-of-domain
  * input loudly instead.
  */
object DeletionVectors {

  // ---------------- Z85 (ZeroMQ RFC 32) ----------------

  object Z85 {
    private val Alphabet =
      "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
        ".-:+=^!/*?&<>()[]{}@%$#"
    private val Inverse: Array[Int] = {
      val a = Array.fill(128)(-1)
      Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
      a
    }

    def encode(b: Array[Byte]): String = {
      require(b.length % 4 == 0, s"Z85 input must be 4-aligned: ${b.length}")
      val sb = new StringBuilder(b.length / 4 * 5)
      var i = 0
      while (i < b.length) {
        var v = 0L
        (0 until 4).foreach(j => v = (v << 8) | (b(i + j) & 0xffL))
        var div = 85L * 85L * 85L * 85L
        while (div >= 1L) {
          sb.append(Alphabet(((v / div) % 85L).toInt))
          div /= 85L
        }
        i += 4
      }
      sb.toString
    }

    def decode(s: String): Option[Array[Byte]] = {
      if (s.length % 5 != 0) return None
      val out = new Array[Byte](s.length / 5 * 4)
      var i = 0
      while (i < s.length) {
        var v = 0L
        var j = 0
        while (j < 5) {
          val c = s.charAt(i + j).toInt
          if (c >= 128 || Inverse(c) < 0) return None
          v = v * 85L + Inverse(c)
          j += 1
        }
        if (v > 0xffffffffL) return None // over-range 5-char group
        val o = i / 5 * 4
        out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
        out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
        i += 5
      }
      Some(out)
    }
  }

  // ---------------- portable RoaringBitmapArray ----------------

  private val Magic = 1681511377
  private val CookieNoRun = 12346
  private val ArrayContainerMax = 4096

  private def putLe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >>> 8) & 0xff)
    b.write((v >>> 16) & 0xff); b.write((v >>> 24) & 0xff)
  }
  private def putLe16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >>> 8) & 0xff)
  }

  /** Serialize sorted-deduped non-negative positions. */
  def serializeRoaring64(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0L), "negative position")
    val sorted = positions.distinct.sorted
    val out = new java.io.ByteArrayOutputStream()
    putLe32(out, Magic)
    val byKey = sorted.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    // number of 32-bit bitmaps: i64 LE
    putLe32(out, byKey.length); putLe32(out, 0)
    byKey.foreach { case (key, ps) =>
      putLe32(out, key)
      out.write(serializeRoaring32(ps.map(p => (p & 0xffffffffL).toInt)))
    }
    out.toByteArray
  }

  private def serializeRoaring32(values: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val byContainer = values.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
    putLe32(out, CookieNoRun)
    putLe32(out, byContainer.length)
    byContainer.foreach { case (k, vs) =>
      putLe16(out, k); putLe16(out, vs.length - 1)
    }
    // offset header: container start from the cookie
    var off = 4 + 4 + 4 * byContainer.length + 4 * byContainer.length
    byContainer.foreach { case (_, vs) =>
      putLe32(out, off)
      off += (if (vs.length <= ArrayContainerMax) 2 * vs.length else 8192)
    }
    byContainer.foreach { case (_, vs) =>
      if (vs.length <= ArrayContainerMax)
        vs.map(_ & 0xffff).sorted.foreach(putLe16(out, _))
      else {
        val bits = new Array[Long](1024)
        vs.foreach { v => val lo = v & 0xffff; bits(lo >>> 6) |= 1L << (lo & 63) }
        bits.foreach { w =>
          (0 until 8).foreach(i => out.write(((w >>> (8 * i)) & 0xffL).toInt))
        }
      }
    }
    out.toByteArray
  }

  /** Deserialize to sorted positions; None on any malformation. */
  def deserializeRoaring64(b: Array[Byte]): Option[Array[Long]] =
    try {
      var p = 0
      def le32(): Int = {
        if (p + 4 > b.length) throw new Malformed
        val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
          ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
        p += 4; v
      }
      def le16(): Int = {
        if (p + 2 > b.length) throw new Malformed
        val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2; v
      }
      if (le32() != Magic) return None
      val nLo = le32(); val nHi = le32()
      if (nHi != 0 || nLo < 0) return None
      val outAll = Array.newBuilder[Long]
      var lastKey = -1L
      (0 until nLo).foreach { _ =>
        val key = le32()
        if ((key & 0xffffffffL) <= lastKey && lastKey >= 0) throw new Malformed
        lastKey = key & 0xffffffffL
        val base = p
        if (le32() != CookieNoRun) throw new Malformed
        val nc = le32()
        if (nc < 0 || nc > 65536) throw new Malformed
        val heads = (0 until nc).map(_ => (le16(), le16() + 1))
        if (heads.map(_._1) != heads.map(_._1).sorted ||
          heads.map(_._1).distinct.length != nc) throw new Malformed
        val offs = (0 until nc).map(_ => le32())
        var containerEnd = p
        heads.zipWithIndex.foreach { case ((ck, card), i) =>
          if (offs(i) != containerEnd - base) throw new Malformed
          p = base + offs(i)
          if (card <= ArrayContainerMax) {
            var prev = -1
            (0 until card).foreach { _ =>
              val v = le16()
              if (v <= prev) throw new Malformed
              prev = v
              outAll += (key.toLong << 32) | (ck.toLong << 16) | v.toLong
            }
          } else {
            var seen = 0
            (0 until 1024).foreach { w =>
              var word = 0L
              (0 until 8).foreach { i2 =>
                if (p >= b.length) throw new Malformed
                word |= (b(p) & 0xffL) << (8 * i2); p += 1
              }
              (0 until 64).foreach { bit =>
                if ((word & (1L << bit)) != 0) {
                  seen += 1
                  outAll += (key.toLong << 32) | (ck.toLong << 16) |
                    (w * 64 + bit).toLong
                }
              }
            }
            if (seen != card) throw new Malformed
          }
          containerEnd = p
        }
      }
      if (p != b.length) return None
      Some(outAll.result())
    } catch { case NonFatal(_) => None }

  private final class Malformed extends RuntimeException

  // ---------------- Iceberg v3 puffin DV blob framing ----------------

  private val DvMagic =
    Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)

  /** Iceberg v3's framing for the puffin `deletion-vector-v1` blob
    * (spec "Deletion vector serialization", iceberg.apache.org): a
    * 4-byte BIG-endian length of (magic + bitmap), the magic
    * `D1 D3 39 64`, the portable RoaringBitmapArray, and a 4-byte
    * big-endian CRC-32 of (magic + bitmap). Total = bitmap + 12 bytes
    * — a reader that hands the bare bitmap to Iceberg (or vice versa)
    * is off by exactly this envelope, which is why [[serializeDvBlob]]
    * / [[deserializeDvBlob]] exist as a pair instead of callers
    * wrapping by hand.
    */
  def serializeDvBlob(positions: Array[Long]): Array[Byte] = {
    val bm = serializeRoaring64(positions)
    val out = new Array[Byte](bm.length + 12)
    val len = bm.length + 4
    out(0) = (len >>> 24).toByte; out(1) = (len >>> 16).toByte
    out(2) = (len >>> 8).toByte; out(3) = len.toByte
    System.arraycopy(DvMagic, 0, out, 4, 4)
    System.arraycopy(bm, 0, out, 8, bm.length)
    val crc = new java.util.zip.CRC32
    crc.update(out, 4, 4 + bm.length)
    val c = crc.getValue.toInt
    val p = out.length - 4
    out(p) = (c >>> 24).toByte; out(p + 1) = (c >>> 16).toByte
    out(p + 2) = (c >>> 8).toByte; out(p + 3) = c.toByte
    out
  }

  /** Verify and strip the v3 framing, then deserialize the bitmap;
    * None on a short blob, a length that disagrees with the blob size,
    * a foreign magic, a CRC mismatch, or a malformed bitmap.
    */
  def deserializeDvBlob(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 12) return None
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    if (be32(0) != b.length - 8) return None
    if (!(0 until 4).forall(i => b(4 + i) == DvMagic(i))) return None
    val crc = new java.util.zip.CRC32
    crc.update(b, 4, b.length - 8)
    if (crc.getValue.toInt != be32(b.length - 4)) return None
    deserializeRoaring64(java.util.Arrays.copyOfRange(b, 8, b.length - 4))
  }

  // ---------------- inline descriptor ----------------

  /** The add-action `deletionVector` descriptor, inline form: storageType
    * "i", the Z85-coded blob (zero-padded to 4), the blob's TRUE byte
    * length, and the position count.
    */
  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      sizeInBytes: Int, cardinality: Long)

  def encodeInline(positions: Array[Long]): DvDescriptor = {
    val blob = serializeRoaring64(positions)
    val padded = blob ++ Array.fill[Byte]((4 - blob.length % 4) % 4)(0)
    DvDescriptor("i", Z85.encode(padded), blob.length,
      positions.distinct.length.toLong)
  }

  /** Decode an inline descriptor back to sorted positions; None when the
    * storage type is not inline, the Z85 is malformed, the declared size
    * disagrees with the coded length by more than the 4-byte pad, the
    * bitmap is malformed, or the declared cardinality lies.
    */
  def decodeInline(d: DvDescriptor): Option[Array[Long]] = {
    if (d.storageType != "i") return None
    Z85.decode(d.pathOrInlineDv).flatMap { padded =>
      if (d.sizeInBytes < 0 || d.sizeInBytes > padded.length ||
        padded.length - d.sizeInBytes >= 4) None
      else deserializeRoaring64(java.util.Arrays.copyOf(padded, d.sizeInBytes))
        .filter(_.length.toLong == d.cardinality)
    }
  }
}
