package graft.operators

import scala.util.control.NonFatal

/** TFRECORD shard walk + tf.Example decode — the TensorFlow
  * training-data container (both layouts public: the TFRecord framing
  * in the TensorFlow docs, `tf.Example` in example.proto): records
  * framed as `u64-LE length, masked-CRC32C(length), payload,
  * masked-CRC32C(payload)` where the mask is TensorFlow's
  * `((crc >> 15) | (crc << 17)) + 0xa282ead8` over the CASTAGNOLI
  * CRC-32C (the JDK's `java.util.zip.CRC32C`) — BOTH checksums are
  * verified on every record, so a single flipped bit anywhere in a
  * shard rejects the walk. Each payload decodes as a `tf.Example`
  * through [[ProtoLite]]: `Example{features=1}` →
  * `Features{feature=1}` map entries → `Feature{bytes_list=1,
  * float_list=2, int64_list=3}` with PACKED repeated int64s/floats
  * (one length-delimited blob of concatenated varints / LE floats —
  * the packed-encoding trap a naive reader misses).
  *
  * Hostile-byte posture: [[probe]] never throws — a truncated frame,
  * either checksum wrong, a malformed Example, a feature with no
  * list set, or trailing garbage all yield None.
  */
object TfRecord {

  sealed trait FeatureValue
  final case class BytesFeature(vs: Vector[Array[Byte]]) extends FeatureValue {
    def strs: Vector[String] = vs.map(new String(_, "UTF-8"))
  }
  final case class FloatFeature(vs: Vector[Float]) extends FeatureValue
  final case class Int64Feature(vs: Vector[Long]) extends FeatureValue

  /** One decoded example: feature name → typed list. */
  final case class Example(features: Map[String, FeatureValue])

  final case class TfRecordInfo(examples: Vector[Example],
      payloadBytes: Long) {
    def nRecords: Int = examples.length
  }

  /** TensorFlow's masked CRC32C of b[from, until). */
  def maskedCrc(b: Array[Byte], from: Int, until: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, from, until - from)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    (0 until 8).foldLeft(0L)((a, i) => a | (b(o + i) & 0xffL) << (8 * i))

  private def decodeExample(payload: Array[Byte]): Option[Example] = {
    val ex = ProtoLite.parse(payload).getOrElse(return None)
    val features = ex.msg(1).getOrElse(return None)
    val out = Map.newBuilder[String, FeatureValue]
    features.msgs(1).foreach { entry =>
      val key = entry.str(1).getOrElse(return None)
      val feat = entry.msg(2).getOrElse(return None)
      val v: FeatureValue =
        if (feat.fields.contains(1)) {
          val bl = feat.msg(1).getOrElse(return None)
          BytesFeature(bl.fields.getOrElse(1, Vector.empty)
            .collect { case ProtoLite.PBytes(b) => b })
        } else if (feat.fields.contains(2)) {
          val fl = feat.msg(2).getOrElse(return None)
          // packed floats: one blob of 4-byte LE singles
          val blob = fl.bytes(1).getOrElse(Array.emptyByteArray)
          if (blob.length % 4 != 0) return None
          FloatFeature((0 until blob.length by 4).map(i =>
            java.lang.Float.intBitsToFloat(le32(blob, i))).toVector)
        } else if (feat.fields.contains(3)) {
          val il = feat.msg(3).getOrElse(return None)
          // packed varints: one blob of concatenated varints
          val blob = il.bytes(1).getOrElse(Array.emptyByteArray)
          val vs = Vector.newBuilder[Long]
          var p = 0
          while (p < blob.length) {
            var v = 0L; var sh = 0
            var done = false
            while (!done) {
              if (p >= blob.length || sh > 63) return None
              val c = blob(p) & 0xff
              p += 1
              v |= (c & 0x7fL) << sh
              if ((c & 0x80) == 0) done = true else sh += 7
            }
            vs += v
          }
          Int64Feature(vs.result())
        } else return None // a feature must set exactly one list
      out += ((key, v))
    }
    Some(Example(out.result()))
  }

  /** Walk a whole shard: length/CRC framing verified per record, each
    * payload decoded as a tf.Example. None on any malformation.
    */
  def probe(b: Array[Byte]): Option[TfRecordInfo] =
    try {
      var p = 0
      val out = Vector.newBuilder[Example]
      var payloadBytes = 0L
      while (p < b.length) {
        if (p + 12 > b.length) return None
        val len = le64(b, p)
        if (len < 0 || len > b.length - p - 16) return None
        if (le32(b, p + 8) != maskedCrc(b, p, p + 8)) return None
        val dataAt = p + 12
        val dataEnd = dataAt + len.toInt
        if (le32(b, dataEnd) != maskedCrc(b, dataAt, dataEnd)) return None
        out += decodeExample(
          java.util.Arrays.copyOfRange(b, dataAt, dataEnd))
          .getOrElse(return None)
        payloadBytes += len
        p = dataEnd + 4
      }
      val es = out.result()
      if (es.isEmpty) return None
      Some(TfRecordInfo(es, payloadBytes))
    } catch { case NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Synthesis (test/oracle side): real wire format, true CRC32C.
  // ------------------------------------------------------------------

  private def wVarint(out: java.io.ByteArrayOutputStream, x: Long): Unit = {
    var v = x
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def wField(out: java.io.ByteArrayOutputStream, id: Int,
      body: Array[Byte]): Unit = {
    wVarint(out, (id.toLong << 3) | 2)
    wVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  /** Encode one tf.Example (real wire format, packed lists). */
  def encodeExample(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val feats = new java.io.ByteArrayOutputStream()
    features.foreach { case (key, fv) =>
      val feat = new java.io.ByteArrayOutputStream()
      fv match {
        case BytesFeature(vs) =>
          val bl = new java.io.ByteArrayOutputStream()
          vs.foreach(v => wField(bl, 1, v))
          wField(feat, 1, bl.toByteArray)
        case FloatFeature(vs) =>
          val blob = new java.io.ByteArrayOutputStream()
          vs.foreach { f =>
            val bits = java.lang.Float.floatToIntBits(f)
            (0 until 4).foreach(i => blob.write((bits >> (8 * i)) & 0xff))
          }
          val fl = new java.io.ByteArrayOutputStream()
          wField(fl, 1, blob.toByteArray)
          wField(feat, 2, fl.toByteArray)
        case Int64Feature(vs) =>
          val blob = new java.io.ByteArrayOutputStream()
          vs.foreach(wVarint(blob, _))
          val il = new java.io.ByteArrayOutputStream()
          wField(il, 1, blob.toByteArray)
          wField(feat, 3, il.toByteArray)
      }
      val entry = new java.io.ByteArrayOutputStream()
      wField(entry, 1, key.getBytes("UTF-8"))
      wField(entry, 2, feat.toByteArray)
      wField(feats, 1, entry.toByteArray)
    }
    val ex = new java.io.ByteArrayOutputStream()
    wField(ex, 1, feats.toByteArray)
    ex.toByteArray
  }

  /** Synthesize a VALID shard: each example framed with its true
    * masked CRC32C pair. Real wire format — [[probe]] is not told
    * anything the bytes don't say.
    */
  def synth(examples: Seq[Seq[(String, FeatureValue)]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    examples.foreach { fs =>
      val payload = encodeExample(fs)
      val frame = new Array[Byte](12 + payload.length + 4)
      (0 until 8).foreach(i =>
        frame(i) = ((payload.length.toLong >> (8 * i)) & 0xff).toByte)
      var crc = maskedCrc(frame, 0, 8)
      (0 until 4).foreach(i => frame(8 + i) = ((crc >> (8 * i)) & 0xff).toByte)
      System.arraycopy(payload, 0, frame, 12, payload.length)
      crc = maskedCrc(frame, 12, 12 + payload.length)
      (0 until 4).foreach(i =>
        frame(12 + payload.length + i) = ((crc >> (8 * i)) & 0xff).toByte)
      out.write(frame, 0, frame.length)
    }
    out.toByteArray
  }
}
