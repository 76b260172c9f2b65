package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TfRecord
import graft.operators.TfRecord._

/** TFRecord framing + tf.Example decode: masked CRC32C verification,
  * packed repeated lists, and the hostile-byte sweep.
  */
class TfRecordSpec extends AnyFunSuite {

  private def shard() = TfRecord.synth(Seq(
    Seq("image" -> BytesFeature(Vector("imgbytes0".getBytes("UTF-8"))),
      "label" -> Int64Feature(Vector(7L)),
      "score" -> FloatFeature(Vector(0.5f, -2.25f))),
    Seq("image" -> BytesFeature(Vector("imgbytes1".getBytes("UTF-8"),
      "second".getBytes("UTF-8"))),
      "label" -> Int64Feature(Vector(3L, 300L, 1L << 40)))))

  test("round trip: records, features, packed lists") {
    val b = shard()
    val t = TfRecord.probe(b).get
    assert(t.nRecords == 2)
    val e0 = t.examples(0)
    assert(e0.features("image").asInstanceOf[BytesFeature].strs ==
      Vector("imgbytes0"))
    assert(e0.features("label").asInstanceOf[Int64Feature].vs == Vector(7L))
    assert(e0.features("score").asInstanceOf[FloatFeature].vs ==
      Vector(0.5f, -2.25f))
    val e1 = t.examples(1)
    assert(e1.features("image").asInstanceOf[BytesFeature].strs ==
      Vector("imgbytes1", "second"))
    // multi-byte packed varints survive (300 = 2 bytes, 2^40 = 6 bytes)
    assert(e1.features("label").asInstanceOf[Int64Feature].vs ==
      Vector(3L, 300L, 1L << 40))
  }

  test("the masked CRC32C matches TensorFlow's published test mask") {
    // mask(crc32c("")) on an empty span: crc 0 -> mask = 0xa282ead8
    assert(TfRecord.maskedCrc(Array.emptyByteArray, 0, 0) == 0xa282ead8)
  }

  test("hostile bytes: EVERY single-byte flip anywhere rejects") {
    val b = shard()
    assert(TfRecord.probe(Array.emptyByteArray).isEmpty)
    assert(TfRecord.probe(b.dropRight(1)).isEmpty) // truncated trailer
    assert(TfRecord.probe(b.take(11)).isEmpty) // truncated header
    // both checksums cover everything: every flip must reject
    b.indices.foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x01).toByte
      assert(TfRecord.probe(c).isEmpty, s"flip at $i survived")
    }
  }

  test("a feature with no list set rejects") {
    // hand-encode: Example{Features{entry{key, Feature{}}}} — the empty
    // Feature message has no list field
    val empty = Array.emptyByteArray
    def fld(id: Int, body: Array[Byte]): Array[Byte] =
      Array(((id << 3) | 2).toByte, body.length.toByte) ++ body
    val entry = fld(1, "k".getBytes) ++ fld(2, empty)
    val ex = fld(1, fld(1, entry))
    val framed = {
      val payload = ex
      val frame = new Array[Byte](12 + payload.length + 4)
      (0 until 8).foreach(i =>
        frame(i) = ((payload.length.toLong >> (8 * i)) & 0xff).toByte)
      var crc = TfRecord.maskedCrc(frame, 0, 8)
      (0 until 4).foreach(i => frame(8 + i) = ((crc >> (8 * i)) & 0xff).toByte)
      System.arraycopy(payload, 0, frame, 12, payload.length)
      crc = TfRecord.maskedCrc(frame, 12, 12 + payload.length)
      (0 until 4).foreach(i =>
        frame(12 + payload.length + i) = ((crc >> (8 * i)) & 0xff).toByte)
      frame
    }
    assert(TfRecord.probe(framed).isEmpty)
  }
}
