package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MkvProbe
import graft.operators.MkvProbe.{SynthCluster, SynthMkvTrack}

/** EBML/Matroska probe: wire-format round trips, the varint width
  * scheme (incl. wider-than-minimal sizes, which are legal), and the
  * hostile-byte sweep (every malformation -> None, never a throw).
  */
class MkvProbeSpec extends AnyFunSuite {

  private val video = SynthMkvTrack(1, 11, 1, "V_VP9", width = 640, height = 360)
  private val audio = SynthMkvTrack(2, 22, 2, "A_OPUS", sampleRate = 48000.0,
    channels = 2)

  private def synth(clusters: Seq[SynthCluster] = Seq(
      SynthCluster(0, Seq(30, 40)), SynthCluster(1000, Seq(25)))) =
    MkvProbe.synth("webm", 4, 1000000L, 12345.0, "muxa", "wrib",
      Seq(video, audio), clusters, (c, i) => c + i)

  test("round trip: header, info, tracks, clusters, byte accounting") {
    val b = synth()
    val info = MkvProbe.probe(b).get
    assert(info.docType == "webm" && info.docTypeVersion == 4)
    assert(info.timestampScale == 1000000L)
    assert(info.durationTicks == 12345.0 && info.durationMs == 12345L)
    assert(info.muxingApp == "muxa" && info.writingApp == "wrib")
    assert(info.nTracks == 2)
    val Vector(t1, t2) = info.tracks
    assert(t1.number == 1 && t1.uid == 11 && t1.trackType == 1)
    assert(t1.codecId == "V_VP9" && t1.width == 640 && t1.height == 360)
    assert(t1.sampleRate == 0.0 && t1.channels == 0)
    assert(t2.trackType == 2 && t2.codecId == "A_OPUS")
    assert(t2.sampleRate == 48000.0 && t2.channels == 2)
    assert(info.clusterCount == 2 && info.blockCount == 3)
    assert(info.blockBytes == (4 + 30) + (4 + 40) + (4 + 25))
    // closed form: header 20+4, segment 6 + info 42 + tracks 6 + entries
    // (19+5+13)+(19+6+18) + clusters (6+5+(7+30)+(7+40))+(6+5+(7+25))
    assert(b.length == 24 + 6 + 42 + 6 + 37 + 43 + 95 + 43)
  }

  test("no clusters is a valid finished file") {
    val info = MkvProbe.probe(synth(Nil)).get
    assert(info.clusterCount == 0 && info.blockCount == 0 && info.blockBytes == 0)
  }

  test("duration scales: 500000 ns/tick halves the ms") {
    val b = MkvProbe.synth("matroska", 2, 500000L, 1001.0, "m", "w",
      Seq(audio), Nil, (_, _) => 0)
    val info = MkvProbe.probe(b).get
    assert(info.docType == "matroska")
    assert(info.durationMs == 500L) // floor(1001 * 500000 / 1e6)
  }

  test("wider-than-minimal sizes are legal and parse identically") {
    // hand-build a DocTypeVersion with a 3-octet size (0x20 00 01)
    // inside an otherwise fixed-2-octet stream: splice by rebuilding the
    // header element with one byte more of size form
    val b = synth()
    // locate DocTypeVersion 0x4287 (id bytes 42 87) in the header
    val i = b.indices.find(j => (b(j) & 0xff) == 0x42 && j + 1 < b.length &&
      (b(j + 1) & 0xff) == 0x87).get
    val widened = b.slice(0, i + 2) ++ Array(0x20.toByte, 0.toByte, 1.toByte) ++
      b.slice(i + 4, b.length)
    // grow the enclosing EBML-header size (2-octet form, low byte) by 1
    widened(5) = (widened(5) + 1).toByte
    assert(MkvProbe.probe(widened).get.docTypeVersion == 4)
  }

  test("unknown-size (all-ones) elements are declined") {
    val b = synth()
    // Segment size is the 2-octet form at bytes [len(hdr)+4, +5]; header
    // total is 24 bytes for docType 'webm'
    val unk = b.clone()
    unk(24 + 4) = 0x7f.toByte; unk(24 + 5) = 0xff.toByte
    assert(MkvProbe.probe(unk).isEmpty)
  }

  test("uints accept leading zeros; floats must be 4 or 8 octets") {
    val b = synth()
    val info = MkvProbe.probe(b).get
    // TimestampScale is synthesized as 3 octets 0x0F4240 — a leading
    // zero would make it 4; patch a widened copy by hand
    val i = b.indices.find(j => (b(j) & 0xff) == 0x2a && j + 2 < b.length &&
      (b(j + 1) & 0xff) == 0xd7 && (b(j + 2) & 0xff) == 0xb1).get
    val widened = b.slice(0, i + 3) ++ Array((0x40).toByte, 4.toByte, 0.toByte) ++
      b.slice(i + 5, b.length)
    // fix up: info body +1, segment body +1 (both 2-octet low bytes)
    val segSizeLow = 24 + 5
    widened(segSizeLow) = (widened(segSizeLow) + 1).toByte
    val infoSizeLow = 24 + 6 + 4 + 1 // segment hdr, info id, size hi byte
    widened(infoSizeLow) = (widened(infoSizeLow) + 1).toByte
    assert(MkvProbe.probe(widened).get.timestampScale == info.timestampScale)
    // a 5-octet Duration float rejects: shrink the 8-octet body by 3
    // (cheaper: patch Duration's declared size to 5 and re-tile fails)
    val durIdx = b.indices.find(j => (b(j) & 0xff) == 0x44 && j + 1 < b.length &&
      (b(j + 1) & 0xff) == 0x89).get
    val badFloat = b.clone()
    badFloat(durIdx + 3) = 5 // declared 8 -> 5: mistiles the Info body too
    assert(MkvProbe.probe(badFloat).isEmpty)
  }

  test("hostile bytes: every malformation rejects, never throws") {
    val b = synth()
    assert(MkvProbe.probe(Array.emptyByteArray).isEmpty)
    assert(MkvProbe.probe(Array[Byte](0x1a, 0x45)).isEmpty)
    Seq(1, 5, 20, 60, b.length - 1).foreach { cut =>
      assert(MkvProbe.probe(b.slice(0, b.length - cut)).isEmpty,
        s"cut of $cut bytes must not parse")
    }
    assert(MkvProbe.probe(b ++ Array[Byte](1, 2)).isEmpty) // trailing garbage
    // a zero first byte (varint width > 8)
    val zeroId = b.clone(); zeroId(0) = 0
    assert(MkvProbe.probe(zeroId).isEmpty)
    // segment before header
    val segFirst = {
      val hdrLen = 24
      b.slice(hdrLen, b.length) ++ b.slice(0, hdrLen)
    }
    assert(MkvProbe.probe(segFirst).isEmpty)
    // an unknown DocType string
    val badDoc = b.clone()
    badDoc(10) = 'x'.toByte // first byte of 'webm'
    assert(MkvProbe.probe(badDoc).isEmpty)
    // duplicate Info: synthesize a second stream and splice its Info in
    // place of the Tracks — simpler: corrupt the Tracks id into Info's
    val tracksId = Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte)
    val ti = b.indices.find(j => j + 4 <= b.length &&
      b.slice(j, j + 4).sameElements(tracksId)).get
    val twoInfos = b.clone()
    Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte).zipWithIndex
      .foreach { case (ch, k) => twoInfos(ti + k) = ch }
    assert(MkvProbe.probe(twoInfos).isEmpty)
    // a cluster whose first child is not Timestamp: corrupt 0xE7 -> 0xEC
    val clusterId = Array(0x1f, 0x43, 0xb6, 0x75).map(_.toByte)
    val ci = b.indices.find(j => j + 4 <= b.length &&
      b.slice(j, j + 4).sameElements(clusterId)).get
    val noTs = b.clone(); noTs(ci + 6) = 0xec.toByte
    assert(MkvProbe.probe(noTs).isEmpty)
  }

  test("synth rejects out-of-contract inputs eagerly") {
    intercept[IllegalArgumentException] {
      MkvProbe.synth("webm", 2, 1000000L, 0.0, "m", "w", Nil, Nil, (_, _) => 0)
    }
    intercept[IllegalArgumentException] {
      // a 2-octet uint cannot hold 70000
      MkvProbe.synth("webm", 2, 1000000L, 0.0, "m", "w",
        Seq(video.copy(width = 70000)), Nil, (_, _) => 0)
    }
  }
}
