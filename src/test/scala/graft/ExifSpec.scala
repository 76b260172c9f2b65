package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Exif, JpegCodec}

/** EXIF-over-JPEG probe and GPS strip (q289): synth→probe round trips
  * under both byte orders, the strip's byte accounting and image
  * preservation, and the hostile sweep.
  */
class ExifSpec extends AnyFunSuite {

  private def baseJpeg: Array[Byte] =
    JpegCodec.encodeJpegFlat(24, 16, subsample420 = false,
      (bx, by) => (40 + bx * 7 + by * 13) % 256)

  private def app1(le: Boolean): Array[Byte] =
    Exif.synthApp1(le, "makerx", "mm", "2023:04:12 09:15:33",
      "N", Vector(51L, 30L, 12L), "W", Vector(0L, 7L, 39L))

  test("synth → probe round trips under both byte orders") {
    for (le <- Seq(true, false)) {
      val jpeg = Exif.insertApp1(baseJpeg, app1(le))
      val info = Exif.probeJpeg(jpeg).getOrElse(fail("probe failed"))
      assert(info.littleEndian === le)
      assert(info.make === Some("makerx"))
      assert(info.model === Some("mm")) // inline (≤3 chars + NUL)
      assert(info.dateTime === Some("2023:04:12 09:15:33"))
      val g = info.gps.getOrElse(fail("no gps"))
      assert(g.latRef === "N" && g.lonRef === "W")
      assert(g.lat === Vector((51L, 1L), (30L, 1L), (12L, 1L)))
      assert(g.lon === Vector((0L, 1L), (7L, 1L), (39L, 1L)))
    }
  }

  test("a JPEG without EXIF probes empty; non-JPEG declines") {
    val info = Exif.probeJpeg(baseJpeg).getOrElse(fail("probe failed"))
    assert(info.make.isEmpty && info.gps.isEmpty)
    assert(Exif.probeJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(Exif.probeJpeg(baseJpeg.dropRight(3)).isEmpty)
  }

  test("stripExif removes exactly the APP1 segment and preserves the image") {
    val a = app1(true)
    val jpeg = Exif.insertApp1(baseJpeg, a)
    val stripped = Exif.stripExif(jpeg).getOrElse(fail("strip failed"))
    assert(jpeg.length - stripped.length === a.length)
    assert(stripped.sameElements(baseJpeg)) // byte-verbatim remainder
    val after = Exif.probeJpeg(stripped).getOrElse(fail("re-probe failed"))
    assert(after.gps.isEmpty && after.make.isEmpty)
    val px0 = JpegCodec.decodeJpeg(jpeg).getOrElse(fail("decode with exif"))
    val px1 = JpegCodec.decodeJpeg(stripped).getOrElse(fail("decode stripped"))
    assert(px0.pixels.toSeq == px1.pixels.toSeq)
  }

  test("closed-form segment size: the q289 arithmetic") {
    // 4 (marker+len) + 6 (Exif\0\0) + 8 (tiff header) + 54 + 54 (IFDs)
    // + make+1 + 20 (datetime) + 48 (rationals); model inline here
    val a = app1(true)
    assert(a.length === 4 + 6 + 8 + 54 + 54 + 7 + 20 + 48)
  }

  test("hostile sweep: every single-byte flip yields Option, never a throw") {
    val jpeg = Exif.insertApp1(baseJpeg, app1(false))
    jpeg.indices.foreach { i =>
      val c = jpeg.clone(); c(i) = (c(i) ^ 0x55).toByte
      Exif.probeJpeg(c); Exif.stripExif(c)
    }
    // out-of-file GPS IFD pointer declines rather than fabricating
    val a = app1(true)
    val evil = a.clone()
    // GPS pointer value sits in IFD0's 4th entry value field
    val tiffOff = 4 + 6
    val gpsPtrOff = tiffOff + 8 + 2 + 3 * 12 + 8
    evil(gpsPtrOff) = 0x7f
    evil(gpsPtrOff + 1) = 0x7f.toByte
    assert(Exif.probeJpeg(Exif.insertApp1(baseJpeg, evil)).isEmpty)
  }
}
