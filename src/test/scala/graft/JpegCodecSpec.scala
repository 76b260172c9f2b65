package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JpegCodec

/** JPEG codec tests, baseline AND progressive: closed-form flat-block
  * roundtrips (bit-exact by construction), the AC/run-length path checked
  * against an INDEPENDENTLY-coded direct IDCT, chroma subsampling,
  * restart markers, the progressive scan machinery (point transform,
  * EOB runs, refinement correction bits) checked pixel-equal to the
  * proven baseline decode, and the hostile-input contract (None, never
  * throw).
  */
class JpegCodecSpec extends AnyFunSuite {

  test("flat-block 4:4:4 roundtrip is bit-exact; Cb=Cr=128 makes RGB = Y") {
    val w = 24; val h = 16 // 3 x 2 luma blocks
    val yOf = (bx: Int, by: Int) => 50 + 10 * bx + 3 * by
    val enc = JpegCodec.encodeJpegFlat(w, h, subsample420 = false, yOf)
    val img = JpegCodec.decodeJpeg(enc).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = yOf(x / 8, y / 8)
      assert(img.pixels(y * w + x) == ((v, v, v)), s"($x,$y)")
    }
  }

  test("flat-block 4:2:0 roundtrip is bit-exact; all four Y blocks per MCU distinct") {
    val w = 32; val h = 32 // 2 x 2 MCUs = 4 x 4 luma blocks
    val yOf = (bx: Int, by: Int) => 40 + 13 * bx + 7 * by
    val enc = JpegCodec.encodeJpegFlat(w, h, subsample420 = true, yOf)
    val img = JpegCodec.decodeJpeg(enc).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = yOf(x / 8, y / 8)
      assert(img.pixels(y * w + x) == ((v, v, v)), s"($x,$y)")
    }
    // the 4:2:0 file really is smaller: 6 blocks per 16x16 vs 12 for 4:4:4
    val enc444 = JpegCodec.encodeJpegFlat(w, h, subsample420 = false, yOf)
    assert(enc.length < enc444.length)
  }

  test("grayscale single-component frames decode and widen to RGB") {
    val cf = (_: Int, bx: Int, by: Int) => {
      val a = new Array[Int](64); a(0) = 10 * bx + by - 100; a
    }
    val enc = JpegCodec.encodeJpeg(16, 8, nComp = 1, subsample420 = false,
      JpegCodec.FlatQuant, JpegCodec.FlatQuant, cf)
    val img = JpegCodec.decodeJpeg(enc).get
    assert(img.width == 16 && img.height == 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = 10 * (x / 8) + (y / 8) - 100 + 128
      assert(img.pixels(y * 16 + x) == ((v, v, v)), s"($x,$y)")
    }
  }

  test("single-component baseline scan is NON-interleaved whatever the sampling factors") {
    // T.81 A.2: a 1-component scan walks the component's own ceil(dim/8)
    // grid, one block per MCU — declared sampling factors (which only
    // relate components to each other) must not change the walk. The
    // entropy stream of a single-component frame is therefore IDENTICAL
    // for 1x1 and 2x2 factors: encode at 1x1, patch the SOF0 sampling
    // byte to 2x2, and the decode must agree pixel-for-pixel. Dims are
    // deliberately non-multiples of 16 so an interleaved walk would
    // misalign (9 blocks in the stream vs 16 expected) and fail to None.
    val w = 24; val h = 17 // ceil(24/8) x ceil(17/8) = 3 x 3 blocks
    val cf = (_: Int, bx: Int, by: Int) => {
      val a = new Array[Int](64); a(0) = 11 * bx + 5 * by - 60; a
    }
    val enc = JpegCodec.encodeJpeg(w, h, nComp = 1, subsample420 = false,
      JpegCodec.FlatQuant, JpegCodec.FlatQuant, cf)
    val sof = (0 until enc.length - 1).find(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0).get
    assert((enc(sof + 11) & 0xff) == 0x11)
    val patched = enc.clone()
    patched(sof + 11) = 0x22.toByte // h=2, v=2 on the only component
    val base = JpegCodec.decodeJpeg(enc).get
    val img = JpegCodec.decodeJpeg(patched).get
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == base.pixels.toSeq)
    // mixed 2x1 factors walk the same grid too
    val patched21 = enc.clone()
    patched21(sof + 11) = 0x21.toByte
    assert(JpegCodec.decodeJpeg(patched21).get.pixels.toSeq == base.pixels.toSeq)
  }

  test("JFIF YCbCr->RGB conversion matches the closed-form formula") {
    val enc = JpegCodec.encodeJpegFlat(8, 8, subsample420 = false,
      (_, _) => 100, cb = 90, cr = 160)
    val img = JpegCodec.decodeJpeg(enc).get
    def clamp(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
    val want = (clamp(100 + 1.402 * (160 - 128)),
      clamp(100 - 0.344136 * (90 - 128) - 0.714136 * (160 - 128)),
      clamp(100 + 1.772 * (90 - 128)))
    assert(img.pixels.forall(_ == want), s"${img.pixels(0)} vs $want")
  }

  test("AC coefficients (runs, ZRL, EOB) decode to the direct-form IDCT") {
    // quant all-1 => dequantized coefficients ARE the supplied ones; the
    // coefficient pattern forces a >16 zero run (ZRL) and mid-block EOBs
    val q1 = Array.fill(64)(1)
    val blocks: Map[(Int, Int, Int), Array[Int]] = {
      def zz(pairs: (Int, Int)*): Array[Int] = {
        val a = new Array[Int](64)
        pairs.foreach { case (k, v) => a(JpegCodec.ZigZag(k)) = v }
        a
      }
      Map(
        (0, 0, 0) -> zz(0 -> 37, 1 -> -21, 5 -> 9, 22 -> -4, 63 -> 3), // ZRL x2 + last coeff
        (0, 1, 0) -> zz(0 -> -90, 2 -> 15, 3 -> -15),
        (1, 0, 0) -> zz(0 -> 12, 10 -> 8),
        (2, 0, 0) -> zz(0 -> 0))
    }
    val enc = JpegCodec.encodeJpeg(16, 8, nComp = 3, subsample420 = false,
      q1, q1, (ci, bx, by) => blocks.getOrElse((ci, bx, by), new Array[Int](64)))
    val img = JpegCodec.decodeJpeg(enc).get
    // independent reference: the textbook O(8^4) IDCT, coded separately
    // from the decoder's separable form
    def directIdct(cf: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * cf(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        out(y * 8 + x) = math.max(0, math.min(255, math.round(s / 4 + 128).toInt))
      }
      out
    }
    val planes = (0 until 3).map { ci =>
      (0 until 2).map { bx =>
        directIdct(blocks.getOrElse((ci, bx, 0), new Array[Int](64)))
      }
    }
    def clamp(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
    for (y <- 0 until 8; x <- 0 until 16) {
      val bx = x / 8; val px = x % 8
      val yy = planes(0)(bx)(y * 8 + px).toDouble
      val cb = planes(1)(bx)(y * 8 + px) - 128.0
      val cr = planes(2)(bx)(y * 8 + px) - 128.0
      val want = (clamp(yy + 1.402 * cr),
        clamp(yy - 0.344136 * cb - 0.714136 * cr),
        clamp(yy + 1.772 * cb))
      assert(img.pixels(y * 16 + x) == want, s"($x,$y)")
    }
  }

  test("restart intervals: RST markers cycle past 7 and reset DC prediction") {
    val w = 80; val h = 16 // 10 x 2 = 20 MCUs -> RST indices wrap (ri = 1)
    val yOf = (bx: Int, by: Int) => (37 * bx + 11 * by) % 200
    for (ri <- Seq(1, 3)) {
      val enc = JpegCodec.encodeJpegFlat(w, h, subsample420 = false, yOf,
        restartInterval = ri)
      val img = JpegCodec.decodeJpeg(enc).get
      for (y <- 0 until h; x <- 0 until w) {
        val v = yOf(x / 8, y / 8)
        assert(img.pixels(y * w + x) == ((v, v, v)), s"ri=$ri ($x,$y)")
      }
    }
    // DRI really is in the stream: the ri=1 encoding carries RST bytes
    val plain = JpegCodec.encodeJpegFlat(w, h, subsample420 = false, yOf)
    val rst = JpegCodec.encodeJpegFlat(w, h, subsample420 = false, yOf,
      restartInterval = 1)
    assert(rst.length > plain.length)
  }

  test("progressive flat-block roundtrip is bit-exact (DC point transform + refinement)") {
    for (sub <- Seq(false, true)) {
      val w = 32; val h = 32
      val yOf = (bx: Int, by: Int) => 40 + 13 * bx + 7 * by
      def dcOnly(v: Int) = { val a = new Array[Int](64); a(0) = v - 128; a }
      val enc = JpegCodec.encodeJpegProgressive(w, h, nComp = 3,
        subsample420 = sub, JpegCodec.FlatQuant, JpegCodec.FlatQuant,
        (ci, bx, by) => if (ci == 0) dcOnly(yOf(bx, by)) else dcOnly(128))
      val img = JpegCodec.decodeJpeg(enc).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = yOf(x / 8, y / 8)
        assert(img.pixels(y * w + x) == ((v, v, v)), s"sub=$sub ($x,$y)")
      }
    }
  }

  test("progressive AC path (bands, EOB runs, refinement correction bits) matches direct IDCT") {
    // coefficients chosen to drive every emitter/decoder branch: odd values
    // (correction bit 1), even values (correction bit 0), |v|=1 values
    // (newly significant only in the refinement scan), long zero runs
    // crossing the 1..5 / 6..63 luma band split, and all-zero-band blocks
    // (EOB runs spanning blocks)
    val q1 = Array.fill(64)(1)
    def zz(pairs: (Int, Int)*): Array[Int] = {
      val a = new Array[Int](64)
      pairs.foreach { case (k, v) => a(JpegCodec.ZigZag(k)) = v }
      a
    }
    val blocks: Map[(Int, Int, Int), Array[Int]] = Map(
      (0, 0, 0) -> zz(0 -> 37, 1 -> -21, 3 -> 9, 5 -> -1, 22 -> -4, 63 -> 3),
      (0, 1, 0) -> zz(0 -> -90, 2 -> 15, 6 -> -15, 7 -> 1),
      (0, 0, 1) -> zz(0 -> 12, 10 -> 8, 35 -> -7),
      // (0,1,1): all-zero — EOB-run block between content blocks
      (1, 0, 0) -> zz(0 -> 12, 10 -> 8),
      (1, 1, 1) -> zz(1 -> 1, 62 -> -1), // chroma: only refinement-visible ACs
      (2, 1, 0) -> zz(0 -> 0, 33 -> 5))
    val cf = (ci: Int, bx: Int, by: Int) =>
      blocks.getOrElse((ci, bx, by), new Array[Int](64))
    val enc = JpegCodec.encodeJpegProgressive(16, 16, nComp = 3,
      subsample420 = false, q1, q1, cf)
    val img = JpegCodec.decodeJpeg(enc).get
    // reference: decode the BASELINE encoding of the same coefficients —
    // already proven against the independently-coded direct IDCT above
    val base = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(16, 16, 3,
      subsample420 = false, q1, q1, cf)).get
    assert(img.width == base.width && img.height == base.height)
    for (i <- img.pixels.indices)
      assert(img.pixels(i) == base.pixels(i), s"pixel $i: ${img.pixels(i)} vs ${base.pixels(i)}")
  }

  test("progressive grayscale equals its baseline decode; truncated scans reject") {
    val cfG = (_: Int, bx: Int, by: Int) => {
      val a = new Array[Int](64); a(0) = 10 * bx + by - 50; a(5) = bx - by; a
    }
    val encG = JpegCodec.encodeJpegProgressive(24, 8, nComp = 1,
      subsample420 = false, JpegCodec.FlatQuant, JpegCodec.FlatQuant, cfG)
    val refG = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(24, 8, 1,
      subsample420 = false, JpegCodec.FlatQuant, JpegCodec.FlatQuant, cfG)).get
    val gotG = JpegCodec.decodeJpeg(encG).get
    assert(gotG.pixels.toSeq == refG.pixels.toSeq)
    // truncations at every boundary return None, never throw
    for (keep <- Seq(10, 100, 200, encG.length - 1, encG.length - 2))
      assert(JpegCodec.decodeJpeg(encG.take(keep)).isEmpty, s"keep=$keep")
    // a progressive stream missing its EOI (trailing scans unseen) rejects
    assert(JpegCodec.decodeJpeg(encG.dropRight(2)).isEmpty)
  }

  test("hostile inputs return None, never throw") {
    val good = JpegCodec.encodeJpegFlat(16, 16, subsample420 = false,
      (bx, by) => 60 + bx + by)
    assert(JpegCodec.decodeJpeg(good).isDefined)
    // truncations at every stage: header, tables, entropy data, EOI
    for (keep <- Seq(1, 3, 20, 150, good.length - 1, good.length - 2))
      assert(JpegCodec.decodeJpeg(good.take(keep)).isEmpty, s"keep=$keep")
    // not a JPEG at all
    assert(JpegCodec.decodeJpeg(Array[Byte](0, 1, 2, 3)).isEmpty)
    assert(JpegCodec.decodeJpeg(Array.emptyByteArray).isEmpty)
    // progressive frame: SOF0 marker byte patched to SOF2
    val sof = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    val prog = good.clone(); prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(prog).isEmpty)
    // hostile dims: width x height patched to 65535 x 65535 (> pixel cap);
    // JPEG has no CRC, so the cap check is what stands between a small
    // payload and a 4-billion-pixel allocation
    val big = good.clone()
    big(sof + 5) = 0xff.toByte; big(sof + 6) = 0xff.toByte // height
    big(sof + 7) = 0xff.toByte; big(sof + 8) = 0xff.toByte // width
    assert(JpegCodec.decodeJpeg(big).isEmpty)
    // zero width
    val zero = good.clone()
    zero(sof + 7) = 0; zero(sof + 8) = 0
    assert(JpegCodec.decodeJpeg(zero).isEmpty)
    // SOS table-selector nibbles past slot 3: must reject, not index out
    // of the 4-slot table arrays (found by self-review — the one hostile
    // byte the original fixture set never flipped)
    val sos = good.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
    assert(sos > 0)
    val badTd = good.clone(); badTd(sos + 6) = 0x75.toByte // comp 1's Td/Ta
    assert(JpegCodec.decodeJpeg(badTd).isEmpty)
    val badTa = good.clone(); badTa(sos + 6) = 0x07.toByte
    assert(JpegCodec.decodeJpeg(badTa).isEmpty)
    // quant tables never defined: DQT marker disguised as a comment
    val dqt = good.indexOfSlice(Seq(0xff.toByte, 0xdb.toByte))
    val noQ = good.clone(); noQ(dqt + 1) = 0xfe.toByte
    assert(JpegCodec.decodeJpeg(noQ).isEmpty)
    // Huffman tables never defined
    val dht = good.indexOfSlice(Seq(0xff.toByte, 0xc4.toByte))
    val noH = good.clone(); noH(dht + 1) = 0xfe.toByte
    assert(JpegCodec.decodeJpeg(noH).isEmpty)
    // corrupted entropy data: flip bytes near the end of the scan; every
    // variant must decode (differently) or reject — never throw
    for (i <- good.length - 12 until good.length - 2) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x5a).toByte
      JpegCodec.decodeJpeg(bad) // Some(garbage) or None are both fine
    }
    // missing EOI trailer
    assert(JpegCodec.decodeJpeg(good.dropRight(2) :+ 0x00.toByte :+ 0x00.toByte).isEmpty)
  }

  test("single-byte corruption sweep: no 1-byte flip anywhere makes decode throw") {
    // exhaustive deterministic fuzz over BOTH stream kinds: every byte
    // position, three xor masks — markers, lengths, table definitions,
    // dims, entropy data, trailers all get hit. The contract under test
    // is exactly "None or garbage pixels, never a throw".
    def dcOnly(v: Int) = { val a = new Array[Int](64); a(0) = v - 128; a }
    val files = Seq(
      JpegCodec.encodeJpegFlat(16, 16, subsample420 = false,
        (bx, by) => 50 + bx + by, restartInterval = 1),
      JpegCodec.encodeJpegProgressive(16, 16, nComp = 3, subsample420 = false,
        JpegCodec.FlatQuant, JpegCodec.FlatQuant,
        (ci, bx, by) => if (ci == 0) dcOnly(60 + bx + by) else dcOnly(128)))
    for (f <- files; i <- f.indices; m <- Seq(0xff, 0x10, 0x01)) {
      val bad = f.clone()
      bad(i) = (bad(i) ^ m).toByte
      JpegCodec.decodeJpeg(bad) // must return, Some or None
    }
  }

  test("non-MCU-aligned dims: whole-MCU streams crop exactly, baseline and progressive") {
    // (24,16,420) is THE padded-vs-scan-grid case: luma's interleaved DC
    // walk covers 4 block columns (2 MCUs wide) while its AC scans cover
    // only ceil(24/8) = 3 — spec A.2.2 vs A.2.4. (17,23,420) pads both
    // axes; (9,9) and (20,10) exercise the 4:4:4 crop.
    def dcOnly(v: Int) = { val a = new Array[Int](64); a(0) = v - 128; a }
    for ((w, h, sub) <- Seq((20, 10, false), (9, 9, false), (24, 16, true), (17, 23, true))) {
      val yOf = (bx: Int, by: Int) => 30 + 9 * bx + 5 * by
      val encs = Seq(
        JpegCodec.encodeJpegFlat(w, h, subsample420 = sub, yOf),
        JpegCodec.encodeJpegProgressive(w, h, nComp = 3, subsample420 = sub,
          JpegCodec.FlatQuant, JpegCodec.FlatQuant,
          (ci, bx, by) => if (ci == 0) dcOnly(yOf(bx, by)) else dcOnly(128)))
      for ((enc, kind) <- encs.zip(Seq("baseline", "progressive"))) {
        val img = JpegCodec.decodeJpeg(enc).get
        assert(img.width == w && img.height == h, s"$kind ${w}x$h sub=$sub")
        for (y <- 0 until h; x <- 0 until w) {
          val v = yOf(x / 8, y / 8)
          assert(img.pixels(y * w + x) == ((v, v, v)),
            s"$kind ${w}x$h sub=$sub ($x,$y)")
        }
      }
    }
  }

  test("encoder rejects out-of-contract inputs loudly") {
    intercept[IllegalArgumentException] { // nonpositive dims
      JpegCodec.encodeJpegFlat(0, 8, subsample420 = false, (_, _) => 0)
    }
    intercept[IllegalArgumentException] { // sample out of range
      JpegCodec.encodeJpegFlat(8, 8, subsample420 = false, (_, _) => 300)
    }
    intercept[IllegalArgumentException] { // AC magnitude past category 10
      JpegCodec.encodeJpeg(8, 8, 1, subsample420 = false,
        JpegCodec.FlatQuant, JpegCodec.FlatQuant,
        (_, _, _) => { val a = new Array[Int](64); a(5) = 2000; a })
    }
  }

  test("multimodal decode chain picks up JPEG payloads for real") {
    val enc = JpegCodec.encodeJpegFlat(16, 8, subsample420 = false,
      (bx, _) => 100 + 20 * bx)
    val Some((w, h, c, feats)) = graft.operators.Multimodal.realDecode(enc)
    assert((w, h, c) == ((16, 8, 3)))
    assert(feats(0) == 100f && feats(1) == 100f && feats(2) == 100f) // top-left
    // row-weighted sum: rows of 8x100 + 8x120 pixels, weights y+1
    val wsum = (0 until 8).map(y => (y + 1).toLong * (8 * 100 + 8 * 120)).sum
    assert(feats(3) == wsum.toFloat)
  }
}
