package graft.operators

import MediaCodecs.BmpImage

/** Pure-JVM BASELINE JPEG codec (ITU-T T.81 sequential DCT, 8-bit,
  * non-progressive) — the last commonly-hit image format on the real
  * decode path. No external libraries: the marker walk, canonical Huffman
  * coding (spec §C.2 / F.2.2.3), zigzag + dequantization, the 2-D IDCT,
  * chroma upsampling, and JFIF YCbCr→RGB conversion are all implemented
  * here from the public specification.
  *
  * Decoder scope: SOF0 frames, 1 or 3 components, sampling factors in
  * {1, 2} per axis (covers 4:4:4, 4:2:0, 4:2:2, 4:4:0), restart
  * intervals, 8-bit quantization tables, single interleaved scan.
  * Everything else — progressive (SOF2), arithmetic coding, 12-bit,
  * hierarchical — returns None, as does any corruption: truncated entropy
  * stream, a marker mid-scan, an undefined Huffman/quant table, a
  * coefficient run past k=63, dims over [[MaxJpegPixels]] (a few-KB
  * payload can declare an enormous frame — allocation is bounded by the
  * cap, never by payload size), or a missing EOI trailer. The decoder
  * NEVER throws on hostile bytes.
  *
  * The encoder is driven at the QUANTIZED-COEFFICIENT level: callers
  * supply each 8×8 block's 64 quantized coefficients, and the encoder
  * performs the real zigzag scan, run-length coding, category/magnitude
  * split, Huffman coding (the public Annex K tables), byte stuffing, and
  * restart-marker emission. DC-only blocks with q(0) = 8 make the decoded
  * pixels closed-form (pixel = coeff + 128, exactly — lossy rounding
  * vanishes when every AC is zero), which is what the oracle-checked
  * roundtrip (q204) exploits; spec tests feed nonzero ACs to drive the
  * run-length and IDCT paths against an independently-coded reference.
  *
  * Scale: like the other [[MediaCodecs]] codecs this is a pure function of
  * one payload used inside `mapPartitions` — embarrassingly parallel, no
  * shuffle, no driver involvement.
  */
object JpegCodec {

  /** Decode pixel budget — same rationale as [[MediaCodecs.MaxPngPixels]]:
    * entropy coding hides the raster size from any payload-length bound.
    */
  val MaxJpegPixels: Long = 1L << 24

  /** Zigzag index k → natural (row-major) position, spec Figure 5. */
  private[graft] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K "typical" Huffman tables (public spec constants): code-length
  // counts for lengths 1..16, then the symbol list in code order.
  private val DcLumaCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaSyms = (0 to 11).toArray
  private val DcChromaCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaSyms = (0 to 11).toArray
  private val AcLumaCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaCounts = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaSyms = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Decode-failure control signal: thrown by the guts, caught ONCE at the
    * [[decodeJpeg]] boundary and turned into None — no stack trace is
    * filled in (writable-stacktrace false), so hostile inputs cost no
    * throwable construction beyond this singleton.
    */
  private object Fail extends RuntimeException(null: String, null, false, false)
  private def fail(): Nothing = throw Fail

  /** Canonical Huffman table (spec C.2 code generation): shared by the
    * decoder (mincode/maxcode/valptr per F.2.2.3) and the encoder
    * (symbol → code/size).
    */
  private final class Huff(counts: Array[Int], val symbols: Array[Int]) {
    require(counts.length == 16 && counts.sum == symbols.length)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    // encoder side: symbol -> (code, size)
    val encCode = new Array[Int](256)
    val encSize = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          var i = 0
          while (i < counts(l - 1)) {
            encCode(symbols(k)) = code
            encSize(symbols(k)) = l
            code += 1; k += 1; i += 1
          }
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (code > maxCode(l)) {
        code = (code << 1) | br.bit()
        l += 1
        if (l > 16) fail()
      }
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  private val DcLuma = new Huff(DcLumaCounts, DcLumaSyms)
  private val DcChroma = new Huff(DcChromaCounts, DcChromaSyms)
  private val AcLuma = new Huff(AcLumaCounts, AcLumaSyms)
  private val AcChroma = new Huff(AcChromaCounts, AcChromaSyms)

  /** MSB-first entropy-stream reader with 0xFF00 byte-unstuffing. A bare
    * marker mid-read means the scan ended early → fail.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail()
        val v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) fail()
          if ((b(pos) & 0xff) == 0x00) pos += 1 else fail()
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Drop to the next byte boundary and consume the expected RSTn. */
    def expectRestart(n: Int): Unit = {
      nbits = 0
      if (pos + 1 >= b.length) fail()
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n)) fail()
      pos += 2
    }
    /** Drop padding bits and require the EOI trailer (fill FFs allowed). */
    def expectEoi(): Unit = {
      nbits = 0
      var p = pos
      while (p + 1 < b.length && (b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xff)
        p += 1
      if (p + 1 >= b.length || (b(p) & 0xff) != 0xff || (b(p + 1) & 0xff) != 0xd9)
        fail()
    }
  }

  /** Spec F.2.2.1 EXTEND: an s-bit magnitude v to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // C(u)·cos((2x+1)uπ/16) — the separable IDCT basis, precomputed once
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline JPEG; None — never throw — on anything outside the
    * documented scope or on corrupt/hostile bytes. Returns the shared RGB
    * container (grayscale widened to r = g = b).
    */
  def decodeJpeg(b: Array[Byte]): Option[BmpImage] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    try Some(decodeGuts(b)) catch { case Fail => None }
  }

  private def decodeGuts(b: Array[Byte]): BmpImage = {
    def u8(p: Int): Int = { if (p >= b.length) fail(); b(p) & 0xff }
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)

    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var pos = 2

    var result: BmpImage = null
    while (result == null) {
      // markers may be preceded by fill bytes (0xFF runs)
      if (u8(pos) != 0xff) fail()
      while (u8(pos + 1) == 0xff) pos += 1
      val m = u8(pos + 1)
      pos += 2
      if (m == 0xd8 || m == 0xd9 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        fail() // second SOI, EOI before any scan, or a stray standalone marker
      } else {
        val len = u16(pos)
        if (len < 2 || pos + len > b.length) fail()
        m match {
          case 0xdb => // DQT: one or more tables in the segment
            var p = pos + 2
            while (p < pos + len) {
              val pqTq = u8(p)
              if ((pqTq >> 4) != 0) fail() // baseline: 8-bit tables only
              val t = pqTq & 15
              if (t > 3 || p + 65 > pos + len) fail()
              var i = 0
              while (i < 64) {
                qt(t)(i) = u8(p + 1 + i)
                if (qt(t)(i) == 0) fail()
                i += 1
              }
              qtSeen(t) = true
              p += 65
            }
            if (p != pos + len) fail()
          case 0xc4 => // DHT: one or more tables
            var p = pos + 2
            while (p < pos + len) {
              val tcTh = u8(p)
              val tc = tcTh >> 4; val th = tcTh & 15
              if (tc > 1 || th > 3 || p + 17 > pos + len) fail()
              val counts = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = counts.sum
              if (n == 0 || n > 256 || p + 17 + n > pos + len) fail()
              val syms = Array.tabulate(n)(i => u8(p + 17 + i))
              val huff = new Huff(counts, syms)
              if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
              p += 17 + n
            }
            if (p != pos + len) fail()
          case 0xc0 => // SOF0 — baseline sequential
            if (comps != null) fail()
            if (u8(pos + 2) != 8) fail() // sample precision
            h = u16(pos + 3); w = u16(pos + 5)
            val nc = u8(pos + 7)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxJpegPixels) fail()
            if ((nc != 1 && nc != 3) || len != 8 + 3 * nc) fail()
            comps = Array.tabulate(nc) { i =>
              val p = pos + 8 + 3 * i
              val hv = u8(p + 1)
              val c = Comp(u8(p), hv >> 4, hv & 15, u8(p + 2))
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) fail()
              c
            }
            if (comps.map(_.id).distinct.length != nc) fail()
          case mm if mm >= 0xc1 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 && mm != 0xcc =>
            fail() // progressive/extended/lossless/arithmetic frames
          case 0xdd => // DRI
            if (len != 4) fail()
            restartInterval = u16(pos + 2)
          case 0xda => // SOS — decode the single interleaved scan
            if (comps == null) fail()
            val ns = u8(pos + 2)
            if (ns != comps.length || len != 6 + 2 * ns) fail()
            val scanTabs = Array.tabulate(ns) { i =>
              val cs = u8(pos + 3 + 2 * i)
              val ci = comps.indexWhere(_.id == cs)
              if (ci != i) fail() // baseline interleave in frame order
              val tdTa = u8(pos + 4 + 2 * i)
              val dc = dcTabs(tdTa >> 4); val ac = acTabs(tdTa & 15)
              if (dc == null || ac == null) fail()
              (dc, ac)
            }
            // spectral selection 0..63, no successive approximation
            if (u8(pos + len - 3) != 0 || u8(pos + len - 2) != 63 ||
              u8(pos + len - 1) != 0) fail()
            comps.foreach(c => if (!qtSeen(c.tq)) fail())
            result = decodeScan(b, pos + len, w, h, comps, scanTabs, qt,
              restartInterval)
          case _ => () // APPn / COM / DNL-free: skip
        }
        if (result == null) pos += len
      }
    }
    result
  }

  private def decodeScan(b: Array[Byte], dataStart: Int, w: Int, h: Int,
      comps: Array[Comp], scanTabs: Array[(Huff, Huff)],
      qt: Array[Array[Int]], restartInterval: Int): BmpImage = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * mcusY * 8 * comps(i).v)).toArray
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val s1 = Array.ofDim[Double](8, 8)
    val br = new BitReader(b, dataStart)

    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRestart((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val (dcT, acT) = scanTabs(ci)
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // -- decode one block's 64 dequantized coefficients --
              java.util.Arrays.fill(coef, 0)
              val s = dcT.decode(br)
              if (s > 11) fail()
              val diff = if (s == 0) 0 else extend(br.receive(s), s)
              preds(ci) += diff
              coef(0) = preds(ci) * q(0)
              var k = 1
              while (k < 64) {
                val rs = acT.decode(br)
                val r = rs >> 4; val ss = rs & 15
                if (ss == 0) {
                  if (r == 15) k += 16 else k = 64 // ZRL / EOB
                } else {
                  k += r
                  if (k > 63 || ss > 10) fail() // run past the block / past baseline AC category
                  coef(ZigZag(k)) = extend(br.receive(ss), ss) * q(k)
                  k += 1
                }
              }
              // -- separable IDCT + level shift into the component plane --
              var v0 = 0
              while (v0 < 8) {
                var x = 0
                while (x < 8) {
                  var acc = 0.0
                  var u = 0
                  while (u < 8) { acc += CosT(x)(u) * coef(v0 * 8 + u); u += 1 }
                  s1(v0)(x) = acc
                  x += 1
                }
                v0 += 1
              }
              val baseX = (mx * c.h + bx) * 8
              val baseY = (my * c.v + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var acc = 0.0
                  var v1 = 0
                  while (v1 < 8) { acc += CosT(y)(v1) * s1(v1)(x); v1 += 1 }
                  val px = math.round(0.25 * acc + 128.0).toInt
                  planes(ci)((baseY + y) * planeW(ci) + baseX + x) =
                    math.max(0, math.min(255, px))
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    br.expectEoi()

    // assemble RGB, cropping MCU padding; chroma upsamples by replication
    val px = new Array[(Int, Int, Int)](w * h)
    def sample(ci: Int, x: Int, y: Int): Int =
      planes(ci)((y * comps(ci).v / vmax) * planeW(ci) + x * comps(ci).h / hmax)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          if (comps.length == 1) {
            val g = sample(0, x, y); (g, g, g)
          } else {
            val yy = sample(0, x, y).toDouble
            val cb = sample(1, x, y) - 128.0
            val cr = sample(2, x, y) - 128.0
            def clamp(d: Double): Int =
              math.max(0, math.min(255, math.round(d).toInt))
            (clamp(yy + 1.402 * cr),
              clamp(yy - 0.344136 * cb - 0.714136 * cr),
              clamp(yy + 1.772 * cb))
          }
        x += 1
      }
      y += 1
    }
    BmpImage(w, h, px)
  }

  // ------------------------------------------------------------ encoder --

  /** MSB-first entropy-stream writer: 0xFF bytes get the mandatory 0x00
    * stuffing; flush pads the final byte with 1-bits (spec F.1.2.3).
    */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Magnitude category (bit count) of a nonzero coefficient. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a baseline JFIF JPEG from QUANTIZED 8×8 coefficient blocks.
    *
    *   - `nComp` 1 (grayscale) or 3 (YCbCr; component 0 uses the luma
    *     quant/Huffman tables, 1..2 the chroma ones).
    *   - `subsample420` (3-component only): component 0 sampled 2×2,
    *     chroma 1×1 — dims must be multiples of 16; otherwise 4:4:4 with
    *     dims multiples of 8 (the decoder handles arbitrary dims; the
    *     encoder keeps full MCUs so callers control every pixel).
    *   - `quantLuma` / `quantChroma`: 64 entries in ZIGZAG order, 1..255.
    *   - `coeffs(comp, bx, by)`: the block's 64 quantized coefficients in
    *     NATURAL order, |AC| ≤ 1023 and |ΔDC| ≤ 2047 (baseline category
    *     limits); (bx, by) index the COMPONENT's own block grid.
    *   - `restartInterval` > 0 emits DRI and RSTn markers every that many
    *     MCUs, resetting DC prediction — the resync path real encoders use.
    */
  def encodeJpeg(width: Int, height: Int, nComp: Int, subsample420: Boolean,
      quantLuma: Array[Int], quantChroma: Array[Int],
      coeffs: (Int, Int, Int) => Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(nComp == 1 || nComp == 3, s"nComp must be 1 or 3, got $nComp")
    require(!(subsample420 && nComp == 1), "4:2:0 needs 3 components")
    val mcuPx = if (subsample420) 16 else 8
    require(width > 0 && height > 0 && width % mcuPx == 0 && height % mcuPx == 0,
      s"dims ${width}x$height must be positive multiples of $mcuPx")
    require(width.toLong * height <= MaxJpegPixels,
      s"dims ${width}x$height exceed the JPEG pixel budget")
    Seq(quantLuma, quantChroma).foreach(q =>
      require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
        "quant tables need 64 entries in 1..255"))

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xdb, (Array(0) ++ quantLuma) ++
      (if (nComp == 3) Array(1) ++ quantChroma else Array.empty[Int])) // DQT
    val comps = Array.tabulate(nComp) { i =>
      if (i == 0) Comp(1, if (subsample420) 2 else 1, if (subsample420) 2 else 1, 0)
      else Comp(i + 1, 1, 1, 1)
    }
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      nComp) ++ comps.flatMap(c => Array(c.id, (c.h << 4) | c.v, c.tq))) // SOF0
    def dht(tc: Int, th: Int, counts: Array[Int], syms: Array[Int]): Array[Int] =
      Array((tc << 4) | th) ++ counts ++ syms
    seg(0xc4, dht(0, 0, DcLumaCounts, DcLumaSyms) ++
      dht(1, 0, AcLumaCounts, AcLumaSyms) ++
      (if (nComp == 3)
        dht(0, 1, DcChromaCounts, DcChromaSyms) ++
          dht(1, 1, AcChromaCounts, AcChromaSyms)
      else Array.empty[Int])) // DHT
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    seg(0xda, Array(nComp) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        Array(c.id, if (i == 0) 0x00 else 0x11)
      } ++ Array(0, 63, 0)) // SOS

    val bw = new BitWriter(out)
    val preds = new Array[Int](nComp)
    def putCoeff(v: Int, huff: Huff, runLen: Int): Unit = {
      val s = category(v)
      bw.put(huff.encCode((runLen << 4) | s), huff.encSize((runLen << 4) | s))
      bw.put(if (v < 0) (v - 1) & ((1 << s) - 1) else v, s)
    }
    def encodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val cf = coeffs(ci, bx, by)
      require(cf.length == 64, s"coeffs($ci,$bx,$by) must have 64 entries")
      val (dcH, acH) = if (ci == 0) (DcLuma, AcLuma) else (DcChroma, AcChroma)
      val diff = cf(0) - preds(ci)
      preds(ci) = cf(0)
      require(math.abs(diff) <= 2047, s"DC diff $diff past baseline category 11")
      if (diff == 0) bw.put(dcH.encCode(0), dcH.encSize(0))
      else putCoeff(diff, dcH, 0)
      var run = 0
      var k = 1
      while (k < 64) {
        val v = cf(ZigZag(k))
        if (v == 0) run += 1
        else {
          require(math.abs(v) <= 1023, s"AC $v past baseline category 10")
          while (run > 15) { bw.put(acH.encCode(0xf0), acH.encSize(0xf0)); run -= 16 }
          putCoeff(v, acH, run)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acH.encCode(0x00), acH.encSize(0x00)) // EOB
    }
    val mcusX = width / mcuPx
    val mcusY = height / mcuPx
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < nComp) {
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              encodeBlock(ci, mx * c.h + bx, my * c.v + by)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Quant table whose DC step is 8 — DC-only blocks then decode to
    * EXACTLY coeff + 128 per pixel (IDCT of a pure-DC block is flat at
    * DC·q(0)/8; the lossy rounding that makes general JPEG decode
    * unpredictable in SQL vanishes). AC steps are the conventional 16.
    */
  val FlatQuant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** Encode a FLAT-BLOCK JPEG: every 8×8 block of each component is one
    * uniform sample value, supplied per block — `yOf(bx, by)` for the luma
    * plane's block grid, constant `cb`/`cr` for chroma (128 ⇒ the decoded
    * RGB equals the luma value exactly: the YCbCr→RGB terms vanish). With
    * [[FlatQuant]] the roundtrip is bit-exact and closed-form, which is
    * what the q204 oracle predicts from SQL. 3 components; 4:2:0 when
    * `subsample420` (dims multiples of 16, one chroma block per MCU).
    */
  def encodeJpegFlat(width: Int, height: Int, subsample420: Boolean,
      yOf: (Int, Int) => Int, cb: Int = 128, cr: Int = 128,
      restartInterval: Int = 0): Array[Byte] = {
    def dcOnly(v: Int): Array[Int] = {
      require(v >= 0 && v <= 255, s"sample $v out of range")
      val cf = new Array[Int](64)
      cf(0) = v - 128
      cf
    }
    encodeJpeg(width, height, nComp = 3, subsample420,
      FlatQuant, FlatQuant,
      (ci, bx, by) =>
        if (ci == 0) dcOnly(yOf(bx, by)) else dcOnly(if (ci == 1) cb else cr),
      restartInterval)
  }
}
