package graft.operators

import MediaCodecs.BmpImage

/** Pure-JVM JPEG codec (ITU-T T.81, 8-bit) — BASELINE sequential (SOF0)
  * AND PROGRESSIVE (SOF2), the two formats that cover essentially every
  * JPEG a real multimodal lake holds. No external libraries: the marker
  * walk, canonical Huffman coding (spec §C.2 / F.2.2.3), zigzag +
  * dequantization, the 2-D IDCT, chroma upsampling, JFIF YCbCr→RGB, and
  * the full progressive machinery (spec §G: spectral selection, DC/AC
  * successive approximation, EOB runs, refinement correction bits) are
  * all implemented here from the public specification.
  *
  * Decoder scope: SOF0/SOF2 frames, 1 or 3 components, sampling factors
  * in {1, 2} per axis (covers 4:4:4, 4:2:0, 4:2:2, 4:4:0), restart
  * intervals, 8-bit quantization tables; progressive scans may be
  * interleaved (DC) or single-component over the non-interleaved scan
  * grid (spec A.2.2), in any spectral/approximation order. Everything
  * else — arithmetic coding, 12-bit, hierarchical — returns None, as
  * does any corruption: truncated entropy stream, a marker mid-scan, an
  * undefined Huffman/quant table, a coefficient run past the band, dims
  * over [[MaxJpegPixels]] (a few-KB payload can declare an enormous
  * frame — allocation is bounded by the cap, never by payload size), or
  * a missing EOI trailer. The decoder NEVER throws on hostile bytes.
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
    /** Drop padding bits; the position where the next marker must start. */
    def endOfScan(): Int = { nbits = 0; pos }
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

  /** Shared frame geometry: the MCU-padded per-component block grids
    * (interleaved scans walk these) and the NON-interleaved scan grids
    * (progressive AC scans and single-component DC scans walk ceil of the
    * component's own sampled dimensions — one less padding column/row than
    * the MCU grid when the frame size is awkward; spec A.2.2/A.2.3).
    */
  private final class Geometry(val comps: Array[Comp], val w: Int, val h: Int) {
    val hmax: Int = comps.map(_.h).max
    val vmax: Int = comps.map(_.v).max
    val mcusX: Int = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY: Int = (h + 8 * vmax - 1) / (8 * vmax)
    val blocksW: Array[Int] = comps.map(c => mcusX * c.h)
    val blocksH: Array[Int] = comps.map(c => mcusY * c.v)
    val scanW: Array[Int] =
      comps.map(c => ((w * c.h + hmax - 1) / hmax + 7) / 8)
    val scanH: Array[Int] =
      comps.map(c => ((h * c.v + vmax - 1) / vmax + 7) / 8)
  }

  /** Separable IDCT of one natural-order coefficient block into a
    * component plane at (baseX, baseY), with level shift and clamp.
    * `s1` is the caller's reusable 8×8 scratch.
    */
  private def idctInto(nat: Array[Int], plane: Array[Int], planeW: Int,
      baseX: Int, baseY: Int, s1: Array[Array[Double]]): Unit = {
    var v0 = 0
    while (v0 < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += CosT(x)(u) * nat(v0 * 8 + u); u += 1 }
        s1(v0)(x) = acc
        x += 1
      }
      v0 += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v1 = 0
        while (v1 < 8) { acc += CosT(y)(v1) * s1(v1)(x); v1 += 1 }
        val px = math.round(0.25 * acc + 128.0).toInt
        plane((baseY + y) * planeW + baseX + x) = math.max(0, math.min(255, px))
        x += 1
      }
      y += 1
    }
  }

  /** Crop the component planes to w×h RGB: chroma upsamples by
    * replication; 1-component widens gray; 3-component converts JFIF
    * YCbCr. Shared by the baseline and progressive reconstructions.
    */
  private def assemblePixels(planes: Array[Array[Int]], planeW: Array[Int],
      comps: Array[Comp], w: Int, h: Int): BmpImage = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
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

  /** Accumulated PROGRESSIVE decode state: per component, the quantized
    * coefficients of every MCU-padded block in ZIGZAG order, refined scan
    * by scan; DC predictors and the EOB run reset per scan (and at
    * restart markers).
    */
  private final class ProgState(val geo: Geometry) {
    val coefs: Array[Array[Int]] = geo.comps.indices.map(i =>
      new Array[Int](geo.blocksW(i) * geo.blocksH(i) * 64)).toArray
    val preds = new Array[Int](geo.comps.length)
    var eobrun = 0
  }

  /** Decode one progressive scan's entropy data (spec G.2): DC first /
    * DC refinement (interleaved or single-component), AC first with EOB
    * runs, and AC refinement with correction bits — updating `st` in
    * place. Returns the byte position where the next marker must start.
    */
  private def decodeProgScan(b: Array[Byte], dataStart: Int, st: ProgState,
      scanComps: Array[(Int, Huff, Huff)], ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int): Int = {
    val geo = st.geo
    val br = new BitReader(b, dataStart)
    java.util.Arrays.fill(st.preds, 0)
    st.eobrun = 0
    var unit = 0
    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.expectRestart((unit / restartInterval - 1) % 8)
        java.util.Arrays.fill(st.preds, 0)
        st.eobrun = 0
      }
    def dcUnit(ci: Int, off: Int, dcT: Huff): Unit =
      if (ah == 0) {
        if (dcT == null) fail()
        val s = dcT.decode(br)
        if (s > 11) fail()
        val diff = if (s == 0) 0 else extend(br.receive(s), s)
        st.preds(ci) += diff
        st.coefs(ci)(off) = st.preds(ci) << al
      } else {
        if (br.bit() == 1) st.coefs(ci)(off) |= (1 << al)
      }
    def acFirst(cf: Array[Int], off: Int, acT: Huff): Unit = {
      if (st.eobrun > 0) { st.eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = acT.decode(br)
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else { st.eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0); k = 64 }
        } else {
          k += r
          if (k > se || s > 10) fail()
          cf(off + k) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }
    def acRefine(cf: Array[Int], off: Int, acT: Huff): Unit = {
      val p1 = 1 << al; val m1 = -p1
      def correct(k: Int): Unit = if (br.bit() == 1) {
        val c = cf(off + k)
        if ((c & p1) == 0) cf(off + k) = c + (if (c >= 0) p1 else m1)
      }
      var k = ss
      if (st.eobrun == 0) {
        var inBand = true
        while (inBand && k <= se) {
          val rs = acT.decode(br)
          var r = rs >> 4; val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r != 15) {
              st.eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              inBand = false // fall through to the EOB correction sweep
            }
          } else {
            if (s != 1) fail() // refinement only creates +-1 at this bit
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (inBand) {
            // advance past r ZERO-HISTORY coefficients, correcting the
            // nonzero-history ones passed on the way (they do not count)
            var placed = false
            while (!placed) {
              if (k > se) fail()
              val c = cf(off + k)
              if (c != 0) { correct(k); k += 1 }
              else if (r == 0) placed = true
              else { r -= 1; k += 1 }
            }
            if (newVal != 0) cf(off + k) = newVal
            k += 1
          }
        }
      }
      if (st.eobrun > 0) {
        while (k <= se) { if (cf(off + k) != 0) correct(k); k += 1 }
        st.eobrun -= 1
      }
    }
    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan: MCU walk over every component's sub-blocks
      var my = 0
      while (my < geo.mcusY) {
        var mx = 0
        while (mx < geo.mcusX) {
          maybeRestart()
          scanComps.foreach { case (ci, dcT, _) =>
            val c = geo.comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                dcUnit(ci,
                  ((my * c.v + by) * geo.blocksW(ci) + (mx * c.h + bx)) * 64, dcT)
                bx += 1
              }
              by += 1
            }
          }
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component walk over the NON-interleaved scan grid
      val (ci, dcT, acT) = scanComps(0)
      if (ss > 0 && acT == null) fail()
      val cf = st.coefs(ci)
      var by = 0
      while (by < geo.scanH(ci)) {
        var bx = 0
        while (bx < geo.scanW(ci)) {
          maybeRestart()
          val off = (by * geo.blocksW(ci) + bx) * 64
          if (ss == 0) dcUnit(ci, off, dcT)
          else if (ah == 0) acFirst(cf, off, acT)
          else acRefine(cf, off, acT)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    br.endOfScan()
  }

  /** Dequantize + IDCT every accumulated block and assemble RGB. */
  private def reconstructProgressive(st: ProgState, qt: Array[Array[Int]],
      qtSeen: Array[Boolean]): BmpImage = {
    val geo = st.geo
    geo.comps.foreach(c => if (!qtSeen(c.tq)) fail())
    val planeW = geo.comps.indices.map(i => geo.blocksW(i) * 8).toArray
    val planes = geo.comps.indices.map(i =>
      new Array[Int](planeW(i) * geo.blocksH(i) * 8)).toArray
    val s1 = Array.ofDim[Double](8, 8)
    val nat = new Array[Int](64)
    var ci = 0
    while (ci < geo.comps.length) {
      val q = qt(geo.comps(ci).tq)
      val cf = st.coefs(ci)
      var br0 = 0
      while (br0 < geo.blocksH(ci)) {
        var bc = 0
        while (bc < geo.blocksW(ci)) {
          val off = (br0 * geo.blocksW(ci) + bc) * 64
          var k = 0
          while (k < 64) { nat(ZigZag(k)) = cf(off + k) * q(k); k += 1 }
          idctInto(nat, planes(ci), planeW(ci), bc * 8, br0 * 8, s1)
          bc += 1
        }
        br0 += 1
      }
      ci += 1
    }
    assemblePixels(planes, planeW, geo.comps, geo.w, geo.h)
  }

  /** Decode a baseline OR progressive JPEG; None — never throw — on
    * anything outside the documented scope or on corrupt/hostile bytes.
    * Returns the shared RGB container (grayscale widened to r = g = b).
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
    var progressive = false
    var prog: ProgState = null
    var pos = 2

    var result: BmpImage = null
    while (result == null) {
      // markers may be preceded by fill bytes (0xFF runs)
      if (u8(pos) != 0xff) fail()
      while (u8(pos + 1) == 0xff) pos += 1
      val m = u8(pos + 1)
      pos += 2
      if (m == 0xd9) {
        // EOI: in a progressive stream with at least one scan decoded,
        // this is where reconstruction happens; anywhere else it is early
        if (prog == null) fail()
        result = reconstructProgressive(prog, qt, qtSeen)
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        fail() // second SOI or a stray standalone marker
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
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            if (comps != null) fail()
            progressive = m == 0xc2
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
          case mm if mm >= 0xc1 && mm <= 0xcf &&
            mm != 0xc2 && mm != 0xc4 && mm != 0xc8 && mm != 0xcc =>
            fail() // extended/lossless/arithmetic frames
          case 0xdd => // DRI
            if (len != 4) fail()
            restartInterval = u16(pos + 2)
          case 0xda if !progressive => // baseline: the single interleaved scan
            if (comps == null) fail()
            val ns = u8(pos + 2)
            if (ns != comps.length || len != 6 + 2 * ns) fail()
            val scanTabs = Array.tabulate(ns) { i =>
              val cs = u8(pos + 3 + 2 * i)
              val ci = comps.indexWhere(_.id == cs)
              if (ci != i) fail() // baseline interleave in frame order
              val tdTa = u8(pos + 4 + 2 * i)
              // table slots are 0..3: a hostile nibble past that must fail
              // cleanly, not index out of the 4-slot arrays
              if ((tdTa >> 4) > 3 || (tdTa & 15) > 3) fail()
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
          case 0xda => // progressive: one of many scans — accumulate
            if (comps == null) fail()
            val ns = u8(pos + 2)
            if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) fail()
            val ss = u8(pos + len - 3); val se = u8(pos + len - 2)
            val ahAl = u8(pos + len - 1)
            val ah = ahAl >> 4; val al = ahAl & 15
            if (al > 13 || ah > 13) fail()
            if (ss == 0) { if (se != 0) fail() } // DC scan: Se must be 0
            else if (ns != 1 || se < ss || se > 63) fail() // AC: single comp
            val scanComps = Array.tabulate(ns) { i =>
              val cs = u8(pos + 3 + 2 * i)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) fail()
              val tdTa = u8(pos + 4 + 2 * i)
              // table slots are 0..3: a hostile nibble past that must fail
              // cleanly, not index out of the 4-slot arrays
              if ((tdTa >> 4) > 3 || (tdTa & 15) > 3) fail()
              val dcT = dcTabs(tdTa >> 4) // may be null for DC REFINE (bits only)
              val acT = acTabs(tdTa & 15)
              if (ss == 0 && ah == 0 && dcT == null) fail()
              if (ss > 0 && acT == null) fail()
              (ci, dcT, acT)
            }
            if (scanComps.map(_._1).distinct.length != ns) fail()
            if (prog == null) prog = new ProgState(new Geometry(comps, w, h))
            pos = decodeProgScan(b, pos + len, prog, scanComps, ss, se, ah, al,
              restartInterval) - len // the shared advance below re-adds len
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

    // T.81 A.2: a SINGLE-component scan is NON-interleaved — one block per
    // MCU over the component's own ceil(dim/8) grid (sampling factors only
    // relate components to each other; alone, the component spans the full
    // frame whatever its declared factors). The interleaved walk below is
    // parametrized so both cases share the block-decode body; the MCU-
    // aligned plane is never smaller than the ceil(dim/8) grid needs.
    val oneComp = comps.length == 1
    val stepsX = if (oneComp) (w + 7) / 8 else mcusX
    val stepsY = if (oneComp) (h + 7) / 8 else mcusY

    var mcu = 0
    var my = 0
    while (my < stepsY) {
      var mx = 0
      while (mx < stepsX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRestart((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val (dcT, acT) = scanTabs(ci)
          val q = qt(c.tq)
          val nv = if (oneComp) 1 else c.v
          val nh = if (oneComp) 1 else c.h
          var by = 0
          while (by < nv) {
            var bx = 0
            while (bx < nh) {
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
              idctInto(coef, planes(ci), planeW(ci),
                (if (oneComp) mx else mx * c.h + bx) * 8,
                (if (oneComp) my else my * c.v + by) * 8, s1)
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
    assemblePixels(planes, planeW, comps, w, h)
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
    *     chroma 1×1. Dims may be ANY positive size: the stream always
    *     carries whole MCUs (spec A.2.4), so the block callback is asked
    *     for the right/bottom padding blocks too, and the decoder crops.
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
    // dims need NOT be MCU multiples: the stream always carries whole
    // MCUs (spec A.2.4) and the decoder crops — the block callback is
    // simply asked for the padding blocks too
    require(width > 0 && height > 0,
      s"dims ${width}x$height must be positive")
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
    val mcuPx = if (subsample420) 16 else 8
    val mcusX = (width + mcuPx - 1) / mcuPx
    val mcusY = (height + mcuPx - 1) / mcuPx
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

  // ------------------------------------------------- progressive encoder --

  /** AC Huffman table for PROGRESSIVE scans: the Annex K sequential tables
    * lack the EOBn symbols (r<<4 for r = 1..14) progressive EOB runs
    * need, so scans here use a flat canonical table carrying every symbol
    * the emitters can produce — EOB0..EOB14, all (run, size ≤ 10) pairs,
    * and ZRL — each at 8 bits (175/256 of the code space; the all-ones
    * code stays unused per the spec's convention). Compression is
    * secondary to a complete alphabet; the DECODER builds whatever DHT a
    * file carries, so this choice is encoder-local.
    */
  private val AcProgSyms: Array[Int] =
    ((0 to 14).map(_ << 4) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s) :+ 0xf0).toArray
  private val AcProg = new Huff(
    Array(0, 0, 0, 0, 0, 0, 0, AcProgSyms.length, 0, 0, 0, 0, 0, 0, 0, 0),
    AcProgSyms)

  /** One progressive scan: component indices (into the frame list),
    * spectral band [ss, se], successive-approximation bit positions
    * (ah = 0 for a first scan, else the previous al; al = this scan's
    * low bit).
    */
  final case class ProgScan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** The default scan script — chosen to exercise every decoder path: an
    * interleaved DC first scan with a point transform, per-component AC
    * first scans (luma split into two bands, so band-boundary EOB logic
    * runs), then DC and AC refinement scans.
    */
  def progressiveScript(nComp: Int): Seq[ProgScan] = {
    val acFirst = (0 until nComp).flatMap { ci =>
      if (ci == 0) Seq(ProgScan(Seq(0), 1, 5, 0, 1), ProgScan(Seq(0), 6, 63, 0, 1))
      else Seq(ProgScan(Seq(ci), 1, 63, 0, 1))
    }
    (ProgScan(0 until nComp, 0, 0, 0, 1) +: acFirst) ++
      (ProgScan(0 until nComp, 0, 0, 1, 0) +:
        (0 until nComp).map(ci => ProgScan(Seq(ci), 1, 63, 1, 0)))
  }

  /** Encode a PROGRESSIVE (SOF2) JFIF JPEG from the same quantized
    * coefficient blocks as [[encodeJpeg]], emitted through `scans`
    * (default [[progressiveScript]]): spectral selection, DC/AC
    * successive approximation, EOB runs, and refinement correction bits —
    * the real thing, not a re-ordered baseline. Same dims/quant/
    * coefficient contracts as the baseline encoder.
    */
  def encodeJpegProgressive(width: Int, height: Int, nComp: Int,
      subsample420: Boolean, quantLuma: Array[Int], quantChroma: Array[Int],
      coeffs: (Int, Int, Int) => Array[Int],
      scans: Seq[ProgScan] = null): Array[Byte] = {
    require(nComp == 1 || nComp == 3, s"nComp must be 1 or 3, got $nComp")
    require(!(subsample420 && nComp == 1), "4:2:0 needs 3 components")
    // dims need not be MCU multiples (the decoder crops); non-aligned
    // dims are in fact what makes the padded-vs-scan-grid distinction
    // real: interleaved DC scans cover the MCU-padded grid, AC scans only
    // the component's own ceil(sampled-dim/8) grid (spec A.2.2/A.2.4)
    require(width > 0 && height > 0,
      s"dims ${width}x$height must be positive")
    require(width.toLong * height <= MaxJpegPixels,
      s"dims ${width}x$height exceed the JPEG pixel budget")
    Seq(quantLuma, quantChroma).foreach(q =>
      require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
        "quant tables need 64 entries in 1..255"))
    val script = Option(scans).getOrElse(progressiveScript(nComp))
    script.foreach { sc =>
      require(sc.comps.nonEmpty && sc.comps.forall(c => c >= 0 && c < nComp) &&
        sc.comps.distinct.length == sc.comps.length, s"bad scan comps $sc")
      if (sc.ss == 0) require(sc.se == 0, s"DC scan needs se=0: $sc")
      else require(sc.comps.length == 1 && sc.se >= sc.ss && sc.se <= 63,
        s"AC scans are single-component with a valid band: $sc")
      require(sc.al >= 0 && sc.al <= 13 && sc.ah >= 0 &&
        (sc.ah == 0 || sc.ah == sc.al + 1), s"bad successive approximation: $sc")
    }
    val comps = Array.tabulate(nComp) { i =>
      if (i == 0) Comp(1, if (subsample420) 2 else 1, if (subsample420) 2 else 1, 0)
      else Comp(i + 1, 1, 1, 1)
    }
    val geo = new Geometry(comps, width, height)
    // materialize the quantized coefficients, ZIGZAG order, padded grids
    // (MCU-aligned dims make the padded and scan grids coincide)
    val store = comps.indices.map(i =>
      new Array[Int](geo.blocksW(i) * geo.blocksH(i) * 64)).toArray
    var ci = 0
    while (ci < nComp) {
      var by = 0
      while (by < geo.blocksH(ci)) {
        var bx = 0
        while (bx < geo.blocksW(ci)) {
          val cf = coeffs(ci, bx, by)
          require(cf.length == 64, s"coeffs($ci,$bx,$by) must have 64 entries")
          require(math.abs(cf(0)) <= 2047, s"DC ${cf(0)} past baseline category 11")
          val off = (by * geo.blocksW(ci) + bx) * 64
          var k = 0
          while (k < 64) {
            val v = cf(ZigZag(k))
            if (k > 0) require(math.abs(v) <= 1023, s"AC $v past category 10")
            store(ci)(off + k) = v
            k += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
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
    seg(0xc2, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      nComp) ++ comps.flatMap(c => Array(c.id, (c.h << 4) | c.v, c.tq))) // SOF2
    def dht(tc: Int, th: Int, hu: Huff, counts: Array[Int]): Array[Int] =
      Array((tc << 4) | th) ++ counts ++ hu.symbols
    seg(0xc4, dht(0, 0, DcLuma, DcLumaCounts) ++
      dht(1, 0, AcProg,
        Array(0, 0, 0, 0, 0, 0, 0, AcProgSyms.length, 0, 0, 0, 0, 0, 0, 0, 0)) ++
      (if (nComp == 3)
        dht(0, 1, DcChroma, DcChromaCounts) ++
          dht(1, 1, AcProg,
            Array(0, 0, 0, 0, 0, 0, 0, AcProgSyms.length, 0, 0, 0, 0, 0, 0, 0, 0))
      else Array.empty[Int])) // DHT

    script.foreach { sc =>
      seg(0xda, Array(sc.comps.length) ++
        sc.comps.flatMap(i => Array(comps(i).id,
          ((if (i == 0) 0 else 1) << 4) | (if (i == 0) 0 else 1))) ++
        Array(sc.ss, sc.se, (sc.ah << 4) | sc.al))
      val bw = new BitWriter(out)
      // unified walk: interleaved MCU order for multi-component DC scans,
      // the component's scan grid otherwise — mirroring the decoder
      def walk(block: (Int, Int) => Unit): Unit =
        if (sc.comps.length > 1) {
          var my = 0
          while (my < geo.mcusY) {
            var mx = 0
            while (mx < geo.mcusX) {
              sc.comps.foreach { i =>
                val c = comps(i)
                var by = 0
                while (by < c.v) {
                  var bx = 0
                  while (bx < c.h) {
                    block(i, ((my * c.v + by) * geo.blocksW(i) + (mx * c.h + bx)) * 64)
                    bx += 1
                  }
                  by += 1
                }
              }
              mx += 1
            }
            my += 1
          }
        } else {
          val i = sc.comps.head
          var by = 0
          while (by < geo.scanH(i)) {
            var bx = 0
            while (bx < geo.scanW(i)) {
              block(i, (by * geo.blocksW(i) + bx) * 64)
              bx += 1
            }
            by += 1
          }
        }
      if (sc.ss == 0 && sc.ah == 0) { // DC first: diffs of point-transformed DCs
        val preds = new Array[Int](nComp)
        walk { (i, off) =>
          val huff = if (i == 0) DcLuma else DcChroma
          val v = store(i)(off) >> sc.al
          val diff = v - preds(i)
          preds(i) = v
          val s = if (diff == 0) 0 else category(diff)
          bw.put(huff.encCode(s), huff.encSize(s))
          if (s > 0) bw.put(if (diff < 0) (diff - 1) & ((1 << s) - 1) else diff, s)
        }
      } else if (sc.ss == 0) { // DC refinement: one bit per block
        walk((i, off) => bw.put((store(i)(off) >> sc.al) & 1, 1))
      } else if (sc.ah == 0) { // AC first: runs + EOB runs over the band
        val cf = store(sc.comps.head)
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          val r = 31 - Integer.numberOfLeadingZeros(eobrun)
          bw.put(AcProg.encCode(r << 4), AcProg.encSize(r << 4))
          if (r > 0) bw.put(eobrun - (1 << r), r)
          eobrun = 0
        }
        def shifted(v: Int): Int = if (v >= 0) v >> sc.al else -((-v) >> sc.al)
        walk { (_, off) =>
          var lastNZ = sc.ss - 1
          var k = sc.ss
          while (k <= sc.se) { if (shifted(cf(off + k)) != 0) lastNZ = k; k += 1 }
          if (lastNZ < sc.ss) {
            eobrun += 1
            if (eobrun == 0x7fff) flushEob()
          } else {
            flushEob()
            var r = 0
            k = sc.ss
            while (k <= lastNZ) {
              val v = shifted(cf(off + k))
              if (v == 0) r += 1
              else {
                while (r > 15) {
                  bw.put(AcProg.encCode(0xf0), AcProg.encSize(0xf0)); r -= 16
                }
                val s = category(v)
                bw.put(AcProg.encCode((r << 4) | s), AcProg.encSize((r << 4) | s))
                bw.put(if (v < 0) (v - 1) & ((1 << s) - 1) else v, s)
                r = 0
              }
              k += 1
            }
            if (lastNZ < sc.se) {
              eobrun += 1
              if (eobrun == 0x7fff) flushEob()
            }
          }
        }
        flushEob()
      } else { // AC refinement: the correction-bit algorithm (spec G.1.2.3)
        val cf = store(sc.comps.head)
        var eobrun = 0
        val pendingBE = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEob(): Unit = {
          if (eobrun > 0) {
            val r = 31 - Integer.numberOfLeadingZeros(eobrun)
            bw.put(AcProg.encCode(r << 4), AcProg.encSize(r << 4))
            if (r > 0) bw.put(eobrun - (1 << r), r)
            eobrun = 0
          }
          pendingBE.foreach(bw.put(_, 1))
          pendingBE.clear()
        }
        walk { (_, off) =>
          val br = scala.collection.mutable.ArrayBuffer.empty[Int]
          // last NEWLY-significant position: zeros beyond it fold into EOB
          var eobPos = sc.ss - 1
          var k = sc.ss
          while (k <= sc.se) {
            if ((math.abs(cf(off + k)) >> sc.al) == 1) eobPos = k
            k += 1
          }
          var r = 0
          k = sc.ss
          while (k <= sc.se) {
            val t = math.abs(cf(off + k)) >> sc.al
            if (t == 0) r += 1
            else {
              while (r > 15 && k <= eobPos) {
                flushEob()
                bw.put(AcProg.encCode(0xf0), AcProg.encSize(0xf0))
                r -= 16
                br.foreach(bw.put(_, 1)); br.clear()
              }
              if (t > 1) br += (t & 1) // history-nonzero: a correction bit
              else { // newly significant at this bit position
                flushEob()
                bw.put(AcProg.encCode((r << 4) | 1), AcProg.encSize((r << 4) | 1))
                bw.put(if (cf(off + k) < 0) 0 else 1, 1)
                br.foreach(bw.put(_, 1)); br.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || br.nonEmpty) { // block ends in an EOB: join the run
            eobrun += 1
            pendingBE ++= br
            if (eobrun == 0x7fff) flushEob()
          }
        }
        flushEob()
      }
      bw.flush()
    }
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
    * `subsample420` (one chroma block per MCU; any positive dims — the
    * stream pads to whole MCUs and the decoder crops).
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
