package graft.operators

/** REAL pure-JVM media codecs for the public formats a zero-dependency
  * sandbox can parse bit-exactly: 24-bit BI_RGB Windows BMP
  * (BITMAPINFOHEADER), binary PPM/PGM/PBM (P6/P5/P4, maxval ≤ 255, `#`
  * header comments), RIFF/WAVE audio (16-bit PCM + G.711 µ-law/A-law),
  * and PNG (8/16-bit, gray/RGB/RGBA/gray-alpha/palette, straight and
  * Adam7-interlaced). JPEG — baseline AND progressive — lives in its own
  * [[JpegCodec]]. [[Multimodal.decodeFeatures]] sniffs the magic bytes
  * and falls back to the deterministic fake only for the one format
  * still out of scope (MP3).
  *
  * The layouts implemented here are the public file-format specifications
  * (BMP: 54-byte header, little-endian fields, BGR byte order, rows stored
  * BOTTOM-UP, each row padded to a 4-byte boundary; WAV: RIFF chunk walk,
  * `fmt ` + `data` chunks, odd-sized chunks padded per the RIFF rule).
  * Getting any of those wrong — padding read as pixels, unflipped rows,
  * RGB/BGR swap — shifts the decoded pixel statistics, which is exactly
  * what the oracle-checked roundtrip queries (q148/q149) detect.
  *
  * Scale: both codecs are pure functions of one payload, used inside
  * `mapPartitions`/typed `map` — embarrassingly parallel, no shuffle, no
  * driver involvement.
  */
object MediaCodecs {

  /** Decoded BMP: `pixels(y*width + x)` = (r, g, b) of the LOGICAL
    * top-down pixel grid, padding stripped, BGR storage unswizzled.
    */
  final case class BmpImage(width: Int, height: Int, pixels: Array[(Int, Int, Int)])

  /** Decoded WAV: PCM samples in file order. */
  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            samples: Array[Short])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Bytes per stored BMP row: 3 bytes per pixel, padded up to 4. */
  def bmpRowStride(width: Int): Int = ((3 * width) + 3) / 4 * 4

  /** Total file size of a 24-bit BMP with the 54-byte header. */
  def bmpFileSize(width: Int, height: Int): Int =
    54 + bmpRowStride(width) * height

  /** Encode a 24-bit uncompressed BMP. `pixel(x, y)` yields (r, g, b) in
    * 0..255 for the LOGICAL grid (y = 0 is the top row); the encoder
    * handles the format's bottom-up row order, BGR byte order, and row
    * padding.
    */
  def encodeBmp24(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = bmpRowStride(width)
    val size = bmpFileSize(width, height)
    val b = new Array[Byte](size) // zero-filled => padding bytes are 0
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, size) // bfSize
    putLe32(b, 10, 54) // bfOffBits
    putLe32(b, 14, 40) // biSize (BITMAPINFOHEADER)
    putLe32(b, 18, width)
    putLe32(b, 22, height) // positive => bottom-up storage
    putLe16(b, 26, 1) // biPlanes
    putLe16(b, 28, 24) // biBitCount
    putLe32(b, 30, 0) // biCompression = BI_RGB
    putLe32(b, 34, stride * height) // biSizeImage
    putLe32(b, 38, 2835); putLe32(b, 42, 2835) // 72 dpi in px/metre
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        val p = rowOff + 3 * x
        b(p) = bl.toByte; b(p + 1) = g.toByte; b(p + 2) = r.toByte // BGR
        x += 1
      }
      y += 1
    }
    b
  }

  /** Decode a 24-bit uncompressed BMP; None when the payload is not one
    * (wrong magic, truncated, compressed, or not 24 bpp) — callers fall
    * back to the stub path. Handles both bottom-up (positive height) and
    * top-down (negative height) storage.
    */
  def decodeBmp24(b: Array[Byte]): Option[BmpImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 2) != b.length) return None // bfSize must match
    val dataOff = le32(b, 10)
    val width = le32(b, 18)
    val rawH = le32(b, 22)
    val bottomUp = rawH > 0
    // all dimension arithmetic in LONG before any allocation: a hostile
    // width (or height = Int.MinValue, whose abs is itself negative)
    // would otherwise overflow the int stride/row-count math PAST the
    // bounds check and surface as an allocation error — this decoder's
    // contract is None, never throw
    val heightL = math.abs(rawH.toLong)
    if (le16(b, 28) != 24 || le32(b, 30) != 0) return None
    if (width <= 0 || heightL <= 0 || dataOff < 0) return None
    // divide, don't multiply: w * h * 3 can wrap Long for hostile
    // (width, height = Int.MinValue) pairs and sneak past a product check
    if (heightL > b.length.toLong / 3L / width.toLong) return None
    val height = heightL.toInt // <= len/3 after the check, so exact
    val stride = bmpRowStride(width)
    if (dataOff + stride.toLong * height > b.length) return None
    val px = new Array[(Int, Int, Int)](width * height)
    var y = 0
    while (y < height) {
      val stored = if (bottomUp) height - 1 - y else y
      val rowOff = dataOff + stored * stride
      var x = 0
      while (x < width) {
        val p = rowOff + 3 * x
        px(y * width + x) = ((b(p + 2) & 0xff), (b(p + 1) & 0xff), (b(p) & 0xff))
        x += 1
      }
      y += 1
    }
    Some(BmpImage(width, height, px))
  }

  /** 64-bit difference hash (dHash) of a decoded image: the image tiles
    * into a (width/blockW) × (height/blockH) grid, each cell's brightness
    * is the SUM of its pixels' channel values (equal cell areas make the
    * sum order-equivalent to the mean with zero division error), and bit
    * (by·(gridW−1) + bx) is 1 iff cell (bx+1, by) is brighter than cell
    * (bx, by) — the classic horizontal-gradient perceptual hash. A 9×8
    * grid yields exactly 64 bits. Requires the dimensions to tile evenly
    * and the bit count to fit a Long.
    */
  def dHash64(img: BmpImage, blockW: Int, blockH: Int): Long = {
    require(blockW > 0 && blockH > 0 &&
      img.width % blockW == 0 && img.height % blockH == 0,
      s"grid ${blockW}x$blockH does not tile ${img.width}x${img.height}")
    val gw = img.width / blockW
    val gh = img.height / blockH
    require(gw >= 2 && (gw - 1).toLong * gh <= 64,
      s"grid ${gw}x$gh yields ${(gw - 1) * gh} bits (need 1..64)")
    val sums = Array.ofDim[Long](gw, gh)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixels(y * img.width + x)
        sums(x / blockW)(y / blockH) += r.toLong + g + b
        x += 1
      }
      y += 1
    }
    var h = 0L
    var by = 0
    while (by < gh) {
      var bx = 0
      while (bx < gw - 1) {
        if (sums(bx + 1)(by) > sums(bx)(by)) h |= 1L << (by * (gw - 1) + bx)
        bx += 1
      }
      by += 1
    }
    h
  }

  /** Encode a binary PPM (P6, maxval 255). `pixel(x, y)` yields (r, g, b)
    * in 0..255, y = 0 the top row (PPM raster order is top-down,
    * left-to-right — no flip, no padding). A `# graft` comment line sits
    * between the magic and the dimensions so decoders exercise the
    * format's comment rule.
    */
  def encodePpm6(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    // Int raster math below: reject sizes it would overflow (encoders are
    // for synthesized test payloads; the decoder handles hostile headers)
    require(3L * width * height + 64L <= Int.MaxValue,
      s"dims ${width}x$height exceed the Int raster budget")
    val header = s"P6\n# graft\n$width $height\n255\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, b, 0, header.length)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        val p = header.length + 3 * (y * width + x)
        b(p) = r.toByte; b(p + 1) = g.toByte; b(p + 2) = bl.toByte // RGB
        x += 1
      }
      y += 1
    }
    b
  }

  /** Byte length of [[encodePpm6]]'s output (header incl. the comment);
    * Long so callers sizing buffers never see a silently negative value.
    */
  def ppmFileSize(width: Int, height: Int): Long =
    s"P6\n# graft\n$width $height\n255\n".length + 3L * width * height

  /** Parse a binary-Netpbm header (`P4`/`P5`/`P6`): tokens may be
    * separated by any whitespace and interleaved with `#` end-of-line
    * comments (the spec's rule); exactly ONE whitespace byte separates the
    * last header token from the raster. P4 (`hasMaxval = false`) carries
    * no maxval token. Returns (width, height, rasterOffset) — dimensions
    * validated positive and width ≤ Int.MaxValue, but the RASTER BUDGET is
    * the caller's to check (stride rules differ per format) — or None on
    * magic mismatch, a maxval needing 2-byte samples, or a malformed
    * header. Never throws.
    */
  private def parseNetpbmHeader(b: Array[Byte], magic: Char,
      hasMaxval: Boolean): Option[(Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != magic) return None
    var off = 2
    def skipWs(): Boolean = { // false on end of input
      var inComment = false
      while (off < b.length) {
        val c = b(off)
        if (inComment) { if (c == '\n') inComment = false; off += 1 }
        else if (c == '#') { inComment = true; off += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') off += 1
        else return true
      }
      false
    }
    def token(): Long = { // nonnegative decimal, -1 on error
      if (!skipWs()) return -1L
      var v = 0L; var n = 0
      // consume the ENTIRE digit run: a run too long for a valid header
      // (incl. zero-padded ones) saturates to one over-limit value that
      // the dimension/maxval checks reject — never splits into two tokens,
      // which could mis-parse a hostile header as a small accepted image
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        if (v <= (Long.MaxValue - 9) / 10) v = v * 10 + (b(off) - '0')
        else v = Long.MaxValue // saturate; keep consuming the run
        off += 1; n += 1
      }
      if (n == 0) -1L else v
    }
    val w = token(); val h = token()
    val maxv = if (hasMaxval) token() else 255L
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    // single whitespace byte, then the raster
    if (off >= b.length) return None
    val sep = b(off)
    if (sep != ' ' && sep != '\t' && sep != '\r' && sep != '\n') return None
    off += 1
    if (w > Int.MaxValue || h > Int.MaxValue) return None
    Some((w.toInt, h.toInt, off))
  }

  /** Header + raster-budget parse for the byte-per-sample formats (P5/P6):
    * divide-don't-multiply (hostile headers must not overflow the check).
    */
  private def parseBytePixelHeader(b: Array[Byte], magic: Char,
      bytesPerPixel: Int): Option[(Int, Int, Int)] =
    parseNetpbmHeader(b, magic, hasMaxval = true).filter { case (w, h, off) =>
      h <= (b.length - off).toLong / bytesPerPixel.toLong / w
    }

  /** Decode a binary PPM (P6, maxval ≤ 255): comment-aware header scan
    * ([[parseNetpbmHeader]]), top-down RGB raster with no padding. Returns
    * the shared RGB container; None, never throw.
    */
  def decodePpm6(b: Array[Byte]): Option[BmpImage] =
    parseBytePixelHeader(b, '6', bytesPerPixel = 3).map { case (wi, hi, off) =>
      val px = new Array[(Int, Int, Int)](wi * hi)
      var i = 0
      while (i < wi * hi) {
        val p = off + 3 * i
        px(i) = ((b(p) & 0xff), (b(p + 1) & 0xff), (b(p + 2) & 0xff))
        i += 1
      }
      BmpImage(wi, hi, px)
    }

  /** Encode a binary PGM (P5, maxval 255) — the grayscale Netpbm sibling.
    * `pixel(x, y)` yields 0..255, y = 0 the top row.
    */
  def encodePgm5(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(width.toLong * height + 64L <= Int.MaxValue,
      s"dims ${width}x$height exceed the Int raster budget")
    val header = s"P5\n# graft\n$width $height\n255\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, b, 0, header.length)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        b(header.length + y * width + x) = pixel(x, y).toByte; x += 1
      }
      y += 1
    }
    b
  }

  /** Decode a binary PGM (P5): one byte per pixel, top-down. Returned in
    * the shared RGB container with r = g = b = gray (so every RGB consumer
    * — feature folds, resizes — works unchanged); None, never throw.
    */
  def decodePgm5(b: Array[Byte]): Option[BmpImage] =
    parseBytePixelHeader(b, '5', bytesPerPixel = 1).map { case (wi, hi, off) =>
      val px = new Array[(Int, Int, Int)](wi * hi)
      var i = 0
      while (i < wi * hi) {
        val g = b(off + i) & 0xff
        px(i) = (g, g, g)
        i += 1
      }
      BmpImage(wi, hi, px)
    }

  /** P4 decode pixel budget: 16.7M pixels (4096×4096). The other formats
    * spend ≥ 1 payload byte per pixel, so a 2 GiB byte array implicitly
    * bounds their pixel arrays — P4's packed bits describe 8 pixels per
    * byte, so a hostile ~270 MB payload could legitimately declare ~2^31
    * pixels and force allocation of Int.MaxValue boxed (Int,Int,Int)
    * tuples (tens of GB) in a decoder whose contract is never-throw. The
    * cap bounds the worst-case decode allocation to a few hundred MB;
    * raise it (encoder and decoder move together) for trusted corpora of
    * larger bilevel scans.
    */
  val MaxPbmPixels: Long = 1L << 24

  /** Encode a binary PBM (P4) — the 1-bit Netpbm sibling: no maxval
    * token, rows packed 8 pixels per byte MSB-first and padded to a byte
    * boundary, bit 1 = BLACK. `pixel(x, y)` true ⇒ black.
    */
  def encodePbm4(width: Int, height: Int,
      pixel: (Int, Int) => Boolean): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    // stride math in LONG (width + 7 wraps Int near Int.MaxValue), and the
    // pixel count bounded by the DECODER's budget so every encodable image
    // is also decodable (packed bits let a small byte buffer describe far
    // more pixels than bytes)
    require((width.toLong + 7L) / 8L * height + 64L <= Int.MaxValue &&
      width.toLong * height <= MaxPbmPixels,
      s"dims ${width}x$height exceed the P4 pixel budget")
    val rowBytes = (width + 7) / 8
    val header = s"P4\n# graft\n$width $height\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + rowBytes * height)
    System.arraycopy(header, 0, b, 0, header.length)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (pixel(x, y)) {
          val p = header.length + y * rowBytes + x / 8
          b(p) = (b(p) | (0x80 >> (x % 8))).toByte
        }
        x += 1
      }
      y += 1
    }
    b
  }

  /** Decode a binary PBM (P4): no maxval token, MSB-first packed rows
    * padded to byte boundaries, 1 = black. Widened into the shared RGB
    * container (black → (0,0,0), white → (255,255,255)) so every RGB
    * consumer works unchanged; None, never throw.
    */
  def decodePbm4(b: Array[Byte]): Option[BmpImage] =
    parseNetpbmHeader(b, '4', hasMaxval = false).filter { case (w, h, off) =>
      // divide, don't multiply: the per-row stride is (w+7)/8 bytes. The
      // extra w*h pixel-count bound matters HERE only: packed bits mean a
      // payload can describe up to 8x its bytes in pixels, so the byte
      // budget alone neither keeps the pixel array inside Int nor bounds
      // its allocation near the payload size — [[MaxPbmPixels]] does both
      // (P5/P6's byte-per-sample budget needs neither).
      h <= (b.length - off).toLong / ((w.toLong + 7L) / 8L) &&
        w.toLong * h <= MaxPbmPixels
    }.map { case (wi, hi, off) =>
      val rowBytes = (wi + 7) / 8
      val px = new Array[(Int, Int, Int)](wi * hi)
      var y = 0
      while (y < hi) {
        var x = 0
        while (x < wi) {
          val bit = (b(off + y * rowBytes + x / 8) >> (7 - x % 8)) & 1
          val v = if (bit == 1) 0 else 255 // 1 = black
          px(y * wi + x) = (v, v, v)
          x += 1
        }
        y += 1
      }
      BmpImage(wi, hi, px)
    }

  // ---------------------------------------------------------------- PNG --

  /** PNG pixel budget — same rationale as [[MaxPbmPixels]], sharper: the
    * raster is DEFLATE-compressed, so a few-KB payload can legitimately
    * declare (and decompress to) an enormous raster. Decode allocation is
    * bounded by this cap, never by the payload size.
    */
  val MaxPngPixels: Long = 1L << 24

  private val PngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Paeth predictor (PNG spec §9.4): nearest of left/above/upper-left to
    * the linear estimate a + b − c, ties broken a, then b.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** One PNG chunk: length + type + data + CRC32(type ++ data). Visible to
    * the spec so hostile fixtures (bad filter bytes, oversized IHDR dims)
    * can be assembled with VALID chunk framing — corruption tests then
    * target exactly one invariant at a time.
    */
  private[graft] def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4, s"bad chunk type $typ")
    val out = new Array[Byte](12 + data.length)
    putBe32(out, 0, data.length)
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 4, 4 + data.length)
    putBe32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  /** zlib-deflate a buffer (JDK Deflater — the zlib wrapper PNG IDAT
    * requires). Spec-visible for the same hostile-fixture reason as
    * [[pngChunk]].
    */
  private[graft] def pngDeflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** The seven Adam7 interlace passes: (xStart, yStart, xStep, yStep),
    * spec §8.2. Each pass is an independently-filtered sub-image; passes
    * with zero width or height contribute no bytes at all.
    */
  private[graft] val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** A pass's sub-image dimensions for a w×h frame (0 when empty). */
  private def adam7Dims(w: Int, h: Int, pass: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = pass
    (if (w > x0) (w - x0 + dx - 1) / dx else 0,
      if (h > y0) (h - y0 + dy - 1) / dy else 0)
  }

  /** Build a complete PNG from an already-FILTERED raw scanline buffer
    * (rows of 1 filter byte + stride sample bytes; for interlace 1, the
    * seven passes' rasters concatenated). Shared by the public encoders;
    * spec-visible so hostile streams (bad filter byte, short raster) can
    * reuse the valid framing. `plte` (when non-empty) lands as a PLTE
    * chunk between IHDR and IDAT — required for color type 3,
    * legal-but-ignored for the truecolor types.
    */
  private[graft] def pngAssemble(width: Int, height: Int, colorType: Int,
      raw: Array[Byte], plte: Array[Byte] = Array.emptyByteArray,
      depth: Int = 8, interlace: Int = 0): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = depth.toByte
    ihdr(9) = colorType.toByte
    // ihdr(10), ihdr(11) = compression 0, filter 0 (zero-filled)
    ihdr(12) = interlace.toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngMagic)
    out.write(pngChunk("IHDR", ihdr))
    if (plte.nonEmpty) out.write(pngChunk("PLTE", plte))
    out.write(pngChunk("IDAT", pngDeflate(raw)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Filter an unfiltered raster (`stride` bytes per row, `height` rows,
    * pixel unit `bpp` BYTES) into the on-wire form: per row one filter
    * byte from `filterOf` then the filtered bytes. Shared by the straight
    * and the per-pass (Adam7) encoders.
    */
  private def filterRaster(img: Array[Byte], stride: Int, height: Int,
      bpp: Int, filterOf: Int => Int): Array[Byte] = {
    val raw = new Array[Byte]((1 + stride) * height)
    var y = 0
    while (y < height) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img(y * stride + x) & 0xff
        val a = if (x >= bpp) img(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) img((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) img((y - 1) * stride + x - bpp) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** Core PNG encode: `channels` samples per pixel at `depth` 8 or 16 bits
    * (16-bit stored big-endian per the spec), fed by `sample(x, y,
    * channel)` (0..255 or 0..65535), one filter type per row from
    * `filterOf` (0=None 1=Sub 2=Up 3=Average 4=Paeth — encode with a mix
    * to exercise every decoder unfilter path; the format allows any
    * per-row choice).
    */
  private def encodePngRaw(width: Int, height: Int, colorType: Int, channels: Int,
      sample: (Int, Int, Int) => Int, filterOf: Int => Int,
      plte: Array[Byte] = Array.emptyByteArray, depth: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0 &&
      width.toLong * height <= MaxPngPixels,
      s"dims ${width}x$height exceed the PNG pixel budget")
    require(depth == 8 || depth == 16, s"unsupported bit depth $depth")
    val bps = depth / 8
    val bpp = channels * bps
    val stride = bpp * width
    val img = new Array[Byte](stride * height) // unfiltered samples
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var ch = 0
        while (ch < channels) {
          val v = sample(x, y, ch)
          val p = y * stride + bpp * x + bps * ch
          if (bps == 1) img(p) = v.toByte
          else { img(p) = (v >> 8).toByte; img(p + 1) = v.toByte } // big-endian
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    pngAssemble(width, height, colorType,
      filterRaster(img, stride, height, bpp, filterOf), plte, depth)
  }

  /** Encode an 8-bit RGB (color type 2) PNG. `pixel(x, y)` yields
    * (r, g, b) in 0..255, y = 0 the top row; `filterOf(y)` picks each
    * row's filter type (default None — pass e.g. `_ % 5` to cycle through
    * Sub/Up/Average/Paeth as well).
    */
  def encodePng(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int),
      filterOf: Int => Int = _ => 0): Array[Byte] =
    encodePngRaw(width, height, colorType = 2, channels = 3,
      (x, y, ch) => { val (r, g, b) = pixel(x, y)
        if (ch == 0) r else if (ch == 1) g else b }, filterOf)

  /** Encode an 8-bit grayscale (color type 0) PNG. */
  def encodePngGray(width: Int, height: Int, pixel: (Int, Int) => Int,
      filterOf: Int => Int = _ => 0): Array[Byte] =
    encodePngRaw(width, height, colorType = 0, channels = 1,
      (x, y, _) => pixel(x, y), filterOf)

  /** Encode an 8-bit RGBA (color type 6) PNG; `pixel(x, y)` yields
    * (r, g, b, a).
    */
  def encodePngRgba(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int, Int),
      filterOf: Int => Int = _ => 0): Array[Byte] =
    encodePngRaw(width, height, colorType = 6, channels = 4,
      (x, y, ch) => { val (r, g, b, a) = pixel(x, y)
        ch match { case 0 => r; case 1 => g; case 2 => b; case _ => a } },
      filterOf)

  /** Encode an 8-bit PALETTE (color type 3) PNG — the icons/plots/
    * screenshots format: `palette` is 1..256 RGB entries carried in a PLTE
    * chunk, `index(x, y)` yields each pixel's palette index. One byte per
    * pixel in the raster, so the same per-row filter machinery applies
    * (bpp = 1, as for grayscale).
    */
  def encodePngPalette(width: Int, height: Int,
      palette: Array[(Int, Int, Int)], index: (Int, Int) => Int,
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256,
      s"palette must have 1..256 entries, got ${palette.length}")
    val plte = new Array[Byte](3 * palette.length)
    palette.zipWithIndex.foreach { case ((r, g, b), i) =>
      plte(3 * i) = r.toByte; plte(3 * i + 1) = g.toByte; plte(3 * i + 2) = b.toByte
    }
    encodePngRaw(width, height, colorType = 3, channels = 1,
      (x, y, _) => {
        val i = index(x, y)
        require(i >= 0 && i < palette.length, s"palette index $i out of range")
        i
      }, filterOf, plte)
  }

  /** Encode a 16-BIT RGB (color type 2, depth 16) PNG — the photography/
    * scientific-imaging depth; `pixel(x, y)` yields (r, g, b) in 0..65535,
    * stored big-endian per the spec.
    */
  def encodePng16(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int),
      filterOf: Int => Int = _ => 0): Array[Byte] =
    encodePngRaw(width, height, colorType = 2, channels = 3,
      (x, y, ch) => { val (r, g, b) = pixel(x, y)
        if (ch == 0) r else if (ch == 1) g else b }, filterOf, depth = 16)

  /** Encode a 16-bit grayscale (color type 0, depth 16) PNG; samples in
    * 0..65535.
    */
  def encodePngGray16(width: Int, height: Int, pixel: (Int, Int) => Int,
      filterOf: Int => Int = _ => 0): Array[Byte] =
    encodePngRaw(width, height, colorType = 0, channels = 1,
      (x, y, _) => pixel(x, y), filterOf, depth = 16)

  /** Encode an 8-bit GRAY+ALPHA (color type 4) PNG; `pixel(x, y)` yields
    * (gray, alpha).
    */
  def encodePngGrayAlpha(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int),
      filterOf: Int => Int = _ => 0): Array[Byte] =
    encodePngRaw(width, height, colorType = 4, channels = 2,
      (x, y, ch) => { val (g, a) = pixel(x, y); if (ch == 0) g else a },
      filterOf)

  /** Encode an ADAM7-INTERLACED 8-bit RGB PNG: the seven passes built as
    * independently-filtered sub-images (spec §8.2) and concatenated into
    * one IDAT stream. `filterOf` picks each pass-row's filter (pass-local
    * row index — cycling still exercises every unfilter path).
    */
  def encodePngAdam7(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int),
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0 &&
      width.toLong * height <= MaxPngPixels,
      s"dims ${width}x$height exceed the PNG pixel budget")
    val out = new java.io.ByteArrayOutputStream()
    Adam7.foreach { pass =>
      val (x0, y0, dx, dy) = pass
      val (pw, ph) = adam7Dims(width, height, pass)
      if (pw > 0 && ph > 0) {
        val stride = 3 * pw
        val img = new Array[Byte](stride * ph)
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            val (r, g, b) = pixel(x0 + px * dx, y0 + py * dy)
            val p = py * stride + 3 * px
            img(p) = r.toByte; img(p + 1) = g.toByte; img(p + 2) = b.toByte
            px += 1
          }
          py += 1
        }
        out.write(filterRaster(img, stride, ph, 3, filterOf))
      }
    }
    pngAssemble(width, height, colorType = 2, out.toByteArray,
      interlace = 1)
  }

  /** Decode a PNG — pure JVM: chunk walk with CRC32 verification, IDAT
    * concatenation, zlib inflate (JDK Inflater), per-row unfilter
    * (None/Sub/Up/Average/Paeth). Supports bit depths 8 AND 16 (16-bit
    * big-endian samples scale to the 8-bit container by their high byte),
    * color types 0 (gray, widened r=g=b), 2 (RGB), 3 (palette via PLTE
    * lookup — 8-bit only per the spec; an index past the table is a
    * corrupt image → None), 4 (gray+alpha: widened, alpha dropped), and
    * 6 (RGBA: alpha dropped), in BOTH the straight and the ADAM7
    * INTERLACED layouts (seven independently-filtered passes scattered to
    * the output grid). Returns None — never throws — for anything else
    * (1/2/4-bit depths, type 3 missing its PLTE or with PLTE after IDAT,
    * truncated or over-long IDAT stream, CRC mismatch, bad filter byte,
    * hostile dims past [[MaxPngPixels]]).
    */
  def decodePng(b: Array[Byte]): Option[BmpImage] = {
    if (b.length < 8 + 25 || !PngMagic.indices.forall(i => b(i) == PngMagic(i)))
      return None
    var off = 8
    var w = 0; var h = 0; var colorType = -1; var depth = 0; var interlace = 0
    var seenIhdr = false; var seenIend = false
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 12 <= b.length && !seenIend) {
      val len = be32(b, off)
      if (len < 0 || off + 12L + len > b.length) return None // truncated
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, off + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          w = be32(b, off + 8); h = be32(b, off + 12)
          depth = b(off + 16) & 0xff; colorType = b(off + 17) & 0xff
          if ((depth != 8 && depth != 16) || (colorType != 0 && colorType != 2 &&
            colorType != 3 && colorType != 4 && colorType != 6)) return None
          if (colorType == 3 && depth != 8) return None // spec: palette ≤ 8-bit
          if (b(off + 18) != 0 || b(off + 19) != 0) return None // compression/filter method
          interlace = b(off + 20) & 0xff
          if (interlace != 0 && interlace != 1) return None
          // dims are signed BE reads: negatives fail the > 0 check; the
          // pixel cap bounds allocation (deflate hides the true raster
          // size from any payload-proportional bound)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPngPixels) return None
        case "PLTE" =>
          // spec §11.2.3: one PLTE, after IHDR, BEFORE the first IDAT,
          // 1..256 RGB triples; forbidden for the grayscale types
          if (!seenIhdr || plte != null || idat.size > 0) return None
          if (colorType == 0 || colorType == 4 ||
            len == 0 || len % 3 != 0 || len > 768) return None
          plte = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
        case "IDAT" => if (!seenIhdr) return None; idat.write(b, off + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, gAMA, ...) skipped
      }
      off += 12 + len
    }
    if (!seenIhdr || !seenIend || idat.size == 0) return None
    if (colorType == 3 && plte == null) return None // PLTE is mandatory
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case _ => 4
    }
    val bps = depth / 8
    val bpp = channels * bps // filter unit in BYTES (spec: ceil(depth/8)·channels)
    // pass list: the whole frame is the single "pass" when non-interlaced
    val passes =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    val passDims = passes.map(adam7Dims(w, h, _))
    val totalLen = passDims.map { case (pw, ph) =>
      if (pw == 0 || ph == 0) 0L else (1L + pw.toLong * bpp) * ph
    }.sum
    if (totalLen > Int.MaxValue) return None // <= 8·MaxPngPixels + rows, but be explicit
    val raw = new Array[Byte](totalLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated stream / preset dictionary
        got += n
      }
      if (got < raw.length) return None
      // strict: the stream must END exactly at the declared raster — one
      // more inflate drives the zlib trailer (Adler-32) through; surplus
      // data (n > 0) or a missing/short trailer (still unfinished) is not
      // the image the header describes
      if (!inf.finished()) {
        val n = inf.inflate(new Array[Byte](1))
        if (n > 0 || !inf.finished()) return None
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val px = new Array[(Int, Int, Int)](w * h)
    var passOff = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = passDims(pi)
      if (pw > 0 && ph > 0) {
        val stride = pw * bpp
        // unfilter this pass in place (prior reconstructed row is read
        // back from `raw`; rows never reference a previous PASS)
        var y = 0
        while (y < ph) {
          val rs = passOff + y * (1 + stride)
          val ft = raw(rs) & 0xff
          if (ft > 4) return None
          var x = 0
          while (x < stride) {
            val i = rs + 1 + x
            val a = if (x >= bpp) raw(i - bpp) & 0xff else 0
            val up = if (y > 0) raw(i - (1 + stride)) & 0xff else 0
            val c = if (y > 0 && x >= bpp) raw(i - (1 + stride) - bpp) & 0xff else 0
            val rec = ft match {
              case 0 => raw(i) & 0xff
              case 1 => (raw(i) & 0xff) + a
              case 2 => (raw(i) & 0xff) + up
              case 3 => (raw(i) & 0xff) + (a + up) / 2
              case 4 => (raw(i) & 0xff) + paeth(a, up, c)
            }
            raw(i) = rec.toByte
            x += 1
          }
          y += 1
        }
        // scatter this pass's pixels to the output grid; a 16-bit sample's
        // HIGH byte is its first byte (big-endian), which IS the standard
        // 16→8 downscale
        y = 0
        while (y < ph) {
          var x = 0
          while (x < pw) {
            val p = passOff + y * (1 + stride) + 1 + x * bpp
            val pix = colorType match {
              case 0 | 4 => val g = raw(p) & 0xff; (g, g, g)
              case 3 =>
                val idx = raw(p) & 0xff
                // an index past the palette is corrupt data, not a color —
                // the contract is None, never a fabricated pixel
                if (3 * idx + 2 >= plte.length) return None
                ((plte(3 * idx) & 0xff), (plte(3 * idx + 1) & 0xff),
                  (plte(3 * idx + 2) & 0xff))
              case _ =>
                ((raw(p) & 0xff), (raw(p + bps) & 0xff), (raw(p + 2 * bps) & 0xff))
            }
            px((y0 + y * dy) * w + (x0 + x * dx)) = pix
            x += 1
          }
          y += 1
        }
        passOff += (1 + stride) * ph
      }
      pi += 1
    }
    Some(BmpImage(w, h, px))
  }

  /** Total file size of a canonical 44-byte-header PCM16 mono WAV. */
  def wavFileSize(nSamples: Int): Int = 44 + 2 * nSamples

  /** Encode 16-bit PCM mono WAV (canonical RIFF: fmt then data). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val b = new Array[Byte](44 + dataLen)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, 36 + dataLen)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLe32(b, 16, 16) // fmt chunk size
    putLe16(b, 20, 1) // PCM
    putLe16(b, 22, 1) // mono
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * 2) // byte rate
    putLe16(b, 32, 2) // block align
    putLe16(b, 34, 16) // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putLe32(b, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(b, 44 + 2 * i, samples(i) & 0xffff); i += 1
    }
    b
  }

  /** G.711 µ-law expansion (format code 7): one companded byte → the
    * 16-bit linear sample, the public CCITT reference algorithm (bias 0x84,
    * 3-bit segment, 4-bit mantissa, complemented on the wire). A public
    * spec table, so the oracle can recompute it in SQL.
    */
  def mulawExpand(byte: Int): Int = {
    val u = ~byte & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (format code 6): XOR 0x55 on the wire, segments
    * 0/1 linear then doubling — the public CCITT reference algorithm.
    */
  def alawExpand(byte: Int): Int = {
    val a = (byte ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0x0f) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case _ => (t0 + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Nearest-level G.711 COMPRESSION (linear 16-bit → companded byte),
    * derived from the PINNED expansions rather than memorized bit tricks:
    * compress(x) = the lowest code b in 0..255 minimizing |expand(b) − x|
    * — the textbook optimal quantizer for the law's level set, precomputed
    * as a 65536-entry inverse table per law (ascending scan ⇒ ties go to
    * the lowest code, a rule the SQL oracle reproduces with
    * list_position-of-min). Building compress FROM expand means the two
    * directions cannot drift: any error would be an error in the already
    * q207-gated expansion.
    */
  private def nearestInverse(expand: Int => Int): Array[Byte] = {
    val t = new Array[Byte](65536)
    var x = -32768
    while (x <= 32767) {
      var best = 0
      var bestD = Int.MaxValue
      var b = 0
      while (b < 256) {
        val d = math.abs(expand(b) - x)
        if (d < bestD) { bestD = d; best = b }
        b += 1
      }
      t(x & 0xffff) = best.toByte
      x += 1
    }
    t
  }

  private lazy val MulawInv: Array[Byte] = nearestInverse(mulawExpand)
  private lazy val AlawInv: Array[Byte] = nearestInverse(alawExpand)

  /** µ-law compression of a linear sample in −32768..32767 (see
    * [[nearestInverse]]).
    */
  def mulawCompress(pcm: Int): Int = MulawInv(pcm & 0xffff) & 0xff

  /** A-law compression of a linear sample in −32768..32767. */
  def alawCompress(pcm: Int): Int = AlawInv(pcm & 0xffff) & 0xff

  /** Encode a mono G.711 WAV (format code 6 = A-law, 7 = µ-law): one
    * companded byte per sample, canonical RIFF layout (fmt carries the
    * 0-length extension field these codes require, then data).
    */
  def encodeWavG711(sampleRate: Int, data: Array[Byte], aLaw: Boolean): Array[Byte] = {
    val b = new Array[Byte](46 + data.length + (data.length & 1))
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, b.length - 8)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLe32(b, 16, 18) // fmt chunk size (16 + cbSize field)
    putLe16(b, 20, if (aLaw) 6 else 7)
    putLe16(b, 22, 1) // mono
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate) // byte rate: 1 byte per sample
    putLe16(b, 32, 1) // block align
    putLe16(b, 34, 8) // bits per companded sample
    putLe16(b, 36, 0) // cbSize = 0
    b(38) = 'd'; b(39) = 'a'; b(40) = 't'; b(41) = 'a'
    putLe32(b, 42, data.length)
    System.arraycopy(data, 0, b, 46, data.length)
    b // trailing zero IS the RIFF pad byte when data.length is odd
  }

  /** IMA/DVI ADPCM step-size table (89 entries) and index-adjust table —
    * public constants from the IMA ADPCM reference algorithm (also WAV
    * format code 0x11). Spec-visible so the DuckDB oracle can replay the
    * identical integer state machine.
    */
  val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)

  val AdpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM decode step: (predictor, index) + 4-bit code → the new
    * (predictor, index). Pure integer — the reference reconstruction
    * diff = (step>>3) + code-bit-gated step>>2 / step>>1 / step, predictor
    * clamped to int16, index stepped by [[AdpcmIndexTable]] and clamped to
    * the table.
    */
  def adpcmStep(pred: Int, index: Int, code: Int): (Int, Int) = {
    val step = AdpcmStepTable(index)
    var diff = step >> 3
    if ((code & 1) != 0) diff += step >> 2
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 4) != 0) diff += step
    val p = if ((code & 8) != 0) pred - diff else pred + diff
    val pc = math.max(-32768, math.min(32767, p))
    val ic = math.max(0, math.min(88, index + AdpcmIndexTable(code & 7)))
    (pc, ic)
  }

  /** One IMA ADPCM ENCODE step: quantize (sample − predictor) against the
    * current step size into the 4-bit code, returning (code, new predictor,
    * new index) with the predictor tracked through the DECODER's
    * reconstruction (so encoder and decoder states never drift).
    */
  def adpcmEncodeStep(pred: Int, index: Int, sample: Int): (Int, Int, Int) = {
    val step = AdpcmStepTable(index)
    var diff = sample - pred
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    if (diff >= step) { code |= 4; diff -= step }
    if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) code |= 1
    val (p, i) = adpcmStep(pred, index, code)
    (code, p, i)
  }

  /** Encode mono IMA ADPCM WAV (format code 0x11): fixed-size blocks of
    * `blockAlign` bytes, each opening with the 4-byte header (predictor
    * int16 LE = the block's first sample verbatim, step index, reserved 0)
    * followed by 4-bit codes two-per-byte, LOW nibble first. The fmt chunk
    * carries the mandatory cbSize=2 extension with wSamplesPerBlock =
    * 1 + (blockAlign−4)·2; the final block is zero-padded codes past the
    * last sample (decoders stop at the fact-chunk/sample count — here the
    * encoder emits whole blocks and [[decodeWavPcm16]] reports every
    * decoded sample, so callers control exact counts via the input
    * length). State (predictor, index) carries ACROSS blocks through the
    * header per the IMA reference.
    */
  def encodeWavAdpcm(sampleRate: Int, samples: Array[Short],
      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign $blockAlign must be >= 8 and a multiple of 4")
    require(samples.nonEmpty, "ADPCM needs at least one sample")
    val perBlock = 1 + (blockAlign - 4) * 2
    val nBlocks = (samples.length + perBlock - 1) / perBlock
    val data = new Array[Byte](nBlocks * blockAlign)
    var pred = 0; var index = 0
    var s = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      pred = samples(s) // block header sample, stored verbatim
      putLe16(data, base, pred & 0xffff)
      data(base + 2) = index.toByte
      data(base + 3) = 0
      s += 1
      var nib = 0
      while (nib < (blockAlign - 4) * 2) {
        val code = if (s < samples.length) {
          val (c, p, i) = adpcmEncodeStep(pred, index, samples(s))
          pred = p; index = i; s += 1; c
        } else 0
        val pos = base + 4 + (nib >> 1)
        if ((nib & 1) == 0) data(pos) = code.toByte // LOW nibble first
        else data(pos) = (data(pos) | (code << 4)).toByte
        nib += 1
      }
      blk += 1
    }
    adpcmContainer(sampleRate, blockAlign, perBlock, samples.length, data, 1)
  }

  /** Encode STEREO IMA ADPCM WAV (format code 0x11, channels = 2): each
    * block opens with ONE 4-byte header PER CHANNEL (left first), then the
    * coded data runs in interleaved 4-byte groups — 8 left nibbles, 8
    * right nibbles, repeating — per the IMA WAV layout. Each channel runs
    * its own independent predictor/index state machine; state carries
    * across blocks through the headers exactly as in the mono form.
    * wSamplesPerBlock (per channel) = 1 + (blockAlign - 8); blockAlign
    * must leave whole 4-byte groups per channel ((blockAlign - 8) % 8 == 0).
    * The final block's code padding past the last frame is dropped by the
    * decoder via the fact chunk's true per-channel count.
    */
  def encodeWavAdpcmStereo(sampleRate: Int, left: Array[Short],
      right: Array[Short], blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 16 && (blockAlign - 8) % 8 == 0,
      s"stereo blockAlign $blockAlign must be >= 16 with whole 4-byte groups per channel")
    require(left.length == right.length, "channels must be equal length")
    require(left.nonEmpty, "ADPCM needs at least one frame")
    val perBlock = 1 + (blockAlign - 8) // frames per channel per block
    val nBlocks = (left.length + perBlock - 1) / perBlock
    val data = new Array[Byte](nBlocks * blockAlign)
    var pL = 0; var iL = 0; var pR = 0; var iR = 0
    var s = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      pL = left(s); pR = right(s) // header frame, stored verbatim per channel
      putLe16(data, base, pL & 0xffff)
      data(base + 2) = iL.toByte; data(base + 3) = 0
      putLe16(data, base + 4, pR & 0xffff)
      data(base + 6) = iR.toByte; data(base + 7) = 0
      s += 1
      val groups = (blockAlign - 8) / 8
      var g = 0
      while (g < groups) {
        val gbase = base + 8 + g * 8
        var k = 0
        while (k < 8) {
          val si = s + k
          val cL = if (si < left.length) {
            val (c, p, i) = adpcmEncodeStep(pL, iL, left(si))
            pL = p; iL = i; c
          } else 0
          val posL = gbase + (k >> 1)
          if ((k & 1) == 0) data(posL) = cL.toByte // LOW nibble first
          else data(posL) = (data(posL) | (cL << 4)).toByte
          val cR = if (si < right.length) {
            val (c, p, i) = adpcmEncodeStep(pR, iR, right(si))
            pR = p; iR = i; c
          } else 0
          val posR = gbase + 4 + (k >> 1)
          if ((k & 1) == 0) data(posR) = cR.toByte
          else data(posR) = (data(posR) | (cR << 4)).toByte
          k += 1
        }
        s += 8
        g += 1
      }
      blk += 1
    }
    adpcmContainer(sampleRate, blockAlign, perBlock, left.length, data, 2)
  }

  /** RIFF container for one IMA ADPCM data payload: fmt (with the
    * mandatory cbSize=2 / wSamplesPerBlock extension) + the spec-REQUIRED
    * `fact` chunk carrying the TRUE per-channel sample count — compressed
    * WAV formats must declare it because the final block's code padding
    * would otherwise read as extra samples — + data.
    */
  private def adpcmContainer(sampleRate: Int, blockAlign: Int, perBlock: Int,
      nSamples: Int, data: Array[Byte], channels: Int): Array[Byte] = {
    val b = new Array[Byte](60 + data.length)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, b.length - 8)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLe32(b, 16, 20) // fmt chunk size (16 + cbSize + wSamplesPerBlock)
    putLe16(b, 20, 0x11) // IMA ADPCM
    putLe16(b, 22, channels)
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * blockAlign / perBlock) // byte rate (approx, informative)
    putLe16(b, 32, blockAlign)
    putLe16(b, 34, 4) // bits per sample
    putLe16(b, 36, 2) // cbSize
    putLe16(b, 38, perBlock) // wSamplesPerBlock
    b(40) = 'f'; b(41) = 'a'; b(42) = 'c'; b(43) = 't'
    putLe32(b, 44, 4)
    putLe32(b, 48, nSamples) // dwSampleLength: the TRUE per-channel count
    b(52) = 'd'; b(53) = 'a'; b(54) = 't'; b(55) = 'a'
    putLe32(b, 56, data.length)
    System.arraycopy(data, 0, b, 60, data.length)
    b
  }

  /** [[encodeWavAdpcm]]'s raw sibling: build the wire bytes from an
    * EXPLICIT initial state and 4-bit code sequence (one block; codes must
    * fill it exactly: (blockAlign−4)·2 codes). The decoder recovers these
    * verbatim, so an oracle that generates the same codes can replay the
    * predictor state machine independently — the encodeJpeg-style
    * coefficients-in contract for audio.
    */
  def encodeWavAdpcmRaw(sampleRate: Int, pred0: Int, index0: Int,
      codes: Array[Int], blockAlign: Int): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0)
    require(codes.length == (blockAlign - 4) * 2,
      s"need ${(blockAlign - 4) * 2} codes to fill one block, got ${codes.length}")
    require(pred0 >= -32768 && pred0 <= 32767 && index0 >= 0 && index0 <= 88)
    require(codes.forall(c => c >= 0 && c <= 15))
    val perBlock = 1 + (blockAlign - 4) * 2
    val data = new Array[Byte](blockAlign)
    putLe16(data, 0, pred0 & 0xffff)
    data(2) = index0.toByte
    data(3) = 0
    var nib = 0
    while (nib < codes.length) {
      val pos = 4 + (nib >> 1)
      if ((nib & 1) == 0) data(pos) = codes(nib).toByte
      else data(pos) = (data(pos) | (codes(nib) << 4)).toByte
      nib += 1
    }
    adpcmContainer(sampleRate, blockAlign, perBlock, perBlock, data, 1)
  }

  /** Decode a WAV to PCM16 samples by WALKING the RIFF chunk list (not
    * fixed offsets: real files carry LIST/INFO/fact chunks between fmt and
    * data; odd-sized chunks are followed by a pad byte per the RIFF rule).
    * Accepts 16-bit PCM (format 1) verbatim, G.711 A-law/µ-law
    * (formats 6/7, 8-bit companded) EXPANDED to linear 16-bit — the
    * telephony formats a real audio lake carries — and mono OR stereo IMA
    * ADPCM (format 0x11, 4-bit; stereo = per-channel block headers +
    * interleaved 4-byte nibble groups, one independent state machine per
    * channel) run through the REAL integer predictor/step state machine
    * ([[adpcmStep]]), honoring the `fact` chunk's declared true
    * per-channel sample count (final-block code padding dropped; a count
    * past the blocks' capacity rejects). `bitsPerSample` reports the FILE's
    * storage width (8 for G.711, 4 for ADPCM), samples are always linear
    * PCM16. None for anything else — float, MS-ADPCM, extensible, wrong
    * widths — never throw.
    */
  def decodeWavPcm16(b: Array[Byte]): Option[WavAudio] = {
    def tag(off: Int): String =
      if (off + 4 <= b.length) new String(b.slice(off, off + 4), "US-ASCII") else ""
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1; var channels = -1; var bits = -1; var fmt = -1
    var blockAlign = -1; var perBlock = -1; var factCount = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val sz = le32(b, off + 4)
      val body = off + 8
      if (sz < 0 || body + sz > b.length) return None
      id match {
        case "fact" => // dwSampleLength: the TRUE sample count (required
          // for compressed formats — the final block's code padding would
          // otherwise read as extra samples)
          if (sz >= 4) factCount = le32(b, body)
        case "fmt " =>
          if (sz < 16) return None
          fmt = le16(b, body)
          channels = le16(b, body + 2)
          rate = le32(b, body + 4)
          blockAlign = le16(b, body + 12)
          bits = le16(b, body + 14)
          fmt match {
            case 1 => if (bits != 16) return None // linear PCM
            case 6 | 7 => if (bits != 8) return None // G.711 companded
            case 0x11 => // IMA ADPCM, mono or stereo: block structure must cohere
              if (bits != 4 || sz < 20) return None
              perBlock = le16(b, body + 18)
              channels match {
                case 1 =>
                  if (blockAlign < 8 ||
                    perBlock != 1 + (blockAlign - 4) * 2) return None
                case 2 =>
                  // two 4-byte headers + whole interleaved 4-byte groups
                  if (blockAlign < 16 || (blockAlign - 8) % 8 != 0 ||
                    perBlock != 1 + (blockAlign - 8)) return None
                case _ => return None
              }
            case _ => return None // float/MS-ADPCM/extensible: out of scope
          }
        case "data" => dataOff = body; dataLen = sz
        case _ => () // skip unknown chunks (LIST, INFO, ...)
      }
      off = body + sz + (sz & 1) // RIFF pad rule
    }
    if (rate < 0 || dataOff < 0) return None
    val samples = fmt match {
      case 1 =>
        val n = dataLen / 2
        val s = new Array[Short](n)
        var i = 0
        while (i < n) { s(i) = le16(b, dataOff + 2 * i).toShort; i += 1 }
        s
      case 0x11 if channels == 1 =>
        if (dataLen % blockAlign != 0) return None
        val nBlocks = dataLen / blockAlign
        // a fact chunk must not claim more samples than the blocks hold
        if (factCount > nBlocks * perBlock) return None
        val s = new Array[Short](nBlocks * perBlock)
        var blk = 0
        var o = 0
        while (blk < nBlocks) {
          val base = dataOff + blk * blockAlign
          var pred = le16(b, base).toShort.toInt // block header sample
          var index = b(base + 2) & 0xff
          if (index > 88) return None
          s(o) = pred.toShort; o += 1
          var nib = 0
          while (nib < (blockAlign - 4) * 2) {
            val byte = b(base + 4 + (nib >> 1)) & 0xff
            val code = if ((nib & 1) == 0) byte & 0x0f else byte >> 4
            val (p, i) = adpcmStep(pred, index, code)
            pred = p; index = i
            s(o) = pred.toShort; o += 1
            nib += 1
          }
          blk += 1
        }
        // honor the declared TRUE count: drop the final block's padding
        if (factCount >= 0 && factCount < s.length)
          java.util.Arrays.copyOf(s, factCount)
        else s
      case 0x11 => // stereo: per-channel headers, interleaved 4-byte groups
        if (dataLen % blockAlign != 0) return None
        val nBlocks = dataLen / blockAlign
        if (factCount > nBlocks * perBlock) return None
        // output is frame-interleaved [L0, R0, L1, R1, ...] like PCM
        val s = new Array[Short](nBlocks * perBlock * 2)
        var blk = 0
        var o = 0
        while (blk < nBlocks) {
          val base = dataOff + blk * blockAlign
          var predL = le16(b, base).toShort.toInt
          var idxL = b(base + 2) & 0xff
          var predR = le16(b, base + 4).toShort.toInt
          var idxR = b(base + 6) & 0xff
          if (idxL > 88 || idxR > 88) return None
          s(o) = predL.toShort; s(o + 1) = predR.toShort; o += 2
          val groups = (blockAlign - 8) / 8
          var g = 0
          while (g < groups) {
            val gbase = base + 8 + g * 8
            var k = 0
            while (k < 8) {
              val byteL = b(gbase + (k >> 1)) & 0xff
              val codeL = if ((k & 1) == 0) byteL & 0x0f else byteL >> 4
              val (pL, iL) = adpcmStep(predL, idxL, codeL)
              predL = pL; idxL = iL
              val byteR = b(gbase + 4 + (k >> 1)) & 0xff
              val codeR = if ((k & 1) == 0) byteR & 0x0f else byteR >> 4
              val (pR, iR) = adpcmStep(predR, idxR, codeR)
              predR = pR; idxR = iR
              s(o) = predL.toShort; s(o + 1) = predR.toShort; o += 2
              k += 1
            }
            g += 1
          }
          blk += 1
        }
        // fact declares FRAMES per channel: truncate the interleaved pair
        if (factCount >= 0 && factCount * 2 < s.length)
          java.util.Arrays.copyOf(s, factCount * 2)
        else s
      case _ =>
        val s = new Array[Short](dataLen)
        var i = 0
        while (i < dataLen) {
          s(i) = (if (fmt == 6) alawExpand(b(dataOff + i) & 0xff)
            else mulawExpand(b(dataOff + i) & 0xff)).toShort
          i += 1
        }
        s
    }
    Some(WavAudio(rate, channels, bits, samples))
  }
}
