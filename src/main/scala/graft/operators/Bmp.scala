package graft.operators

/** Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB) reader/writer
  * in pure Scala — the media layer's one REAL image codec (the sandbox ships
  * no image libraries, but the published BMP layout is simple enough to
  * parse by hand). Pixels are accepted/returned as top-down row-major RGB
  * triplets.
  *
  * File layout (little-endian): 14-byte file header ('B''M', file size,
  * reserved, pixel-data offset), ≥40-byte info header (header size, width,
  * height — positive means bottom-up storage — planes=1, bpp, compression,
  * ...), then pixel rows padded to 4-byte multiples, stored B,G,R. Only the
  * 24-bpp BI_RGB variant is supported (the common denominator every BMP
  * writer emits).
  */
object Bmp {

  final val HeaderBytes = 54 // 14 file + 40 info

  def isBmp(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= HeaderBytes &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte

  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need ${w.toLong * h * 3} rgb bytes for ${w}x$h, got ${rgb.length}")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val out = new Array[Byte](HeaderBytes + dataSize)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putInt(out, 2, out.length)
    putInt(out, 10, HeaderBytes)
    putInt(out, 14, 40)
    putInt(out, 18, w)
    putInt(out, 22, h) // positive: bottom-up
    putShort(out, 26, 1)
    putShort(out, 28, 24)
    putInt(out, 30, 0) // BI_RGB
    putInt(out, 34, dataSize)
    putInt(out, 38, 2835); putInt(out, 42, 2835) // 72 DPI
    var o = HeaderBytes
    var y = h - 1
    while (y >= 0) {
      var x = 0
      val row = y * w * 3
      while (x < w) {
        val p = row + x * 3
        out(o) = rgb(p + 2); out(o + 1) = rgb(p + 1); out(o + 2) = rgb(p)
        o += 3; x += 1
      }
      o += pad
      y -= 1
    }
    out
  }

  /** (width, height, top-down row-major RGB bytes); rejects non-24-bpp or
    * compressed variants. Handles both bottom-up (height > 0) and top-down
    * (height < 0) storage. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isBmp(payload), "not a BMP payload")
    val off = getInt(payload, 10)
    val hdrSize = getInt(payload, 14)
    require(hdrSize >= 40, s"unsupported BMP info-header size $hdrSize")
    val w = getInt(payload, 18)
    val hRaw = getInt(payload, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = getShort(payload, 28)
    val comp = getInt(payload, 30)
    require(bpp == 24 && comp == 0, s"unsupported BMP variant: $bpp bpp, compression $comp")
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    // header fields are untrusted: size math in LONG arithmetic (a hostile
    // w×h can overflow Int into a small/negative product that would pass a
    // 32-bit truncation check and blow up later), and the pixel-data offset
    // must land inside the payload past both headers
    require(w.toLong * h * 3 <= Int.MaxValue, s"oversized BMP ${w}x$h")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    require(off >= HeaderBytes && off.toLong <= payload.length, s"bad pixel-data offset $off")
    require(payload.length >= off.toLong + (rowBytes + pad).toLong * h, "truncated BMP pixel data")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var src = off + srcRow * (rowBytes + pad)
      var dst = y * w * 3
      var x = 0
      while (x < w) {
        rgb(dst) = payload(src + 2); rgb(dst + 1) = payload(src + 1); rgb(dst + 2) = payload(src)
        src += 3; dst += 3; x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** nearest-neighbor resample of top-down RGB pixels (real pixel math) */
  def resizeRgb(w: Int, h: Int, rgb: Array[Byte], nw: Int, nh: Int): Array[Byte] = {
    require(nw > 0 && nh > 0)
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * h / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * w / nw).toInt
        val s = (sy * w + sx) * 3
        val d = (y * nw + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PPM (P6 binary, the other trivially-parseable public format) ----

  def isPpm(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 2 &&
      payload(0) == 'P'.toByte && payload(1) == '6'.toByte

  /** binary PPM: "P6\n<w> <h>\n255\n" + raw RGB rows top-down (no padding) */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** (width, height, top-down RGB); handles whitespace/comments per the
    * published netpbm grammar, 8-bit maxval only */
  def decodePpm(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isPpm(payload), "not a P6 PPM payload")
    var pos = 2
    def skipSpace(): Unit = {
      var in = true
      while (in && pos < payload.length) {
        val c = payload(pos)
        if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipSpace()
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(w > 0 && h > 0 && maxval == 255, s"unsupported PPM ${w}x$h maxval $maxval")
    require(w.toLong * h * 3 <= Int.MaxValue, s"oversized PPM ${w}x$h") // untrusted header dims
    pos += 1 // single whitespace after maxval
    require(payload.length >= pos.toLong + w.toLong * h * 3, "truncated PPM pixel data")
    (w, h, java.util.Arrays.copyOfRange(payload, pos, pos + w * h * 3))
  }

  @inline private def putInt(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = v.toByte; b(pos + 1) = (v >> 8).toByte
    b(pos + 2) = (v >> 16).toByte; b(pos + 3) = (v >> 24).toByte
  }
  @inline private def putShort(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = v.toByte; b(pos + 1) = (v >> 8).toByte
  }
  @inline private def getInt(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) | ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
  @inline private def getShort(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
}
