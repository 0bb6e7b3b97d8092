package graft.operators

import graft.core.ByteWriter

/** PNG (RFC 2083) reader + writer. The image-specific layers are
  * implemented here by hand — chunk framing with CRC-32 verification, IHDR
  * validation, IDAT reassembly, scanline UN-FILTERING (None/Sub/Up/Average/
  * Paeth), color-type normalization to top-down RGB — while the DEFLATE
  * bitstream goes through `java.util.zip` (part of Java SE since 1.1; a JDK
  * intrinsic, not an external codec library). Pixels are accepted/returned
  * as top-down row-major RGB triplets, same contract as Bmp/Gif.
  *
  * Supported on decode: bit depth 8; color types 0 (gray), 2 (RGB),
  * 3 (palette), 4 (gray+alpha), 6 (RGBA — alpha stripped, documented);
  * interlace none (Adam7 is rejected loudly, an honest boundary). The
  * writer emits color type 2 with per-row filter 0 and REAL zlib
  * compression (Deflater), so round-trips exercise the same inflate path
  * real-world PNGs use. All header fields are treated as untrusted with
  * long-arithmetic bounds checks.
  */
object Png {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  def isPng(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 && {
      var i = 0
      while (i < 8 && payload(i) == SIG(i)) i += 1
      i == 8
    }

  // ------------------------------ decode ------------------------------

  /** (width, height, top-down row-major RGB bytes); rejects malformed
    * containers and bad chunk CRCs loudly */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isPng(payload), "not a PNG payload")
    var pos = 8
    def u32(p: Int): Long = {
      require(p + 4 <= payload.length, "truncated PNG")
      ((payload(p) & 0xffL) << 24) | ((payload(p + 1) & 0xffL) << 16) |
        ((payload(p + 2) & 0xffL) << 8) | (payload(p + 3) & 0xffL)
    }
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var palette: Array[Byte] = null
    val idat = new ByteWriter(1024)
    var seenIhdr = false
    var seenIend = false
    while (!seenIend) {
      val len = u32(pos)
      require(len <= Int.MaxValue - 12 && pos + 12 + len <= payload.length,
        s"truncated PNG chunk at $pos (len $len)")
      val ctype = new String(payload, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      // CRC-32 over type + data (java.util.zip.CRC32 — the PNG polynomial)
      val crc = new java.util.zip.CRC32()
      crc.update(payload, pos + 4, 4 + len.toInt)
      require(crc.getValue == u32(dataOff + len.toInt),
        s"bad CRC in PNG chunk $ctype")
      ctype match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          w = u32(dataOff).toInt; h = u32(dataOff + 4).toInt
          bitDepth = payload(dataOff + 8) & 0xff
          colorType = payload(dataOff + 9) & 0xff
          val compression = payload(dataOff + 10) & 0xff
          val filterMethod = payload(dataOff + 11) & 0xff
          val interlace = payload(dataOff + 12) & 0xff
          require(w > 0 && h > 0 && w.toLong * h * 4 + h <= Int.MaxValue,
            s"bad PNG dimensions ${w}x$h")
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth (only 8)")
          require(Set(0, 2, 3, 4, 6).contains(colorType), s"unsupported PNG color type $colorType")
          require(compression == 0 && filterMethod == 0, "nonstandard PNG compression/filter method")
          require(interlace == 0, "Adam7-interlaced PNG not supported")
          seenIhdr = true
        case "PLTE" =>
          require(len % 3 == 0 && len <= 256 * 3, s"bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(payload, dataOff, dataOff + len.toInt)
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.writeBytes(java.util.Arrays.copyOfRange(payload, dataOff, dataOff + len.toInt))
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk (tEXt/gAMA/tRNS/...) — skipped
      }
      pos = dataOff + len.toInt + 4
    }
    require(seenIhdr, "PNG without IHDR")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    if (colorType == 3) require(palette != null, "palette PNG without PLTE")

    // zlib inflate of the concatenated IDAT stream
    val stride = w * channels
    val expect = h * (1 + stride)
    val raw = new Array[Byte](expect)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toArray)
      var got = 0
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(raw, got, expect - got)
        require(n > 0 || inf.finished(), "truncated/invalid PNG zlib stream")
        got += n
      }
      require(got == expect, s"PNG pixel data: inflated $got of $expect bytes")
    } finally inf.end()

    // un-filter scanlines in place (output shifted down by the filter bytes)
    val img = new Array[Byte](h * stride)
    val bpp = channels
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      val prev = dst - stride
      var x = 0
      ft match {
        case 0 => System.arraycopy(raw, src, img, dst, stride)
        case 1 => // Sub
          while (x < stride) {
            val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0
            img(dst + x) = ((raw(src + x) & 0xff) + a).toByte; x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val b = if (y > 0) img(prev + x) & 0xff else 0
            img(dst + x) = ((raw(src + x) & 0xff) + b).toByte; x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0
            val b = if (y > 0) img(prev + x) & 0xff else 0
            img(dst + x) = ((raw(src + x) & 0xff) + ((a + b) >> 1)).toByte; x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0
            val b = if (y > 0) img(prev + x) & 0xff else 0
            val c = if (x >= bpp && y > 0) img(prev + x - bpp) & 0xff else 0
            img(dst + x) = ((raw(src + x) & 0xff) + paeth(a, b, c)).toByte; x += 1
          }
        case other => throw new IllegalArgumentException(s"bad PNG filter type $other")
      }
      y += 1
    }

    // normalize to RGB
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    colorType match {
      case 2 => System.arraycopy(img, 0, rgb, 0, rgb.length)
      case 0 =>
        while (i < w * h) {
          val g = img(i); rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g; i += 1
        }
      case 4 => // gray + alpha: alpha stripped
        while (i < w * h) {
          val g = img(i * 2); rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g; i += 1
        }
      case 6 => // RGBA: alpha stripped
        while (i < w * h) {
          rgb(i * 3) = img(i * 4); rgb(i * 3 + 1) = img(i * 4 + 1)
          rgb(i * 3 + 2) = img(i * 4 + 2); i += 1
        }
      case 3 =>
        while (i < w * h) {
          val p = img(i) & 0xff
          require(p * 3 + 2 < palette.length, s"PNG palette index $p outside PLTE")
          rgb(i * 3) = palette(p * 3); rgb(i * 3 + 1) = palette(p * 3 + 1)
          rgb(i * 3 + 2) = palette(p * 3 + 2); i += 1
        }
    }
    (w, h, rgb)
  }

  /** Paeth predictor (RFC 2083 §6.6) */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------ encode ------------------------------

  /** color-type-2 (truecolor RGB) writer, per-row filter 0, real zlib
    * compression. Round-trips bit-identically through [[decode]]. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"need ${w.toLong * h * 3} rgb bytes for ${w}x$h, got ${rgb.length}")
    val out = new ByteWriter(1024)
    out.writeBytes(SIG)
    val ihdr = new ByteWriter(13)
    writeU32BE(ihdr, w); writeU32BE(ihdr, h)
    ihdr.writeByte(8); ihdr.writeByte(2) // bit depth 8, color type 2 (RGB)
    ihdr.writeByte(0); ihdr.writeByte(0); ihdr.writeByte(0)
    chunk(out, "IHDR", ihdr.toArray)

    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      raw(y * (1 + stride)) = 0 // filter type 0
      System.arraycopy(rgb, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new ByteWriter(raw.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(tmp)
        if (n > 0) buf.writeBytes(java.util.Arrays.copyOf(tmp, n))
      }
      buf.toArray
    } finally d.end()
  }

  private def chunk(out: ByteWriter, ctype: String, data: Array[Byte]): Unit = {
    writeU32BE(out, data.length)
    val t = ctype.getBytes("US-ASCII")
    out.writeBytes(t)
    out.writeBytes(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    writeU32BE(out, crc.getValue.toInt)
  }

  private def writeU32BE(out: ByteWriter, v: Int): Unit = {
    out.writeByte((v >>> 24) & 0xff); out.writeByte((v >>> 16) & 0xff)
    out.writeByte((v >>> 8) & 0xff); out.writeByte(v & 0xff)
  }
}
