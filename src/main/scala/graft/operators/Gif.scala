package graft.operators

import graft.core.{ByteReader, ByteWriter}

/** GIF87a/89a reader + GIF87a writer in pure Scala — the media layer's third
  * REAL image codec (after BMP and P6 PPM; no image libraries ship in this
  * sandbox, but the published GIF layout + LZW variant are parseable by
  * hand). Pixels are accepted/returned as top-down row-major RGB triplets.
  *
  * Container layout (little-endian): "GIF87a"/"GIF89a" signature, 7-byte
  * logical screen descriptor (width, height, packed flags incl. global
  * color table size 2^(n+1), background index, aspect), optional global
  * color table (RGB triplets), then blocks: 0x21 extensions (89a — label +
  * length-prefixed sub-blocks, skipped), 0x2C image descriptor (left, top,
  * width, height, packed flags incl. local color table + interlace), LZW
  * minimum code size byte, length-prefixed compressed sub-blocks, 0x3B
  * trailer.
  *
  * LZW (GIF variant): codes packed LSB-first; initial code width is
  * minCodeSize+1; CLEAR = 2^min resets the dictionary, END = CLEAR+1
  * terminates; each emitted code appends (previous sequence + first byte of
  * current) to the dictionary, widening the code size when the dictionary
  * reaches 2^width, capped at 12 bits. The writer implements real LZW (with
  * dictionary reset at 4096 entries), so round-trips exercise the same
  * growth path real-world GIFs use.
  */
object Gif {

  def isGif(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 13 &&
      payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a'

  // ------------------------------ decode ------------------------------

  /** (width, height, top-down row-major RGB bytes) of the FIRST image in
    * the stream; 89a extension blocks are skipped; interlaced and
    * local-color-table images are handled; rejects malformed containers
    * loudly (all header fields treated as untrusted). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isGif(payload), "not a GIF payload")
    val r = new ByteReader(payload, 6)
    val sw = readU16(r); val sh = readU16(r)
    val packed = r.readByte() & 0xff
    r.readByte(); r.readByte() // background index, aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(r.remaining >= 3 * n, "truncated GIF global color table")
      gct = r.readBytes(3 * n)
    }
    while (true) {
      require(r.remaining >= 1, "truncated GIF: no image descriptor")
      (r.readByte() & 0xff) match {
        case 0x21 => // 89a extension: label + sub-blocks, skipped
          require(r.remaining >= 1, "truncated GIF extension")
          r.readByte()
          skipSubBlocks(r)
        case 0x2c =>
          val left = readU16(r); val top = readU16(r)
          val w = readU16(r); val h = readU16(r)
          val ip = r.readByte() & 0xff
          val interlaced = (ip & 0x40) != 0
          val palette =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              require(r.remaining >= 3 * n, "truncated GIF local color table")
              r.readBytes(3 * n)
            } else gct
          require(palette != null, "GIF image has neither local nor global color table")
          require(w > 0 && h > 0 && left + w <= sw && top + h <= sh,
            s"bad GIF frame geometry ${w}x$h@$left,$top in ${sw}x$sh")
          require(sw.toLong * sh * 3 <= Int.MaxValue, s"oversized GIF ${sw}x$sh")
          val minCode = r.readByte() & 0xff
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
          val data = readSubBlocks(r)
          val idx = lzwDecode(data, minCode, w * h)
          // frame indices → full-canvas top-down RGB (background = 0s);
          // single-frame use, so the canvas is just this frame placed at
          // (left, top) — matching how every still-image GIF is written
          val rgb = new Array[Byte](sw * sh * 3)
          val rows = rowOrder(h, interlaced)
          var i = 0
          var y = 0
          while (y < h) {
            val destY = top + rows(y)
            var x = 0
            while (x < w) {
              val c = idx(i) & 0xff
              require(c * 3 + 2 < palette.length, s"GIF index $c outside palette")
              val o = (destY * sw + left + x) * 3
              rgb(o) = palette(c * 3); rgb(o + 1) = palette(c * 3 + 1); rgb(o + 2) = palette(c * 3 + 2)
              i += 1; x += 1
            }
            y += 1
          }
          return (sw, sh, rgb)
        case 0x3b => throw new IllegalArgumentException("GIF trailer before any image")
        case other => throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** ALL frames of a (possibly multi-image/animated) GIF: frames composite
    * onto a running canvas at their (left, top) — the "do not dispose"
    * semantics still-and-slideshow GIFs use — and each emitted frame is the
    * canvas after drawing. Single-image GIFs yield exactly decode(). */
  def decodeFrames(payload: Array[Byte]): (Int, Int, IndexedSeq[Array[Byte]]) = {
    require(isGif(payload), "not a GIF payload")
    val r = new ByteReader(payload, 6)
    val sw = readU16(r); val sh = readU16(r)
    val packed = r.readByte() & 0xff
    r.readByte(); r.readByte()
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(r.remaining >= 3 * n, "truncated GIF global color table")
      gct = r.readBytes(3 * n)
    }
    require(sw > 0 && sh > 0 && sw.toLong * sh * 3 <= Int.MaxValue, s"bad GIF canvas ${sw}x$sh")
    val canvas = new Array[Byte](sw * sh * 3)
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var done = false
    while (!done) {
      require(r.remaining >= 1, "truncated GIF: missing trailer")
      (r.readByte() & 0xff) match {
        case 0x21 =>
          require(r.remaining >= 1, "truncated GIF extension")
          r.readByte()
          skipSubBlocks(r)
        case 0x2c =>
          val left = readU16(r); val top = readU16(r)
          val w = readU16(r); val h = readU16(r)
          val ip = r.readByte() & 0xff
          val interlaced = (ip & 0x40) != 0
          val palette =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              require(r.remaining >= 3 * n, "truncated GIF local color table")
              r.readBytes(3 * n)
            } else gct
          require(palette != null, "GIF image has neither local nor global color table")
          require(w > 0 && h > 0 && left + w <= sw && top + h <= sh,
            s"bad GIF frame geometry ${w}x$h@$left,$top in ${sw}x$sh")
          val minCode = r.readByte() & 0xff
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
          val idx = lzwDecode(readSubBlocks(r), minCode, w * h)
          val rows = rowOrder(h, interlaced)
          var i = 0
          var y = 0
          while (y < h) {
            val destY = top + rows(y)
            var x = 0
            while (x < w) {
              val c = idx(i) & 0xff
              require(c * 3 + 2 < palette.length, s"GIF index $c outside palette")
              val o = (destY * sw + left + x) * 3
              canvas(o) = palette(c * 3); canvas(o + 1) = palette(c * 3 + 1); canvas(o + 2) = palette(c * 3 + 2)
              i += 1; x += 1
            }
            y += 1
          }
          frames += java.util.Arrays.copyOf(canvas, canvas.length)
        case 0x3b =>
          require(frames.nonEmpty, "GIF trailer before any image")
          done = true
        case other => throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
      }
    }
    (sw, sh, frames.toIndexedSeq)
  }

  /** header-only walk: (canvas w, canvas h, image count) without decoding
    * any pixel data — sub-blocks are skipped by their length prefixes */
  def countFrames(payload: Array[Byte]): (Int, Int, Int) = {
    require(isGif(payload), "not a GIF payload")
    val r = new ByteReader(payload, 6)
    val sw = readU16(r); val sh = readU16(r)
    val packed = r.readByte() & 0xff
    r.readByte(); r.readByte()
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(r.remaining >= 3 * n, "truncated GIF global color table")
      r.pos += 3 * n
    }
    var frames = 0
    while (true) {
      require(r.remaining >= 1, "truncated GIF: missing trailer")
      (r.readByte() & 0xff) match {
        case 0x21 =>
          require(r.remaining >= 1, "truncated GIF extension")
          r.readByte()
          skipSubBlocks(r)
        case 0x2c =>
          require(r.remaining >= 10, "truncated GIF image descriptor")
          r.pos += 8
          val ip = r.readByte() & 0xff
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            require(r.remaining >= 3 * n, "truncated GIF local color table")
            r.pos += 3 * n
          }
          require(r.remaining >= 1, "truncated GIF image data")
          r.readByte() // LZW min code size
          skipSubBlocks(r)
          frames += 1
        case 0x3b =>
          require(frames > 0, "GIF trailer before any image")
          return (sw, sh, frames)
        case other => throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** interlaced GIFs store rows in 4 passes (0,8.. / 4,8.. / 2,4.. / 1,2..) */
  private def rowOrder(h: Int, interlaced: Boolean): Array[Int] = {
    val out = new Array[Int](h)
    if (!interlaced) { var y = 0; while (y < h) { out(y) = y; y += 1 }; return out }
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { out(i) = y; i += 1; y += step }
    }
    out
  }

  private def readU16(r: ByteReader): Int = {
    val lo = r.readByte() & 0xff; val hi = r.readByte() & 0xff
    lo | (hi << 8)
  }

  private def skipSubBlocks(r: ByteReader): Unit = {
    var len = r.readByte() & 0xff
    while (len != 0) {
      require(r.remaining >= len + 1, "truncated GIF sub-blocks")
      r.pos += len
      len = r.readByte() & 0xff
    }
  }

  private def readSubBlocks(r: ByteReader): Array[Byte] = {
    val w = new ByteWriter(256)
    var len = r.readByte() & 0xff
    while (len != 0) {
      require(r.remaining >= len + 1, "truncated GIF image data")
      w.writeBytes(r.readBytes(len))
      len = r.readByte() & 0xff
    }
    w.toArray
  }

  /** GIF-variant LZW over the concatenated sub-block bytes; expects exactly
    * `expect` pixels (truncated/overlong streams rejected). Dictionary as
    * (prefix link, appended byte) pairs — O(output) total work. Width grows
    * when the NEXT free code would no longer fit (the code about to be read
    * can be at most `nextFree`, the KwKwK case). */
  private def lzwDecode(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val append = new Array[Byte](maxDict)
    val firstOf = new Array[Byte](maxDict) // first byte of each sequence
    val out = new Array[Byte](expect)
    var outLen = 0
    var nextFree = end + 1
    var width = minCode + 1
    var bitPos = 0
    var prev = -1

    def read(): Int = {
      var v = 0; var got = 0
      while (got < width) {
        val byteI = bitPos >> 3
        require(byteI < data.length, "truncated GIF LZW stream")
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        val bits = ((data(byteI) & 0xff) >> (bitPos & 7)) & ((1 << take) - 1)
        v |= bits << got
        got += take; bitPos += take
      }
      v
    }

    def first(code: Int): Byte = if (code < clear) code.toByte else firstOf(code)

    def emit(code: Int): Unit = {
      var n = 1
      var c = code
      while (c > end) { n += 1; c = prefix(c) }
      require(outLen + n <= expect, s"GIF LZW output exceeds $expect pixels")
      var o = outLen + n - 1
      c = code
      while (c > end) { out(o) = append(c); o -= 1; c = prefix(c) }
      out(o) = c.toByte
      outLen += n
    }

    var code = read()
    while (code != end) {
      if (code == clear) {
        nextFree = end + 1; width = minCode + 1; prev = -1
      } else {
        if (prev < 0) {
          require(code < clear, s"first LZW code $code not a literal")
          emit(code)
        } else {
          require(code < nextFree || code == nextFree, s"bad LZW code $code (next free $nextFree)")
          require(code != nextFree || nextFree < maxDict, "KwKwK code with full dictionary")
          if (nextFree < maxDict) {
            // entry = prev's sequence + first byte of CURRENT sequence; for
            // the KwKwK case (code == nextFree) that first byte is prev's own
            prefix(nextFree) = prev
            append(nextFree) = if (code == nextFree) first(prev) else first(code)
            firstOf(nextFree) = first(prev)
            nextFree += 1
          }
          emit(code)
        }
        prev = code
        // the next code can be at most nextFree (KwKwK): widen when it
        // would not fit at the current width
        if (nextFree == (1 << width) && width < 12) width += 1
      }
      code = read()
    }
    require(outLen == expect, s"GIF LZW decoded $outLen of $expect pixels")
    out
  }

  // ------------------------------ encode ------------------------------

  /** GIF87a writer: palette-based (≤256 distinct colors required — the
    * published format's hard limit), real LZW compression with dictionary
    * growth and reset. Round-trips bit-identically through [[decode]]. */
  /** palette bytes (padded to 2^bits entries), bits, and per-pixel indices */
  private def buildPalette(w: Int, h: Int, rgb: Array[Byte]): (Array[Byte], Int, Array[Byte]) = {
    val colorToIdx = new java.util.HashMap[Integer, Integer]()
    val palette = new ByteWriter(64)
    val idx = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val c = ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff)
      var pi = colorToIdx.get(c)
      if (pi == null) {
        pi = colorToIdx.size()
        require(pi < 256, "GIF supports at most 256 distinct colors")
        colorToIdx.put(c, pi)
        palette.writeBytes(Array(rgb(i * 3), rgb(i * 3 + 1), rgb(i * 3 + 2)))
      }
      idx(i) = pi.toByte
      i += 1
    }
    val ndv = colorToIdx.size()
    var bits = 1
    while ((1 << bits) < ndv) bits += 1 // table size field stores 2^(n+1)
    palette.writeBytes(new Array[Byte](((1 << bits) - ndv) * 3)) // pad to 2^n
    (palette.toArray, bits, idx)
  }

  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff && rgb.length == w * h * 3,
      s"need ${w.toLong * h * 3} rgb bytes for ${w}x$h, got ${rgb.length}")
    val (palette, bits, idx) = buildPalette(w, h, rgb)
    val minCode = math.max(2, bits)
    val out = new ByteWriter(1024)
    out.writeBytes("GIF87a".getBytes("US-ASCII"))
    out.writeShort(w); out.writeShort(h)
    out.writeByte(0x80 | ((bits - 1) & 7)) // GCT present, size 2^bits
    out.writeByte(0); out.writeByte(0)
    out.writeBytes(palette)
    out.writeByte(0x2c)
    out.writeShort(0); out.writeShort(0); out.writeShort(w); out.writeShort(h)
    out.writeByte(0) // no LCT, not interlaced
    out.writeByte(minCode)
    writeSubBlocks(out, lzwEncode(idx, minCode))
    out.writeByte(0x3b)
    out.toArray
  }

  /** multi-image GIF87a writer (the format allows any number of image
    * blocks): every frame is full-canvas with its OWN local color table, so
    * frames are palette-independent. Round-trips through [[decodeFrames]];
    * [[decode]] of the result is frame 0. */
  def encodeAnimated(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad canvas ${w}x$h")
    val out = new ByteWriter(1024)
    out.writeBytes("GIF87a".getBytes("US-ASCII"))
    out.writeShort(w); out.writeShort(h)
    out.writeByte(0) // no global color table
    out.writeByte(0); out.writeByte(0)
    for (rgb <- frames) {
      require(rgb.length == w * h * 3, s"frame needs ${w.toLong * h * 3} rgb bytes, got ${rgb.length}")
      val (palette, bits, idx) = buildPalette(w, h, rgb)
      val minCode = math.max(2, bits)
      out.writeByte(0x2c)
      out.writeShort(0); out.writeShort(0); out.writeShort(w); out.writeShort(h)
      out.writeByte(0x80 | ((bits - 1) & 7)) // LCT present, size 2^bits
      out.writeBytes(palette)
      out.writeByte(minCode)
      writeSubBlocks(out, lzwEncode(idx, minCode))
    }
    out.writeByte(0x3b)
    out.toArray
  }

  private def writeSubBlocks(out: ByteWriter, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.writeByte(n)
      var i = 0
      while (i < n) { out.writeByte(data(off + i)); i += 1 }
      off += n
    }
    out.writeByte(0)
  }

  /** real LZW: longest-match dictionary of (prefixCode, byte) → code, CLEAR
    * emitted up front and on dictionary overflow. Code widths follow a
    * SIMULATION OF THE DECODER'S dictionary clock (decNext): the decoder
    * assigns its mirror entry one code later than the encoder does, so
    * driving widths off the encoder's own table would desynchronize at
    * every power-of-two boundary. */
  private def lzwEncode(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val maxDict = 4096
    val out = new ByteWriter(256)
    var cur = 0; var curBits = 0
    var width = minCode + 1
    // (prefixCode << 8 | byte) → code; encoder's own table
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = end + 1
    // decoder mirror: entries the decoder has assigned so far
    var decNext = end + 1
    var firstSinceClear = true

    def put(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) { out.writeByte(cur & 0xff); cur >>>= 8; curBits -= 8 }
    }

    /** after each DATA code: advance the decoder mirror and widen like it */
    def dataCodeEmitted(): Unit = {
      if (!firstSinceClear && decNext < maxDict) decNext += 1
      firstSinceClear = false
      if (decNext == (1 << width) && width < 12) width += 1
    }

    def reset(): Unit = {
      put(clear)
      dict = new java.util.HashMap[Integer, Integer]()
      nextCode = end + 1
      decNext = end + 1
      width = minCode + 1
      firstSinceClear = true
    }

    reset()
    var prev = -1
    var i = 0
    while (i < pixels.length) {
      val b = pixels(i) & 0xff
      if (prev < 0) prev = b
      else {
        val key = (prev << 8) | b
        val hit = dict.get(key)
        if (hit != null) prev = hit
        else {
          put(prev); dataCodeEmitted()
          if (nextCode < maxDict) {
            dict.put(key, nextCode); nextCode += 1
          } else reset()
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) { put(prev); dataCodeEmitted() }
    put(end)
    if (curBits > 0) out.writeByte(cur & 0xff)
    out.toArray
  }
}
