package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PNG codec: zlib round-trips, every filter type's un-filtering, all five
  * supported color types, CRC verification, malformed rejection, and
  * real-image-path integration. */
class PngSpec extends AnyFunSuite {

  // ---- hand-rolled PNG builder (independent of Png.encode): arbitrary
  // color type and per-row filter, so the decoder's un-filter branches and
  // normalization paths are exercised by an independent construction ----
  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val t = ctype.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    u32be(data.length.toLong) ++ t ++ data ++ u32be(crc.getValue)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  /** build a PNG with the given color type and per-row filter types,
    * applying the filters FORWARD per RFC 2083 §6 */
  private def buildPng(w: Int, h: Int, colorType: Int, channels: Int,
                       pixels: Array[Byte], filters: Int => Int,
                       plte: Array[Byte] = null): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    val ihdr = u32be(w.toLong) ++ u32be(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until h) {
      val ft = filters(y)
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xff
        val a = if (x >= channels) pixels(y * stride + x - channels) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= channels && y > 0) pixels((y - 1) * stride + x - channels) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = (cur - pred).toByte
      }
    }
    sig ++ chunk("IHDR", ihdr) ++
      (if (plte != null) chunk("PLTE", plte) else Array.emptyByteArray) ++
      chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.emptyByteArray)
  }

  test("encode→decode is the identity (zlib-compressed color type 2)") {
    for (seed <- Seq(1L, 0x9E6L); (w, h) <- Seq((5, 3), (33, 21), (128, 64))) {
      val rgb = MediaOps.seededRgb(graft.core.Bits.mix(seed), w, h)
      val png = Png.encode(w, h, rgb)
      assert(Png.isPng(png))
      val (dw, dh, back) = Png.decode(png)
      assert(dw === w && dh === h)
      assert(java.util.Arrays.equals(back, rgb), s"seed=$seed ${w}x$h")
    }
  }

  test("every filter type un-filters correctly (independent construction)") {
    val w = 17; val h = 10
    val rgb = MediaOps.seededRgb(42L, w, h)
    for (ft <- 0 to 4) {
      val png = buildPng(w, h, colorType = 2, channels = 3, rgb, _ => ft)
      assert(java.util.Arrays.equals(Png.decode(png)._3, rgb), s"filter $ft")
    }
    // mixed filters per row (the realistic encoder output shape)
    val mixed = buildPng(w, h, 2, 3, rgb, y => y % 5)
    assert(java.util.Arrays.equals(Png.decode(mixed)._3, rgb))
  }

  test("color types normalize to RGB: gray, palette, gray+alpha, RGBA") {
    val w = 9; val h = 7
    // gray (type 0): replicate
    val gray = Array.tabulate(w * h)(i => (graft.core.Bits.mix(i.toLong) & 0xff).toByte)
    val g = Png.decode(buildPng(w, h, 0, 1, gray, _ => 1))._3
    for (i <- 0 until w * h; ch <- 0 until 3) assert(g(i * 3 + ch) === gray(i))
    // palette (type 3)
    val plte = Array.tabulate(3 * 16)(i => (i * 7 + 3).toByte)
    val idx = Array.tabulate(w * h)(i => (i % 16).toByte)
    val p = Png.decode(buildPng(w, h, 3, 1, idx, _ => 0, plte))._3
    for (i <- 0 until w * h; ch <- 0 until 3)
      assert(p(i * 3 + ch) === plte((idx(i) & 0xff) * 3 + ch))
    // gray+alpha (type 4): alpha stripped
    val ga = new Array[Byte](w * h * 2)
    for (i <- 0 until w * h) { ga(i * 2) = gray(i); ga(i * 2 + 1) = 0x80.toByte }
    val gaRgb = Png.decode(buildPng(w, h, 4, 2, ga, _ => 2))._3
    for (i <- 0 until w * h) assert(gaRgb(i * 3) === gray(i))
    // RGBA (type 6): alpha stripped
    val rgb = MediaOps.seededRgb(7L, w, h)
    val rgba = new Array[Byte](w * h * 4)
    for (i <- 0 until w * h) {
      rgba(i * 4) = rgb(i * 3); rgba(i * 4 + 1) = rgb(i * 3 + 1)
      rgba(i * 4 + 2) = rgb(i * 3 + 2); rgba(i * 4 + 3) = 0xff.toByte
    }
    assert(java.util.Arrays.equals(Png.decode(buildPng(w, h, 6, 4, rgba, _ => 4))._3, rgb))
  }

  test("malformed containers fail loudly; corrupt CRC detected") {
    assert(!Png.isPng(Array[Byte](1, 2, 3)))
    val png = Png.encode(8, 8, MediaOps.seededRgb(3L, 8, 8))
    intercept[IllegalArgumentException](Png.decode(java.util.Arrays.copyOf(png, 20)))
    // flip a byte inside IHDR data: chunk CRC must catch it
    val corrupt = png.clone()
    corrupt(16) = (corrupt(16) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Png.decode(corrupt))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("dimensions"))
    // Adam7 rejected loudly: patch interlace byte and re-CRC
    val ihdrData = java.util.Arrays.copyOfRange(png, 16, 29)
    ihdrData(12) = 1
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    val patched = png.clone()
    System.arraycopy(ihdrData, 0, patched, 16, 13)
    val crcBytes = u32be(crc.getValue)
    System.arraycopy(crcBytes, 0, patched, 29, 4)
    val e2 = intercept[IllegalArgumentException](Png.decode(patched))
    assert(e2.getMessage.contains("Adam7"))
  }

  test("PNGs flow through the real image path: meta, pixels, resize, checksum") {
    val rgb = MediaOps.seededRgb(11L, 24, 16)
    val png = Png.encode(24, 16, rgb)
    val m = MediaOps.parseImage(png)
    assert(m.valid && m.width === 24 && m.height === 16 && m.channels === 3)
    assert(java.util.Arrays.equals(MediaOps.decodePixels(png), rgb))
    // corrupt real container → meta classifier, not a throw
    assert(!MediaOps.parseImage(java.util.Arrays.copyOf(png, 20)).valid)
  }
}
