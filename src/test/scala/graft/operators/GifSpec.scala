package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GIF87a/89a codec: LZW round-trips (incl. code-width growth and
  * dictionary overflow), interlace, 89a extensions, palette limits, and
  * integration with the real-image dispatch. */
class GifSpec extends AnyFunSuite {

  test("encode→decode is the identity on paletted pixels") {
    for (seed <- Seq(1L, 42L, 0x61FL); (w, h) <- Seq((7, 5), (33, 21), (64, 48))) {
      val rgb = MediaOps.seededPalettedRgb(graft.core.Bits.mix(seed), w, h)
      val gif = Gif.encode(w, h, rgb)
      assert(Gif.isGif(gif))
      val (dw, dh, back) = Gif.decode(gif)
      assert(dw === w && dh === h)
      assert(java.util.Arrays.equals(back, rgb), s"seed=$seed ${w}x$h")
    }
  }

  test("LZW width growth and dictionary overflow round-trip (large low-entropy image)") {
    // 256×200 = 51k pixels over a 29-color palette: the dictionary blows
    // through every width boundary and past 4096 (CLEAR + reset path)
    val w = 256; val h = 200
    val rgb = MediaOps.seededPalettedRgb(7L, w, h)
    val (dw, dh, back) = Gif.decode(Gif.encode(w, h, rgb))
    assert(dw === w && dh === h)
    assert(java.util.Arrays.equals(back, rgb))
    // and a maximally repetitive image (runs → deep LZW chains, KwKwK)
    val flat = new Array[Byte](w * h * 3)
    java.util.Arrays.fill(flat, 0x55.toByte)
    val (_, _, backFlat) = Gif.decode(Gif.encode(w, h, flat))
    assert(java.util.Arrays.equals(backFlat, flat))
  }

  test("two-color and single-color images (minimum code size floor)") {
    val w = 10; val h = 8
    val two = Array.tabulate(w * h * 3) { i =>
      if ((i / 3) % 2 == 0) 0.toByte else 0xff.toByte
    }
    assert(java.util.Arrays.equals(Gif.decode(Gif.encode(w, h, two))._3, two))
    val one = new Array[Byte](w * h * 3)
    assert(java.util.Arrays.equals(Gif.decode(Gif.encode(w, h, one))._3, one))
  }

  test("interlaced GIFs deinterlace by the 4-pass row order") {
    val w = 16; val h = 13
    val rgb = MediaOps.seededPalettedRgb(99L, w, h)
    // rows permuted into storage order, then the interlace flag set: the
    // decoder must place stored row j at display row passOrder(j)
    val pass = {
      val order = new Array[Int](h)
      var i = 0
      for ((s, st) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = s
        while (y < h) { order(i) = y; i += 1; y += st }
      }
      order
    }
    val permuted = new Array[Byte](rgb.length)
    for (j <- 0 until h)
      System.arraycopy(rgb, pass(j) * w * 3, permuted, j * w * 3, w * 3)
    val gif = Gif.encode(w, h, permuted)
    // image descriptor starts right after header(13) + GCT; set its
    // interlace bit (packed byte is 9 bytes into the 0x2C block)
    val gctBytes = 3 * (2 << ((gif(10) & 7)))
    val descPos = 13 + gctBytes
    assert(gif(descPos) === 0x2c.toByte)
    gif(descPos + 9) = (gif(descPos + 9) | 0x40).toByte
    val (_, _, back) = Gif.decode(gif)
    assert(java.util.Arrays.equals(back, rgb))
  }

  test("89a signature and extension blocks are accepted and skipped") {
    val w = 12; val h = 9
    val rgb = MediaOps.seededPalettedRgb(5L, w, h)
    val gif = Gif.encode(w, h, rgb)
    val gctBytes = 3 * (2 << ((gif(10) & 7)))
    val descPos = 13 + gctBytes
    // splice a graphic-control extension (0x21 0xF9, 4-byte block, term)
    // before the image descriptor and stamp the 89a signature
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val out = new Array[Byte](gif.length + ext.length)
    System.arraycopy(gif, 0, out, 0, descPos)
    System.arraycopy(ext, 0, out, descPos, ext.length)
    System.arraycopy(gif, descPos, out, descPos + ext.length, gif.length - descPos)
    out(4) = '9'.toByte
    val (dw, dh, back) = Gif.decode(out)
    assert(dw === w && dh === h)
    assert(java.util.Arrays.equals(back, rgb))
  }

  test("malformed containers fail loudly") {
    assert(!Gif.isGif("GIF88a".getBytes))
    assert(!Gif.isGif(Array[Byte](1, 2, 3)))
    val rgb = MediaOps.seededPalettedRgb(3L, 8, 8)
    val gif = Gif.encode(8, 8, rgb)
    intercept[IllegalArgumentException](Gif.decode(java.util.Arrays.copyOf(gif, 20)))
    // >256 distinct colors rejected at encode
    val many = Array.tabulate(32 * 32 * 3)(i => graft.core.Bits.mix(i.toLong).toByte)
    intercept[IllegalArgumentException](Gif.encode(32, 32, many))
    // meta is a classifier: a corrupt GIF container reports valid=false
    // instead of throwing (decodePixels stays loud)
    assert(!MediaOps.parseImage(java.util.Arrays.copyOf(gif, 20)).valid)
    intercept[IllegalArgumentException](MediaOps.decodePixels(java.util.Arrays.copyOf(gif, 20)))
  }

  test("multi-image GIF: encodeAnimated→decodeFrames round-trips; decode() is frame 0") {
    val w = 18; val h = 11
    val frames = (0 until 5).map(f => MediaOps.seededPalettedRgb(graft.core.Bits.mix(f + 100L), w, h))
    val gif = Gif.encodeAnimated(w, h, frames)
    assert(Gif.isGif(gif))
    val (dw, dh, back) = Gif.decodeFrames(gif)
    assert(dw === w && dh === h && back.length === 5)
    for (f <- 0 until 5) assert(java.util.Arrays.equals(back(f), frames(f)), s"frame $f")
    val (_, _, first) = Gif.decode(gif)
    assert(java.util.Arrays.equals(first, frames(0)))
    // header-only frame count agrees without touching pixel data
    assert(Gif.countFrames(gif) === ((w, h, 5)))
    assert(Gif.countFrames(Gif.encode(w, h, frames(0))) === ((w, h, 1)))
    // and video_meta reports it through the expression surface
    val vm = MediaOps.VideoMetaExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(gif,
        org.apache.spark.sql.types.BinaryType)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(vm.getBoolean(0) && vm.getInt(1) === w && vm.getInt(2) === h && vm.getInt(3) === 5)
  }

  test("partial frames composite onto the running canvas at (left, top)") {
    val w = 20; val h = 14
    val base = MediaOps.seededPalettedRgb(1L, w, h)
    val gif1 = Gif.encode(w, h, base)
    // a small 6x4 patch as its own single-frame animated gif (image block
    // carries a local color table, so it splices palette-independently)
    val pw = 6; val ph = 4
    val patch = MediaOps.seededPalettedRgb(2L, pw, ph)
    val patchGif = Gif.encodeAnimated(pw, ph, Seq(patch))
    // splice the patch's image block (starts at 13 — no GCT) before gif1's
    // trailer, then point its (left, top) at (3, 5)
    val block = java.util.Arrays.copyOfRange(patchGif, 13, patchGif.length - 1)
    assert(block(0) === 0x2c.toByte)
    val left = 3; val top = 5
    block(1) = left.toByte; block(2) = 0; block(3) = top.toByte; block(4) = 0
    val out = new Array[Byte](gif1.length - 1 + block.length + 1)
    System.arraycopy(gif1, 0, out, 0, gif1.length - 1)
    System.arraycopy(block, 0, out, gif1.length - 1, block.length)
    out(out.length - 1) = 0x3b
    val (_, _, fs) = Gif.decodeFrames(out)
    assert(fs.length === 2)
    assert(java.util.Arrays.equals(fs(0), base))
    val expect = java.util.Arrays.copyOf(base, base.length)
    for (y <- 0 until ph; x <- 0 until pw; ch <- 0 until 3)
      expect(((top + y) * w + left + x) * 3 + ch) = patch((y * pw + x) * 3 + ch)
    assert(java.util.Arrays.equals(fs(1), expect))
  }

  test("frame_sample over a multi-image GIF re-encodes sampled frames as BMPs") {
    val w = 16; val h = 12
    val frames = (0 until 6).map(f => MediaOps.seededPalettedRgb(f + 7L, w, h))
    val gif = Gif.encodeAnimated(w, h, frames)
    val expr = MediaOps.FrameSampleExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(gif,
        org.apache.spark.sql.types.BinaryType), 2)
    val arr = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() === 3) // frames 0, 2, 4
    for (i <- 0 until 3) {
      val bmp = arr.getBinary(i)
      assert(Bmp.isBmp(bmp))
      assert(java.util.Arrays.equals(Bmp.decode(bmp)._3, frames(i * 2)))
    }
  }

  test("GIFs flow through the real image path: meta, pixels, resize, checksum") {
    val rgb = MediaOps.seededPalettedRgb(11L, 24, 16)
    val gif = Gif.encode(24, 16, rgb)
    val m = MediaOps.parseImage(gif)
    assert(m.valid && m.width === 24 && m.height === 16 && m.channels === 3)
    assert(java.util.Arrays.equals(MediaOps.decodePixels(gif), rgb))
    val real = MediaOps.realImage(gif)
    assert(real != null && real._1 === 24)
  }
}
