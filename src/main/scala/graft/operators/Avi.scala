package graft.operators

/** Minimal uncompressed-DIB AVI reader/writer in pure Scala — the media
  * layer's REAL video container (no video codec libraries ship in this
  * sandbox, but AVI with raw DIB frames is pure published container math:
  * RIFF chunks — the grammar Wav.scala already parses — around BMP-style
  * bottom-up BGR frame bitmaps, the Bmp.scala pixel layout without the
  * 14-byte file header). Compressed codecs (H.264 & co.) stay out of
  * scope; the frame-extraction OPERATOR is fully real for this format.
  *
  * Layout (little-endian):
  *   RIFF <size> "AVI "
  *     LIST <size> "hdrl"
  *       "avih" 56  (µs/frame, maxBytesPerSec, pad, flags, totalFrames,
  *                   initialFrames, streams=1, bufSize, width, height, rsvd×4)
  *       LIST <size> "strl"
  *         "strh" 56 ("vids" "DIB ", flags, prio, frames, scale=1,
  *                    rate=fps, start, length, bufSize, quality, sampleSize, rect)
  *         "strf" 40 (BITMAPINFOHEADER: w, h, planes=1, bpp=24, BI_RGB, ...)
  *     LIST <size> "movi"
  *       "00db" <size> <bottom-up BGR rows padded to 4 bytes>   × frames
  * (the optional idx1 index is omitted on write and skipped on read, as
  * players do for in-memory streams)
  */
object Avi {

  def isAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'A' && payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' '

  /** frames are top-down row-major RGB, all w×h */
  def encode(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty)
    frames.foreach(f => require(f.length == w * h * 3, s"frame needs ${w * h * 3} rgb bytes"))
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dibSize = (rowBytes + pad) * h
    val w8 = new graft.core.ByteWriter(1024 + frames.length * (dibSize + 8))
    def tag(t: String): Unit = { var i = 0; while (i < 4) { w8.writeByte(t.charAt(i)); i += 1 } }
    // sizes computed up front (single-pass write)
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + frames.length * (8 + dibSize)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    tag("RIFF"); w8.writeInt(riffSize); tag("AVI ")
    tag("LIST"); w8.writeInt(hdrlSize); tag("hdrl")
    tag("avih"); w8.writeInt(56)
    w8.writeInt(1000000 / fps); w8.writeInt(dibSize * fps); w8.writeInt(0); w8.writeInt(0)
    w8.writeInt(frames.length); w8.writeInt(0); w8.writeInt(1); w8.writeInt(dibSize)
    w8.writeInt(w); w8.writeInt(h); (1 to 4).foreach(_ => w8.writeInt(0))
    tag("LIST"); w8.writeInt(strlSize); tag("strl")
    tag("strh"); w8.writeInt(56)
    tag("vids"); tag("DIB ")
    w8.writeInt(0); w8.writeInt(0) // flags, prio+lang
    w8.writeInt(0) // initial frames
    w8.writeInt(1); w8.writeInt(fps) // scale, rate
    w8.writeInt(0); w8.writeInt(frames.length) // start, length
    w8.writeInt(dibSize); w8.writeInt(-1); w8.writeInt(0) // bufSize, quality, sampleSize
    w8.writeShort(0); w8.writeShort(0); w8.writeShort(w); w8.writeShort(h) // rcFrame
    tag("strf"); w8.writeInt(40)
    w8.writeInt(40); w8.writeInt(w); w8.writeInt(h) // biSize, w, h (positive: bottom-up)
    w8.writeShort(1); w8.writeShort(24) // planes, bpp
    w8.writeInt(0); w8.writeInt(dibSize) // BI_RGB, image size
    w8.writeInt(2835); w8.writeInt(2835); w8.writeInt(0); w8.writeInt(0)
    tag("LIST"); w8.writeInt(moviSize); tag("movi")
    frames.foreach { rgb =>
      tag("00db"); w8.writeInt(dibSize)
      var y = h - 1
      while (y >= 0) {
        var x = 0
        val row = y * w * 3
        while (x < w) {
          val p = row + x * 3
          w8.writeByte(rgb(p + 2)); w8.writeByte(rgb(p + 1)); w8.writeByte(rgb(p))
          x += 1
        }
        var k = 0
        while (k < pad) { w8.writeByte(0); k += 1 }
        y -= 1
      }
    }
    w8.toArray
  }

  /** (width, height, usPerFrame, frames as top-down row-major RGB); rejects
    * non-DIB/non-24-bpp streams; skips unknown chunks (idx1, JUNK, INFO).
    * Header fields are untrusted: sizes validated in long arithmetic. */
  def decode(payload: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = {
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val (w, h, usPerFrame, _) = parse(payload, Some(frames))
    require(frames.nonEmpty, "AVI holds no frame chunks")
    (w, h, usPerFrame, frames.toArray)
  }

  /** header-only metadata: (width, height, usPerFrame, frameChunkCount) —
    * counts frame chunks without materializing any pixels */
  def meta(payload: Array[Byte]): (Int, Int, Int, Int) = parse(payload, None)

  private def parse(payload: Array[Byte],
                    sink: Option[scala.collection.mutable.ArrayBuffer[Array[Byte]]]): (Int, Int, Int, Int) = {
    require(isAvi(payload), "not a RIFF/AVI payload")
    var w = 0; var h = 0; var usPerFrame = 0; var bpp = 0; var comp = 0
    var nFrames = 0
    // multi-stream files interleave audio strls with the video one: honor
    // only the FIRST `vids` stream's strf — an audio strf is a
    // WAVEFORMATEX whose fields would corrupt w/h/bpp (r4 ADVICE)
    var curStreamType = "" // fccType of the most recent strh
    var vidsDone = false
    def getInt(pos: Int): Int =
      (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8) |
        ((payload(pos + 2) & 0xff) << 16) | ((payload(pos + 3) & 0xff) << 24)
    def getShort(pos: Int): Int = (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8)
    def tagAt(pos: Int): String = new String(payload, pos, 4, "US-ASCII")
    def decodeDib(pos: Int, size: Int): Array[Byte] = {
      require(w > 0 && h > 0, "frame chunk before strf header")
      require(bpp == 24 && comp == 0, s"unsupported AVI stream: $bpp bpp, compression $comp")
      val rowBytes = w * 3
      val pad = (4 - rowBytes % 4) % 4
      require(size.toLong >= (rowBytes + pad).toLong * h, s"truncated DIB frame ($size bytes)")
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var src = pos + (h - 1 - y) * (rowBytes + pad)
        var dst = y * w * 3
        var x = 0
        while (x < w) {
          rgb(dst) = payload(src + 2); rgb(dst + 1) = payload(src + 1); rgb(dst + 2) = payload(src)
          src += 3; dst += 3; x += 1
        }
        y += 1
      }
      rgb
    }
    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = tagAt(pos)
        val size = getInt(pos + 4)
        require(size >= 0 && pos + 8L + size <= until, s"truncated AVI chunk $id ($size bytes)")
        id match {
          case "LIST" => walk(pos + 12, pos + 8 + size) // list type tag, then sub-chunks
          case "avih" =>
            require(size >= 56, s"short avih ($size)")
            usPerFrame = getInt(pos + 8)
          case "strh" =>
            require(size >= 8, s"short strh ($size)")
            curStreamType = tagAt(pos + 8)
          case "strf" if curStreamType == "vids" && !vidsDone =>
            require(size >= 40, s"short strf ($size)")
            w = getInt(pos + 12); h = getInt(pos + 16)
            bpp = getShort(pos + 22); comp = getInt(pos + 24)
            require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue, s"bad AVI dims ${w}x$h")
            vidsDone = true
          case "00db" | "00dc" =>
            nFrames += 1
            sink.foreach(_ += decodeDib(pos + 8, size))
          case _ => // auds strf/idx1/JUNK/INFO... skipped
        }
        pos += 8 + size + (size & 1) // chunks pad to even
      }
    }
    walk(12, payload.length)
    require(vidsDone, "AVI holds no vids stream header")
    (w, h, usPerFrame, nFrames)
  }
}
