package graft.core

/** FSST (Fast Static Symbol Table) string compression, implemented from
  * scratch per the published algorithm (P. Boncz, T. Neumann, V. Leis,
  * "FSST: Fast Random Access String Compression", PVLDB 13(12), 2020):
  * a table of ≤255 symbols of 1–8 bytes each; encoding replaces the longest
  * matching symbol with its 1-byte code; byte 255 escapes a literal byte.
  * The table is trained by a few generations of greedy re-parsing a sample,
  * keeping the highest-gain (frequency × length) symbols and pairwise
  * concatenations.
  *
  * Performance notes (this is the engine's hottest string kernel):
  * symbols are manipulated as *packed little-endian Longs* (≤8 bytes fit one
  * word — the same word-packing discipline as the reference's packed_int,
  * pint.hpp:758-787). Matching is `(window ^ symbol) & lenMask == 0` on a
  * single loaded word — no byte loops, no allocation; training counts
  * (bytesLong, len) pairs in primitive-keyed maps — no per-token garbage.
  */
object Fsst {

  final val EscapeCode: Int = 255
  final val MaxSymbols: Int = 255
  final val MaxSymbolLen: Int = 8

  @inline private def lenMask(len: Int): Long =
    if (len >= 8) -1L else (1L << (len * 8)) - 1L

  /** little-endian load of up to 8 bytes at pos (zero-padded past end) */
  @inline private def loadWord(data: Array[Byte], pos: Int, end: Int): Long = {
    if (pos + 8 <= end) {
      Bits.loadLongLE(data, pos)
    } else {
      val n = end - pos
      var w = 0L
      var i = 0
      while (i < n) { w |= (data(pos + i) & 0xffL) << (i * 8); i += 1 }
      w
    }
  }

  /** A trained table: symbols(code) = byte sequence for code ∈ [0, n).
    *
    * Matching is the paper's §4.3 lossy-perfect-hash encoder: symbols of
    * length ≥ 3 hash by their first THREE bytes into a single-probe table
    * (16 KB — L1-resident, unlike the r2 65536-entry prefix-sum bucket
    * index); on a slot collision the higher-gain symbol keeps the slot
    * (symbols arrive gain-ordered from training) and the loser becomes
    * unreachable through the hash — compression gets marginally worse,
    * "lossy", while the matcher is ONE load + one masked compare. Symbols
    * of length ≤ 2 resolve in one combined `shortCodes` lookup: the 2-byte
    * symbol for the window's low two bytes if present, else the 1-byte
    * symbol for the low byte, else -1 (escape).
    */
  final class SymbolTable(val symbols: Array[Array[Byte]]) extends Serializable {
    require(symbols.length <= MaxSymbols)
    private val symWord = symbols.map(s => loadWord(s, 0, s.length))
    private val symLen = symbols.map(_.length)
    // direct map: byte value -> code of its 1-byte symbol, or -1
    private val oneByte: Array[Int] = {
      val a = Array.fill(256)(-1)
      var c = 0
      while (c < symbols.length) {
        if (symLen(c) == 1) {
          val b = (symWord(c) & 0xffL).toInt
          if (a(b) < 0) a(b) = c
        }
        c += 1
      }
      a
    }
    private val HashBits = 12
    @inline private def hash3(w: Long): Int =
      (((w & 0xffffffL) * 0x9E3779B97F4A7C15L) >>> (64 - HashBits)).toInt
    // single-slot lossy hash over first-3-byte prefixes, len >= 3 symbols
    private val hashTab: Array[Int] = {
      val a = Array.fill(1 << HashBits)(-1)
      var c = 0
      while (c < symbols.length) {
        if (symLen(c) >= 3) {
          val idx = hash3(symWord(c))
          if (a(idx) < 0) a(idx) = c // first (= highest-gain) wins
        }
        c += 1
      }
      a
    }
    // two-bytes -> 2-byte symbol code | 1-byte symbol code of low byte | -1
    private val shortCodes: Array[Int] = {
      val a = new Array[Int](65536)
      var p = 0
      while (p < 65536) { a(p) = oneByte(p & 0xff); p += 1 }
      var c = 0
      while (c < symbols.length) {
        if (symLen(c) == 2) a((symWord(c) & 0xffffL).toInt) = c
        c += 1
      }
      a
    }

    /** longest-match code for the word at the cursor, or -1 (→ escape) */
    @inline def findLongest(window: Long, remaining: Int): Int = {
      if (remaining >= 3) {
        val c = hashTab(hash3(window))
        if (c >= 0) {
          val l = symLen(c)
          if (l <= remaining && ((window ^ symWord(c)) & lenMask(l)) == 0L) return c
        }
      }
      if (remaining >= 2) shortCodes((window & 0xffffL).toInt)
      else oneByte((window & 0xffL).toInt)
    }

    def compress(data: Array[Byte]): Array[Byte] = compress(data, 0, data.length)

    def compress(data: Array[Byte], from: Int, end: Int): Array[Byte] = {
      // worst case: every byte escapes -> 2x; single alloc, raw-index writes
      val out = new Array[Byte]((end - from) * 2 + 8)
      val o = compressInto(data, from, end, out, 0)
      java.util.Arrays.copyOf(out, o)
    }

    /** compress into `dst` at `dstOff`, returning bytes written. The caller
      * must leave (end-from)*2 bytes of capacity (worst-case escape
      * expansion). The block encoder compresses a whole block into ONE
      * shared buffer through this — no per-value 2x scratch allocation, no
      * per-value exact-size copy (the ingest hot path: 78%+ of encode bytes
      * are FSST text/html). */
    def compressInto(data: Array[Byte], from: Int, end: Int,
                     dst: Array[Byte], dstOff: Int): Int = {
      var o = dstOff
      var pos = from
      val safe = end - 8
      while (pos < end) {
        val w = if (pos <= safe) Bits.loadLongLE(data, pos) else loadWord(data, pos, end)
        val c = findLongest(w, end - pos)
        if (c >= 0) {
          dst(o) = c.toByte; o += 1
          pos += symLen(c)
        } else {
          dst(o) = EscapeCode.toByte; dst(o + 1) = data(pos); o += 2
          pos += 1
        }
      }
      o - dstOff
    }

    def decompress(comp: Array[Byte], from: Int, until: Int): Array[Byte] = {
      // each input byte expands to <= 8 output bytes; +8 slack allows
      // unconditional 8-byte word stores (tail truncated by the final copy)
      val out = new Array[Byte]((until - from) * MaxSymbolLen + 8)
      val o = decompressInto(comp, from, until, out, 0)
      java.util.Arrays.copyOf(out, o)
    }

    /** decompress into `dst` at `dstOff`, returning bytes written. The
      * caller must leave (until-from)*8 + 8 bytes of capacity (worst-case
      * expansion + word-store slack) — the shared-buffer decode path uses
      * this to rebuild a whole block into ONE buffer instead of a per-value
      * array each (StrView slice-view decode). */
    def decompressInto(comp: Array[Byte], from: Int, until: Int,
                       dst: Array[Byte], dstOff: Int): Int = {
      var o = dstOff
      var pos = from
      while (pos < until) {
        val code = comp(pos) & 0xff
        if (code == EscapeCode) {
          dst(o) = comp(pos + 1); o += 1
          pos += 2
        } else {
          Bits.storeLongLE(dst, o, symWord(code))
          o += symLen(code)
          pos += 1
        }
      }
      o - dstOff
    }

    def serializedSize: Int = 1 + symbols.map(_.length + 1).sum

    def writeTo(w: ByteWriter): Unit = {
      w.writeByte(symbols.length)
      symbols.foreach { s => w.writeByte(s.length); w.writeBytes(s) }
    }
  }

  object SymbolTable {
    val empty = new SymbolTable(Array.empty)
    def readFrom(r: ByteReader): SymbolTable = {
      val n = r.readByte() & 0xff
      val syms = Array.fill(n) {
        val len = r.readByte() & 0xff
        r.readBytes(len)
      }
      new SymbolTable(syms)
    }
  }

  /** Train a symbol table on a sample. Zero allocation per parsed token:
    * tokens are (packed word, len) pairs; counts live in primitive-keyed
    * open-addressing maps. A (rare) key collision only perturbs a count —
    * compression stays exact regardless of table quality. */
  def train(sample: Array[Byte], generations: Int = 4): SymbolTable = {
    if (sample.length < 8) return SymbolTable.empty
    var table = SymbolTable.empty
    val counts = new LongCounter(1 << 12)
    var gen = 0
    while (gen < generations) {
      counts.clear()
      var pos = 0
      var prevW = 0L
      var prevL = 0
      while (pos < sample.length) {
        val w = loadWord(sample, pos, sample.length)
        val c = table.findLongest(w, sample.length - pos)
        val (curW, curL) = if (c >= 0) {
          val l = table.symbols(c).length
          (w & lenMask(l), l)
        } else (w & 0xffL, 1)
        counts.add(curW, curL)
        if (prevL > 0 && prevL + curL <= MaxSymbolLen) {
          counts.add(prevW | (curW << (prevL * 8)), prevL + curL)
        }
        prevW = curW
        prevL = curL
        pos += curL
      }
      table = new SymbolTable(counts.topSymbols(MaxSymbols))
      gen += 1
    }
    table
  }

  /** open-addressing counter keyed by (packed word, len); gain-ranked export. */
  private final class LongCounter(capacity: Int) {
    // capacity must be a power of two, sized for ~16K distinct candidates
    private val mask = capacity * 4 - 1
    private val words = new Array[Long](mask + 1)
    private val lens = new Array[Byte](mask + 1)
    private val cnts = new Array[Int](mask + 1)
    private var used = 0

    def clear(): Unit = {
      java.util.Arrays.fill(lens, 0.toByte)
      java.util.Arrays.fill(cnts, 0)
      used = 0
    }

    def add(w: Long, l: Int): Unit = {
      if (used > mask - (mask >> 2)) return // table ~75% full: stop admitting
      var idx = (Bits.mix(w ^ (l.toLong << 56)) & mask).toInt
      var probes = 0
      while (probes < 64) {
        if (lens(idx) == 0) {
          words(idx) = w; lens(idx) = l.toByte; cnts(idx) = 1; used += 1
          return
        } else if (lens(idx) == l && words(idx) == w) {
          cnts(idx) += 1
          return
        }
        idx = (idx + 1) & mask
        probes += 1
      }
    }

    /** top-N byte sequences by gain = count * (2*len - 1) (escape-relative).
      * Prefix-aware for the lossy-hash matcher: of several length ≥ 3
      * candidates sharing a first-3-byte prefix only the highest-gain one
      * is admitted — the others could never be matched (one hash slot per
      * prefix), so admitting them would waste code space that a reachable
      * symbol can use instead. */
    def topSymbols(n: Int): Array[Array[Byte]] = {
      val order = (0 to mask).filter(i => lens(i) > 0)
        .sortBy(i => -cnts(i).toLong * (2L * lens(i) - 1L))
      val seen3 = new java.util.HashSet[Integer]()
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var oi = 0
      while (oi < order.length && out.length < n) {
        val i = order(oi)
        val l = lens(i)
        val admit = l < 3 || seen3.add((words(i) & 0xffffffL).toInt)
        if (admit) {
          val b = new Array[Byte](l)
          var k = 0
          while (k < l) { b(k) = ((words(i) >>> (k * 8)) & 0xff).toByte; k += 1 }
          out += b
        }
        oi += 1
      }
      out.toArray
    }
  }
}

/** Growable little-endian byte sink (no java.io overhead in kernels). */
final class ByteWriter(initial: Int = 64) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var len = 0
  private def ensure(n: Int): Unit = {
    if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }
  def size: Int = len
  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
  def writeBytes(bs: Array[Byte]): Unit = { ensure(bs.length); System.arraycopy(bs, 0, buf, len, bs.length); len += bs.length }
  def writeBytesRange(bs: Array[Byte], off: Int, n: Int): Unit = { ensure(n); System.arraycopy(bs, off, buf, len, n); len += n }
  def writeInt(v: Int): Unit = {
    ensure(4)
    buf(len) = v.toByte; buf(len + 1) = (v >>> 8).toByte
    buf(len + 2) = (v >>> 16).toByte; buf(len + 3) = (v >>> 24).toByte
    len += 4
  }
  def writeShort(v: Int): Unit = {
    ensure(2)
    buf(len) = v.toByte; buf(len + 1) = (v >>> 8).toByte
    len += 2
  }
  def writeLong(v: Long): Unit = { writeInt(v.toInt); writeInt((v >>> 32).toInt) }
  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

/** Little-endian byte source over a blob. */
final class ByteReader(val buf: Array[Byte], var pos: Int = 0) {
  def readByte(): Byte = { val b = buf(pos); pos += 1; b }
  def readBytes(n: Int): Array[Byte] = {
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
  }
  def readInt(): Int = {
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4; v
  }
  def readShort(): Int = {
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8)
    pos += 2; v
  }
  def readLong(): Long = {
    val lo = readInt() & 0xffffffffL
    val hi = readInt() & 0xffffffffL
    lo | (hi << 32)
  }
  def remaining: Int = buf.length - pos
}
