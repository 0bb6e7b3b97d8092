package graft.core

import scala.collection.mutable

/** FSST (Fast Static Symbol Table) string compression, implemented from
  * scratch per the published algorithm (P. Boncz, T. Neumann, V. Leis,
  * "FSST: Fast Random Access String Compression", PVLDB 13(12), 2020):
  * a table of ≤255 symbols of 1–8 bytes each; encoding replaces the longest
  * matching symbol with its 1-byte code; byte 255 escapes a literal byte.
  * The table is trained by a few generations of greedy re-parsing a sample,
  * keeping the highest-gain (frequency × length) symbols and pairwise
  * concatenations.
  *
  * In the engine this is the text/html codec of the suite (SURVEY.md §7.3);
  * the reference has no string compression — this is the generalization the
  * north rule asks for.
  */
object Fsst {

  final val EscapeCode: Int = 255
  final val MaxSymbols: Int = 255
  final val MaxSymbolLen: Int = 8

  /** A trained table: symbols(code) = byte sequence for code ∈ [0, n). */
  final class SymbolTable(val symbols: Array[Array[Byte]]) extends Serializable {
    require(symbols.length <= MaxSymbols)
    // index: first byte → candidate codes sorted by symbol length descending
    private val byFirst: Array[Array[Int]] = {
      val tmp = Array.fill(256)(mutable.ArrayBuffer.empty[Int])
      var c = 0
      while (c < symbols.length) {
        tmp(symbols(c)(0) & 0xff) += c
        c += 1
      }
      tmp.map(_.sortBy(c => -symbols(c).length).toArray)
    }

    @inline private def matches(sym: Array[Byte], data: Array[Byte], pos: Int, end: Int): Boolean = {
      if (pos + sym.length > end) return false
      var i = 0
      while (i < sym.length) {
        if (sym(i) != data(pos + i)) return false
        i += 1
      }
      true
    }

    /** longest-match code at data[pos), or -1 */
    @inline def findLongest(data: Array[Byte], pos: Int, end: Int): Int = {
      val cands = byFirst(data(pos) & 0xff)
      var i = 0
      while (i < cands.length) {
        val c = cands(i)
        if (matches(symbols(c), data, pos, end)) return c
        i += 1
      }
      -1
    }

    def compress(data: Array[Byte]): Array[Byte] = {
      val out = new ByteWriter(data.length / 2 + 8)
      var pos = 0
      while (pos < data.length) {
        val c = findLongest(data, pos, data.length)
        if (c >= 0) {
          out.writeByte(c)
          pos += symbols(c).length
        } else {
          out.writeByte(EscapeCode)
          out.writeByte(data(pos))
          pos += 1
        }
      }
      out.toArray
    }

    def decompress(comp: Array[Byte], from: Int, until: Int): Array[Byte] = {
      val out = new ByteWriter((until - from) * 3 + 8)
      var pos = from
      while (pos < until) {
        val code = comp(pos) & 0xff
        if (code == EscapeCode) {
          out.writeByte(comp(pos + 1))
          pos += 2
        } else {
          out.writeBytes(symbols(code))
          pos += 1
        }
      }
      out.toArray
    }

    def serializedSize: Int = 1 + symbols.map(_.length + 1).sum

    def writeTo(w: ByteWriter): Unit = {
      w.writeByte(symbols.length)
      symbols.foreach { s => w.writeByte(s.length); w.writeBytes(s) }
    }
  }

  object SymbolTable {
    def readFrom(r: ByteReader): SymbolTable = {
      val n = r.readByte() & 0xff
      val syms = Array.fill(n) {
        val len = r.readByte() & 0xff
        r.readBytes(len)
      }
      new SymbolTable(syms)
    }
  }

  private final case class Cand(bytes: Array[Byte]) {
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case Cand(b) => java.util.Arrays.equals(bytes, b)
      case _ => false
    }
  }

  /** Train a symbol table on a sample (generational greedy re-parse). */
  def train(sample: Array[Byte], generations: Int = 5): SymbolTable = {
    if (sample.isEmpty) return new SymbolTable(Array.empty)
    var table = new SymbolTable(Array.empty)
    var gen = 0
    while (gen < generations) {
      val single = mutable.HashMap.empty[Cand, Long]
      val pairs = mutable.HashMap.empty[Cand, Long]
      var pos = 0
      var prev: Array[Byte] = null
      while (pos < sample.length) {
        val c = table.findLongest(sample, pos, sample.length)
        val cur = if (c >= 0) table.symbols(c) else Array(sample(pos))
        single.updateWith(Cand(cur))(v => Some(v.getOrElse(0L) + 1L))
        if (prev != null && prev.length + cur.length <= MaxSymbolLen) {
          pairs.updateWith(Cand(prev ++ cur))(v => Some(v.getOrElse(0L) + 1L))
        }
        prev = cur
        pos += cur.length
      }
      // gain = freq * len, minus the 1-byte code we pay on every use; single
      // bytes gain only by avoiding the escape (2 bytes -> 1).
      val scored = (single.iterator.map { case (k, f) => (k, f * (2L * k.bytes.length - 1L)) } ++
        pairs.iterator.map { case (k, f) => (k, f * (2L * k.bytes.length - 1L)) })
        .filter(_._2 > 0)
      val merged = mutable.HashMap.empty[Cand, Long]
      scored.foreach { case (k, g) => merged.updateWith(k)(v => Some(math.max(v.getOrElse(0L), g))) }
      val top = merged.toArray.sortBy { case (k, g) => (-g, k.bytes.length.toLong) }
        .take(MaxSymbols).map(_._1.bytes)
      table = new SymbolTable(top)
      gen += 1
    }
    table
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
  def writeInt(v: Int): Unit = {
    ensure(4)
    buf(len) = v.toByte; buf(len + 1) = (v >>> 8).toByte
    buf(len + 2) = (v >>> 16).toByte; buf(len + 3) = (v >>> 24).toByte
    len += 4
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
  def readLong(): Long = {
    val lo = readInt() & 0xffffffffL
    val hi = readInt() & 0xffffffffL
    lo | (hi << 32)
  }
  def remaining: Int = buf.length - pos
}
