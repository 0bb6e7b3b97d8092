package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Bit-packing kernels: N values of `width` bits (1..64) packed LSB-first
  * into little-endian 64-bit words, values freely crossing word boundaries.
  *
  * This generalizes the reference's pack/unpack kernels
  * (reference: include/pint/pint.hpp:390-407 `make_truncated_int` — mask each
  * value to its lane width, shift to offset, OR together; pint.hpp:799-807
  * `get` — shift down, mask; pint.hpp:809-822 `get_signed` — shift-up /
  * arithmetic-shift-down sign extension). The reference constrains all lanes
  * to one machine word (pint.hpp:763-764); these kernels remove that
  * constraint so a column block of any length packs into a contiguous
  * byte buffer.
  *
  * All loops are branch-free in the hot path (the single word-crossing
  * conditional compiles to a predictable branch; JIT keeps it in registers).
  */
object BitPack {

  /** Minimal number of bits to represent unsigned v (0 needs 0 bits, but we
    * clamp to 1 so a width is always a valid pack width). */
  @inline def bitsNeeded(v: Long): Int = {
    val b = 64 - java.lang.Long.numberOfLeadingZeros(v)
    if (b == 0) 1 else b
  }

  @inline def maskFor(width: Int): Long =
    if (width >= 64) -1L else (1L << width) - 1L

  /** Zig-zag map signed → unsigned so small-magnitude negatives pack small
    * (public Protocol-Buffers / Parquet DELTA_BINARY_PACKED technique). */
  @inline def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Sign-extend the low `width` bits of v (semantics of pint get_signed,
    * pint.hpp:809-822). */
  @inline def signExtend(v: Long, width: Int): Long =
    if (width >= 64) v else (v << (64 - width)) >> (64 - width)

  /** Number of bytes the packed form of `count` values at `width` occupies. */
  @inline def packedByteLen(count: Int, width: Int): Int =
    ((count.toLong * width + 7L) >>> 3).toInt

  /** Pack values (each truncated to `width` bits — truncate-on-construct
    * semantics, pint.hpp:592-601) into little-endian words. */
  def packWords(values: Array[Long], width: Int): Array[Long] = {
    require(width >= 1 && width <= 64, s"width $width out of [1,64]")
    val n = values.length
    val mask = maskFor(width)
    val out = new Array[Long](((n.toLong * width + 63L) >>> 6).toInt)
    var bit = 0L
    var i = 0
    while (i < n) {
      val v = values(i) & mask
      val w0 = (bit >>> 6).toInt
      val off = (bit & 63L).toInt
      out(w0) |= v << off
      // value straddles into the next word iff off+width > 64 (then off >= 1)
      if (off + width > 64) out(w0 + 1) |= v >>> (64 - off)
      bit += width
      i += 1
    }
    out
  }

  def unpackWords(words: Array[Long], width: Int, count: Int): Array[Long] = {
    require(width >= 1 && width <= 64, s"width $width out of [1,64]")
    val mask = maskFor(width)
    val out = new Array[Long](count)
    var bit = 0L
    var i = 0
    while (i < count) {
      val w0 = (bit >>> 6).toInt
      val off = (bit & 63L).toInt
      var v = words(w0) >>> off
      if (off + width > 64) v |= words(w0 + 1) << (64 - off)
      out(i) = v & mask
      bit += width
      i += 1
    }
    out
  }

  /** Pack to a trimmed little-endian byte buffer (ceil(n*width/8) bytes). */
  def pack(values: Array[Long], width: Int): Array[Byte] = {
    val words = packWords(values, width)
    val nBytes = packedByteLen(values.length, width)
    val bb = ByteBuffer.allocate(words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    java.util.Arrays.copyOf(bb.array(), nBytes)
  }

  def unpack(bytes: Array[Byte], width: Int, count: Int): Array[Long] = {
    val nWords = ((count.toLong * width + 63L) >>> 6).toInt
    val padded =
      if (bytes.length == nWords * 8) bytes
      else java.util.Arrays.copyOf(bytes, nWords * 8)
    val words = new Array[Long](nWords)
    ByteBuffer.wrap(padded).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(words)
    unpackWords(words, width, count)
  }

  /** Unpack with per-value sign extension. */
  def unpackSigned(bytes: Array[Byte], width: Int, count: Int): Array[Long] = {
    val out = unpack(bytes, width, count)
    var i = 0
    while (i < out.length) { out(i) = signExtend(out(i), width); i += 1 }
    out
  }
}
