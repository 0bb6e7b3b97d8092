package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties for the block bit-packing kernels — including the
  * word-boundary-crossing cases the reference never exercises (pint constrains
  * Σ bits ≤ one word, pint.hpp:763-764; our column blocks must straddle). */
class BitPackSpec extends AnyFunSuite {

  test("bitsNeeded") {
    assert(BitPack.bitsNeeded(0L) === 1)
    assert(BitPack.bitsNeeded(1L) === 1)
    assert(BitPack.bitsNeeded(2L) === 2)
    assert(BitPack.bitsNeeded(255L) === 8)
    assert(BitPack.bitsNeeded(256L) === 9)
    assert(BitPack.bitsNeeded(-1L) === 64)
    assert(BitPack.bitsNeeded(Long.MaxValue) === 63)
  }

  test("zigzag round-trip and small-magnitude property") {
    val vs = Seq(0L, 1L, -1L, 2L, -2L, Long.MaxValue, Long.MinValue, 12345L, -98765L)
    vs.foreach(v => assert(BitPack.unzigzag(BitPack.zigzag(v)) === v))
    assert(BitPack.zigzag(-1L) === 1L)
    assert(BitPack.zigzag(1L) === 2L)
  }

  test("round-trip every width 1..64, values crossing word boundaries") {
    val rnd = new scala.util.Random(42)
    (1 to 64).foreach { w =>
      val n = 257 // odd count ⇒ many straddles at most widths
      val mask = BitPack.maskFor(w)
      val vs = Array.fill(n)(rnd.nextLong() & mask)
      val bytes = BitPack.pack(vs, w)
      assert(bytes.length === BitPack.packedByteLen(n, w))
      val back = BitPack.unpack(bytes, w, n)
      assert(back.toSeq === vs.toSeq, s"width $w")
    }
  }

  test("signed round-trip via sign extension (pint get_signed semantics)") {
    val rnd = new scala.util.Random(1)
    (2 to 64).foreach { w =>
      val lo = if (w >= 64) Long.MinValue else -(1L << (w - 1))
      val hi = if (w >= 64) Long.MaxValue else (1L << (w - 1)) - 1
      val vs = Array.fill(101)(BitPack.signExtend(rnd.nextLong() & BitPack.maskFor(w), w)) ++
        Array(lo, hi, 0L, -1L)
      val bytes = BitPack.pack(vs, w)
      assert(BitPack.unpackSigned(bytes, w, vs.length).toSeq === vs.toSeq, s"width $w")
    }
  }

  test("pack truncates values wider than width") {
    val vs = Array(0x1ffL, 0x2aaL)
    assert(BitPack.unpack(BitPack.pack(vs, 5), 5, 2).toSeq === Seq(0x1fL, 0x0aL))
  }

  test("empty and single-value blocks") {
    assert(BitPack.pack(Array.empty[Long], 13).length === 0)
    assert(BitPack.unpack(Array.empty[Byte], 13, 0).length === 0)
    assert(BitPack.unpack(BitPack.pack(Array(5L), 3), 3, 1).toSeq === Seq(5L))
  }
}
