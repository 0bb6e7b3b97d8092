package graft.core

/** SWAR (SIMD-within-a-register) lane arithmetic over one 64-bit word holding
  * N sub-word unsigned lanes of heterogeneous widths — the complete public
  * operator surface of the reference, re-expressed with runtime lane specs
  * (the reference fixes widths as C++ template parameters; Spark schemas are
  * dynamic, so masks are computed once per `LaneSpec` and reused).
  *
  * Reference semantics mirrored here (file:line into /root/reference):
  *  - pack / truncate-on-construct      include/pint/pint.hpp:592-601,390-407
  *  - get (zero-extend)                 pint.hpp:799-807
  *  - get_signed (sign-extend)          pint.hpp:809-822
  *  - slice                             pint.hpp:746-754,923-932
  *  - add_wrap                          pint.hpp:826-838
  *  - add_unsigned_saturate             pint.hpp:840-855 (carry vector 375-378)
  *  - add_signed_saturate               pint.hpp:857-866 (overflow 563-582)
  *  - sub_wrap                          pint.hpp:870-884
  *  - sub_unsigned_saturate             pint.hpp:886-908 (borrow vector 380-383)
  *  - sub_signed_saturate               pint.hpp:910-919 (overflow 385-388)
  *  - min/max unsigned                  pint.hpp:936-950,952-966
  *  - min/max signed (sign-bias trick)  pint.hpp:968-985,987-1004
  *  - shift_left / shift_right_unsigned pint.hpp:1006-1017,1019-1029
  *  - storage-width selection (clp2 + find_appropriate_int) pint.hpp:709-734,789-795
  *
  * Carry/borrow extraction uses exact per-lane identities:
  * carryOut = (a&b) | ((a|b) & ~sum) with sum the per-lane wrapped sum;
  * borrowOut = (~a&b) | (~(a^b) & diff) with diff the per-lane wrapped
  * difference (cf. pint.hpp:375-383).
  */
final class LaneSpec private (val widths: Array[Int]) extends Serializable {
  require(widths.nonEmpty, "at least one lane")
  widths.foreach(w => require(w >= 1 && w <= 64, s"lane width $w out of [1,64]"))
  val count: Int = widths.length
  val offsets: Array[Int] = widths.scanLeft(0)(_ + _).init
  val totalBits: Int = widths.sum
  require(totalBits <= 64, s"lanes must fit one 64-bit word, got $totalBits bits")

  val fullMask: Long = BitPack.maskFor(totalBits)
  /** top bit of every lane (pint mask_hiorder, pint.hpp:323-329) */
  val hiMask: Long = {
    var m = 0L; var i = 0
    while (i < count) { m |= 1L << (offsets(i) + widths(i) - 1); i += 1 }; m
  }
  /** bottom bit of every lane (pint mask_loorder, pint.hpp:331-337) */
  val loMask: Long = {
    var m = 0L; var i = 0
    while (i < count) { m |= 1L << offsets(i); i += 1 }; m
  }
  private val m1: Long = fullMask & ~hiMask

  @inline def laneMask(i: Int): Long = BitPack.maskFor(widths(i)) << offsets(i)

  /** pack with truncation (pint make_truncate, pint.hpp:592-601) */
  def pack(values: Long*): Long = pack(values.toArray)
  def pack(values: Array[Long]): Long = {
    require(values.length == count, s"expected $count lane values")
    var word = 0L; var i = 0
    while (i < count) {
      word |= (values(i) & BitPack.maskFor(widths(i))) << offsets(i); i += 1
    }
    word
  }

  /** zero-extending lane read (pint get, pint.hpp:799-807) */
  @inline def get(word: Long, i: Int): Long =
    (word >>> offsets(i)) & BitPack.maskFor(widths(i))

  /** sign-extending lane read (pint get_signed, pint.hpp:809-822) */
  @inline def getSigned(word: Long, i: Int): Long =
    BitPack.signExtend(get(word, i), widths(i))

  def getAll(word: Long): Array[Long] = Array.tabulate(count)(get(word, _))
  def getAllSigned(word: Long): Array[Long] = Array.tabulate(count)(getSigned(word, _))

  /** contiguous lane sub-range projection (pint slice, pint.hpp:923-932) */
  def slice(word: Long, from: Int, until: Int): (LaneSpec, Long) = {
    require(0 <= from && from < until && until <= count, s"bad slice [$from,$until)")
    val sub = LaneSpec(widths.slice(from, until))
    (sub, (word >>> offsets(from)) & sub.fullMask)
  }

  /** lane-wise wrapping add, cross-lane carries suppressed (pint.hpp:826-838) */
  @inline def addWrap(a: Long, b: Long): Long =
    (((a & m1) + (b & m1)) ^ ((a ^ b) & hiMask)) & fullMask

  /** lane-wise wrapping subtract, borrows suppressed (pint.hpp:870-884) */
  @inline def subWrap(a: Long, b: Long): Long = {
    val nb = ~b & fullMask
    // a - b = a + ~b + 1 per lane; the +1 enters at each lane's low bit
    (((a & m1) + (nb & m1) + (loMask & m1)) ^ ((a ^ nb) & hiMask) ^ (hiMask & loMask)) & fullMask
  }

  /** per-lane carry-out bits (at lane tops) of a+b (pint carry_add_vector) */
  @inline private def carryLanes(a: Long, b: Long): Long = {
    val sum = addWrap(a, b)
    ((a & b) | ((a | b) & ~sum)) & hiMask
  }

  /** per-lane borrow-out bits (at lane tops) of a-b (pint carry_sub_vector) */
  @inline private def borrowLanes(a: Long, b: Long): Long = {
    val diff = subWrap(a, b)
    ((~a & b) | (~(a ^ b) & diff)) & hiMask
  }

  /** spread lane-top flag bits into full-lane all-ones masks
    * (pint make_unsigned_saturation_mask, pint.hpp:409-551; runtime loop in
    * place of the reference's three compile-time strategies) */
  private def spread(topBits: Long): Long = {
    var m = 0L; var i = 0
    while (i < count) {
      if ((topBits & (1L << (offsets(i) + widths(i) - 1))) != 0L) m |= laneMask(i)
      i += 1
    }
    m
  }

  /** bitwise select (pint interleave, pint.hpp:603-606) */
  @inline private def interleave(a: Long, b: Long, mask: Long): Long =
    (a & mask) | (b & ~mask)

  /** lane-wise unsigned saturating add (pint.hpp:840-855) */
  def addSatU(a: Long, b: Long): Long =
    addWrap(a, b) | spread(carryLanes(a, b))

  /** lane-wise unsigned saturating subtract, clamps at 0 (pint.hpp:886-908) */
  def subSatU(a: Long, b: Long): Long =
    subWrap(a, b) & ~spread(borrowLanes(a, b))

  /** lane-wise signed saturating add (pint.hpp:857-866) */
  def addSatS(a: Long, b: Long): Long = {
    val sum = addWrap(a, b)
    // overflow iff operands share a sign and the sum's sign differs
    val ovf = (~(a ^ b)) & (sum ^ a) & hiMask
    applySignedSaturation(sum, ovf, a)
  }

  /** lane-wise signed saturating subtract (pint.hpp:910-919) */
  def subSatS(a: Long, b: Long): Long = {
    val diff = subWrap(a, b)
    // overflow iff operands differ in sign and the diff's sign differs from a
    val ovf = (a ^ b) & (diff ^ a) & hiMask
    applySignedSaturation(diff, ovf, a)
  }

  /** clamp overflowed lanes to signed max (a's sign clear) / min (a's sign set)
    * (pint apply_signed_saturation, pint.hpp:563-582) */
  private def applySignedSaturation(raw: Long, ovf: Long, a: Long): Long = {
    val mask = spread(ovf)
    // positive overflow → 011…1; negative overflow → 100…0 per lane
    val satMax = mask & ~hiMask
    val satMin = hiMask & mask
    val negLanes = spread(a & ovf & hiMask) // lanes where a was negative
    interleave((satMax & ~negLanes) | (satMin & negLanes), raw, mask)
  }

  /** lane-wise unsigned min/max (borrow-select, pint.hpp:936-966) */
  def minU(a: Long, b: Long): Long = interleave(a, b, spread(borrowLanes(a, b)))
  def maxU(a: Long, b: Long): Long = interleave(b, a, spread(borrowLanes(a, b)))

  /** lane-wise signed min/max via sign-bias into unsigned order
    * (pint.hpp:968-1004) */
  def minS(a: Long, b: Long): Long =
    interleave(a, b, spread(borrowLanes(a ^ hiMask, b ^ hiMask)))
  def maxS(a: Long, b: Long): Long =
    interleave(b, a, spread(borrowLanes(a ^ hiMask, b ^ hiMask)))

  /** keep-mask of a left shift by `amount` (bits that survive lane clipping);
    * a plan-time constant when the shift amount is fixed — the codegen path
    * folds it into one AND, mirroring pint's compile-time mask dispatch */
  def shiftLeftKeep(amount: Int): Long = {
    var keep = 0L; var i = 0
    while (i < count) {
      val w = widths(i)
      if (amount < w)
        keep |= BitPack.maskFor(w - amount) << (offsets(i) + amount)
      i += 1
    }
    keep
  }

  def shiftRightKeep(amount: Int): Long = {
    var keep = 0L; var i = 0
    while (i < count) {
      val w = widths(i)
      if (amount < w)
        keep |= BitPack.maskFor(w - amount) << offsets(i)
      i += 1
    }
    keep
  }

  /** shift every lane left by `amount`; bits crossing the lane top are
    * discarded; amount ≥ lane width zeroes the lane (pint.hpp:1006-1017) */
  def shiftLeft(word: Long, amount: Int): Long = {
    if (amount <= 0) return word & fullMask
    if (amount >= 64) 0L else (word << amount) & shiftLeftKeep(amount)
  }

  /** logical right shift per lane; bits crossing the lane bottom are
    * discarded; overshift zeroes the lane (pint.hpp:1019-1029) */
  def shiftRightU(word: Long, amount: Int): Long = {
    if (amount <= 0) return word & fullMask
    if (amount >= 64) 0L else (word >>> amount) & shiftRightKeep(amount)
  }
}

object LaneSpec {
  def apply(widths: Int*): LaneSpec = new LaneSpec(widths.toArray)
  def apply(widths: Array[Int]): LaneSpec = new LaneSpec(widths.clone())

  /** next power of two ≥ v (pint clp2, pint.hpp:709-722) */
  def clp2(v: Int): Int = {
    var x = v - 1
    x |= x >> 1; x |= x >> 2; x |= x >> 4; x |= x >> 8; x |= x >> 16
    x + 1
  }

  /** storage width (bits) the reference would select: Σ bits rounded up to a
    * power of two, minimum 8 (pint make_packed_int + find_appropriate_int,
    * pint.hpp:724-734,789-795). 8→uint8_t … 64→uint64_t. */
  def storageBits(sumBits: Int): Int = {
    require(sumBits >= 1 && sumBits <= 64, s"sum of widths $sumBits out of [1,64]")
    math.max(8, clp2(sumBits))
  }
}
