package graft.core

/** Block-grain Bloom filters for point-lookup block skipping — the analog of
  * Parquet's split-block bloom filters / Iceberg's `parquet.bloom.filter`
  * column property, kept at OUR block grain (one filter per encoded block of
  * an opted-in column, stored as a sibling `bm_<col>` binary column in the
  * data files).
  *
  * Why: zone maps ([[Codecs.rangeOfLong]]/[[Codecs.rangeOfStr]]) prune by
  * VALUE RANGE, which is useless for a hash-scattered column in a table
  * keyed by something else — every part and nearly every block spans the
  * full domain, so a needle probe decodes everything. A bloom answers
  * "definitely absent" per block for ~100 ns, so a point lookup decodes only
  * the (one + false-positive) blocks that can match.
  *
  * Shape: a flat bitmap of `16 * n` bits rounded up to a power of two
  * (minimum 1024), probed with k=4 double-hashed positions. At 16 bits/value
  * the false-positive rate is ~0.24% — a needle probe over a 4096-block part
  * decodes ~1 true block + ~10 false positives instead of 4096. Filters are
  * OR-mergeable only at equal sizes; we never merge (block grain only —
  * part-level filters saturate at scale, which is exactly why Iceberg keeps
  * them per data file too).
  *
  * Invariant: NO false negatives — `maybe` returning false proves absence.
  * The hash is [[Codecs.hash64]] for bytes and splitmix for longs; both are
  * persisted-format contracts (bits written at encode time are probed by
  * every later reader).
  */
object Bloom {
  final val BitsPerValue = 16
  final val Probes = 4
  final val MinBits = 1024

  /** filter size in BYTES for an n-value block (power-of-two bits). */
  def sizeFor(n: Int): Int = {
    var bits = MinBits
    val want = math.min(1L << 30, math.max(MinBits.toLong, n.toLong * BitsPerValue))
    while (bits < want) bits <<= 1
    bits >> 3
  }

  @inline def hashLong(v: Long): Long = Bits.mix(v ^ 0x6a09e667f3bcc909L)
  @inline def hashBytes(b: Array[Byte]): Long = Codecs.hash64(b)

  @inline private def set(bm: Array[Byte], bit: Int): Unit =
    bm(bit >> 3) = (bm(bit >> 3) | (1 << (bit & 7))).toByte
  @inline private def get(bm: Array[Byte], bit: Int): Boolean =
    (bm(bit >> 3) & (1 << (bit & 7))) != 0

  /** add a pre-hashed value: k=4 double-hashed probes (Kirsch–Mitzenmacher:
    * g_i = h1 + i*h2 over a power-of-two bitmap). */
  def add(bm: Array[Byte], h: Long): Unit = {
    val mask = bm.length * 8 - 1
    val h1 = (h & 0x7fffffffffffffffL).toInt
    val h2 = ((h >>> 32) | 1L).toInt // odd stride covers the pow2 ring
    var i = 0
    while (i < Probes) { set(bm, (h1 + i * h2) & mask); i += 1 }
  }

  /** membership: false PROVES the hashed value was never added. */
  def maybe(bm: Array[Byte], h: Long): Boolean = {
    if (bm == null || bm.length == 0) return true // no filter = no claim
    require((bm.length & (bm.length - 1)) == 0, s"bloom size ${bm.length} not a power of two")
    val mask = bm.length * 8 - 1
    val h1 = (h & 0x7fffffffffffffffL).toInt
    val h2 = ((h >>> 32) | 1L).toInt
    var i = 0
    while (i < Probes) {
      if (!get(bm, (h1 + i * h2) & mask)) return false
      i += 1
    }
    true
  }

  /** build a filter over an encoded blob's NON-NULL values; null when the
    * blob's values cannot be enumerated locally (shared-dictionary codecs —
    * opt-in bloom columns are high-cardinality by nature, never shared-dict)
    * or the block is all-null. Long blobs hash the decoded longs (for
    * doubles that is the bit pattern — probe with double_bits(v)); string /
    * binary blobs hash the raw bytes. */
  def ofBlob(blob0: Array[Byte]): Array[Byte] = {
    val blob = Codecs.pageUnwrap(blob0)
    val id = blob(0) & 0xff
    val inner = Codecs.innerCodecId(blob)
    if (inner == Codecs.SharedDictStr || inner == Codecs.SharedRleDict) return null
    if (id == Codecs.NullLong || (id >= 1 && id <= 15)) {
      val (vs, nulls) = Codecs.decodeLongsN(blob)
      var n = 0
      var i = 0
      while (i < vs.length) { if (nulls == null || !nulls(i)) n += 1; i += 1 }
      if (n == 0) return null
      val bm = new Array[Byte](sizeFor(n))
      i = 0
      while (i < vs.length) {
        if (nulls == null || !nulls(i)) add(bm, hashLong(vs(i)))
        i += 1
      }
      bm
    } else {
      val vs = Codecs.decodeStrsN(blob) // null entries = null values
      var n = 0
      var i = 0
      while (i < vs.length) { if (vs(i) != null) n += 1; i += 1 }
      if (n == 0) return null
      val bm = new Array[Byte](sizeFor(n))
      i = 0
      while (i < vs.length) {
        if (vs(i) != null) add(bm, hashBytes(vs(i)))
        i += 1
      }
      bm
    }
  }
}
