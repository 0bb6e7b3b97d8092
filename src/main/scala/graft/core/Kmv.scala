package graft.core

/** KMV ("k minimum values") distinct-count sketches — the manifest's NDV
  * column, the analog of the Apache DataSketches theta sketches Iceberg
  * persists in Puffin files (one sketch per column per snapshot) to feed
  * engine CBO. Ours live at the manifest grain instead: one sketch per
  * (part, column) row, built at encode time from each block's values and
  * union-merged upward (part → table) — merges are exact set semantics, so
  * a table-wide NDV never re-reads data.
  *
  * The estimator (Bar-Yossef et al. 2002; the same family as theta): keep
  * the K smallest distinct 64-bit hashes of the stream. If fewer than K
  * distinct hashes ever arrived the sketch IS the distinct set — the count
  * is EXACT (the low-cardinality regime: lang, source, any dict-coded
  * column). Otherwise NDV ≈ (K-1)/u where u is the Kth smallest hash
  * normalized to (0,1); relative error ~1/sqrt(K-2) ≈ 3.1% at K=1024.
  * Union of two sketches = K smallest of the merged hash sets, which are
  * provably the K smallest of the combined stream (each input retained its
  * own K smallest), so part sketches roll up without bias.
  *
  * Wire format (persisted-format contract, like [[Bloom]] bits):
  * {{{
  *   byte 0    magic 0x4B ('K')
  *   byte 1    flags: bit0 = exact (the sketch holds ALL distinct hashes)
  *   bytes 2-3 K (LE u16)
  *   bytes 4-7 n (LE u32), number of stored hashes
  *   then      n longs, LE, sorted ascending as UNSIGNED 64-bit values
  * }}}
  * A 1-byte 0x50 ('P') blob is the POISON marker: "this part's NDV is
  * unknowable" (a block whose values cannot be enumerated locally —
  * shared-dictionary codes, FSST/raw text). Poison absorbs in merges and
  * finishes as SQL NULL. The hash salt differs from [[Bloom]]'s so the two
  * persisted bit streams are independent.
  */
object Kmv {
  final val K = 1024
  final val Magic = 0x4B
  final val PoisonMagic = 0x50
  final val FlagExact = 1

  /** the poison marker blob (fresh array each call — callers may not share) */
  def poison: Array[Byte] = Array(PoisonMagic.toByte)

  def isPoison(sk: Array[Byte]): Boolean =
    sk != null && sk.length == 1 && (sk(0) & 0xff) == PoisonMagic

  @inline def hashLong(v: Long): Long = Bits.mix(v ^ 0x243f6a8885a308d3L) // pi salt
  @inline def hashBytes(b: Array[Byte]): Long = Bits.mix(Codecs.hash64(b) ^ 0x243f6a8885a308d3L)
  @inline def hashBytesRange(b: Array[Byte], off: Int, len: Int): Long =
    Bits.mix(Codecs.hash64Range(b, off, len) ^ 0x243f6a8885a308d3L)

  @inline private def flip(h: Long): Long = h ^ Long.MinValue // unsigned order key

  /** serialize `m` hashes of `hs` (must already be sorted unsigned-ascending
    * and distinct); truncates to the K smallest and clears exact if over. */
  private def pack(hs: Array[Long], m: Int, exactIn: Boolean): Array[Byte] = {
    val n = math.min(m, K)
    val exact = exactIn && m <= K
    val out = new Array[Byte](8 + 8 * n)
    out(0) = Magic.toByte
    out(1) = (if (exact) FlagExact else 0).toByte
    out(2) = (K & 0xff).toByte; out(3) = ((K >> 8) & 0xff).toByte
    out(4) = (n & 0xff).toByte; out(5) = ((n >> 8) & 0xff).toByte
    out(6) = ((n >> 16) & 0xff).toByte; out(7) = ((n >> 24) & 0xff).toByte
    var i = 0
    while (i < n) { Bits.storeLongLE(out, 8 + 8 * i, hs(i)); i += 1 }
    out
  }

  def count(sk: Array[Byte]): Int =
    (sk(4) & 0xff) | ((sk(5) & 0xff) << 8) | ((sk(6) & 0xff) << 16) | ((sk(7) & 0xff) << 24)

  def isExact(sk: Array[Byte]): Boolean = (sk(1) & FlagExact) != 0

  private def hashAt(sk: Array[Byte], i: Int): Long = Bits.loadLongLE(sk, 8 + 8 * i)

  /** build from raw (unsorted, possibly duplicated) hashes[0, m) */
  def fromHashes(hs: Array[Long], m: Int): Array[Byte] = {
    val a = new Array[Long](m)
    var i = 0
    while (i < m) { a(i) = flip(hs(i)); i += 1 }
    java.util.Arrays.sort(a)
    // dedupe in place, un-flip back to raw hash values
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    i = 0
    while (i < w) { a(i) = flip(a(i)); i += 1 }
    pack(a, w, exactIn = true)
  }

  /** the empty sketch: zero distinct values, exact */
  def empty: Array[Byte] = pack(new Array[Long](0), 0, exactIn = true)

  /** union-merge; poison absorbs; null means poison too (unknown input) */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null || b == null || isPoison(a) || isPoison(b)) return poison
    val na = count(a); val nb = count(b)
    if (na == 0) return b
    if (nb == 0) return a
    val out = new Array[Long](na + nb)
    var i = 0; var j = 0; var w = 0
    var last = 0L; var any = false
    while (i < na && j < nb) {
      val ha = hashAt(a, i); val hb = hashAt(b, j)
      val fa = flip(ha); val fb = flip(hb)
      val h = if (fa <= fb) ha else hb
      if (fa <= fb) i += 1
      if (fb <= fa) j += 1
      if (!any || h != last) { out(w) = h; w += 1; last = h; any = true }
    }
    while (i < na) {
      val h = hashAt(a, i); i += 1
      if (!any || h != last) { out(w) = h; w += 1; last = h; any = true }
    }
    while (j < nb) {
      val h = hashAt(b, j); j += 1
      if (!any || h != last) { out(w) = h; w += 1; last = h; any = true }
    }
    pack(out, w, exactIn = isExact(a) && isExact(b))
  }

  /** (estimate, exact?) — null for poison/unknown. Exact sketches return the
    * stored distinct count; saturated ones the KMV estimator (K-1)/u_K. */
  def estimate(sk: Array[Byte]): (Long, Boolean) = {
    if (sk == null || isPoison(sk)) return null
    val n = count(sk)
    if (isExact(sk)) (n.toLong, true)
    else {
      // u = (kth smallest hash as unsigned, normalized to (0,1])
      val kth = hashAt(sk, n - 1)
      val u = (flip(kth).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)
      val est = math.round((n - 1).toDouble / u)
      (math.max(est, n.toLong), false)
    }
  }

  /** Sketch an encoded blob's NON-NULL values, or return null ("unknowable
    * here") when enumeration requires external state or a symbol-table
    * decompression pass we refuse to pay at metadata time:
    *   - shared-dictionary codes (the dictionary lives beside the manifest,
    *     not in the blob);
    *   - FSST payloads (the encoder picked FSST precisely because the column
    *     is high-entropy text; decompressing megabytes to learn "ndv ≈ rows"
    *     is all cost and no signal).
    * Long blobs (any codec — FOR/delta/bitpack/RLE/ALP/TZ-FOR) hash the
    * decoded stored longs; const/dict/RLE-dict/PREFIX/raw string blocks hash
    * value slices of the zero-copy [[Codecs.StrView]] (dictionary expansion /
    * front-coded reconstruction / in-place raw spans — no per-value copies).
    * Raw is included because small tail blocks of LOW-cardinality columns
    * legitimately pick it on byte cost, and one unenumerable block would
    * poison the whole column's NDV. An all-null block yields the EXACT empty
    * sketch — zero distinct non-null values is knowledge, not ignorance. */
  def ofBlob(blob0: Array[Byte]): Array[Byte] = {
    val blob = Codecs.pageUnwrap(blob0)
    val id = blob(0) & 0xff
    val inner = Codecs.innerCodecId(blob)
    if (inner == Codecs.SharedDictStr || inner == Codecs.SharedRleDict) return null
    if (id == Codecs.NullLong || (id >= 1 && id <= 15)) {
      val (vs, nulls) = Codecs.decodeLongsN(blob)
      val hs = new Array[Long](vs.length)
      var m = 0; var i = 0
      while (i < vs.length) {
        if (nulls == null || !nulls(i)) { hs(m) = hashLong(vs(i)); m += 1 }
        i += 1
      }
      fromHashes(hs, m)
    } else if (inner == Codecs.ConstStr || inner == Codecs.DictId ||
               inner == Codecs.RleDict || inner == Codecs.PrefixStr ||
               inner == Codecs.RawStr) {
      val v = Codecs.decodeStrsView(blob) // lens < 0 = null values
      val hs = new Array[Long](v.n)
      var m = 0; var i = 0
      while (i < v.n) {
        if (v.lens(i) >= 0) { hs(m) = hashBytesRange(v.buf, v.offs(i), v.lens(i)); m += 1 }
        i += 1
      }
      fromHashes(hs, m)
    } else {
      // FSST: the all-null case is knowable from the null wrapper's header
      // alone (count == popcount) — never decompress to learn it
      if (id == Codecs.NullStr &&
          Codecs.nullCountOf(blob) == new ByteReader(blob, 1).readInt().toLong) empty
      else null
    }
  }
}
