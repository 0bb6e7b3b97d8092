package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis expressions for the training-data-pipeline operator set:
  * SimHash document fingerprints and a heuristic n-gram/stopword language
  * guesser. Pure functions of their input — deterministic at any parallelism.
  */
object TextHash {
  /** FNV-1a 64 then splitmix finalizer — deterministic token hash. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    graft.core.Bits.mix(h)
  }
}

/** 64-bit SimHash over an array<string> of tokens: per bit, sum +1/-1 across
  * token hashes; bit set iff the sum is positive. Near-duplicate documents
  * differ in few bits (hamming distance via bit_count(a ^ b)). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = TextHash.hashBytes(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Heuristic language identification: character-range ratios for CJK/Cyrillic,
  * stopword voting for Latin-script languages. Intentionally simple — the
  * point is the distributed plumbing (a codegen-compatible scalar expression),
  * not NLP quality. */
case class LangGuess(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_guess"

  @transient private lazy val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "was", "that", "for", "with", "are", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "eine", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "des", "une", "dans", "que", "pour", "avec"),
    "es" -> Set("el", "la", "los", "las", "es", "no", "una", "del", "por", "con", "para", "que"))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var cjk = 0; var cyr = 0; var letters = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            block == Character.UnicodeBlock.HIRAGANA ||
            block == Character.UnicodeBlock.KATAKANA) cjk += 1
        else if (block == Character.UnicodeBlock.CYRILLIC) cyr += 1
      }
      i += 1
    }
    val result =
      if (letters == 0) "und"
      else if (cjk * 5 >= letters) {
        // hiragana/katakana presence says ja; pure han says zh
        val hasKana = s.exists { c =>
          val b = Character.UnicodeBlock.of(c)
          b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA
        }
        if (hasKana) "ja" else "zh"
      } else if (cyr * 2 >= letters) "ru"
      else {
        val toks = s.toLowerCase.split("[^\\p{L}]+")
        var best = "und"; var bestHits = 0
        stopwords.foreach { case (lang, words) =>
          var hits = 0
          var k = 0
          while (k < toks.length) { if (words.contains(toks(k))) hits += 1; k += 1 }
          if (hits > bestHits) { best = lang; bestHits = hits }
        }
        best
      }
    UTF8String.fromString(result)
  }
  override protected def withNewChildInternal(newChild: Expression): LangGuess =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003): a polynomial
  * ROLLING hash over every k-byte gram of the UTF-8 text (O(1) per position),
  * then the minimum hash of each `window` consecutive grams is kept
  * (rightmost-min tie break = robust winnowing). Guarantees: any shared
  * substring of length ≥ window+k-1 yields at least one shared fingerprint,
  * and fingerprint density is ~2/(window+1) — position-robust dedup evidence
  * at a tunable cost. */
case class WinnowFingerprints(child: Expression, k: Int = 8, window: Int = 16)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && window >= 2)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  private val Base = 0x100000001b3L
  // Base^k for the rolling subtract (wrapping Long arithmetic)
  @transient private lazy val baseK: Long = {
    var p = 1L; var i = 0
    while (i < k) { p *= Base; i += 1 }
    p
  }
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < k)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Long])
    val n = bytes.length - k + 1
    val grams = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    grams(0) = h
    i = 1
    while (i < n) {
      h = h * Base + (bytes(i + k - 1) & 0xffL) - baseK * (bytes(i - 1) & 0xffL)
      grams(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each window, deduped by position
    val picks = new scala.collection.mutable.ArrayBuffer[Long](n / window + 2)
    var lastPos = -1
    var w0 = 0
    val nWin = math.max(n - window + 1, 1)
    while (w0 < nWin) {
      val end = math.min(w0 + window, n)
      var best = w0
      var j = w0 + 1
      while (j < end) {
        // unsigned compare; rightmost min (<=) = robust winnowing
        if (java.lang.Long.compareUnsigned(grams(j), grams(best)) <= 0) best = j
        j += 1
      }
      if (best != lastPos) {
        picks += graft.core.Bits.mix(grams(best))
        lastPos = best
      }
      w0 += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(picks.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** k-entry MinHash signature over an array<string> of shingles, one pass:
  * each shingle hashed once, then the k per-permutation hashes come from
  * Kirsch–Mitzenmacher double hashing — h_j(x) = h1(x) + j·h2(x) with h2
  * forced odd — so the inner loop is one ADD + compare per permutation
  * (the r2 family re-mixed per j: 2 multiplies each; at TB scale the
  * signature pass is shingles × k). sig[j] = min over shingles. A single
  * eval replaces k nested Catalyst lambda evaluations of the shingle
  * array. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val base = TextHash.hashBytes(arr.getUTF8String(i).getBytes)
      val h2 = graft.core.Bits.mix(base ^ 0x5851f42d4c957f2dL) | 1L
      var h = graft.core.Bits.mix(base)
      var j = 0
      while (j < k) {
        if (h < sig(j)) sig(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
