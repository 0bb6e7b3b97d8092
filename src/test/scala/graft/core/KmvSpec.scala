package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** KMV NDV sketch unit behavior: exactness below K, estimator accuracy above
  * it, union-merge semantics, poison absorption, and the per-blob builder's
  * enumerable/unenumerable codec boundary. */
class KmvSpec extends AnyFunSuite {

  private def sketchOfLongs(vs: Seq[Long]): Array[Byte] = {
    val hs = vs.map(Kmv.hashLong).toArray
    Kmv.fromHashes(hs, hs.length)
  }

  test("below K the sketch is exact, duplicates collapse") {
    val sk = sketchOfLongs(Seq.tabulate(500)(i => (i % 100).toLong))
    val (est, exact) = Kmv.estimate(sk)
    assert(exact); assert(est === 100L)
  }

  test("empty sketch is exact zero; merge with empty is identity") {
    assert(Kmv.estimate(Kmv.empty) === ((0L, true)))
    val sk = sketchOfLongs(1L to 42L)
    assert(Kmv.estimate(Kmv.merge(sk, Kmv.empty)) === ((42L, true)))
    assert(Kmv.estimate(Kmv.merge(Kmv.empty, sk)) === ((42L, true)))
  }

  test("above K the estimate lands within 10% of truth") {
    for (n <- Seq(5000, 50000)) {
      val sk = sketchOfLongs(Seq.tabulate(n)(i => i * 7919L))
      val (est, exact) = Kmv.estimate(sk)
      assert(!exact)
      assert(math.abs(est - n).toDouble / n < 0.10, s"n=$n est=$est")
    }
  }

  test("merge equals the sketch of the concatenated stream") {
    val a = Seq.tabulate(3000)(i => i.toLong)
    val b = Seq.tabulate(3000)(i => (i + 1500).toLong) // half overlap
    val merged = Kmv.merge(sketchOfLongs(a), sketchOfLongs(b))
    val direct = sketchOfLongs(a ++ b)
    assert(java.util.Arrays.equals(merged, direct))
    val (est, exact) = Kmv.estimate(merged)
    assert(!exact)
    assert(math.abs(est - 4500L).toDouble / 4500 < 0.10, s"est=$est")
  }

  test("exact sketches merge to exact while the union stays under K") {
    val m = Kmv.merge(sketchOfLongs(1L to 400L), sketchOfLongs(201L to 600L))
    assert(Kmv.estimate(m) === ((600L, true)))
  }

  test("poison absorbs through merges; estimate of poison is null") {
    assert(Kmv.estimate(Kmv.poison) === null)
    assert(Kmv.isPoison(Kmv.merge(sketchOfLongs(1L to 5L), Kmv.poison)))
    assert(Kmv.isPoison(Kmv.merge(Kmv.poison, Kmv.empty)))
    assert(Kmv.isPoison(Kmv.merge(null, Kmv.empty)))
  }

  test("ofBlob: long blobs exact below K, null-aware") {
    val vs = Array.tabulate(1000)(i => (i % 50).toLong)
    val nulls = Array.tabulate(1000)(i => i % 10 == 0)
    val blob = Codecs.encodeLongsN(vs, nulls)
    val sk = Kmv.ofBlob(blob)
    assert(Kmv.estimate(sk) === ((45L, true))) // 50 residues minus the 5 nulled multiples of 10
  }

  test("ofBlob: dict/prefix/raw string blocks are enumerable, FSST is not") {
    val dictVals = Array.tabulate(800)(i => s"lang_${i % 7}".getBytes("UTF-8"))
    val dictBlob = Codecs.encodeStrs(dictVals)
    assert(Set("dict", "rle_dict").contains(Codecs.codecOf(dictBlob)))
    assert(Kmv.estimate(Kmv.ofBlob(dictBlob)) === ((7L, true)))

    val urls = Array.tabulate(512)(i => f"https://example.com/path/$i%06d".getBytes("UTF-8"))
    val prefixBlob = Codecs.encodeStrsAs(urls, Codecs.PrefixStr)
    assert(Kmv.estimate(Kmv.ofBlob(prefixBlob)) === ((512L, true)))

    // high-entropy text: raw blocks hash in place (a low-card column's tail
    // block may pick raw — it must not poison the column)...
    val rnd = new java.util.Random(7)
    val texts = Array.tabulate(64) { _ =>
      val b = new Array[Byte](300); rnd.nextBytes(b)
      b.map(x => ((x & 0x3f) + 48).toByte)
    }
    val rawBlob = Codecs.encodeStrsAs(texts, Codecs.RawStr)
    assert(Kmv.estimate(Kmv.ofBlob(rawBlob)) === ((64L, true)))
    // ...while FSST stays unenumerable by design (no decompression pass)
    val fsstBlob = Codecs.encodeStrsAs(
      Array.tabulate(64)(i => s"the quick brown fox $i jumps over".getBytes("UTF-8")),
      Codecs.FsstId)
    assert(Codecs.codecOf(fsstBlob) === "fsst")
    assert(Kmv.ofBlob(fsstBlob) === null)
  }

  test("ofBlob: all-null blocks are EXACT empty sketches, both kinds") {
    val lblob = Codecs.encodeLongsN(new Array[Long](100), Array.fill(100)(true))
    assert(Kmv.estimate(Kmv.ofBlob(lblob)) === ((0L, true)))
    val sblob = Codecs.encodeStrsN(Array.fill[Array[Byte]](100)(null))._1
    assert(Kmv.estimate(Kmv.ofBlob(sblob)) === ((0L, true)))
  }
}
