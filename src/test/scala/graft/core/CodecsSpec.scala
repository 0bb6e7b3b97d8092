package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Round-trip + selector tests for the codec suite (SURVEY.md §5 items 2,4:
  * codec round-trips on generated data; selector fixtures with known-optimal
  * codecs). Deterministic seeds throughout. */
class CodecsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def rt(vs: Array[Long]): Unit = {
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq, s"codec=${Codecs.codecOf(blob)}")
  }

  test("long round-trip: constant column selects const") {
    val vs = Array.fill(1000)(42L)
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.codecOf(blob) === "const")
    assert(blob.length === 13)
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq)
  }

  test("long round-trip: random 40-bit ints select bitpack at width 40-ish") {
    val vs = Array.fill(4096)(rnd.nextLong() & BitPack.maskFor(40))
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.codecOf(blob) === "bitpack")
    assert(blob.length <= 4096L * 40 / 8 + 16)
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq)
  }

  test("long round-trip: sorted timestamps with small jitter select delta") {
    val base = 1700000000000000L
    var t = base
    val vs = Array.fill(4096) { t += 1000 + rnd.nextInt(50); t }
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.codecOf(blob) === "delta")
    assert(blob.length < 4096 * 3) // ~11-bit zigzag deltas ≪ 8 B/value
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq)
  }

  test("long round-trip: clustered values in a narrow high band select for") {
    val vs = Array.fill(4096)(1L << 60 | (rnd.nextInt(1000).toLong)).map(v => -v)
    rt(vs) // negatives force FOR over bitpack
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.codecOf(blob) === "for" || Codecs.codecOf(blob) === "delta")
  }

  test("long round-trip: long runs select rle") {
    val vs = (0 until 50).flatMap(i => Array.fill(200)(i.toLong * 7)).toArray
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.codecOf(blob) === "rle")
    assert(blob.length < 500)
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq)
  }

  test("long round-trip: adversarial distributions") {
    rt(Array(0L))
    rt(Array(Long.MinValue, Long.MaxValue)) // full-range FOR overflow guard
    rt(Array(-1L, 0L, 1L))
    rt(Array.fill(257)(rnd.nextLong()))
    rt(Array.tabulate(1000)(i => if (i % 2 == 0) Long.MinValue else Long.MaxValue))
    (1 to 64).foreach(w => rt(Array.fill(67)(rnd.nextLong() & BitPack.maskFor(w))))
  }

  test("every long codec round-trips when forced") {
    val vs = Array.tabulate(777)(i => (i / 3).toLong)
    Seq(Codecs.BitPackId, Codecs.ForId, Codecs.DeltaId, Codecs.RleLong).foreach { id =>
      assert(Codecs.decodeLongs(Codecs.encodeLongsAs(vs, id)).toSeq === vs.toSeq, s"id=$id")
    }
  }

  // ---- strings ----

  private val langs = Array("en", "de", "fr", "es", "zh", "ja", "pt", "ru")
  private def words = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy",
    "dog", "compression", "spark", "column", "encode", "worth", "señor", "日本語")
  private def sentence(r: scala.util.Random, n: Int): String =
    Array.fill(n)(words(r.nextInt(words.length))).mkString(" ")

  test("string round-trip: constant column selects const") {
    val vs = Array.fill(500)("en")
    val blob = Codecs.encodeStrings(vs)
    assert(Codecs.codecOf(blob) === "const")
    assert(Codecs.decodeStrings(blob).toSeq === vs.toSeq)
  }

  test("string round-trip: low-cardinality selects dict (or rle_dict when sorted)") {
    val r = new scala.util.Random(1)
    val vs = Array.fill(2000)(langs(r.nextInt(langs.length)))
    val blob = Codecs.encodeStrings(vs)
    assert(Codecs.codecOf(blob) === "dict")
    assert(blob.length < 2000) // ≤3 bits/code + tiny dict, raw would be ~4000 B
    assert(Codecs.decodeStrings(blob).toSeq === vs.toSeq)

    val sortedVs = vs.sorted
    val blob2 = Codecs.encodeStrings(sortedVs)
    assert(Codecs.codecOf(blob2) === "rle_dict")
    assert(blob2.length < blob.length)
    assert(Codecs.decodeStrings(blob2).toSeq === sortedVs.toSeq)
  }

  test("string round-trip: english-like text selects fsst and compresses >1.5x") {
    val r = new scala.util.Random(2)
    val vs = Array.fill(300)(sentence(r, 30))
    val raw = vs.map(_.getBytes(UTF_8).length).sum
    val blob = Codecs.encodeStrings(vs)
    assert(Codecs.codecOf(blob) === "fsst")
    assert(blob.length.toDouble < raw / 1.5, s"fsst ${blob.length} vs raw $raw")
    assert(Codecs.decodeStrings(blob).toSeq === vs.toSeq)
  }

  test("string round-trip: high-entropy unique strings fall back to raw") {
    val r = new scala.util.Random(3)
    val vs = Array.fill(200)(r.nextString(20)) // random UTF-16 chars ⇒ incompressible
    val blob = Codecs.encodeStrings(vs)
    assert(Codecs.decodeStrings(blob).toSeq === vs.toSeq)
  }

  test("string round-trip: adversarial — empty strings, non-ASCII, single row") {
    Seq(
      Array(""),
      Array("", "", ""),
      Array("a"),
      Array("日本語テキスト", "ñçüö", "", "🙂 emoji", "plain"),
      Array.fill(100)("")
    ).foreach { vs =>
      assert(Codecs.decodeStrings(Codecs.encodeStrings(vs)).toSeq === vs.toSeq)
    }
  }

  test("every string codec round-trips when forced") {
    val r = new scala.util.Random(4)
    val vs = Array.fill(150)(sentence(r, 5)).map(_.getBytes(UTF_8))
    Seq(Codecs.RawStr, Codecs.DictId, Codecs.RleDict, Codecs.FsstId).foreach { id =>
      val back = Codecs.decodeStrs(Codecs.encodeStrsAs(vs, id))
      assert(back.length === vs.length)
      back.zip(vs).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b), s"id=$id") }
    }
  }

  test("binary (html-like) round-trip via fsst") {
    val r = new scala.util.Random(5)
    val vs = Array.fill(100)(("<html><body><p>" + sentence(r, 20) + "</p></body></html>").getBytes(UTF_8))
    val blob = Codecs.encodeStrs(vs)
    val back = Codecs.decodeStrs(blob)
    back.zip(vs).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    assert(blob.length < vs.map(_.length).sum)
  }

  // ---- FSST unit behavior ----

  test("fsst: escape-only table still round-trips") {
    val table = new Fsst.SymbolTable(Array.empty)
    val data = "hello world".getBytes(UTF_8)
    val comp = table.compress(data)
    assert(comp.length === data.length * 2) // all escaped
    assert(new String(table.decompress(comp, 0, comp.length), UTF_8) === "hello world")
  }

  test("fsst: trained table compresses repetitive text well") {
    val data = ("http://example.com/page/" * 400).getBytes(UTF_8)
    val table = Fsst.train(data)
    val comp = table.compress(data)
    assert(comp.length * 4 < data.length, s"${comp.length} vs ${data.length}")
    assert(java.util.Arrays.equals(table.decompress(comp, 0, comp.length), data))
  }

  test("fsst: symbol table serialization round-trips") {
    val data = ("the quick brown fox " * 100).getBytes(UTF_8)
    val table = Fsst.train(data)
    val w = new ByteWriter()
    table.writeTo(w)
    val back = Fsst.SymbolTable.readFrom(new ByteReader(w.toArray))
    assert(back.symbols.length === table.symbols.length)
    val comp = table.compress(data)
    assert(java.util.Arrays.equals(back.decompress(comp, 0, comp.length), data))
  }

  // ================= encoded-domain predicate kernels =================

  private def strs(vs: String*): Array[Array[Byte]] = vs.map(_.getBytes(UTF_8)).toArray

  test("countEqStr answers correctly for every string codec without decode") {
    val block = strs("alpha", "beta", "alpha", "gamma", "beta", "alpha")
    for (id <- Seq(Codecs.RawStr, Codecs.DictId, Codecs.RleDict, Codecs.FsstId)) {
      val blob = Codecs.encodeStrsAs(block, id)
      assert(Codecs.countEqStr(blob, "alpha".getBytes(UTF_8)) === 3L, s"codec $id")
      assert(Codecs.countEqStr(blob, "beta".getBytes(UTF_8)) === 2L, s"codec $id")
      assert(Codecs.countEqStr(blob, "missing".getBytes(UTF_8)) === 0L, s"codec $id")
      // prefix of a present value must NOT match (length-aware compare)
      assert(Codecs.countEqStr(blob, "alph".getBytes(UTF_8)) === 0L, s"codec $id")
    }
    val const = Codecs.encodeStrsAs(strs("x", "x", "x"), Codecs.ConstStr)
    assert(Codecs.countEqStr(const, "x".getBytes(UTF_8)) === 3L)
    assert(Codecs.countEqStr(const, "y".getBytes(UTF_8)) === 0L)
  }

  test("countEqStr on FSST relies on deterministic compression: long realistic block") {
    // the FSST path compares COMPRESSED spans (equal raw ⟺ equal compressed
    // because the greedy encoder is a deterministic function) — pin that on a
    // block big enough to train a real symbol table
    val words = "the of and to in is was for on that with data web page".split(" ")
    val r = new scala.util.Random(5)
    val block = Array.fill(300)((1 to 30).map(_ => words(r.nextInt(words.length))).mkString(" ").getBytes(UTF_8))
    val target = block(137)
    val expected = block.count(java.util.Arrays.equals(_, target))
    val blob = Codecs.encodeStrsAs(block, Codecs.FsstId)
    assert(Codecs.codecOf(blob) === "fsst")
    assert(Codecs.countEqStr(blob, target) === expected.toLong)
    assert(Codecs.countEqStr(blob, "absent words entirely".getBytes(UTF_8)) === 0L)
  }

  test("countEqStr recurses through the null wrapper and only counts non-nulls") {
    val vs: Array[Array[Byte]] = Array("a".getBytes(UTF_8), null, "a".getBytes(UTF_8), null, "b".getBytes(UTF_8))
    val (blob, _) = Codecs.encodeStrsN(vs)
    assert(Codecs.codecOf(blob).endsWith("+nulls"))
    assert(Codecs.countEqStr(blob, "a".getBytes(UTF_8)) === 2L)
    assert(Codecs.countEqStr(blob, "b".getBytes(UTF_8)) === 1L)
    assert(Codecs.blobHasNulls(blob))
    val allNull: Array[Array[Byte]] = Array(null, null)
    val (blobAllNull, _) = Codecs.encodeStrsN(allNull)
    assert(Codecs.countEqStr(blobAllNull, "a".getBytes(UTF_8)) === 0L)
    assert(Codecs.decodeStrsN(blobAllNull).toSeq === Seq(null, null))
  }

  test("countBetweenStr: every string codec, all bound shapes, brute-force differential") {
    def bf(block: Array[Array[Byte]], lo: String, loInc: Boolean, hi: String, hiInc: Boolean): Long = {
      def cmp(a: Array[Byte], b: Array[Byte]) = java.util.Arrays.compareUnsigned(a, b)
      block.count { v =>
        (lo == null || { val c = cmp(v, lo.getBytes(UTF_8)); c > 0 || (loInc && c == 0) }) &&
          (hi == null || { val c = cmp(v, hi.getBytes(UTF_8)); c < 0 || (hiInc && c == 0) })
      }.toLong
    }
    val block = strs("alpha", "beta", "alpha", "gamma", "beta", "delta", "betaz", "a")
    val bounds = Seq(
      ("a", true, "c", false), ("alpha", true, "beta", true), ("alpha", false, "beta", false),
      ("beta", true, "beta", true), ("beta", false, "beta", true), ("beta", true, "beta", false),
      (null, true, "betaz", true), ("delta", true, null, true), (null, true, null, true),
      ("x", true, "z", true), ("gamma", true, "alpha", true) /* inverted = empty */)
    for (id <- Seq(Codecs.RawStr, Codecs.DictId, Codecs.RleDict, Codecs.FsstId);
         (lo, loInc, hi, hiInc) <- bounds) {
      val blob = Codecs.encodeStrsAs(block, id)
      val loB = if (lo == null) null else lo.getBytes(UTF_8)
      val hiB = if (hi == null) null else hi.getBytes(UTF_8)
      assert(Codecs.countBetweenStr(blob, loB, loInc, hiB, hiInc) === bf(block, lo, loInc, hi, hiInc),
        s"codec $id bounds ($lo,$loInc,$hi,$hiInc)")
    }
    // const + null wrapper
    val const = Codecs.encodeStrsAs(strs("mm", "mm", "mm"), Codecs.ConstStr)
    assert(Codecs.countBetweenStr(const, "m".getBytes(UTF_8), true, "n".getBytes(UTF_8), false) === 3L)
    assert(Codecs.countBetweenStr(const, "mm".getBytes(UTF_8), false, null, true) === 0L)
    val vs: Array[Array[Byte]] = Array("aa".getBytes(UTF_8), null, "bb".getBytes(UTF_8), null)
    val (wrapped, _) = Codecs.encodeStrsN(vs)
    assert(Codecs.countBetweenStr(wrapped, "a".getBytes(UTF_8), true, "b".getBytes(UTF_8), true) === 1L)
    assert(Codecs.countBetweenStr(wrapped, null, true, null, true) === 2L) // nulls not counted
  }

  test("prefix (front-coding) round-trips; selector picks it for sorted urls") {
    // sorted url-like block: long shared scheme://host/ prefixes
    val hosts = Seq("alpha.example.com", "beta.example.org", "gamma.example.net")
    val urls = (for (h <- hosts; i <- 0 until 200)
      yield s"https://$h/articles/2026/section-${i / 20}/page-$i.html").sorted
    val block = urls.map(_.getBytes(UTF_8)).toArray
    val auto = Codecs.encodeStrs(block)
    assert(Codecs.codecOf(auto) === "prefix", Codecs.codecOf(auto))
    assert(Codecs.decodeStrs(auto).map(new String(_, UTF_8)).toSeq === urls)
    // and it genuinely beats raw by a wide margin on this shape
    val raw = Codecs.encodeStrsAs(block, Codecs.RawStr)
    assert(auto.length * 2 < raw.length, s"prefix ${auto.length} vs raw ${raw.length}")
    // adversarial shapes round-trip when forced
    for (vs <- Seq(
      strs("solo"),
      strs("", "", "a", "ab", "abc", "abd", "b"),
      strs("zz", "aa", "zz", "aa"), // unsorted: lcp 0 everywhere
      strs("sameprefix-x", "sameprefix-y", "sameprefix-y", "sameprefix-z"))) {
      val blob = Codecs.encodeStrsAs(vs, Codecs.PrefixStr)
      assert(Codecs.decodeStrs(blob).toSeq.map(_.toSeq) === vs.toSeq.map(_.toSeq))
    }
  }

  test("prefix blob encoded-domain predicates: countEq incremental match, countBetween, range") {
    val vs = strs("app", "apple", "apples", "apply", "apply", "banana", "band", "bandage", "xylophone")
    val blob = Codecs.encodeStrsAs(vs, Codecs.PrefixStr)
    assert(Codecs.codecOf(blob) === "prefix")
    // equality: every present value, a prefix of a present value, an absent value
    for (t <- Seq("app", "apple", "apples", "apply", "banana", "band", "bandage", "xylophone",
                  "appl", "ap", "bandages", "zzz", "")) {
      val expected = vs.count(v => new String(v, UTF_8) == t).toLong
      assert(Codecs.countEqStr(blob, t.getBytes(UTF_8)) === expected, s"target '$t'")
    }
    // ranges (differential against the raw codec, whose path is independent)
    val rawBlob = Codecs.encodeStrsAs(vs, Codecs.RawStr)
    for ((lo, loInc, hi, hiInc) <- Seq(
      ("app", true, "apply", true), ("app", false, "apply", false),
      (null, true, "band", true), ("banana", true, null, true), (null, true, null, true))) {
      val loB = if (lo == null) null else lo.getBytes(UTF_8)
      val hiB = if (hi == null) null else hi.getBytes(UTF_8)
      assert(Codecs.countBetweenStr(blob, loB, loInc, hiB, hiInc) ===
        Codecs.countBetweenStr(rawBlob, loB, loInc, hiB, hiInc), s"bounds ($lo,$hi)")
    }
    val (lo, hi) = Codecs.rangeOfStr(blob)
    assert(java.util.Arrays.compareUnsigned(lo, "app".getBytes(UTF_8)) <= 0)
    assert(hi == null || java.util.Arrays.compareUnsigned(hi, "xylophone".getBytes(UTF_8)) >= 0)
  }

  test("decodeStrsView slices equal the copying decode for every codec and null shape") {
    def check(blob: Array[Byte]): Unit = {
      val copies = Codecs.decodeStrsN(blob)
      val v = Codecs.decodeStrsView(blob)
      assert(v.n === copies.length, s"codec ${Codecs.codecOf(blob)}")
      (0 until v.n).foreach { i =>
        if (copies(i) == null) assert(v.lens(i) === -1, s"codec ${Codecs.codecOf(blob)} row $i")
        else {
          val slice = java.util.Arrays.copyOfRange(v.buf, v.offs(i), v.offs(i) + v.lens(i))
          assert(java.util.Arrays.equals(slice, copies(i)), s"codec ${Codecs.codecOf(blob)} row $i")
        }
      }
    }
    val words = "web page data site of the and with for".split(" ")
    val r = new scala.util.Random(9)
    val block = Array.fill(200)((1 to 12).map(_ => words(r.nextInt(words.length))).mkString(" ").getBytes(UTF_8))
    for (id <- Seq(Codecs.RawStr, Codecs.DictId, Codecs.RleDict, Codecs.FsstId, Codecs.PrefixStr))
      check(Codecs.encodeStrsAs(block, id))
    check(Codecs.encodeStrsAs(strs("k", "k", "k"), Codecs.ConstStr))
    check(Codecs.encodeStrs(strs("", "x", "", "yz"))) // empties
    // null wrapper over each inner codec
    val withNulls: Array[Array[Byte]] = Array("aa".getBytes(UTF_8), null, "bb".getBytes(UTF_8),
      "aa".getBytes(UTF_8), null)
    check(Codecs.encodeStrsN(withNulls)._1)
    val allNull: Array[Array[Byte]] = Array(null, null, null)
    check(Codecs.encodeStrsN(allNull)._1)
  }

  test("nullCountOf reads the wrapper bitmap exactly; 0 for unwrapped blobs") {
    assert(Codecs.nullCountOf(Codecs.encodeLongs(Array(1L, 2L, 3L))) === 0L)
    assert(Codecs.nullCountOf(Codecs.encodeStrs(strs("a", "b"))) === 0L)
    val vs = Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    val nulls = Array(true, false, true, false, false, false, false, false, true, false)
    assert(Codecs.nullCountOf(Codecs.encodeLongsN(vs, nulls)) === 3L)
    val sv: Array[Array[Byte]] = Array(null, "x".getBytes(UTF_8), null)
    assert(Codecs.nullCountOf(Codecs.encodeStrsN(sv)._1) === 2L)
    val allNull: Array[Array[Byte]] = Array(null, null, null)
    assert(Codecs.nullCountOf(Codecs.encodeStrsN(allNull)._1) === 3L)
  }

  test("countEqLong and countBetweenLong: every codec, zone accept/reject/straddle") {
    val forBlock = Codecs.encodeLongsAs(Array(100L, 105L, 100L, 120L, 100L), Codecs.ForId)
    assert(Codecs.countEqLong(forBlock, 100L) === 3L)
    assert(Codecs.countEqLong(forBlock, 99L) === 0L)   // zone reject (below ref)
    assert(Codecs.countEqLong(forBlock, 1000L) === 0L) // zone reject (above ref+2^w)
    assert(Codecs.countBetweenLong(forBlock, 100L, 105L) === 4L) // straddle: decode
    assert(Codecs.countBetweenLong(forBlock, 0L, 99L) === 0L)    // zone reject
    assert(Codecs.countBetweenLong(forBlock, 0L, Long.MaxValue) === 5L) // zone accept, no decode
    val rle = Codecs.encodeLongsAs(Array(7L, 7L, 7L, 9L, 9L, 7L), Codecs.RleLong)
    assert(Codecs.countEqLong(rle, 7L) === 4L)
    assert(Codecs.countBetweenLong(rle, 8L, 9L) === 2L)
    val delta = Codecs.encodeLongsAs(Array(10L, 11L, 13L, 13L, 20L), Codecs.DeltaId)
    assert(Codecs.countEqLong(delta, 13L) === 2L)
    assert(Codecs.countBetweenLong(delta, 11L, 13L) === 3L)
    val const = Codecs.encodeLongsAs(Array(5L, 5L), Codecs.ConstLong)
    assert(Codecs.countEqLong(const, 5L) === 2L)
    assert(Codecs.countBetweenLong(const, 6L, 9L) === 0L)
    val bp = Codecs.encodeLongsAs(Array(1L, 2L, 3L, 2L), Codecs.BitPackId)
    assert(Codecs.countEqLong(bp, 2L) === 2L)
    assert(Codecs.countEqLong(bp, -1L) === 0L) // zone reject: bitpack is unsigned
    // null wrapper recursion
    val withNulls = Codecs.encodeLongsN(Array(4L, 0L, 4L), Array(false, true, false))
    assert(Codecs.countEqLong(withNulls, 4L) === 2L)
    assert(Codecs.countEqLong(withNulls, 0L) === 0L) // the null slot's 0 is NOT a value
  }

  test("rangeOfLong: header-derived bounds contain the data, null for all-null") {
    val vs = Array(1000L, 1010L, 1040L, 1005L)
    for (id <- Seq(Codecs.ForId, Codecs.RleLong, Codecs.DeltaId)) {
      val (lo, hi) = Codecs.rangeOfLong(Codecs.encodeLongsAs(vs, id))
      assert(lo <= 1000L && hi >= 1040L, s"codec $id: [$lo,$hi]")
    }
    val (clo, chi) = Codecs.rangeOfLong(Codecs.encodeLongsAs(Array(7L, 7L), Codecs.ConstLong))
    assert(clo === 7L && chi === 7L)
    val allNull = Codecs.encodeLongsN(Array(0L, 0L), Array(true, true))
    assert(Codecs.rangeOfLong(allNull) === null)
    val wrapped = Codecs.encodeLongsN(Array(50L, 0L, 60L), Array(false, true, false))
    val (wlo, whi) = Codecs.rangeOfLong(wrapped)
    assert(wlo <= 50L && whi >= 60L)
  }

  test("statsOfLong: EXACT attained min/max/sum/count for every codec, nulls skipped") {
    val vs = Array(1000L, 1010L, 1040L, 1005L)
    for (id <- Seq(Codecs.ConstLong, Codecs.BitPackId, Codecs.ForId, Codecs.RleLong, Codecs.DeltaId)) {
      val in = if (id == Codecs.ConstLong) Array(7L, 7L, 7L) else vs
      val s = Codecs.statsOfLong(Codecs.encodeLongsAs(in, id))
      assert(s.min === in.min && s.max === in.max, s"codec $id")
      assert(s.sum === in.sum && s.count === in.length.toLong, s"codec $id")
    }
    // exactness where rangeOfLong is only representable: bitpack hi is a
    // width bound (e.g. 1040 packs at 11 bits → representable hi 2047),
    // statsOfLong must report the ATTAINED 1040
    val bp = Codecs.encodeLongsAs(vs, Codecs.BitPackId)
    assert(Codecs.rangeOfLong(bp)._2 >= Codecs.statsOfLong(bp).max)
    assert(Codecs.statsOfLong(bp).max === 1040L)
    // null-wrapped: null slots excluded from every stat
    val wrapped = Codecs.encodeLongsN(Array(50L, 0L, 60L), Array(false, true, false))
    val w = Codecs.statsOfLong(wrapped)
    assert(w.min === 50L && w.max === 60L && w.sum === 110L && w.count === 2L)
    // all-null → null (no attained values)
    assert(Codecs.statsOfLong(Codecs.encodeLongsN(Array(0L, 0L), Array(true, true))) === null)
    // negative values (sign-sensitive min/max, wrapping sum domain)
    val neg = Codecs.statsOfLong(Codecs.encodeLongs(Array(-5L, 3L, -9L)))
    assert(neg.min === -9L && neg.max === 3L && neg.sum === -11L)
    assert(neg.sumValid)
    // sum overflow: sumValid=false, min/max/count stay exact — the block
    // must decline the scan-free sum, never serve a wrapped number
    val huge = Codecs.statsOfLong(
      Codecs.encodeLongs(Array(Long.MaxValue - 1L, Long.MaxValue - 2L, 5L)))
    assert(!huge.sumValid)
    assert(huge.min === 5L && huge.max === Long.MaxValue - 1L && huge.count === 3L)
    // negative-direction overflow detected too
    val hugeNeg = Codecs.statsOfLong(
      Codecs.encodeLongs(Array(Long.MinValue + 1L, Long.MinValue + 2L)))
    assert(!hugeNeg.sumValid)
  }

  test("rangeOfStr: truncated byte-string bounds contain the data for every codec") {
    def cmp(a: Array[Byte], b: Array[Byte]): Int = java.util.Arrays.compareUnsigned(a, b)
    val vs = Array("delta", "alpha", "zebra", "alpha", "mike").map(_.getBytes(UTF_8))
    for (id <- Seq(Codecs.RawStr, Codecs.DictId, Codecs.RleDict, Codecs.FsstId)) {
      val (lo, hi) = Codecs.rangeOfStr(Codecs.encodeStrsAs(vs, id))
      assert(cmp(lo, "alpha".getBytes(UTF_8)) <= 0, s"codec $id")
      assert(cmp(hi, "zebra".getBytes(UTF_8)) >= 0, s"codec $id")
    }
    val xx = Array("x".getBytes(UTF_8), "x".getBytes(UTF_8))
    val (clo, chi) = Codecs.rangeOfStr(Codecs.encodeStrsAs(xx, Codecs.ConstStr))
    assert(new String(clo, UTF_8) === "x" && new String(chi, UTF_8) === "x")
    // truncation: bounds stay sound and short for long values
    val long1 = ("a" * 40).getBytes(UTF_8); val long2 = ("b" * 40).getBytes(UTF_8)
    val (tlo, thi) = Codecs.rangeOfStr(Codecs.encodeStrsAs(Array(long1, long2), Codecs.RawStr))
    assert(tlo.length <= 16 && thi.length <= 16)
    assert(cmp(tlo, long1) <= 0 && cmp(thi, long2) >= 0)
    // 0xff tail past the truncation point: last non-0xff byte increments
    val ffTail = Array.fill[Byte](20)(-1); ffTail(0) = 'q'.toByte
    val (_, fhi) = Codecs.rangeOfStr(Codecs.encodeStrsAs(Array(ffTail, "a".getBytes(UTF_8)), Codecs.RawStr))
    assert(fhi != null && cmp(fhi, ffTail) > 0)
    // all-0xff prefix: upper bound impossible → null = unbounded
    val allFf = Array.fill[Byte](20)(-1)
    val (_, nhi) = Codecs.rangeOfStr(Codecs.encodeStrsAs(Array(allFf, allFf), Codecs.RawStr))
    assert(nhi === null)
    // null wrapper recursion and all-null blocks
    val (wrapped, _) = Codecs.encodeStrsN(Array("kk".getBytes(UTF_8), null, "aa".getBytes(UTF_8)), null)
    val (wlo, whi) = Codecs.rangeOfStr(wrapped)
    assert(new String(wlo, UTF_8) === "aa" && new String(whi, UTF_8) === "kk")
    val (allNull, _) = Codecs.encodeStrsN(Array(null, null), null)
    assert(Codecs.rangeOfStr(allNull) === null)
  }

  test("zone maps at the 2^62 / 2^63 boundary: width-63 blocks and near-MaxValue refs") {
    // width-63 bitpack (any non-negative column with max >= 2^62): a signed
    // `target >= 1L << 63` zone test is vacuously true — every count came back 0
    val big = (1L << 62) + 7L
    val w63 = Array(5L, big, 5L, big + 1, 0L)
    for (id <- Seq(Codecs.BitPackId, Codecs.ForId, Codecs.DeltaId)) {
      val blob = Codecs.encodeLongsAs(w63, id)
      assert(Codecs.countEqLong(blob, 5L) === 2L, s"codec $id")
      assert(Codecs.countEqLong(blob, big) === 1L, s"codec $id")
      assert(Codecs.countEqLong(blob, big + 2) === 0L, s"codec $id")
      assert(Codecs.countBetweenLong(blob, 0L, Long.MaxValue) === 5L, s"codec $id")
      assert(Codecs.countBetweenLong(blob, big, big + 1) === 2L, s"codec $id")
      val (lo, hi) = Codecs.rangeOfLong(blob)
      assert(lo <= 0L && hi >= big + 1, s"codec $id: [$lo,$hi]")
    }
    // RLE needs runs to be chosen; exercise its width-63 zone path directly
    val rleW63 = Codecs.encodeLongsAs(Array(0L, 0L, big, big, big), Codecs.RleLong)
    assert(Codecs.countEqLong(rleW63, big) === 3L)
    assert(Codecs.countEqLong(rleW63, 1L) === 0L)
    assert(Codecs.countBetweenLong(rleW63, big - 1, big + 1) === 3L)

    // FoR/RLE ref near MaxValue: ref + (2^width - 1) overflows signed; the
    // un-saturated hi < lo zone-rejected blocks that contain matches
    val nearMax = Array.tabulate(11)(i => Long.MaxValue - 10 + i)
    for (id <- Seq(Codecs.ForId, Codecs.RleLong, Codecs.DeltaId)) {
      val blob = Codecs.encodeLongsAs(nearMax, id)
      val (lo, hi) = Codecs.rangeOfLong(blob)
      assert(lo <= Long.MaxValue - 10 && hi >= Long.MaxValue && hi >= lo, s"codec $id: [$lo,$hi]")
      assert(Codecs.countBetweenLong(blob, Long.MaxValue - 2, Long.MaxValue) === 3L, s"codec $id")
      assert(Codecs.countEqLong(blob, Long.MaxValue) === 1L, s"codec $id")
      assert(Codecs.countEqLong(blob, Long.MinValue + 5) === 0L, s"codec $id (wraparound alias)")
    }
    // negative-ref FoR with a huge span (width 63): values straddle zero
    val straddle = Array(-(1L << 62), 0L, (1L << 62) - 10)
    for (id <- Seq(Codecs.ForId, Codecs.DeltaId)) {
      val blob = Codecs.encodeLongsAs(straddle, id)
      assert(Codecs.countEqLong(blob, 0L) === 1L, s"codec $id")
      assert(Codecs.countEqLong(blob, -(1L << 62)) === 1L, s"codec $id")
      assert(Codecs.countBetweenLong(blob, -1L, 1L) === 1L, s"codec $id")
      val (lo, hi) = Codecs.rangeOfLong(blob)
      assert(lo <= straddle.min && hi >= straddle.max, s"codec $id")
    }
  }

  // ---- float-in-long codecs (ALP + TZ-FOR) ----

  private def bitsOf(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("alp: 2-decimal prices select alp, round-trip bit-exact, ~4x smaller than FOR") {
    val r = new scala.util.Random(7)
    // TPC-H-style extendedprice: cents/100.0 — the decimal sweet spot
    val prices = Array.fill(4096)(bitsOf((90000 + r.nextInt(9000000)).toLong / 100.0))
    val blob = Codecs.encodeLongs(prices)
    assert(Codecs.codecOf(blob) === "alp")
    assert(Codecs.decodeLongs(blob).toSeq === prices.toSeq)
    // round(d*100) < 10^5..10^7 → ~27-bit FOR body vs 64-bit bit patterns
    assert(blob.length < 4096 * 8 / 2, s"alp blob ${blob.length} bytes")
    // probe kernels: decode-fallback answers are exact
    val target = prices(17)
    val n = prices.count(_ == target).toLong
    assert(Codecs.countEqLong(blob, target) === n)
    val (lo, hi) = Codecs.rangeOfLong(blob)
    assert(lo <= prices.min && hi >= prices.max)
    val st = Codecs.statsOfLong(blob)
    assert(st.min === prices.min && st.max === prices.max && st.count === 4096L)
  }

  test("alp: exceptions patch bit-exactly (NaN, infinity, irrational outliers)") {
    val r = new scala.util.Random(11)
    val vs = Array.fill(1024)(bitsOf(r.nextInt(100000) / 100.0))
    // anomalies away from the gate/sample stride positions
    vs(3) = bitsOf(Double.NaN)
    vs(7) = bitsOf(Double.PositiveInfinity)
    vs(33) = bitsOf(math.Pi)
    vs(65) = bitsOf(1.0 / 3.0)
    vs(129) = bitsOf(-0.0)
    val blob = Codecs.encodeLongsAs(vs, Codecs.AlpLong)
    assert(Codecs.codecOf(blob) === "alp")
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq) // incl. the NaN bit pattern
  }

  test("alp: never misfires on genuine longs or timestamps; forced encode throws") {
    val ids = Array.tabulate(2048)(i => 1000000L + i * 7)
    assert(Codecs.codecOf(Codecs.encodeLongs(ids)) !== "alp")
    val micros = Array.tabulate(2048)(i => 1700000000000000L + i * 1000000L)
    assert(Codecs.codecOf(Codecs.encodeLongs(micros)) !== "alp")
    intercept[IllegalArgumentException] { Codecs.encodeLongsAs(ids, Codecs.AlpLong) }
  }

  test("tzfor: float-upcast doubles (non-decimal mantissas) beat FOR's 64-bit wall") {
    val r = new scala.util.Random(13)
    // embedding-like floats in [-1,1): as doubles the low 29 mantissa bits are
    // zero but the values are NOT decimal (alp's 10^e test fails at e<=14)
    val vs = Array.fill(4096)(bitsOf((r.nextFloat() * 2f - 1f).toDouble))
    val blob = Codecs.encodeLongs(vs)
    assert(Codecs.codecOf(blob) === "tzfor", s"picked ${Codecs.codecOf(blob)}")
    assert(Codecs.decodeLongs(blob).toSeq === vs.toSeq)
    assert(blob.length < 4096L * 64 / 8 * 6 / 10, s"tzfor blob ${blob.length} bytes") // ≥40% saved
    // equality zone skip: a target without the common trailing zeros is
    // rejected from the header alone
    assert(Codecs.countEqLong(blob, 1L) === 0L)
    assert(Codecs.countEqLong(blob, vs(5)) >= 1L)
    assert(Codecs.countBetweenLong(blob, vs(5), vs(5)) >= 1L)
    val (lo, hi) = Codecs.rangeOfLong(blob)
    assert(lo <= vs.min && hi >= vs.max)
  }

  test("tzfor: forced round-trip on shifted integers and sign-bit patterns") {
    val evens = Array.tabulate(512)(i => (i * 8).toLong)
    assert(Codecs.decodeLongs(Codecs.encodeLongsAs(evens, Codecs.TzForId)).toSeq === evens.toSeq)
    val r = new scala.util.Random(17)
    val mixed = Array.fill(512)(r.nextLong() << 20) // random incl. negatives, tz=20
    assert(Codecs.decodeLongs(Codecs.encodeLongsAs(mixed, Codecs.TzForId)).toSeq === mixed.toSeq)
    intercept[IllegalArgumentException] { // odd values: no common trailing zeros
      Codecs.encodeLongsAs(Array(1L, 2L, 3L), Codecs.TzForId)
    }
  }

  test("alp/tzfor: auto round-trips stay exact under the full selector race") {
    val r = new scala.util.Random(19)
    rt(Array.fill(777)(bitsOf(r.nextInt(1000) / 10.0)))           // alp e=1
    rt(Array.fill(777)(bitsOf(r.nextFloat().toDouble)))           // tzfor
    rt(Array.fill(777)(bitsOf(r.nextDouble())))                   // raw-entropy doubles
    rt(Array.tabulate(777)(i => bitsOf(i / 1000.0)))              // alp e=3, sorted
    rt(Array.fill(9)(bitsOf(0.25)))                               // const wins
  }
}
