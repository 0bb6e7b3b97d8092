package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Shared (per-partition) dictionary codec: blobs carry packed rebased codes
  * + a content id; the dictionary itself lives outside the blob (manifest
  * side-structure / JVM registry). Covers encode competition vs inline,
  * registry-resolved decode, header-only bounds, kernel pushdown
  * (countEq/countBetween/rangeOf), and the loud-failure path. */
class SharedDictSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")
  private def cmp(a: Array[Byte], c: Array[Byte]): Int = java.util.Arrays.compareUnsigned(a, c)

  private def mkDict(values: Seq[String]): Codecs.DictTable = {
    val vs = values.distinct.map(b).toArray
    java.util.Arrays.sort(vs, (x: Array[Byte], y: Array[Byte]) => cmp(x, y))
    new Codecs.DictTable(vs)
  }

  // host-like values: where shared dictionaries actually pay (the inline
  // dictionary would repeat ~170 bytes per block)
  private val hosts = (0 until 8).map(i => s"www.host$i.example.com")
  private val dict = mkDict(hosts)
  private val dictId = Codecs.dictContentId(dict.values)

  // deterministic pseudo-random block over the dictionary, with runs
  private def block(n: Int, nulls: Boolean): Array[Array[Byte]] = {
    val r = new scala.util.Random(42)
    Array.tabulate(n) { i =>
      if (nulls && i % 17 == 0) null
      else b(hosts(if (i % 13 < 7) 2 else r.nextInt(hosts.length)))
    }
  }

  test("shared encode beats inline on host-like blocks and round-trips via registry") {
    val vs = block(512, nulls = false)
    val (shared, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    val (inline, _) = Codecs.encodeStrsN(vs, null)
    assert(Codecs.codecOf(shared).startsWith("shared"), Codecs.codecOf(shared))
    assert(shared.length < inline.length)
    Codecs.registerDict(dictId, dict)
    val back = Codecs.decodeStrsN(shared)
    assert(back.length === vs.length)
    vs.indices.foreach(i => assert(java.util.Arrays.equals(back(i), vs(i))))
    // slice-view decode agrees byte for byte
    val view = Codecs.decodeStrsView(shared)
    vs.indices.foreach { i =>
      val got = java.util.Arrays.copyOfRange(view.buf, view.offs(i), view.offs(i) + view.lens(i))
      assert(java.util.Arrays.equals(got, vs(i)))
    }
  }

  test("inline stays smaller for tiny dictionaries and auto-select keeps it") {
    // 2 two-byte values: the inline rle_dict is a handful of bytes; the
    // 22-byte shared header cannot win — competition must pick inline
    val tiny = mkDict(Seq("dd", "ee"))
    val tinyId = Codecs.dictContentId(tiny.values)
    val vs = (Array.fill(100)(b("ee")) ++ Array.fill(100)(b("dd")))
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, tinyId, tiny)
    assert(!Codecs.codecOf(blob).startsWith("shared"), Codecs.codecOf(blob))
    val back = Codecs.decodeStrsN(blob) // decodes with no registry involved
    vs.indices.foreach(i => assert(java.util.Arrays.equals(back(i), vs(i))))
  }

  test("null-wrapped shared blobs round-trip nulls in place") {
    val vs = block(300, nulls = true)
    Codecs.registerDict(dictId, dict)
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    val back = Codecs.decodeStrsN(blob)
    vs.indices.foreach { i =>
      if (vs(i) == null) assert(back(i) == null)
      else assert(java.util.Arrays.equals(back(i), vs(i)))
    }
  }

  test("a value missing from the dictionary falls back to self-describing inline") {
    val vs = block(64, nulls = false)
    vs(10) = b("not-in-the-dictionary")
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    assert(!Codecs.codecOf(blob).startsWith("shared"))
    // decodes with NO registry/resolver involvement
    val back = Codecs.decodeStrsN(blob)
    vs.indices.foreach(i => assert(java.util.Arrays.equals(back(i), vs(i))))
  }

  test("unregistered dictionary fails loudly, never corrupts") {
    val privDict = mkDict((0 until 6).map(i => s"unregistered-$i.priv.example.org"))
    val privId = Codecs.dictContentId(privDict.values) ^ 0x5a5a5a5aL // wrong id on purpose
    val vs = Array.tabulate(256)(i => privDict.values(i % 6))
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, privId, privDict)
    assert(Codecs.codecOf(blob).startsWith("shared"), Codecs.codecOf(blob))
    val e = intercept[IllegalArgumentException](Codecs.decodeStrsN(blob))
    assert(e.getMessage.contains("shared dictionary"))
  }

  test("countEqStr on shared blobs: present, absent, and zone-rejected targets") {
    Codecs.registerDict(dictId, dict)
    val vs = block(1000, nulls = false)
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    assert(Codecs.codecOf(blob).startsWith("shared"))
    hosts.foreach { h =>
      val expect = vs.count(v => java.util.Arrays.equals(v, b(h)))
      assert(Codecs.countEqStr(blob, b(h)) === expect.toLong, h)
    }
    // absent but inside bounds
    assert(Codecs.countEqStr(blob, b("www.host3.example.con")) === 0L)
    // zone-rejected (outside inline bounds — resolved with NO dictionary,
    // verified by probing a blob whose dict id is junk)
    // dict_id lives at offset 5..12 of the PLAIN layout; unwrap the page
    // layer first (kernels accept plain blobs unchanged), then flip a byte
    // → unresolvable
    val junk = Codecs.pageUnwrap(blob).clone()
    junk(6) = (junk(6) ^ 0x7f).toByte
    assert(Codecs.countEqStr(junk, b("zzz")) === 0L) // > hi, rejected pre-resolve
    assert(Codecs.countEqStr(junk, b("a")) === 0L)   // < lo, rejected pre-resolve
  }

  test("countBetweenStr on shared blobs: interval, zone accept, zone reject, exclusivity") {
    Codecs.registerDict(dictId, dict)
    val vs = block(1000, nulls = false)
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    assert(Codecs.codecOf(blob).startsWith("shared"))
    def truth(lo: String, loInc: Boolean, hi: String, hiInc: Boolean): Long =
      vs.count { v =>
        val okLo = lo == null || { val c = cmp(v, b(lo)); c > 0 || (loInc && c == 0) }
        val okHi = hi == null || { val c = cmp(v, b(hi)); c < 0 || (hiInc && c == 0) }
        okLo && okHi
      }.toLong
    def got(lo: String, loInc: Boolean, hi: String, hiInc: Boolean): Long =
      Codecs.countBetweenStr(blob, if (lo == null) null else b(lo), loInc,
        if (hi == null) null else b(hi), hiInc)
    val cases = Seq(
      ("www.host2.example.com", true, "www.host5.example.com", true),
      ("www.host2.example.com", false, "www.host5.example.com", false),
      ("a", true, "zzz", true),               // zone accept: whole block
      ("www.host0.example.com", true, null, true),
      (null, true, "www.host3.example.com", false),
      ("x", true, "z", true),                 // zone reject: above all values
      ("a", true, "b", true))                 // zone reject: below all values
    cases.foreach { case (lo, li, hi, hi2) =>
      assert(got(lo, li, hi, hi2) === truth(lo, li, hi, hi2), s"[$lo,$hi]")
    }
  }

  test("rangeOfStr answers from the inline header bounds without resolution") {
    val privDict = mkDict((0 until 6).map(i => s"range-probe-$i.priv.example.org"))
    val privId = Codecs.dictContentId(privDict.values) ^ 0x1234L // unresolvable on purpose
    val lo3 = privDict.values(1); val hi4 = privDict.values(4)
    val vs = Array.tabulate(200)(i => privDict.values(1 + i % 4)) // codes 1..4 only
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, privId, privDict)
    assert(Codecs.codecOf(blob).startsWith("shared"), Codecs.codecOf(blob))
    val (lo, hi) = Codecs.rangeOfStr(blob)
    // sound truncated bounds: lo <= min value, hi >= max value (unsigned)
    assert(cmp(lo, lo3) <= 0)
    assert(hi == null || cmp(hi, hi4) >= 0)
    // and tight: lo within 16-byte truncation of the true min
    assert(cmp(lo, java.util.Arrays.copyOf(lo3, 16)) === 0)
  }

  test("block bounds reflect the block's code interval, not the whole dictionary") {
    Codecs.registerDict(dictId, dict)
    // block touching only hosts 3..5 of the 0..7 dictionary
    val vs = Array.tabulate(256)(i => b(hosts(3 + i % 3)))
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    assert(Codecs.codecOf(blob).startsWith("shared"))
    val (lo, hi) = Codecs.rangeOfStr(blob)
    assert(cmp(lo, b(hosts(3))) <= 0 && cmp(lo, b(hosts(2))) > 0)
    assert(hi != null && cmp(hi, b(hosts(5))) >= 0 && cmp(hi, b(hosts(6))) < 0)
    // zone reject outside the BLOCK's range even though the dict covers it
    assert(Codecs.countEqStr(blob, b(hosts(0))) === 0L)
    assert(Codecs.countEqStr(blob, b(hosts(7))) === 0L)
  }
}
