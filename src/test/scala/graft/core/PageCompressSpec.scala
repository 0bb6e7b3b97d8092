package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** The transparent compressed-page layer (zstd default, legacy DEFLATE
  * readable): blobs produced by the storage-finalizing encoders carry an
  * outermost compressed page when it saves ≥1/16 of the bytes; every
  * consumer unwraps at entry, so decode, views, zone kernels and stats
  * behave identically on wrapped and plain blobs (the Parquet
  * encoding-vs-page-compression separation). */
class PageCompressSpec extends AnyFunSuite {

  private val words = Array("the", "of", "and", "data", "page", "web", "report",
    "system", "service", "market", "value", "customer", "online", "search")

  private def texts(n: Int): Array[Array[Byte]] = {
    var h = 0x12345L
    Array.tabulate(n) { i =>
      val sb = new StringBuilder
      var k = 0
      while (k < 40) {
        h = graft.core.Bits.mix(h + i)
        sb.append(words(((h >>> 7) % words.length).toInt.abs)).append(' ')
        k += 1
      }
      sb.toString.getBytes(UTF_8)
    }
  }

  test("string page: compressible FSST block wraps, round-trips, reports inner codec") {
    val vs = texts(2048)
    val (blob, _) = Codecs.encodeStrsN(vs)
    assert(Codecs.isPageCompressed(blob), "expected the page layer on Zipf text")
    assert(Codecs.codecOf(blob) === "fsst") // transparent: inner codec reported
    val dec = Codecs.decodeStrsN(blob)
    assert(dec.length === vs.length)
    var i = 0
    while (i < vs.length) {
      assert(java.util.Arrays.equals(dec(i), vs(i)), s"row $i")
      i += 1
    }
  }

  test("string page: slice views and zone kernels see through the page") {
    val vs = texts(1024)
    val (blob, _) = Codecs.encodeStrsN(vs)
    assert(Codecs.isPageCompressed(blob))
    // views
    val v = Codecs.decodeStrsView(blob)
    assert(v.n === 1024)
    val s0 = java.util.Arrays.copyOfRange(v.buf, v.offs(0), v.offs(0) + v.lens(0))
    assert(java.util.Arrays.equals(s0, vs(0)))
    // encoded-domain kernels
    val target = vs(7)
    val expect = vs.count(java.util.Arrays.equals(_, target)).toLong
    assert(Codecs.countEqStr(blob, target) === expect)
    val lo = "a".getBytes(UTF_8); val hi = "zzzz".getBytes(UTF_8)
    assert(Codecs.countBetweenStr(blob, lo, true, hi, true) === 1024L)
    assert(Codecs.nullCountOf(blob) === 0L)
    val (rLo, rHi) = Codecs.rangeOfStr(blob)
    assert(java.util.Arrays.compareUnsigned(rLo, rHi) <= 0)
  }

  test("long page: null-wrapped delta block wraps and round-trips with stats") {
    val n = 4096
    val vs = Array.tabulate(n)(i => 1700000000000000L + i * 1000L)
    val nulls = Array.tabulate(n)(i => i % 7 == 0)
    val blob = Codecs.encodeLongsN(vs, nulls)
    assert(Codecs.isPageCompressed(blob))
    assert(Codecs.codecOf(blob).endsWith("+nulls"))
    val (dec, isNull) = Codecs.decodeLongsN(blob)
    var i = 0
    while (i < n) {
      assert(isNull(i) === nulls(i))
      if (!nulls(i)) assert(dec(i) === vs(i))
      i += 1
    }
    assert(Codecs.nullCountOf(blob) === nulls.count(identity).toLong)
    val st = Codecs.statsOfLong(blob)
    assert(st.min === vs(1) && st.count === (n - nulls.count(identity)).toLong)
    assert(Codecs.countBetweenLong(blob, vs(1), vs(1)) === 1L)
  }

  test("page wrap is idempotent and declines incompressible or tiny blobs") {
    val vs = texts(512)
    val (blob, _) = Codecs.encodeStrsN(vs)
    assert(Codecs.pageWrap(blob) eq blob) // already wrapped: identity
    // high-entropy bytes: deflate cannot save 1/16 — blob stays plain
    val rnd = new java.util.Random(7)
    val noise = Array.fill(256) { val b = new Array[Byte](48); rnd.nextBytes(b); b }
    val (nb, _) = Codecs.encodeStrsN(noise)
    assert(!Codecs.isPageCompressed(nb), Codecs.codecOf(nb))
    assert(Codecs.decodeStrsN(nb).length === 256)
    // tiny blobs are never worth a page
    val (tiny, _) = Codecs.encodeStrsN(Array("a".getBytes(UTF_8)))
    assert(!Codecs.isPageCompressed(tiny))
  }

  test("legacy DEFLATE pages (the pre-zstd writer era) still decode") {
    val vs = texts(1024)
    val (zstdBlob, _) = Codecs.encodeStrsN(vs)
    assert((zstdBlob(0) & 0xff) === Codecs.PageZstd) // current writer = zstd
    val inner = Codecs.pageUnwrap(zstdBlob)
    val zlibBlob = Codecs.pageWrapAt(inner, 6) // what the DEFLATE era wrote
    assert((zlibBlob(0) & 0xff) === Codecs.PageZlib)
    assert(Codecs.isPageCompressed(zlibBlob))
    assert(Codecs.codecOf(zlibBlob) === "fsst")
    val dec = Codecs.decodeStrsN(zlibBlob)
    var i = 0
    while (i < vs.length) {
      assert(java.util.Arrays.equals(dec(i), vs(i)), s"row $i")
      i += 1
    }
    // zone kernels see through the legacy page too
    assert(Codecs.countBetweenStr(zlibBlob, "a".getBytes(UTF_8), true,
      "zzzz".getBytes(UTF_8), true) === 1024L)
  }

  test("corrupt page headers fail loudly, not silently") {
    val vs = texts(1024)
    val (blob, _) = Codecs.encodeStrsN(vs)
    assert(Codecs.isPageCompressed(blob))
    val shortBlob = java.util.Arrays.copyOf(blob, 3)
    intercept[IllegalArgumentException](Codecs.decodeStrsN(shortBlob))
    val badLen = blob.clone()
    badLen(1) = -1; badLen(2) = -1; badLen(3) = -1; badLen(4) = -1 // innerLen = -1
    intercept[IllegalArgumentException](Codecs.decodeStrsN(badLen))
    val truncated = java.util.Arrays.copyOf(blob, blob.length / 2)
    intercept[Exception](Codecs.decodeStrsN(truncated))
  }

  test("shared-dict blobs page-compress and resolve through the registry") {
    // host-like values (where shared dictionaries pay; 2-byte langs lose
    // the size competition to the inline dict)
    val hosts = (0 until 8).map(i => s"www.host$i.example.com")
    val sorted = hosts.map(_.getBytes(UTF_8)).toArray
    java.util.Arrays.sort(sorted,
      (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.compareUnsigned(x, y))
    val dict = new Codecs.DictTable(sorted)
    val dictId = Codecs.dictContentId(dict.values)
    val vs = Array.tabulate(4096)(i => hosts(i % hosts.length).getBytes(UTF_8))
    val (blob, _) = Codecs.encodeStrsNSharedOpt(vs, null, dictId, dict)
    assert(Codecs.codecOf(blob).startsWith("shared"), Codecs.codecOf(blob))
    Codecs.registerDicts(Map(dictId -> dict))
    val dec = Codecs.decodeStrsN(blob)
    assert(new String(dec(3), UTF_8) === hosts(3))
    assert(Codecs.countEqStr(blob, hosts(1).getBytes(UTF_8)) ===
      vs.count(v => new String(v, UTF_8) == hosts(1)).toLong)
  }
}
