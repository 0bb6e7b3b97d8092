package graft

import graft.core.{BitPack, Codecs, Fsst, LaneSpec}

/** Single-thread kernel micro-benchmark — the analog of the reference's
  * Google-Benchmark harness (tests/pint_bench.cpp: items/sec over 100M random
  * pairs). Reports MB/s per codec kernel so per-core throughput can be
  * compared against pint's SWAR loops and scaled to cluster width.
  *
  * Run: sbt "runMain graft.KernelBench [sizeMB]"
  */
object KernelBench {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def bench(name: String, bytes: Long, reps: Int)(f: => Unit): Unit = {
    f // warmup
    val (_, s) = time((1 to reps).foreach(_ => f))
    println(f"$name%-28s ${bytes * reps / s / 1e6}%10.1f MB/s")
  }

  def main(args: Array[String]): Unit = {
    val sizeMB = if (args.nonEmpty) args(0).toInt else 64
    val n = sizeMB * 1024 * 1024 / 8
    val rnd = new scala.util.Random(42)

    // SWAR add_wrap over packed words — pint's own headline benchmark
    val spec = LaneSpec(8, 8, 8, 8)
    val wordsA = Array.fill(n)(rnd.nextLong() & spec.fullMask)
    val wordsB = Array.fill(n)(rnd.nextLong() & spec.fullMask)
    bench("swar add_wrap 4x8", n * 8L, 4) {
      var acc = 0L
      var i = 0
      while (i < n) { acc ^= spec.addWrap(wordsA(i), wordsB(i)); i += 1 }
      if (acc == 42L) println("") // defeat DCE
    }
    bench("swar add_sat_u 4x8", n * 8L, 4) {
      var acc = 0L
      var i = 0
      while (i < n) { acc ^= spec.addSatU(wordsA(i), wordsB(i)); i += 1 }
      if (acc == 42L) println("")
    }

    // block bit-pack at a representative width
    val vals20 = Array.fill(n)(rnd.nextLong() & BitPack.maskFor(20))
    bench("bitpack pack w=20", n * 8L, 4) { BitPack.pack(vals20, 20) }
    val packed20 = BitPack.pack(vals20, 20)
    bench("bitpack unpack w=20", n * 8L, 4) { BitPack.unpack(packed20, 20, n) }

    // FoR/delta on sorted timestamps
    var t = 1700000000000000L
    val ts = Array.fill(n) { t += 1000 + rnd.nextInt(64); t }
    bench("delta encode (ts)", n * 8L, 4) { Codecs.encodeLongsAs(ts, Codecs.DeltaId) }
    val deltaBlob = Codecs.encodeLongsAs(ts, Codecs.DeltaId)
    bench("delta decode (ts)", n * 8L, 4) { Codecs.decodeLongs(deltaBlob) }
    bench("auto-select longs", n * 8L, 4) { Codecs.encodeLongs(ts) }

    // float-in-long codecs: alp on 2-decimal prices, tzfor on float upcasts
    val prices = Array.fill(n)(java.lang.Double.doubleToRawLongBits(
      (90000 + rnd.nextInt(9000000)).toLong / 100.0))
    bench("alp encode (prices)", n * 8L, 4) { Codecs.encodeLongsAs(prices, Codecs.AlpLong) }
    val alpBlob = Codecs.encodeLongsAs(prices, Codecs.AlpLong)
    println(f"alp ratio (prices)           ${n * 8.0 / alpBlob.length}%10.2fx")
    bench("alp decode (prices)", n * 8L, 4) { Codecs.decodeLongs(alpBlob) }
    val floats = Array.fill(n)(java.lang.Double.doubleToRawLongBits(
      (rnd.nextFloat() * 2f - 1f).toDouble))
    bench("tzfor encode (floats)", n * 8L, 4) { Codecs.encodeLongsAs(floats, Codecs.TzForId) }
    val tzBlob = Codecs.encodeLongsAs(floats, Codecs.TzForId)
    println(f"tzfor ratio (floats)         ${n * 8.0 / tzBlob.length}%10.2fx")
    bench("tzfor decode (floats)", n * 8L, 4) { Codecs.decodeLongs(tzBlob) }
    bench("auto-select doubles", n * 8L, 4) { Codecs.encodeLongs(prices) }

    // dict on low-cardinality strings
    val langs = Array("en", "de", "fr", "es", "zh", "ja", "pt", "ru")
    val strN = n / 8
    val strs = Array.fill(strN)(langs(rnd.nextInt(langs.length)).getBytes("UTF-8"))
    val strBytes = strs.map(_.length.toLong).sum
    bench("dict encode (lang)", strBytes, 4) { Codecs.encodeStrsAs(strs, Codecs.DictId) }
    val dictBlob = Codecs.encodeStrsAs(strs, Codecs.DictId)
    bench("dict decode (lang)", strBytes, 4) { Codecs.decodeStrs(dictBlob) }
    bench("dict decode VIEW (lang)", strBytes, 4) { Codecs.decodeStrsView(dictBlob) }

    // FSST on English-like text
    val words = ("the of and to in is was for on that with as by at from it an be this are " +
      "which has had were their one all data page web site news about time year").split(" ")
    val sb = new StringBuilder
    while (sb.length < sizeMB * 1024 * 1024 / 8) {
      sb.append(words(rnd.nextInt(words.length))).append(' ')
    }
    val textRows: Array[Array[Byte]] = sb.toString.grouped(400).map(_.getBytes("UTF-8")).toArray
    val textBytes = textRows.map(_.length.toLong).sum
    bench("fsst encode (text)", textBytes, 2) { Codecs.encodeStrsAs(textRows, Codecs.FsstId) }
    val fsstBlob = Codecs.encodeStrsAs(textRows, Codecs.FsstId)
    println(f"fsst ratio                   ${textBytes.toDouble / fsstBlob.length}%10.2fx")
    bench("fsst decode (text)", textBytes, 4) { Codecs.decodeStrs(fsstBlob) }
    bench("fsst decode VIEW (text)", textBytes, 4) { Codecs.decodeStrsView(fsstBlob) }
    // raw strings: the view is pure offset arithmetic over the blob
    val rawBlob = Codecs.encodeStrsAs(textRows, Codecs.RawStr)
    bench("raw decode (text)", textBytes, 4) { Codecs.decodeStrs(rawBlob) }
    bench("raw decode VIEW (text)", textBytes, 4) { Codecs.decodeStrsView(rawBlob) }

    // front coding on sorted urls (the e_url shape: sortWithinPartitions on key)
    val urlRows: Array[Array[Byte]] = (0 until strN)
      .map(i => s"https://host-${i % 97}.example.com/section-${i / 512}/page-$i.html")
      .sorted.map(_.getBytes("UTF-8")).toArray
    val urlBytes = urlRows.map(_.length.toLong).sum
    bench("prefix encode (urls)", urlBytes, 4) { Codecs.encodeStrsAs(urlRows, Codecs.PrefixStr) }
    val pfxBlob = Codecs.encodeStrsAs(urlRows, Codecs.PrefixStr)
    println(f"prefix ratio (urls)          ${urlBytes.toDouble / pfxBlob.length}%10.2fx")
    bench("prefix decode (urls)", urlBytes, 4) { Codecs.decodeStrs(pfxBlob) }
    bench("prefix decode VIEW (urls)", urlBytes, 4) { Codecs.decodeStrsView(pfxBlob) }

    // encode-side block assembly (NEXT item 2 measurement): the BlockIterator
    // copies each binary value out of the UnsafeRow page (row.getBinary =
    // one allocation + memcpy per value). Compare that against (a) a bulk
    // arena copy of the same bytes and (b) the cheapest string encoders, to
    // size the headroom an arena/span refactor could recover.
    {
      // a fake row page: values packed back-to-back, like UnsafeRow payloads
      val page = new Array[Byte](textBytes.toInt)
      val offs = new Array[Int](textRows.length + 1)
      var o = 0
      for (i <- textRows.indices) {
        System.arraycopy(textRows(i), 0, page, o, textRows(i).length)
        offs(i) = o; o += textRows(i).length
      }
      offs(textRows.length) = o
      val out = new Array[Array[Byte]](textRows.length)
      bench("assembly copy/value (text)", textBytes, 8) {
        var i = 0
        while (i < textRows.length) {
          val len = offs(i + 1) - offs(i)
          val a = new Array[Byte](len)
          System.arraycopy(page, offs(i), a, 0, len)
          out(i) = a
          i += 1
        }
      }
      val arena = new Array[Byte](textBytes.toInt)
      bench("assembly arena copy (text)", textBytes, 8) {
        System.arraycopy(page, 0, arena, 0, page.length)
      }
      // the short-value shape (lang dict column): per-value alloc overhead
      // dominates relative to the 2-byte payloads
      val pageS = new Array[Byte](strBytes.toInt)
      val offsS = new Array[Int](strs.length + 1)
      o = 0
      for (i <- strs.indices) {
        System.arraycopy(strs(i), 0, pageS, o, strs(i).length)
        offsS(i) = o; o += strs(i).length
      }
      offsS(strs.length) = o
      val outS = new Array[Array[Byte]](strs.length)
      bench("assembly copy/value (lang)", strBytes, 8) {
        var i = 0
        while (i < strs.length) {
          val len = offsS(i + 1) - offsS(i)
          val a = new Array[Byte](len)
          System.arraycopy(pageS, offsS(i), a, 0, len)
          outS(i) = a
          i += 1
        }
      }
    }

    // transparent compressed-page layer over the WINNING blob (zstd default,
    // legacy DEFLATE readable): wrap/unwrap throughput and residual ratio on
    // the FSST-compressed webtext page — the measurement behind PageLevel
    // and the zstd-over-DEFLATE decision. Throughput is normalized to INNER
    // (pre-page) bytes: that is the rate the page stage adds to the
    // per-core encode/decode budget.
    {
      val inner = fsstBlob
      for (lvl <- Seq(1, 3, 6)) {
        val wrapped = Codecs.pageWrapZstdAt(inner, lvl)
        val extra = inner.length.toDouble / wrapped.length
        bench(f"page zstd wrap L$lvl (fsst)", inner.length.toLong, 4) {
          Codecs.pageWrapZstdAt(inner, lvl)
        }
        println(f"page zstd ratio L$lvl          ${extra}%10.2fx")
      }
      val zlibWrapped = Codecs.pageWrapAt(inner, 3)
      bench("page ZLIB wrap L3 (fsst)", inner.length.toLong, 4) {
        Codecs.pageWrapAt(inner, 3)
      }
      println(f"page ZLIB ratio L3          ${inner.length.toDouble / zlibWrapped.length}%10.2fx")
      val wrappedDef = Codecs.pageWrapZstdAt(inner, Codecs.PageLevel)
      // cold inflate (what the first probe of a blob pays) vs the memo hit
      // (what each FURTHER kernel over the same blob pays — a memcmp)
      bench("page inflate COLD (zstd)", inner.length.toLong, 4) {
        Codecs.pageInflate(wrappedDef)
      }
      bench("page inflate COLD (zlib)", inner.length.toLong, 4) {
        Codecs.pageInflate(zlibWrapped)
      }
      bench("page unwrap MEMO", inner.length.toLong, 4) {
        Codecs.pageUnwrap(wrappedDef)
      }
      // end-to-end string decode through the page (what readers actually pay)
      val pagedFsst = Codecs.pageWrap(fsstBlob)
      bench("fsst decode PAGED (text)", textBytes, 4) { Codecs.decodeStrs(pagedFsst) }
      bench("fsst view PAGED (text)", textBytes, 4) { Codecs.decodeStrsView(pagedFsst) }
    }

    // raw FSST kernel on one big buffer (no per-row framing)
    val big = sb.toString.getBytes("UTF-8")
    val table = Fsst.train(java.util.Arrays.copyOf(big, 1 << 14))
    bench("fsst compress (flat)", big.length.toLong, 2) { table.compress(big) }
    val comp = table.compress(big)
    bench("fsst decompress (flat)", big.length.toLong, 4) { table.decompress(comp, 0, comp.length) }
  }
}
