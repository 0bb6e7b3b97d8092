package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style web page row (the north-rule input table:
  * url string, warc_ts timestamp, html binary, text string, lang string). */
case class WebDoc(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
                  text: String, lang: String)

/** Deterministic synthetic WebDoc generator (FIXTURES.md §2): pure function
  * of the row id — no wall clock, no unseeded RNG — so the same table is
  * reproduced at any parallelism, which the verification joins and the
  * two-parallelism scaling bench rely on. Zipf-skewed hosts model the real
  * web's host distribution (the skew the pipeline's salting must handle).
  */
object WebDocGen {
  final val Seed = 0x9e3779b97f4a7c15L
  final val BaseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
  final val StepMicros = 1000L
  final val JitterMicros = 50000L
  final val Hosts = 997

  /** splitmix64 (delegates to the core mixer — the library must not depend
    * on this test-data generator package). */
  @inline def mix(x0: Long): Long = graft.core.Bits.mix(x0)

  private val langs = Array("en", "de", "fr", "es", "zh", "ja", "ru")
  // cumulative permille: en 60%, de 15%, fr 10%, es 8%, zh 4%, ja 2%, ru 1%
  private val langCum = Array(600, 750, 850, 930, 970, 990, 1000)

  private val vocab: Array[String] = (
    "the of and to in is was for on that with as by at from it an be this are or " +
      "which has had were their one all we can more data page web site news about " +
      "time year people world over new other into out up down work life just like " +
      "make know take see come think look want give use find tell ask seem feel try " +
      "leave call good great small large long little own old right big high low " +
      "different early young important few public bad same able market value price " +
      "report system service product company business customer online free search " +
      "home contact privacy policy terms copyright reserved share follow read next"
    ).split("\\s+")

  private val nonAscii = Array("日本語のテキスト", "données françaises", "señal española",
    "русский текст", "中文内容")

  def lang(i: Long): String = {
    val r = (mix(i ^ Seed ^ 0x1111L) >>> 11) % 1000
    var k = 0
    while (langCum(k) <= r) k += 1
    langs(k)
  }

  def host(i: Long): Int = {
    // u^3 concentrates mass near 0: top hosts dominate (Zipf-ish skew)
    val u = ((mix(i ^ Seed) >>> 11).toDouble / (1L << 53).toDouble)
    (u * u * u * Hosts).toInt.min(Hosts - 1)
  }

  def url(i: Long): String = s"https://www.host${host(i)}.example.com/p/$i"

  def tsMicros(i: Long): Long =
    BaseMicros + i * StepMicros + java.lang.Long.remainderUnsigned(mix(i ^ Seed ^ 0x2222L), JitterMicros)

  def text(i: Long): String = {
    var h = mix(i ^ Seed ^ 0x3333L)
    val nWords = 30 + (java.lang.Long.remainderUnsigned(h, 90L)).toInt
    val sb = new java.lang.StringBuilder(nWords * 6)
    var k = 0
    while (k < nWords) {
      h = mix(h)
      // squared pick skews toward low indices: Zipf-ish word frequencies
      val u = (h >>> 11).toDouble / (1L << 53).toDouble
      val w = vocab(((u * u) * vocab.length).toInt.min(vocab.length - 1))
      if (k > 0) sb.append(' ')
      sb.append(w)
      k += 1
    }
    if (java.lang.Long.remainderUnsigned(mix(h), 100L) == 0)
      sb.append(' ').append(nonAscii((java.lang.Long.remainderUnsigned(h, nonAscii.length.toLong)).toInt))
    sb.toString
  }

  def html(i: Long, textVal: String): Array[Byte] =
    (s"<html><head><title>page $i</title></head><body><p>" + textVal +
      "</p></body></html>").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def microsToTimestamp(micros: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))

  def make(i: Long): WebDoc = {
    val t = text(i)
    WebDoc(url(i), microsToTimestamp(tsMicros(i)), html(i, t), t, lang(i))
  }

  /** the synthetic table as a typed Dataset, `partitions`-way parallel */
  def dataset(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[WebDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => make(i))
  }
}
