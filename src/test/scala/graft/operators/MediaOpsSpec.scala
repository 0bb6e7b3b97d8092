package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Multimodal plumbing tests: schemas, expressions, batch shape, determinism.
  * (Pixel decode is a documented stub — what's tested is the Spark-side
  * contract a real codec would plug into.) */
class MediaOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("WAV codec: encode→decode round-trips samples bit-identically") {
    val samples = MediaOps.seededPcm(0xFEEDL, 1000)
    val wav = Wav.encode(16000, 2, samples)
    assert(Wav.isWav(wav))
    val (rate, ch, back) = Wav.decode(wav)
    assert(rate === 16000 && ch === 2)
    assert(back.toSeq === samples.toSeq)
    // unknown chunks (LIST) are skipped per the RIFF spec: splice one in
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = wav.take(12) ++ listChunk ++ wav.drop(12)
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
    val (r2, c2, s2) = Wav.decode(spliced)
    assert(r2 === 16000 && c2 === 2 && s2.toSeq === samples.toSeq)
    // malformed payloads are rejected with a clear message, not an AIOOBE
    intercept[IllegalArgumentException] { Wav.decode(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] { Wav.decode(wav.take(50)) } // truncated data chunk
  }

  test("WAV resample keeps channels and scales frame count") {
    val samples = MediaOps.seededPcm(7L, 800) // 400 stereo frames
    val out = Wav.resample(samples, 2, 16000, 4000)
    assert(out.length === 100 * 2) // 400 frames * 4000/16000 = 100 frames
    // frame f maps to source frame f*4: channels stay aligned
    assert(out(0) === samples(0) && out(1) === samples(1))
    assert(out(2) === samples(8) && out(3) === samples(9))
  }

  test("audio expressions: meta, checksum, resample over the synthetic table") {
    val df = MediaOps.fakeAudioTable(spark, 50, 4)
    val m = df.select(MediaOps.audio_meta($"payload").as("m"))
      .select($"m.valid", $"m.sample_rate", $"m.channels", $"m.n_samples").collect()
    assert(m.length === 50)
    assert(m.forall(_.getBoolean(0)))
    assert(m.forall(r => Seq(8000, 16000).contains(r.getInt(1))))
    // checksum is deterministic and content-derived
    val a = df.select(MediaOps.sample_checksum($"payload").as("ck")).as[Long].collect()
    val b = df.select(MediaOps.sample_checksum($"payload").as("ck")).as[Long].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.distinct.length > 40) // different clips, different sums
    // resample rewrites the header and the checksum changes with content
    val rm = df.select(MediaOps.audio_meta(MediaOps.audio_resample($"payload", 4000)).as("m"))
      .select($"m.valid", $"m.sample_rate").collect()
    assert(rm.forall(r => r.getBoolean(0) && r.getInt(1) === 4000))
  }

  test("AVI codec: encode→decode is the identity on real frame pixels") {
    val w = 23; val h = 11 // odd width: exercises DIB row padding
    val frames = (0 until 5).map(f => MediaOps.seededRgb(f * 77L + 3, w, h))
    val avi = Avi.encode(w, h, fps = 10, frames)
    assert(Avi.isAvi(avi))
    val (dw, dh, us, back) = Avi.decode(avi)
    assert(dw === w && dh === h && us === 100000)
    assert(back.length === 5)
    frames.zip(back).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    // malformed payloads fail with a clear message
    intercept[IllegalArgumentException] { Avi.decode(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] { Avi.decode(avi.take(200)) }
  }

  test("AVI in the media pipeline: real frame extraction into real BMP images") {
    val df = MediaOps.fakeAviTable(spark, 12, 4)
    val meta = df.select(MediaOps.video_meta($"payload").as("m"))
      .select($"m.valid", $"m.width", $"m.height", $"m.n_frames").collect()
    assert(meta.length === 12)
    assert(meta.forall(r => r.getBoolean(0) && r.getInt(1) === 24 && r.getInt(2) === 18))
    assert(meta.map(_.getInt(3)).sum === (0 until 12).map(i => 4 + i % 4).sum)
    // sampled frames are REAL BMPs: the full image path decodes them
    val frames = df.select(explode(MediaOps.frame_sample($"payload", 2)).as("f"))
    val fm = frames.select(MediaOps.image_meta($"f").as("m"))
      .select($"m.valid", $"m.width", $"m.height").collect()
    assert(fm.nonEmpty && fm.forall(r => r.getBoolean(0) && r.getInt(1) === 24 && r.getInt(2) === 18))
    // frame pixel bytes survive AVI → BMP → decode unchanged
    val clip = df.filter($"doc_id" === 0).select($"payload").head().getAs[Array[Byte]](0)
    val (w, h, _, decoded) = Avi.decode(clip)
    val firstBmp = frames.limit(1).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(Bmp.decode(firstBmp)._3, decoded(0)))
    assert(w === 24 && h === 18)
  }

  test("image metadata parses from the binary payload; garbage is flagged") {
    val df = MediaOps.fakeMediaTable(spark, 40, 4)
      .filter($"media_type" === "image/fake")
      .select($"doc_id", MediaOps.image_meta($"payload").as("m"))
    val rows = df.select($"m.valid", $"m.width", $"m.height", $"m.channels").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(0)))
    assert(rows.forall(r => r.getInt(1) >= 32 && r.getInt(2) >= 24 && r.getInt(3) === 3))
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
      .select(MediaOps.image_meta($"payload").as("m")).select($"m.valid").head()
    assert(!bad.getBoolean(0))
  }

  test("resize rewrites dimensions deterministically") {
    val df = MediaOps.fakeMediaTable(spark, 20, 2).filter($"media_type" === "image/fake")
    val resized = df.select($"doc_id",
      MediaOps.image_meta(MediaOps.image_resize($"payload", 224, 224)).as("m"))
    val rows = resized.select($"m.width", $"m.height").collect()
    assert(rows.forall(r => r.getInt(0) === 224 && r.getInt(1) === 224))
    // determinism across runs
    val a = df.select(MediaOps.image_resize($"payload", 224, 224)).collect().map(_.getAs[Array[Byte]](0))
    val b = df.select(MediaOps.image_resize($"payload", 224, 224)).collect().map(_.getAs[Array[Byte]](0))
    a.zip(b).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
  }

  test("feature extraction yields unit-norm vectors usable by the ANN operators") {
    val df = MediaOps.fakeMediaTable(spark, 64, 4).filter($"media_type" === "image/fake")
      .select($"doc_id".as("vec_id"), MediaOps.image_feature($"payload", 32).as("embedding"))
    val norms = df.select(TextOps.l2Norm($"embedding".cast("array<double>")).as("n")).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
    // plugs straight into the similarity-search operator
    val top = TextOps.bruteForceTopK(df, df.filter($"vec_id" === 0L), "vec_id", "embedding", 3).collect()
    assert(top.length === 3)
  }

  test("frame sampling explodes videos into image payloads") {
    val vids = MediaOps.fakeMediaTable(spark, 40, 4).filter($"media_type" === "video/fake")
    val frames = vids.select($"doc_id", explode(MediaOps.frame_sample($"payload", 4)).as("frame"))
      .select($"doc_id", MediaOps.image_meta($"frame").as("m"))
    val rows = frames.select($"m.valid", $"m.width").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(0) && r.getInt(1) === 64))
  }

  test("BMP codec: encode→decode is the identity on real pixel bytes") {
    // 3x2 image with distinct per-pixel colors, hand-laid-out
    val rgb = Array[Byte](
      10, 20, 30,   40, 50, 60,   70, 80, 90,      // row 0 (top)
      -1, 0, 1,     100, -100, 50, 5, 6, 7)        // row 1
    val bmp = Bmp.encode(3, 2, rgb)
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    val (w, h, back) = Bmp.decode(bmp)
    assert(w === 3 && h === 2)
    assert(back.toSeq === rgb.toSeq)
    // the stored bytes are genuinely bottom-up BGR with row padding:
    // first stored pixel = bottom-left = rgb(row1,col0) = (-1, 0, 1) as B,G,R
    assert(bmp(54) === 1.toByte && bmp(55) === 0.toByte && bmp(56) === -1.toByte)
    // row stride 3*3=9 padded to 12
    assert(bmp.length === 54 + 2 * 12)
  }

  test("BMP in the media pipeline: real meta, real resample, real checksum") {
    // media_type = image/bmp rows decode through the REAL codec
    val media = MediaOps.fakeMediaTable(spark, 40, 4)
    val bmps = media.filter($"media_type" === "image/bmp")
    assert(bmps.count() === 10)
    val metas = bmps.select(MediaOps.image_meta($"payload").as("m"))
      .select($"m.valid", $"m.width", $"m.height", $"m.channels").collect()
    assert(metas.forall(r => r.getBoolean(0) && r.getInt(3) === 3))
    // nearest-neighbor resize of a solid-color BMP keeps the color everywhere
    val solid = Bmp.encode(5, 4, Array.fill[Byte](5 * 4 * 3)(42))
    val resizedPayload = Seq(Tuple1(solid)).toDF("payload")
      .select(MediaOps.image_resize($"payload", 8, 8)).head().getAs[Array[Byte]](0)
    val (rw, rh, rp) = Bmp.decode(resizedPayload)
    assert(rw === 8 && rh === 8 && rp.forall(_ === 42.toByte))
    // checksum equals the plain sum of the generator's pixel bytes
    val seed = graft.core.Bits.mix(1L ^ 0xBEEF) // doc_id 1 is a BMP row
    val w = 33; val h = 25 // 32 + 1 % 64, 24 + 1 % 48
    val expected = MediaOps.seededRgb(seed, w, h).map(_ & 0xff).map(_.toLong).sum
    val got = bmps.filter($"doc_id" === 1)
      .select(MediaOps.pixel_checksum($"payload")).head().getLong(0)
    assert(got === expected)
    // feature vectors from real pixels are unit-norm and content-dependent
    val feats = bmps.select(MediaOps.image_feature($"payload", 16).as("v"))
      .select(expr("aggregate(v, 0d, (a, x) -> a + double(x) * double(x))")).collect()
    assert(feats.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-3))
  }

  test("PPM (P6) codec: identity round-trip, header grammar, real pipeline ops") {
    val rgb = Array.tabulate[Byte](4 * 3 * 3)(i => (i * 7).toByte)
    val ppm = Bmp.encodePpm(4, 3, rgb)
    val (w, h, back) = Bmp.decodePpm(ppm)
    assert(w === 4 && h === 3 && back.toSeq === rgb.toSeq)
    // the netpbm grammar allows comments and arbitrary whitespace
    val commented = ("P6\n# a comment line\n 4\t3 \n255\n".getBytes("US-ASCII") ++ rgb)
    val (cw, ch, cb) = Bmp.decodePpm(commented)
    assert(cw === 4 && ch === 3 && cb.toSeq === rgb.toSeq)
    // pipeline: meta + resize keep PPM real (resize re-encodes as PPM)
    val df = Seq(Tuple1(ppm)).toDF("payload")
    val m = df.select(MediaOps.image_meta($"payload").as("m"))
      .select($"m.valid", $"m.width", $"m.height", $"m.channels").head()
    assert(m.getBoolean(0) && m.getInt(1) === 4 && m.getInt(2) === 3 && m.getInt(3) === 3)
    val resized = df.select(MediaOps.image_resize($"payload", 8, 6)).head().getAs[Array[Byte]](0)
    assert(Bmp.isPpm(resized))
    val (rw, rh, _) = Bmp.decodePpm(resized)
    assert(rw === 8 && rh === 6)
    // checksum over real PPM pixels
    val ck = df.select(MediaOps.pixel_checksum($"payload")).head().getLong(0)
    assert(ck === rgb.map(_ & 0xff).map(_.toLong).sum)
  }

  test("batch-shaped processing sees fixed-size batches, not rows or whole partitions") {
    val df = MediaOps.fakeMediaTable(spark, 100, 2)
    val batchSizes = MediaOps.processBatches(df, "doc_id", "payload", batchSize = 16, partitions = 4) {
      batch => Iterator.single(batch.size)
    }.collect()
    assert(batchSizes.sum === 100)
    assert(batchSizes.max <= 16)
    assert(batchSizes.count(_ == 16) >= 4) // mostly full batches
  }
}
