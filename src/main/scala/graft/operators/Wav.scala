package graft.operators

/** Minimal RIFF/WAVE PCM-16 reader/writer in pure Scala — the media layer's
  * REAL audio codec (no audio libraries ship in this sandbox, but the
  * published RIFF layout parses by hand the same way BMP does; Bmp.scala is
  * the sibling pattern). Samples are interleaved signed 16-bit
  * little-endian, the universal uncompressed interchange format.
  *
  * File layout (little-endian): "RIFF" <riffSize:u32> "WAVE", then chunks of
  * ("<4-char id>" <size:u32> <payload, padded to even>): a "fmt " chunk
  * (audioFormat=1 (PCM), channels, sampleRate, byteRate, blockAlign,
  * bitsPerSample) and a "data" chunk holding the samples. Other chunks
  * (LIST, fact, ...) are skipped per the spec.
  */
object Wav {

  def isWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0,
      s"bad WAV shape: rate $sampleRate, $channels ch, ${samples.length} samples")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    putTag(out, 0, "RIFF"); putInt(out, 4, 36 + dataBytes); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putInt(out, 16, 16)
    putShort(out, 20, 1) // PCM
    putShort(out, 22, channels)
    putInt(out, 24, sampleRate)
    putInt(out, 28, sampleRate * channels * 2) // byte rate
    putShort(out, 32, channels * 2) // block align
    putShort(out, 34, 16) // bits per sample
    putTag(out, 36, "data"); putInt(out, 40, dataBytes)
    var i = 0
    while (i < samples.length) {
      out(44 + i * 2) = samples(i).toByte
      out(44 + i * 2 + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  /** (sampleRate, channels, interleaved PCM-16 samples); rejects non-PCM /
    * non-16-bit variants; skips unknown chunks; header fields are untrusted
    * (sizes validated in long arithmetic against the actual payload). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    require(isWav(payload), "not a RIFF/WAVE payload")
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmt = 0
    var samples: Array[Short] = null
    while (pos + 8 <= payload.length && (samples == null || sampleRate == 0)) {
      val id = new String(payload, pos, 4, "US-ASCII")
      val size = getInt(payload, pos + 4)
      require(size >= 0 && pos + 8L + size <= payload.length, s"truncated WAV chunk $id ($size bytes)")
      id match {
        case "fmt " =>
          require(size >= 16, s"short fmt chunk ($size bytes)")
          fmt = getShort(payload, pos + 8)
          channels = getShort(payload, pos + 10)
          sampleRate = getInt(payload, pos + 12)
          bits = getShort(payload, pos + 22)
          require(fmt == 1 && bits == 16, s"unsupported WAV variant: format $fmt, $bits-bit")
          require(channels > 0 && sampleRate > 0, s"bad fmt: $channels ch at $sampleRate Hz")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((payload(pos + 8 + i * 2) & 0xff) |
              (payload(pos + 8 + i * 2 + 1) << 8)).toShort
            i += 1
          }
        case _ => // skip LIST/fact/... per spec
      }
      pos += 8 + size + (size & 1) // chunks pad to even
    }
    require(sampleRate > 0, "WAV missing fmt chunk")
    require(samples != null, "WAV missing data chunk")
    require(samples.length % channels == 0, "data chunk not a whole number of frames")
    (sampleRate, channels, samples)
  }

  /** nearest-frame resample of interleaved PCM (real sample math — the audio
    * analog of Bmp.resizeRgb) */
  def resample(samples: Array[Short], channels: Int, srcRate: Int, dstRate: Int): Array[Short] = {
    require(srcRate > 0 && dstRate > 0 && channels > 0)
    val srcFrames = samples.length / channels
    val dstFrames = math.max((srcFrames.toLong * dstRate / srcRate).toInt, 1)
    val out = new Array[Short](dstFrames * channels)
    var f = 0
    while (f < dstFrames) {
      val sf = math.min((f.toLong * srcRate / dstRate).toInt, srcFrames - 1)
      var c = 0
      while (c < channels) { out(f * channels + c) = samples(sf * channels + c); c += 1 }
      f += 1
    }
    out
  }

  @inline private def putTag(b: Array[Byte], pos: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(pos + i) = tag.charAt(i).toByte; i += 1 }
  }
  @inline private def putInt(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = v.toByte; b(pos + 1) = (v >> 8).toByte
    b(pos + 2) = (v >> 16).toByte; b(pos + 3) = (v >> 24).toByte
  }
  @inline private def putShort(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = v.toByte; b(pos + 1) = (v >> 8).toByte
  }
  @inline private def getInt(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) | ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
  @inline private def getShort(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
}
