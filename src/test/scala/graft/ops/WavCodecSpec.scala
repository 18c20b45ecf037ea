package graft.ops

import graft.SparkSpec

/** WavCodec (round 9): the RIFF/WAVE container codec — 16-bit round
  * trip, 8-bit normalization, unknown-chunk skip + odd-size pad byte,
  * corrupt-header drops, and the audio feature math on a hand-computed
  * clip.
  */
class WavCodecSpec extends SparkSpec {

  test("16-bit WAV round trip returns the exact samples, LE order") {
    val pcm = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val Some((ch, rate, bytes)) = Audio.WavCodec.decode(Audio.encodeWav(1L, pcm))
    assert(ch == 1 && rate == Audio.SampleRate)
    val back = (0 until bytes.length / 2).map { i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
    }
    assert(back == pcm.toSeq)
  }

  test("the every-7th-id LIST chunk (odd size + pad byte) is skipped and " +
    "data still decodes exactly") {
    val pcm = Array[Short](5, -5, 100)
    val wav = Audio.encodeWav(7L, pcm) // id % 7 == 0 → LIST before data
    assert(new String(wav, 36, 4, "US-ASCII") == "LIST")
    val Some((_, _, bytes)) = Audio.WavCodec.decode(wav)
    assert(bytes.length == 6)
    assert(((bytes(0) & 0xff) | (bytes(1) << 8)).toShort == 5)
  }

  test("8-bit unsigned PCM normalizes to 16-bit signed: (x-128)<<8") {
    // hand-build an 8-bit mono file: samples 0, 128, 255
    val data = Array[Byte](0, 128.toByte, 255.toByte)
    val out = new Array[Byte](44 + 4) // 3 data bytes + pad to even
    def tag(o: Int, t: String): Unit =
      (0 until 4).foreach(i => out(o + i) = t.charAt(i).toByte)
    def le32(o: Int, v: Int): Unit = (0 until 4).foreach(i => out(o + i) = (v >> (8 * i)).toByte)
    def le16(o: Int, v: Int): Unit = (0 until 2).foreach(i => out(o + i) = (v >> (8 * i)).toByte)
    tag(0, "RIFF"); le32(4, out.length - 8); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 8000); le16(32, 1); le16(34, 8)
    tag(36, "data"); le32(40, 3)
    System.arraycopy(data, 0, out, 44, 3)
    val Some((ch, rate, bytes)) = Audio.WavCodec.decode(out)
    assert(ch == 1 && rate == 8000 && bytes.length == 6)
    val back = (0 until 3).map { i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
    }
    assert(back == Seq[Short](-32768, 0, 32512.toShort))
  }

  test("corrupt payloads drop, never throw") {
    val good = Audio.encodeWav(2L, Audio.syntheticPcm(2L))
    assert(Audio.WavCodec.decode(Array[Byte]()).isEmpty)
    assert(Audio.WavCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Audio.WavCodec.decode(good.take(40)).isEmpty)
    // declared data size past the payload end
    val truncated = good.clone()
    truncated(truncated.length - 1) = 0 // keep bytes, then lie in header
    val lying = good.clone()
    // data chunk size field sits 8 bytes before the samples when id%7!=0
    val dataSizePos = 40
    lying(dataSizePos) = -1; lying(dataSizePos + 1) = -1
    lying(dataSizePos + 2) = -1; lying(dataSizePos + 3) = 0x7f
    assert(Audio.WavCodec.decode(lying).isEmpty)
    // non-PCM format code
    val alaw = good.clone(); alaw(20) = 6
    assert(Audio.WavCodec.decode(alaw).isEmpty)
    // 24-bit depth unsupported
    val deep = good.clone(); deep(34) = 24
    assert(Audio.WavCodec.decode(deep).isEmpty)
    // data before fmt: no trusted format yet → None
    val noFmt = good.clone(); noFmt(12) = 'j'
    assert(Audio.WavCodec.decode(noFmt).isEmpty)
  }

  test("audio features match a hand computation") {
    import spark.implicits._
    val pcm = Array[Short](10, -3, 4, -4, 0, -32768)
    // sum_abs = 10+3+4+4+0+32768 = 32789; peak = 32768
    // signs: + - + - + -  → 5 crossings (0 counts as +)
    val item = Multimodal.MediaItem(42L, "audio", Audio.encodeWav(42L, pcm), 0L)
    val ds = spark.createDataset(Seq(item))
    val row = Audio.extractAudioFeatures(ds).collect().head
    assert(row == Audio.AudioFeatures(42L, 6L, 32789L, 32768L, 5L))
  }

  test("gate query at sf0.001: every doc decodes, n_samples matches the " +
    "clip-length formula") {
    val df = Audio.audioFeaturesQuery(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Audio.clipSamples(id).toLong,
        s"clip $id sample count")
    }
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == docs, "no dropped clips")
  }
}
