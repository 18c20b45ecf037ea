package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Audio as a first-class multimodal column (north star, SURVEY.md §2.5):
  * payloads are REAL RIFF/WAVE files — the format crawled audio actually
  * arrives in for uncompressed corpora — decoded by a pure-JVM chunk-walking
  * parser ([[WavCodec]]) behind the same [[Multimodal.MediaCodec]] plug
  * point as the three image codecs. Where the image codecs exercise raster
  * conventions (stride, row order, channel packing), WAV exercises the
  * container side a production media pipeline owes: chunk framing with
  * unknown-chunk skipping, RIFF's odd-size pad byte, little-endian
  * multi-byte header fields, and sample-format normalization (8-bit
  * unsigned and 16-bit signed PCM both normalize to 16-bit LE signed, the
  * audio analog of "every image codec returns top-down unpadded RGB").
  *
  * The gate query synthesizes each clip's PCM from the shared LCG
  * ([[Multimodal.syntheticPayload]]'s generator), wraps it in real WAV
  * bytes ON THE EXECUTORS, decodes through [[WavCodec]], and reduces to
  * all-integer sample statistics — which the DuckDB oracle replays from
  * the LCG directly. The WAV round trip is lossless, so a single framing
  * error anywhere (chunk offset, pad byte, endianness, sign handling)
  * breaks the hash: the container is value-proven, not smoke-run.
  *
  * Scale: payloads never pass through the driver; encode and decode are
  * mapPartitions over the documents partitioning (no shuffle before the
  * final feature aggregation), and features are fixed-size integer rows.
  */
object Audio {

  /** One decoded clip reduced to join-friendly integer features. All
    * columns are exact integers, so the oracle compare has no float
    * surface: `sum_abs`/`peak_abs` are over |sample| (|-32768| = 32768
    * needs the Long), `zero_cross` counts sign changes between adjacent
    * samples with sign(s) := if (s >= 0) +1 else -1.
    */
  final case class AudioFeatures(
      media_id: Long, n_samples: Long, sum_abs: Long, peak_abs: Long,
      zero_cross: Long)

  val SampleRate = 8000
  /** Clip length in samples: 128 + (id % 256) — deterministic, modest
    * (the oracle walks one recursive-CTE row per sample per doc).
    */
  def clipSamples(id: Long): Int = 128 + (id % 256).toInt

  /** Deterministic 16-bit signed mono PCM: sample i = top 16 bits of the
    * (i+1)-th LCG state seeded from the media id — the same generator and
    * seeding convention as [[Multimodal.syntheticPayload]], so the oracle
    * reuses the proven HUGEINT replay with a 16-bit (not 8-bit) read.
    */
  def syntheticPcm(id: Long): Array[Short] = {
    val n = clipSamples(id)
    val out = new Array[Short](n)
    var state = id * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      state = state * 6364136223846793005L + 1442695040888963407L
      out(i) = (state >>> 48).toShort
      i += 1
    }
    out
  }

  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def putTag(b: Array[Byte], o: Int, t: String): Unit = {
    var i = 0; while (i < 4) { b(o + i) = t.charAt(i).toByte; i += 1 }
  }

  /** Real WAV encode: RIFF header, `fmt ` chunk (PCM, mono, 16-bit), an
    * optional odd-length `LIST` metadata chunk BEFORE `data` (every 7th
    * id) so the decoder's unknown-chunk skip and RIFF pad-byte handling
    * sit on the hash-gated hot path rather than only in specs, then the
    * `data` chunk with little-endian samples.
    */
  def encodeWav(id: Long, pcm: Array[Short]): Array[Byte] = {
    val dataSize = pcm.length * 2
    val listContent = if (id % 7 == 0) "INFOx".getBytes("US-ASCII")
      else Array.emptyByteArray
    val listChunk = if (listContent.isEmpty) 0
      else 8 + listContent.length + (listContent.length & 1)
    val total = 44 + listChunk + dataSize
    val out = new Array[Byte](total)
    putTag(out, 0, "RIFF"); putLe32(out, 4, total - 8); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLe32(out, 16, 16)
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, 1) // mono
    putLe32(out, 24, SampleRate)
    putLe32(out, 28, SampleRate * 2) // byte rate
    putLe16(out, 32, 2) // block align
    putLe16(out, 34, 16) // bits per sample
    var pos = 36
    if (listChunk > 0) {
      putTag(out, pos, "LIST"); putLe32(out, pos + 4, listContent.length)
      System.arraycopy(listContent, 0, out, pos + 8, listContent.length)
      pos += listChunk // pad byte (zero) already in place for odd sizes
    }
    putTag(out, pos, "data"); putLe32(out, pos + 4, dataSize)
    var i = 0
    while (i < pcm.length) {
      out(pos + 8 + 2 * i) = pcm(i).toByte
      out(pos + 8 + 2 * i + 1) = (pcm(i) >> 8).toByte
      i += 1
    }
    out
  }

  /** REAL codec #4: RIFF/WAVE PCM (format code 1, 8- or 16-bit, any
    * channel count) — pure JVM, public format, no dependencies. Returns
    * (channels, sampleRate, samples as 16-bit LE signed) through the
    * [[Multimodal.MediaCodec]] contract; 8-bit unsigned samples are
    * normalized as (x - 128) << 8 so downstream features are
    * bit-depth-independent. Chunk walking per the RIFF spec: unknown
    * chunks (`LIST`, `fact`, …) are skipped, every chunk is padded to an
    * even boundary, `fmt ` must precede `data` to be trusted. All size
    * arithmetic is in Long so corrupt headers (sizes that wrap Int) drop
    * the row instead of throwing — the MediaCodec contract.
    */
  object WavCodec extends Multimodal.MediaCodec {
    private def le16(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    private def tag(p: Array[Byte], o: Int): String =
      new String(p, o, 4, "US-ASCII")

    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 44 || tag(payload, 0) != "RIFF" ||
        tag(payload, 8) != "WAVE") return None
      var pos = 12L
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      while (pos + 8 <= payload.length) {
        val id = tag(payload, pos.toInt)
        val size = le32(payload, pos.toInt + 4)
        val body = pos + 8
        if (size < 0 || body + size > payload.length) return None
        if (id == "fmt ") {
          if (size < 16) return None
          val code = le16(payload, body.toInt)
          val channels = le16(payload, body.toInt + 2)
          val rate = le32(payload, body.toInt + 4)
          val bits = le16(payload, body.toInt + 14)
          if (code != 1 || channels < 1 || channels > 64 ||
            rate <= 0 || rate > Int.MaxValue ||
            (bits != 8 && bits != 16)) return None
          fmt = Some((channels, rate.toInt, bits))
        } else if (id == "data") {
          // 2^28 samples = 512 MB normalized — any training clip fits;
          // past it n*2 would wrap the Int array size (the same corrupt-
          // payload class the image codecs guard against)
          if (size > (1L << 28)) return None
          return fmt.map { case (channels, rate, bits) =>
            val n = if (bits == 16) (size / 2).toInt else size.toInt
            val out = new Array[Byte](n * 2)
            var i = 0
            if (bits == 16) {
              // already 16-bit LE — copy the sample bytes through
              System.arraycopy(payload, body.toInt, out, 0, n * 2)
            } else {
              while (i < n) {
                val s = (((payload(body.toInt + i) & 0xff) - 128) << 8).toShort
                out(2 * i) = s.toByte
                out(2 * i + 1) = (s >> 8).toByte
                i += 1
              }
            }
            (channels, rate, out)
          }
        }
        pos = body + size + (size & 1) // RIFF: chunks pad to even offsets
      }
      None
    }
  }

  /** Audio table synthesized from document ids — every doc is one clip;
    * payloads are real WAV bytes built on the executors.
    */
  def wavMediaTable(s: SparkSession, dir: String): Dataset[Multimodal.MediaItem] = {
    import s.implicits._
    OpUtil.spread(Tables.documents(s, dir).select(col("doc_id"))).as[Long].map { id =>
      val bytes = encodeWav(id, syntheticPcm(id))
      Multimodal.MediaItem(id, "audio", bytes, bytes.length.toLong)
    }
  }

  /** Decode + feature-extract, batched per partition — the same
    * mapPartitions shape as [[Multimodal.extractFeatures]], specialized
    * to signed-sample statistics.
    */
  def extractAudioFeatures(media: Dataset[Multimodal.MediaItem],
      codec: Multimodal.MediaCodec = WavCodec): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { items =>
      items.flatMap { m =>
        codec.decode(m.payload).map { case (_, _, bytes) =>
          val n = bytes.length / 2
          var sumAbs = 0L
          var peak = 0L
          var crossings = 0L
          var prevSign = 0
          var i = 0
          while (i < n) {
            val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
            val a = math.abs(s)
            sumAbs += a
            if (a > peak) peak = a
            val sign = if (s >= 0) 1 else -1
            if (prevSign != 0 && sign != prevSign) crossings += 1
            prevSign = sign
            i += 1
          }
          AudioFeatures(m.media_id, n.toLong, sumAbs, peak, crossings)
        }
      }
    }
  }

  /** The gate query: real WAV encode → [[WavCodec]] decode → integer
    * sample stats, hash-checked against the LCG replayed in SQL.
    */
  def audioFeaturesQuery(s: SparkSession, dir: String): DataFrame =
    extractAudioFeatures(wavMediaTable(s, dir)).toDF()

  /** LCG replay with a 16-bit signed read: state // 2^48 is the top-16
    * unsigned value, re-biased to signed; zero crossings via lag() over
    * the per-doc sample order. Integer everywhere.
    */
  val audioFeaturesOracle: String =
    """WITH RECURSIVE gen(doc_id, i, n, state) AS (
      |  SELECT doc_id, 0::BIGINT, (128 + doc_id % 256)::BIGINT,
      |    ((doc_id::HUGEINT * 6364136223846793005 + 1442695040888963407)
      |      % 18446744073709551616 + 18446744073709551616)
      |      % 18446744073709551616
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, i + 1, n,
      |    (state * 6364136223846793005 + 1442695040888963407)
      |      % 18446744073709551616
      |  FROM gen WHERE i < n
      |), samples AS (
      |  SELECT doc_id, i,
      |    CASE WHEN (state // 281474976710656) >= 32768
      |      THEN (state // 281474976710656)::BIGINT - 65536
      |      ELSE (state // 281474976710656)::BIGINT END AS s
      |  FROM gen WHERE i >= 1
      |), signed AS (
      |  SELECT doc_id, i, s, CASE WHEN s >= 0 THEN 1 ELSE -1 END AS sgn
      |  FROM samples
      |), crossings AS (
      |  SELECT doc_id, sgn,
      |    lag(sgn) OVER (PARTITION BY doc_id ORDER BY i) AS prev_sgn,
      |    s
      |  FROM signed)
      |SELECT doc_id AS media_id, count(*)::BIGINT AS n_samples,
      |  sum(abs(s))::BIGINT AS sum_abs, max(abs(s))::BIGINT AS peak_abs,
      |  sum(CASE WHEN prev_sgn IS NOT NULL AND sgn != prev_sgn
      |    THEN 1 ELSE 0 END)::BIGINT AS zero_cross
      |FROM crossings
      |GROUP BY 1""".stripMargin
}
