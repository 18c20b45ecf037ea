package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (north star, SURVEY.md §2.5): media as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction running per-partition over batches — the Spark-side shape
  * (schema, partitioning, batch iteration) is real and tested. Three
  * REAL codecs ship behind the [[MediaCodec]] plug point — Netpbm and
  * BMP (raw rasters, hand-parsed) and [[ImageIoCodec]] (PNG/JPEG/GIF,
  * the compressed production formats via the JDK registry) — alongside
  * the deterministic [[StubCodec]] that keeps the default pipeline
  * oracle-replayable; `multimodal_png_features` runs the compressed
  * path under the same hash gate.
  *
  * Scale: payloads never pass through the driver; decode is a
  * mapPartitions pipeline (no shuffle); per-media features are fixed-size
  * rows so downstream joins/aggs behave like any other table.
  */
object Multimodal {

  /** One media item: payload + envelope metadata. */
  final case class MediaItem(
      media_id: Long, modality: String, payload: Array[Byte], size_bytes: Long)

  /** Decoded media features (fixed-size, join-friendly). `mean_byte_x100`
    * is the mean pixel value scaled by 100 and half-up rounded in pure
    * integer arithmetic — float rounding of `sum/n` lands exactly on
    * .005 boundaries often enough (integer sums) that engines disagree.
    */
  final case class MediaFeatures(
      media_id: Long, modality: String, width: Int, height: Int,
      mean_byte_x100: Long, byte_entropy: Double)

  private val Magic: Array[Byte] = "GMM1".getBytes("US-ASCII")

  /** Deterministic fake payload: 8-byte header (magic + width/height
    * shorts) + body bytes from a seeded LCG — stands in for real
    * image/audio bytes so the plumbing is exercised end-to-end.
    */
  def syntheticPayload(id: Long): Array[Byte] = {
    val width = 16 + (id % 48).toInt
    val height = 16 + (id % 32).toInt
    val body = new Array[Byte](width * height)
    var state = id * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < body.length) {
      state = state * 6364136223846793005L + 1442695040888963407L
      body(i) = (state >>> 56).toByte
      i += 1
    }
    val out = new Array[Byte](8 + body.length)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = (width >> 8).toByte; out(5) = width.toByte
    out(6) = (height >> 8).toByte; out(7) = height.toByte
    System.arraycopy(body, 0, out, 8, body.length)
    out
  }

  /** Codec adapter — THE plug point for real media decoding: swapping
    * in a production decoder (javax.imageio, ffmpeg bindings, a JNI
    * wrapper) is implementing this one method and passing the instance
    * to [[extractFeatures]]/[[sampleFrames]]/[[metaQuery]]; no query
    * changes shape. Returns (width, height, sample bytes) — pixels for
    * images, PCM for audio — or None for an undecodable payload (the
    * row is dropped, never a task failure). Implementations ship to
    * executors: they must be Serializable and safe to call concurrently
    * within a partition.
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])]
  }

  /** STUB CODEC — the deterministic test instance (no media libraries
    * exist in this environment): parses the synthetic header and returns
    * the LCG body as "pixels". Kept as the default so the whole pipeline
    * stays oracle-replayable; production swaps in a real [[MediaCodec]].
    */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 8 || !payload.take(4).sameElements(Magic)) None
      else {
        val w = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
        val h = ((payload(6) & 0xff) << 8) | (payload(7) & 0xff)
        Some((w, h, java.util.Arrays.copyOfRange(payload, 8, payload.length)))
      }
    }
  }

  /** REAL codec for the public Netpbm formats (PPM `P6` / PGM `P5`,
    * binary variants, 8-bit maxval) — pure JVM, no external library:
    * proof that [[MediaCodec]]'s plug point takes a production decoder,
    * not just the stub. Header grammar per the published spec: magic,
    * then width/height/maxval as ASCII decimals separated by whitespace,
    * `#` comments legal between tokens, one whitespace byte after maxval,
    * then the raster (RGB triplets for P6, single luma bytes for P5).
    * Returns the raster bytes as the sample; undecodable payloads (bad
    * magic, maxval > 255, truncated raster) yield None — dropped rows,
    * never task failures, same contract as the stub.
    */
  object NetpbmCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 2 || payload(0) != 'P' ||
        (payload(1) != '5' && payload(1) != '6')) return None
      val channels = if (payload(1) == '6') 3 else 1
      var pos = 2
      // read the next ASCII integer token, skipping whitespace + comments
      def nextInt(): Option[Int] = {
        while (pos < payload.length &&
          (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
          if (payload(pos) == '#')
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < payload.length && payload(pos) >= '0' &&
          payload(pos) <= '9') pos += 1
        // >9 digits overflows Int.parseInt (would throw, not drop) and is
        // never a plausible dimension — corrupt header, reject
        if (pos == start || pos - start > 9) None
        else Some(new String(payload, start, pos - start, "US-ASCII").toInt)
      }
      for {
        w <- nextInt()
        h <- nextInt()
        maxval <- nextInt()
        if w > 0 && h > 0 && maxval > 0 && maxval <= 255
        // exactly one whitespace byte separates maxval from the raster
        if pos < payload.length && payload(pos).toChar.isWhitespace
        raster = {
          pos += 1
          // Long math: w*h*channels on Ints can wrap negative (e.g.
          // 46341x46341) and sneak past the truncation check into a
          // throwing copyOfRange — corrupt payloads drop, never throw
          val n = w.toLong * h * channels
          if (n > payload.length.toLong - pos) None
          else Some(java.util.Arrays.copyOfRange(payload, pos, pos + n.toInt))
        }
        bytes <- raster
      } yield (w, h, bytes)
    }
  }

  /** REAL codec #2: uncompressed 24-bit Windows BMP (`BM` magic,
    * BITMAPINFOHEADER, BI_RGB) — pure JVM, public format. Where Netpbm
    * is byte-per-sample and densely packed, BMP exercises the parts of
    * a production decoder Netpbm can't: little-endian multi-byte header
    * fields, ROW STRIDE (rows pad to 4-byte boundaries), bottom-up row
    * order (positive height; negative = top-down), and BGR channel
    * order — the returned sample is repacked to top-down unpadded RGB
    * so downstream features see the same pixel convention as P6.
    * Undecodable payloads (bad magic, unsupported bpp/compression,
    * truncated raster, dimensions that overflow) yield None — dropped
    * rows, never task failures, the [[MediaCodec]] contract.
    */
  object BmpCodec extends MediaCodec {
    private def le16(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], o: Int): Long =
      ((p(o) & 0xffL)) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M')
        return None
      val dataOffset = le32(payload, 10)
      val dibSize = le32(payload, 14)
      val width = le32(payload, 18).toInt // signed LE per spec
      val heightRaw = le32(payload, 22).toInt
      val planes = le16(payload, 26)
      val bpp = le16(payload, 28)
      val compression = le32(payload, 30)
      val topDown = heightRaw < 0
      val height = math.abs(heightRaw)
      // bounds in Long: width*3, stride*height, and offset sums must not
      // wrap Int (the same corrupt-payload class the Netpbm fix covers)
      if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0 ||
        width <= 0 || height <= 0 || heightRaw == Int.MinValue ||
        width > (1 << 20) || height > (1 << 20)) return None
      val stride = (width.toLong * 3 + 3) & ~3L
      if (dataOffset < 54 ||
        dataOffset + stride * height > payload.length) return None
      val out = new Array[Byte](width * height * 3)
      var row = 0
      while (row < height) {
        val srcRow = if (topDown) row else height - 1 - row
        val base = (dataOffset + stride * srcRow).toInt
        var x = 0
        while (x < width) {
          val s = base + x * 3
          val d = (row * width + x) * 3
          out(d) = payload(s + 2) // R (BMP stores BGR)
          out(d + 1) = payload(s + 1) // G
          out(d + 2) = payload(s) // B
          x += 1
        }
        row += 1
      }
      Some((width, height, out))
    }
  }

  /** REAL codec #3: the compressed production formats (PNG, JPEG, GIF —
    * whatever the JDK's `javax.imageio` registry reads), pure public JDK
    * API, no new dependencies. This is the codec a real corpus needs:
    * Netpbm/BMP prove the plug point on raw rasters; this one handles
    * the formats crawled data actually arrives in. Design points:
    *
    *  - Dimensions are read from the HEADER (`ImageReader.getWidth`)
    *    before any pixel decode, and a payload whose decoded size would
    *    exceed [[ImageIoCodec.MaxPixels]] is rejected — the
    *    decompression-bomb guard a production decoder owes the cluster
    *    (a 100-byte PNG can legally declare a gigapixel canvas).
    *  - `ImageIO.setUseCache(false)`: decode stays on-heap; the default
    *    disk-backed cache would write temp files per image per task.
    *  - Pixels are repacked row-by-row through `getRGB` (one Int row
    *    buffer, not a full-frame copy) into top-down unpadded RGB —
    *    the same sample convention as P6/BMP, so downstream features
    *    are codec-independent. `getRGB` normalizes every source color
    *    model (palette, YCbCr JPEG, 16-bit) to 8-bit sRGB.
    *  - Undecodable payloads (bad magic, truncation, codec exceptions)
    *    yield None — dropped rows, never task failures, the
    *    [[MediaCodec]] contract. Readers are per-call (ImageIO reader
    *    instances are not thread-safe; the registry lookup is).
    */
  object ImageIoCodec extends MediaCodec {
    /** 64M pixels = 192 MB of RGB sample — generous for any training
      * image, small enough that one hostile payload cannot OOM a task.
      */
    val MaxPixels: Long = 1L << 26

    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      javax.imageio.ImageIO.setUseCache(false)
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        if (in == null) return None
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(in, true, true)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
            val img = reader.read(0)
            val out = new Array[Byte](w * h * 3)
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val argb = row(x)
                val d = (y * w + x) * 3
                out(d) = (argb >> 16).toByte
                out(d + 1) = (argb >> 8).toByte
                out(d + 2) = argb.toByte
                x += 1
              }
              y += 1
            }
            Some((w, h, out))
          } finally reader.dispose()
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Media table synthesized from document ids (the harness ships no
    * binary media table; payload content is deterministic in media_id).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    OpUtil.spread(Tables.documents(s, dir).select(col("doc_id"))).as[Long].map { id =>
      val p = syntheticPayload(id)
      MediaItem(id, if (id % 3 == 0) "image" else "audio", p, p.length.toLong)
    }
  }

  /** Decode + feature-extract, batched per partition (the mapInPandas
    * shape: one iterator in, one iterator out, no per-row overhead).
    */
  def extractFeatures(media: Dataset[MediaItem],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { items =>
      items.flatMap { m =>
        codec.decode(m.payload).map { case (w, h, pixels) =>
          val hist = new Array[Long](256)
          var sum = 0L
          pixels.foreach { b => val v = b & 0xff; hist(v) += 1; sum += v }
          val n = math.max(pixels.length, 1).toLong
          val nd = n.toDouble
          val entropy = -hist.iterator.filter(_ > 0).map { c =>
            val p = c / nd; p * math.log(p) / math.log(2)
          }.sum
          // integer half-up: floor(100*sum/n + 1/2) = (200*sum + n) / 2n
          MediaFeatures(m.media_id, m.modality, w, h,
            (200L * sum + n) / (2L * n),
            BigDecimal(entropy).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }
    }
  }

  /** Resize STUB: real implementation would transform pixels; here it
    * rescales metadata only, preserving the pipeline shape.
    */
  def resizeStub(features: Dataset[MediaFeatures], maxDim: Int): DataFrame =
    features.toDF().select(
      col("media_id"),
      least(col("width"), lit(maxDim)).as("width"),
      least(col("height"), lit(maxDim)).as("height"))

  /** Frame sampling for video-shaped payloads: treat the body as
    * `frameSize`-byte frames and keep every `stride`-th one. The slicing
    * is real (byte ranges out of the payload); only the notion that a
    * frame is a decodable image is stubbed.
    */
  def sampleFrames(media: Dataset[MediaItem], frameSize: Int, stride: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      codec.decode(m.payload).toSeq.flatMap { case (_, _, body) =>
        val nFrames = body.length / frameSize
        (0 until nFrames by stride).map { f =>
          (m.media_id, f,
            java.util.Arrays.copyOfRange(body, f * frameSize, (f + 1) * frameSize))
        }
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  def featuresQuery(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir)).toDF()

  /** [[mediaTable]] re-encoded as REAL PNG files on the executors: each
    * LCG body byte becomes one gray pixel (R=G=B=v) of a w×h sRGB image,
    * compressed through the JDK PNG writer. No driver involvement, no
    * shuffle — encode is a map over the same partitions.
    */
  def pngMediaTable(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    mediaTable(s, dir).mapPartitions { items =>
      javax.imageio.ImageIO.setUseCache(false)
      items.flatMap { m =>
        StubCodec.decode(m.payload).map { case (w, h, body) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < body.length) {
            val v = body(i) & 0xff
            img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          MediaItem(m.media_id, m.modality, bytes, bytes.length.toLong)
        }
      }
    }
  }

  /** The PRODUCTION-FORMAT twin of [[featuresQuery]], under the same
    * hash gate: payloads are real compressed PNGs ([[pngMediaTable]]),
    * decoded by [[ImageIoCodec]]. Why the multimodal_features oracle
    * verifies it VERBATIM: PNG is lossless and both encode and decode
    * sit in 8-bit sRGB (TYPE_INT_RGB in, `getRGB` out — no colorspace
    * conversion), so the decoded sample is the LCG body with every byte
    * tripled (gray → R=G=B). Tripling is invisible to every feature:
    * width/height unchanged, mean's integer half-up rounding is
    * scale-invariant ((200·3s + 3n)/(2·3n) = (200s + n)/(2n)), and the
    * entropy histogram scales all counts by 3 — identical p's. A single
    * off-by-one anywhere in the codec (stride, row order, channel
    * swap with non-gray content aside, bomb-guard misfire) breaks the
    * hash, so the compressed round trip is value-proven, not smoke-run.
    */
  def pngFeaturesQuery(s: SparkSession, dir: String): DataFrame =
    extractFeatures(pngMediaTable(s, dir), ImageIoCodec).toDF()

  val FrameSize = 64
  val FrameStride = 4

  /** Frame-sampling surfaced as a gate query: every [[FrameStride]]-th
    * [[FrameSize]]-byte frame is sliced out of each payload by
    * [[sampleFrames]] (the real byte-range operator on the hot path),
    * then reduced to integer stats per frame — which the oracle replays
    * byte-for-byte from the LCG (positions (i-1) div frameSize, top-8
    * bits of each state), so the whole slice-and-sample path is
    * hash-checked, not just row-counted.
    */
  def frameStatsQuery(s: SparkSession, dir: String): DataFrame = {
    val frames = sampleFrames(mediaTable(s, dir), FrameSize, FrameStride)
    val stats = udf { (b: Array[Byte]) =>
      var sum = 0L
      var mn = 255
      var mx = 0
      b.foreach { x =>
        val v = x & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      (sum, mn, mx)
    }
    frames
      .withColumn("st", stats(col("frame")))
      .select(col("media_id"), col("frame_idx"),
        col("st._1").as("frame_sum"), col("st._2").as("frame_min"),
        col("st._3").as("frame_max"))
  }

  /** Envelope + decoded-header rollup per modality. Every value here is
    * recomputed from the decoded payload (not the synthesis parameters),
    * so the oracle check covers payload framing end-to-end. One pass:
    * decode and envelope stats come off the same MediaItem rows — no
    * second payload synthesis, no join.
    */
  def metaQuery(s: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .mapPartitions { items =>
        items.flatMap { m =>
          codec.decode(m.payload).map { case (w, h, _) =>
            (m.modality, w.toLong, h.toLong, m.size_bytes)
          }
        }
      }
      .toDF("modality", "width", "height", "size_bytes")
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("width")).as("sum_width"),
        sum(col("height")).as("sum_height"),
        sum(col("size_bytes")).as("sum_bytes"))
  }
}
