package graft.ops

import graft.SparkSpec

/** ImageIoCodec (round 8): the compressed-format production codec —
  * PNG exact round trip, JPEG tolerance, bomb guard, corrupt drops, and
  * the full PNG query path equalling the stub path row-for-row.
  */
class ImageIoCodecSpec extends SparkSpec {
  import java.awt.image.BufferedImage

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  // 3x2 with distinct R/G/B in every position — any channel swap, row
  // flip, or stride slip lands on different bytes
  private def fixture(): BufferedImage = {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    val px = Array(
      0x102030, 0x405060, 0x708090,
      0xa0b0c0, 0xd0e0f0, 0x112233)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, px(y * 3 + x))
    img
  }

  test("PNG round trip is byte-exact: channels, row order, no stride slip") {
    val Some((w, h, rgb)) = Multimodal.ImageIoCodec.decode(encode(fixture(), "png"))
    assert((w, h) == (3, 2))
    val expect = Array(
      0x10, 0x20, 0x30, 0x40, 0x50, 0x60, 0x70, 0x80, 0x90,
      0xa0, 0xb0, 0xc0, 0xd0, 0xe0, 0xf0, 0x11, 0x22, 0x33).map(_.toByte)
    assert(rgb.toSeq == expect.toSeq)
  }

  test("JPEG decodes to the right shape; lossy values stay in tolerance") {
    // flat-gray content compresses near-losslessly, so a tight mean bound
    // holds even though per-byte equality cannot
    val img = new BufferedImage(8, 5, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val Some((w, h, rgb)) = Multimodal.ImageIoCodec.decode(encode(img, "jpg"))
    assert((w, h) == (8, 5) && rgb.length == 8 * 5 * 3)
    val mean = rgb.map(_ & 0xff).sum.toDouble / rgb.length
    assert(math.abs(mean - 0x80) < 4.0, s"jpeg mean drifted: $mean")
  }

  test("non-image and truncated payloads drop, never throw") {
    assert(Multimodal.ImageIoCodec.decode(Array[Byte]()).isEmpty)
    assert(Multimodal.ImageIoCodec.decode("not an image".getBytes).isEmpty)
    val png = encode(fixture(), "png")
    assert(Multimodal.ImageIoCodec.decode(png.take(20)).isEmpty)
    // the synthetic GMM1 payload is not an ImageIO format either
    assert(Multimodal.ImageIoCodec.decode(Multimodal.syntheticPayload(7L)).isEmpty)
  }

  test("decompression bomb: a 57-byte PNG declaring 4G pixels is rejected " +
    "from the header, before any pixel decode") {
    // handcraft signature + IHDR only: getWidth/getHeight read just this
    val w = 1 << 16
    val h = 1 << 16 // w*h = 2^32 > MaxPixels = 2^26
    val ihdrData = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII"))
    crc.update(ihdrData)
    val bomb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
      .put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      .putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdrData)
      .putInt(crc.getValue.toInt).array()
    assert(Multimodal.ImageIoCodec.decode(bomb).isEmpty)
    assert(w.toLong * h > Multimodal.ImageIoCodec.MaxPixels)
  }

  test("PNG query path == stub query path row-for-row (compressed round " +
    "trip invisible to features)") {
    val viaPng = Multimodal.pngFeaturesQuery(spark, sfDir).collect()
      .map(_.toSeq).toSet
    val viaStub = Multimodal.featuresQuery(spark, sfDir).collect()
      .map(_.toSeq).toSet
    assert(viaPng.nonEmpty && viaPng == viaStub)
  }
}
