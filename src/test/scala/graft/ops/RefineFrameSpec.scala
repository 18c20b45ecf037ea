package graft.ops

import graft.SparkSpec

/** Two-stage PQ refine, RANGE-frame window, frame-sampling stats. */
class RefineFrameSpec extends SparkSpec {
  import spark.implicits._

  test("refined PQ search recall beats or equals raw ADC recall") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = Similarity.queryVectors(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adc = Similarity.pqSearch(spark, emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val refined = Similarity.pqSearchRefined(spark, emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rAdc = (exact & adc).size.toDouble / exact.size
    val rRef = (exact & refined).size.toDouble / exact.size
    // exact re-rank of a 4x shortlist can only improve the ordering
    assert(rRef >= rAdc, s"refined $rRef < adc $rAdc")
    assert(rRef >= 0.5, s"refined recall@5 = $rRef")
  }

  test("SRP-LSH (md5 planes) reaches useful recall and excludes self") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = Similarity.queryVectors(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val srp = Similarity.srpLshTopK(spark, emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(!srp.exists(r => r._1 == r._2))
    val recall = (exact & srp.toSet).size.toDouble / exact.size
    assert(recall >= 0.4, s"SRP recall@5 = $recall")
  }

  test("range-frame window: trailing sum covers same-day ties deterministically") {
    val rows = graft.queries.Relational.q31RangeWindow(spark, sfDir)
      .as[(Long, Long, Int, Double, Long)].collect()
    assert(rows.nonEmpty)
    // every frame contains at least its own row
    assert(rows.forall(_._5 >= 1))
    // recompute one customer brute-force
    val byCust = rows.groupBy(_._2)
    val (cust, cRows) = byCust.maxBy(_._2.length)
    cRows.foreach { case (_, _, day, trailing, n) =>
      val window = cRows.filter(r => r._3 >= day - 6 && r._3 <= day)
      assert(window.length.toLong == n, s"cust $cust day $day")
    }
  }

  test("frame stats match a local replay of the payload slicing") {
    val out = Multimodal.frameStatsQuery(spark, sfDir)
      .as[(Long, Int, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out.nonEmpty)
    // local ground truth for a handful of ids
    (0L to 5L).foreach { id =>
      val body = Multimodal.syntheticPayload(id).drop(8)
      val nFrames = body.length / Multimodal.FrameSize
      (0 until nFrames by Multimodal.FrameStride).foreach { f =>
        val fr = body.slice(f * Multimodal.FrameSize, (f + 1) * Multimodal.FrameSize)
          .map(_ & 0xff)
        assert(out((id, f)) == ((fr.map(_.toLong).sum, fr.min, fr.max)),
          s"media $id frame $f")
      }
      // no partial or off-stride frames leak through
      assert(!out.keys.exists { case (m, f) =>
        m == id && (f % Multimodal.FrameStride != 0 || f >= nFrames) })
    }
  }

  test("a custom MediaCodec drops in without changing any query shape") {
    val rows = Multimodal
      .extractFeatures(Multimodal.mediaTable(spark, sfDir), WhiteCodec)
      .collect()
    assert(rows.nonEmpty)
    // all-255 pixels: mean_byte_x100 = 25500 exactly, entropy 0
    assert(rows.forall(r => r.width == 2 && r.height == 2 &&
      r.mean_byte_x100 == 25500L && r.byte_entropy == 0.0))
    // and the default instance still routes through StubCodec unchanged
    val stub = Multimodal
      .extractFeatures(Multimodal.mediaTable(spark, sfDir)).take(1).head
    assert(stub.width != 2 || stub.height != 2 || stub.mean_byte_x100 != 25500L)
  }

  test("NetpbmCodec decodes real P6/P5 fixtures through the full feature " +
      "pipeline") {
    import spark.implicits._
    // a 2x2 P6 image with a header comment: pixels RGB = (10,20,30),
    // (40,50,60), (70,80,90), (100,110,120)
    val raster6 = Array.tabulate[Byte](12)(i => ((i + 1) * 10).toByte)
    val ppm = "P6\n# fixture\n2 2\n255\n".getBytes("US-ASCII") ++ raster6
    assert(Multimodal.NetpbmCodec.decode(ppm)
      .exists { case (w, h, b) => w == 2 && h == 2 &&
        b.sameElements(raster6) })
    // a 3x1 P5 grayscale: luma 0, 128, 255
    val raster5 = Array[Byte](0, -128, -1)
    val pgm = "P5 3 1 255 ".getBytes("US-ASCII") ++ raster5
    assert(Multimodal.NetpbmCodec.decode(pgm)
      .exists { case (w, h, b) => w == 3 && h == 1 &&
        b.sameElements(raster5) })
    // malformed payloads drop (None), never throw: bad magic, 16-bit
    // maxval, truncated raster
    assert(Multimodal.NetpbmCodec.decode("P7 2 2 255 x".getBytes).isEmpty)
    assert(Multimodal.NetpbmCodec
      .decode(("P6 2 2 65535 ".getBytes("US-ASCII") ++ raster6)).isEmpty)
    assert(Multimodal.NetpbmCodec
      .decode("P6 2 2 255 ".getBytes("US-ASCII") ++ raster6.take(5)).isEmpty)
    // adversarial headers drop too (the contract is None, never a throw):
    // a dimension token that would overflow Int.parseInt...
    assert(Multimodal.NetpbmCodec
      .decode(("P6 99999999999 2 255 ".getBytes("US-ASCII") ++ raster6))
      .isEmpty)
    // ...and dims whose product wraps Int negative (46341^2 > 2^31), which
    // used to pass the truncation check and crash in copyOfRange
    assert(Multimodal.NetpbmCodec
      .decode(("P6 46341 46341 255 ".getBytes("US-ASCII") ++ raster6))
      .isEmpty)
    // end-to-end: the real decoder rides the same extractFeatures path
    val media = Seq(
      Multimodal.MediaItem(1L, "image", ppm, ppm.length.toLong),
      Multimodal.MediaItem(2L, "image", pgm, pgm.length.toLong),
      Multimodal.MediaItem(3L, "image", Array[Byte](9, 9), 2L))
      .toDS()
    val feats = Multimodal.extractFeatures(media, Multimodal.NetpbmCodec)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L)) // undecodable row 3 dropped
    // P6 mean = (10+20+...+120)/12 = 65 -> 6500; P5 mean = 383/3 ->
    // half-up 12767
    assert(feats(1L).mean_byte_x100 == 6500L)
    assert(feats(2L).mean_byte_x100 == 12767L)
    // 12 distinct bytes -> entropy log2(12); 3 distinct -> log2(3)
    assert(math.abs(feats(1L).byte_entropy -
      math.log(12) / math.log(2)) < 1e-3)
    assert(math.abs(feats(2L).byte_entropy -
      math.log(3) / math.log(2)) < 1e-3)
  }
  test("BmpCodec handles stride padding, bottom-up order, and BGR swap") {
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int) = Array(v, v >> 8).map(_.toByte)
    // 3x2 24-bit BI_RGB: rows pad 9 -> 12 bytes; stored bottom-up in BGR.
    // Intended top-down RGB image: row0 = red, green, blue;
    // row1 = (10,20,30), (40,50,60), (70,80,90)
    val raster = Array[Byte](
      30, 20, 10, 60, 50, 40, 90, 80, 70, 0, 0, 0, // bottom row + pad
      0, 0, -1, 0, -1, 0, -1, 0, 0, 0, 0, 0) // top row + pad
    def bmp(height: Int) =
      "BM".getBytes("US-ASCII") ++ le32(54 + raster.length) ++ le16(0) ++
        le16(0) ++ le32(54) ++ le32(40) ++ le32(3) ++ le32(height) ++
        le16(1) ++ le16(24) ++ le32(0) ++ le32(raster.length) ++
        le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ raster
    val topDownRgb = Array[Byte](
      -1, 0, 0, 0, -1, 0, 0, 0, -1,
      10, 20, 30, 40, 50, 60, 70, 80, 90)
    // positive height: stored bottom-up, decode flips to top-down RGB
    assert(Multimodal.BmpCodec.decode(bmp(2))
      .exists { case (w, h, b) => w == 3 && h == 2 &&
        b.sameElements(topDownRgb) })
    // negative height: stored top-down, so the SAME raster reads flipped
    val flipped = topDownRgb.grouped(9).toSeq.reverse.flatten.toArray
    assert(Multimodal.BmpCodec.decode(bmp(-2))
      .exists { case (w, h, b) => w == 3 && h == 2 &&
        b.sameElements(flipped) })
    // corrupt payloads drop, never throw: truncated raster, unsupported
    // bpp, dimensions that would overflow the raster size
    assert(Multimodal.BmpCodec.decode(bmp(2).dropRight(1)).isEmpty)
    val bpp32 = bmp(2); bpp32(28) = 32
    assert(Multimodal.BmpCodec.decode(bpp32).isEmpty)
    val huge = bmp(2)
    System.arraycopy(le32(Int.MaxValue), 0, huge, 18, 4)
    assert(Multimodal.BmpCodec.decode(huge).isEmpty)
    // and the codec rides the same extractFeatures path as the others
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaItem(1L, "image", bmp(2), 78L),
      Multimodal.MediaItem(2L, "image", Array[Byte]('B', 'M', 0), 3L))
      .toDS()
    val feats = Multimodal.extractFeatures(media, Multimodal.BmpCodec)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L))
    // mean over the UNPADDED rgb bytes: (765 + 450) / 18 = 67.5 -> 6750
    assert(feats(1L).width == 3 && feats(1L).height == 2 &&
      feats(1L).mean_byte_x100 == 6750L)
  }
}

/** A "decoder" that reports every payload as a 2x2 white image — stands
  * in for a real imageio/ffmpeg adapter in the plug-point test (top
  * level so the closure ships without dragging the spec instance along).
  */
object WhiteCodec extends Multimodal.MediaCodec {
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    Some((2, 2, Array.fill[Byte](4)(-1)))
}
