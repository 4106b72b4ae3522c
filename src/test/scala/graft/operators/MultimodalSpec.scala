package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    Tables(spark, sf("sf0.001"), "documents")).cache()

  test("media table: binary payloads with typed kind metadata") {
    assert(media.count() == 500)
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(media.filter(length($"payload") > 0).count() == 500)
  }

  test("feature extraction: per-partition decoder, fixed-dim deterministic features") {
    val f1 = Multimodal.extractFeatures(media).cache()
    assert(f1.count() == 500)
    val rows = f1.collect()
    rows.foreach(r => assert(r.features.length == 16))
    // image rows went through the REAL javax.imageio decode: true 8x8
    // dimensions from the PNG header, luminance features in [0,1]
    val images = rows.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { r =>
      assert(r.decode_ok, s"media ${r.media_id}: PNG must decode")
      assert(r.meta_width == 8 && r.meta_height == 8)
      assert(r.features.forall(f => f >= 0.0f && f <= 1.0f))
    }
    // audio rows went through the REAL WAV parse: true sample rate and
    // frame count (one frame per text byte), RMS features in [0,1]
    val audio = rows.filter(_.kind == "audio")
    assert(audio.nonEmpty)
    audio.foreach { r =>
      assert(r.decode_ok, s"media ${r.media_id}: WAV must parse")
      assert(r.meta_width == 8000 && r.meta_height > 0)
      assert(r.n_bytes == 44 + 2 * r.meta_height, "header + 16-bit frames")
      assert(r.features.forall(f => f >= 0.0f && f <= 1.0f))
    }
    // video rows went through the REAL AVI parse + DIB frame decode:
    // true 8x8 pixel dimensions, per-time-bin mean luminance in [0,1]
    val videos = rows.filter(_.kind == "video")
    assert(videos.nonEmpty)
    videos.foreach { r =>
      assert(r.decode_ok, s"media ${r.media_id}: AVI must decode")
      assert(r.meta_width == 8 && r.meta_height == 8)
      assert(r.features.forall(f => f >= 0.0f && f <= 1.0f))
    }
    rows.foreach(r => assert(r.n_bytes > 0))
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(media)
    assert(f1.collect().sortBy(_.media_id).toSeq == f2.collect().sortBy(_.media_id).toSeq)
  }

  test("ImageIoDecoder: known-pixel PNG fixture decodes to exact luminance cells") {
    // 2x2 grayscale PNG with known gray levels; grid-4 cell assignment
    // puts pixel (x,y) into cell (min(3, y*4/2), min(3, x*4/2)) =
    // (y*2, x*2) -> cells 0, 2, 8, 10; all other cells stay 0.
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val grays = Seq(Seq(0, 51), Seq(102, 255)) // [y][x]
    for (y <- 0 until 2; x <- 0 until 2) {
      val g = grays(y)(x); img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val row = Multimodal.MediaRow(1L, "image", bos.toByteArray, "fixture")
    val f = new Multimodal.ImageIoDecoder().features(row)
    assert(f.decode_ok && f.meta_width == 2 && f.meta_height == 2)
    // integer luma of gray g is (g*299 + g*587 + g*114)/1000 = g
    def lum(g: Int): Float = (g.toDouble / 255.0).toFloat
    assert(f.features(0) == lum(0) && f.features(2) == lum(51))
    assert(f.features(8) == lum(102) && f.features(10) == lum(255))
    assert(Seq(1, 3, 4, 5, 6, 7, 9, 11, 12, 13, 14, 15).forall(f.features(_) == 0.0f))

    // corrupt payload: decode_ok = false, stub features keep the row alive
    val bad = Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3), "fixture")
    val fb = new Multimodal.ImageIoDecoder().features(bad)
    assert(!fb.decode_ok && fb.features.length == 16)
  }

  test("WavCodec: round trip and known-amplitude RMS bins") {
    // wavFromText: byte b -> sample (b-128)<<8; parse must return them exactly
    val wav = Multimodal.WavCodec.wavFromText("ab", sampleRate = 4000)
    val Some((rate, ch, samples)) = Multimodal.WavCodec.parse(wav)
    assert(rate == 4000 && ch == 1)
    assert(samples.toSeq == Seq((('a' - 128) << 8).toShort, (('b' - 128) << 8).toShort))

    // hand-built WAV: 32 frames, first 16 at amplitude 8192, rest silent ->
    // with dim=16, bins 0-7 have RMS 8192/32768 = 0.25, bins 8-15 have 0
    val bb = java.nio.ByteBuffer.allocate(44 + 64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 64).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(64)
    (0 until 32).foreach(i => bb.putShort(if (i < 16) 8192.toShort else 0.toShort))
    val row = Multimodal.MediaRow(1L, "audio", bb.array(), "fixture")
    val f = new Multimodal.JdkAvDecoder(16).features(row)
    assert(f.decode_ok && f.meta_width == 8000 && f.meta_height == 32)
    assert((0 until 8).forall(f.features(_) == 0.25f), f.features)
    assert((8 until 16).forall(f.features(_) == 0.0f), f.features)

    // non-WAV payload: decode_ok = false, stub features keep the row alive
    val bad = new Multimodal.JdkAvDecoder(16)
      .features(Multimodal.MediaRow(2L, "audio", Array[Byte](1, 2, 3), "fixture"))
    assert(!bad.decode_ok && bad.features.length == 16)
  }

  test("AviCodec: known-frame DIB AVI decodes to exact dimensions and luminance bins") {
    // aviFromText("A"): every pixel of every frame is byte 'A' = 65, so
    // every frame's integer mean luma is exactly 65; 4 frames into 16
    // bins -> bins {0,4,8,12} hold 65/255, the rest are empty (0)
    val avi = Multimodal.AviCodec.aviFromText("A")
    val Some(parsed) = Multimodal.AviCodec.parse(avi)
    assert(parsed.width == 8 && parsed.height == 8)
    assert(parsed.usPerFrame == 100000 && parsed.frames.length == 4)
    assert(parsed.bitCount == 24 && parsed.compression == 0)
    parsed.frames.foreach { case (fourcc, frame) =>
      assert(fourcc == "00db")
      assert(Multimodal.AviCodec.frameMeanLuma(parsed, fourcc, frame) === Some(65L))
    }
    val f = new Multimodal.JdkAvDecoder(16)
      .features(Multimodal.MediaRow(1L, "video", avi, "fixture"))
    assert(f.decode_ok && f.meta_width == 8 && f.meta_height == 8)
    val hot = (65.0 / 255.0).toFloat
    assert(Seq(0, 4, 8, 12).forall(f.features(_) == hot), f.features)
    assert((0 until 16).filterNot(Seq(0, 4, 8, 12).contains)
      .forall(f.features(_) == 0.0f), f.features)

    // malformed payloads: decode_ok = false, stub features keep the row
    val bad = new Multimodal.JdkAvDecoder(16)
      .features(Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3), "fixture"))
    assert(!bad.decode_ok && bad.features.length == 16)
    val truncated = new Multimodal.JdkAvDecoder(16)
      .features(Multimodal.MediaRow(3L, "video",
        java.util.Arrays.copyOfRange(avi, 0, avi.length - 50), "fixture"))
    assert(!truncated.decode_ok)
  }

  test("AviCodec: MJPEG ('00dc') frames decode through the JDK JPEG reader") {
    // one uniform-gray 16x16 JPEG frame: DC-only blocks survive JPEG
    // quantization nearly exactly -> mean luma within a few counts of 128
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (128 << 16) | (128 << 8) | 128)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val jpeg = jbos.toByteArray
    // minimal AVI: RIFF('AVI ') { LIST hdrl { avih }, LIST movi { 00dc } }
    val jlen = jpeg.length + (jpeg.length & 1)
    val hdrlLen = 4 + 8 + 56
    val moviLen = 4 + 8 + jlen
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    fourcc("RIFF"); bb.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(40000).putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(0).putInt(1).putInt(0)
      .putInt(16).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviLen); fourcc("movi")
    fourcc("00dc"); bb.putInt(jpeg.length); bb.put(jpeg)
    if ((jpeg.length & 1) == 1) bb.put(0.toByte)
    val f = new Multimodal.JdkAvDecoder(16)
      .features(Multimodal.MediaRow(4L, "video", bb.array(), "fixture"))
    assert(f.decode_ok && f.meta_width == 16 && f.meta_height == 16)
    // single frame lands in bin 0
    assert(math.abs(f.features(0) - 128.0f / 255.0f) < 3.0f / 255.0f, f.features)
    assert((1 until 16).forall(f.features(_) == 0.0f))
  }

  test("sampleFrames: real container-aware frame sampling keeps every stride-th frame") {
    val avi = Multimodal.AviCodec.aviFromText("hello frames", nFrames = 6)
    val m = Seq(Multimodal.MediaRow(7L, "video", avi, "fx"),
      Multimodal.MediaRow(8L, "video", Array[Byte](1, 2, 3), "fx")).toDS()
    val out = Multimodal.sampleFrames(m, stride = 2).collect()
    // frames 0, 2, 4 of the parseable video; the corrupt row drops out
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((7L, 0L), (7L, 2L), (7L, 4L)))
    assert(out.forall(_.getString(2) == "00db"))
    assert(out.forall(_.getLong(3) == 192L)) // 8 rows × 24B aligned stride
  }

  test("videoNearDupPairs: identical and re-rendered videos pair, distinct content doesn't") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different pixel content from other words entirely xyz"
    val m = Seq(
      Multimodal.MediaRow(1L, "video", Multimodal.AviCodec.aviFromText(t1), "fx"),
      Multimodal.MediaRow(2L, "video", Multimodal.AviCodec.aviFromText(t1), "fx"),
      Multimodal.MediaRow(3L, "video", Multimodal.AviCodec.aviFromText(t2), "fx"),
      Multimodal.MediaRow(4L, "image", Array[Byte](0), "fx")).toDS()
    // frame hashes: per-frame 64-bit aHash; identical payloads → identical
    val fh = Multimodal.videoFrameHashes(m).collect()
    assert(fh.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    val h1 = fh.filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val h2 = fh.filter(_.getLong(0) == 2L).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(h1 === h2)
    val pairs = Multimodal.videoNearDupPairs(m, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"identical videos must pair: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"distinct content must not pair: $pairs")
    val full = Multimodal.videoNearDupPairs(m, maxHamming = 3)
      .filter($"vid_a" === 1 && $"vid_b" === 2).head()
    assert(full.getAs[Long]("shared_ppm") === 1000000L)
    assert(full.getAs[Long]("nf_a") === 4 && full.getAs[Long]("nf_b") === 4)
  }

  test("videoNearDupPairs: a trimmed clip matches all of its own frames") {
    // clip = first 2 frames of the long video's 6: same per-frame pixels
    // (aviFromText pixels depend only on absolute frame index)
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val long = Multimodal.AviCodec.aviFromText(text, nFrames = 6)
    val clip = Multimodal.AviCodec.aviFromText(text, nFrames = 2)
    val m = Seq(Multimodal.MediaRow(1L, "video", long, "fx"),
      Multimodal.MediaRow(2L, "video", clip, "fx")).toDS()
    val p = Multimodal.videoNearDupPairs(m, maxHamming = 0).head()
    assert(p.getAs[Long]("vid_a") === 1L && p.getAs[Long]("vid_b") === 2L)
    assert(p.getAs[Long]("n_match_b") === 2L && p.getAs[Long]("nf_b") === 2L)
    assert(p.getAs[Long]("shared_ppm") === 1000000L) // clip side fully covered
  }

  test("chunk sampling keeps every stride-th chunk") {
    val out = Multimodal.sampleChunks(media.toDF(), chunkBytes = 50, stride = 2)
    val one = out.filter($"media_id" === media.head().media_id)
    assert(one.count() >= 1)
    assert(out.filter(length($"chunk") > 50).count() == 0)
  }

  test("resize stub: caps payload size, preserves metadata, deterministic") {
    val resized = Multimodal.resizeStub(media, targetBytes = 40)
    assert(resized.collect().forall(_.payload.length <= 40))
    val before = media.collect().map(r => r.media_id -> r.kind).toMap
    assert(resized.collect().map(r => r.media_id -> r.kind).toMap == before)
    val a = Multimodal.resizeStub(media, 40).collect().map(_.payload.toSeq).toSet
    val b = Multimodal.resizeStub(media, 40).collect().map(_.payload.toSeq).toSet
    assert(a == b)
    // short payloads pass through untouched
    val short = media.filter(r => r.payload.length <= 40).collect().map(_.media_id).toSet
    val kept = Multimodal.resizeStub(media, 40).collect()
      .filter(r => short(r.media_id)).map(_.payload.length).toSet
    assert(media.collect().filter(r => short(r.media_id))
      .map(_.payload.length).toSet == kept)
  }

  test("features feed the standard vector operators (cosine over media)") {
    import graft.functions.GraftFunctions.cosine_sim
    val f = Multimodal.extractFeatures(media).toDF()
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val knn = Knn.exact(f, f.filter($"vec_id" < 3), k = 2)
    assert(knn.count() == 6)
    val sims = knn.select($"sim").as[Double].collect()
    assert(sims.forall(s => s >= -1.0 && s <= 1.0 + 1e-9))
  }

  test("imageAHash64: perceptual near-dups collide, distinct images don't") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // base: strong gradient; near: same with ONE cell nudged (stays on the
    // same side of the mean); far: inverted gradient (every bit flips)
    val base = png((x, y) => x * 32)
    val near = png((x, y) => if (x == 7 && y == 7) 230 else x * 32)
    val far = png((x, y) => 255 - x * 32)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", base, "s"),
      Multimodal.MediaRow(2L, "image", near, "s"),
      Multimodal.MediaRow(3L, "image", far, "s"),
      Multimodal.MediaRow(4L, "audio", base, "s"), // non-image: dropped
      Multimodal.MediaRow(5L, "image", Array[Byte](1, 2, 3), "s")) // bad decode: dropped
    val sigs = Multimodal.imageAHash64(spark.createDataset(rows)).cache()
    assert(sigs.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val pairs = Dedup.hammingPairs64(sigs, maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "visually-near pair must collide")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "inverted image must stay far")
    // hash is a pure function of pixels: identical images -> identical bits
    val again = Multimodal.imageAHash64(spark.createDataset(rows))
    assert(sigs.collect().toSet == again.collect().toSet)
  }
}
