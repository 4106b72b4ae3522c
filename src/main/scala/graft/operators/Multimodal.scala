package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (LLM-data-pipeline extension).
  *
  * Media (image/audio/video) travels as opaque `binary` columns with typed
  * metadata — the lakehouse pattern for training-data pipelines. The
  * Spark-side plumbing is real and tested: schema, per-partition decoder
  * initialization (`mapPartitions`, one decoder instance per partition —
  * the shape you need when the real decoder is an expensive native library
  * or model), batch-friendly row flow, and deterministic partitioning.
  *
  * IMAGE decode is REAL: [[ImageIoDecoder]] uses the JDK's built-in
  * `javax.imageio` (PNG/JPEG/GIF/BMP) — true pixel dimensions and
  * luminance-grid features from decoded pixels. AUDIO decode is REAL for
  * PCM WAV: [[WavCodec]] is a dependency-free RIFF parser (the container
  * has no codec libraries, but WAV needs none) — true sample rate, frame
  * count, and per-time-bin RMS energy features. VIDEO decode is REAL for
  * AVI: [[AviCodec]] walks the RIFF `hdrl`/`movi` lists (the same
  * chunk-parser discipline as [[WavCodec]]) and decodes frames —
  * uncompressed BI_RGB DIB frames by direct pixel parse, MJPEG frames
  * through the JDK JPEG reader — into true dimensions, frame count and
  * per-time-bin mean-luminance features.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Extracted features + decode metadata. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Seq[Float], // fixed-dim feature vector
      meta_width: Int, // stub: derived; real: decoded pixel width
      meta_height: Int,
      decode_ok: Boolean)

  /** Decoder contract: initialized once per partition (expensive native
    * setup happens in the constructor), then called per row. */
  trait MediaDecoder extends Serializable {
    def features(row: MediaRow): MediaFeatures
  }

  /** STUB decoder — deterministic byte-level pseudo-features standing in
    * for a real image/audio decode (none available in this environment).
    * Real features would come from e.g. JPEG decode + CNN embedding; the
    * byte histogram keeps the dataflow, schema and determinism identical. */
  final class StubDecoder(dim: Int = 16) extends MediaDecoder {
    override def features(row: MediaRow): MediaFeatures = {
      val hist = new Array[Float](dim)
      var i = 0
      val p = row.payload
      while (i < p.length) { hist((p(i) & 0xff) % dim) += 1.0f; i += 1 }
      val n = math.max(1, p.length).toFloat
      var j = 0
      while (j < dim) { hist(j) /= n; j += 1 }
      // stub "dimensions": derived from content so they're stable
      val w = 64 + ((if (p.length > 0) p(0) & 0xff else 0) % 64)
      val h = 64 + ((if (p.length > 1) p(1) & 0xff else 0) % 64)
      MediaFeatures(row.media_id, row.kind, p.length.toLong,
        hist.toSeq, w, h, decode_ok = p.nonEmpty)
    }
  }

  /** Real image decode + featurization via the JDK's `javax.imageio` —
    * zero external dependencies. Image payloads that decode yield their
    * TRUE pixel dimensions and a `grid × grid` mean-luminance feature
    * vector (row-major, [0,1], integer-exact cell assignment so results
    * are deterministic on any JVM). Image payloads that fail to decode
    * report `decode_ok = false` over stub features; audio/video kinds
    * (no JDK codec) keep the stub path. */
  final class ImageIoDecoder(dim: Int = 16) extends MediaDecoder {
    private val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a square, got $dim")
    @transient private lazy val stub = {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      new StubDecoder(dim)
    }

    override def features(row: MediaRow): MediaFeatures = {
      if (row.kind != "image") stub.features(row)
      else {
        // NonFatal: JDK readers throw RuntimeExceptions on malformed
        // payloads; every decode failure must yield decode_ok=false
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) stub.features(row).copy(decode_ok = false)
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = new Array[Long](dim)
          val counts = new Array[Long](dim)
          var y = 0
          while (y < h) {
            val cy = math.min(grid - 1, y * grid / h)
            var x = 0
            while (x < w) {
              val cx = math.min(grid - 1, x * grid / w)
              val rgb = img.getRGB(x, y)
              // integer ITU-R 601 luma — deterministic across JVMs
              val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              val c = cy * grid + cx
              sums(c) += luma; counts(c) += 1
              x += 1
            }
            y += 1
          }
          val feats = Array.tabulate(dim)(i =>
            if (counts(i) == 0) 0.0f
            else (sums(i).toDouble / counts(i) / 255.0).toFloat)
          MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
            feats.toSeq, w, h, decode_ok = true)
        }
      }
    }
  }

  /** Minimal PCM WAV (RIFF) codec — pure JDK, no codec libraries needed.
    * Little-endian chunk walk: "RIFF"+"WAVE" header, then `fmt ` (PCM only,
    * 16-bit) and `data` sub-chunks in any order. */
  object WavCodec {
    /** (sampleRate, channels, interleaved 16-bit samples), or None if the
      * payload is not a 16-bit PCM WAV. */
    def parse(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def tag(o: Int): String = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
      var data: Option[(Int, Int)] = None // offset, len
      while (off + 8 <= bytes.length) {
        val id = tag(off); val size = le32(off + 4)
        if (size < 0 || off + 8 + size > bytes.length) return None
        if (id == "fmt " && size >= 16)
          fmt = Some((le16(off + 8), le16(off + 10), le32(off + 12), le16(off + 22)))
        if (id == "data") data = Some((off + 8, size))
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      for {
        (format, channels, rate, bits) <- fmt
        (dOff, dLen) <- data
        if format == 1 && bits == 16 && channels >= 1 && rate > 0
      } yield {
        val n = dLen / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = le16(dOff + 2 * i).toShort; i += 1 }
        (rate, channels, samples)
      }
    }

    /** 16-bit PCM mono WAV with one sample per text byte (centered, full
      * scale) — a REAL audio payload that is a pure function of the text,
      * so the demo media table exercises the true parse path end-to-end. */
    def wavFromText(text: String, sampleRate: Int = 8000): Array[Byte] = {
      val src = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.max(1, src.length)
      val dataLen = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(sampleRate)
        .putInt(sampleRate * 2).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        val b = if (src.isEmpty) 0 else src(i) & 0xff
        bb.putShort((((b - 128)) << 8).toShort)
        i += 1
      }
      bb.array()
    }
  }

  /** Minimal AVI (RIFF 'AVI ') parser — pure JDK, the [[WavCodec]] chunk
    * discipline extended to NESTED lists: `LIST hdrl` holds the `avih`
    * main header (frame timing, total frames, dimensions) and per-stream
    * `LIST strl` (`strh` stream header + `strf` format — BITMAPINFOHEADER
    * for the `vids` stream gives bit depth and compression); `LIST movi`
    * holds the frame chunks (`..db` uncompressed DIB / `..dc` compressed,
    * e.g. MJPEG). Bounds-checked walk, word-aligned chunks, no seeking
    * past the buffer — a malformed payload yields None, never a throw. */
  object AviCodec {
    /** Parsed stream: true dimensions, frame timing, the vids stream's
      * bit depth + biCompression (0 = BI_RGB), and the raw frame chunks
      * (fourcc, bytes) in stream order. */
    final case class Avi(width: Int, height: Int, usPerFrame: Int,
        bitCount: Int, compression: Int,
        frames: Vector[(String, Array[Byte])])

    def parse(bytes: Array[Byte]): Option[Avi] = {
      def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def tag(o: Int): String = new String(bytes, o, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
      var width = 0; var height = 0; var usPerFrame = 0
      var bitCount = -1; var compression = 0
      var inVidsStream = false
      val frames = Vector.newBuilder[(String, Array[Byte])]
      def walk(start: Int, end: Int): Boolean = {
        var off = start
        while (off + 8 <= end) {
          val id = tag(off); val size = le32(off + 4)
          if (size < 0 || off + 8 + size > end) return false
          if (id == "LIST" && size >= 4) {
            val sub = tag(off + 8)
            if (sub == "hdrl" || sub == "strl" || sub == "movi" || sub == "rec ")
              if (!walk(off + 12, off + 8 + size)) return false
          } else if (id == "avih" && size >= 40) {
            usPerFrame = le32(off + 8)
            width = le32(off + 8 + 32); height = le32(off + 8 + 36)
          } else if (id == "strh" && size >= 4) {
            inVidsStream = tag(off + 8) == "vids"
          } else if (id == "strf" && size >= 20 && inVidsStream && bitCount < 0) {
            bitCount = le16(off + 8 + 14); compression = le32(off + 8 + 16)
          } else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc"))) {
            frames += ((id, java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)))
          }
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
        true
      }
      if (!walk(12, bytes.length)) None
      else if (width <= 0 || height <= 0) None
      else Some(Avi(width, height, usPerFrame,
        if (bitCount < 0) 24 else bitCount, compression, frames.result()))
    }

    /** `grid × grid` integer mean-luminance cells (row-major TOP-DOWN
      * image order, 0..255) of one frame — the shared primitive behind
      * the frame mean and the per-frame perceptual hash. `..db` BI_RGB
      * 24-bit DIB frames by direct pixel walk (bottom-up rows flipped
      * into image order, 4-byte-aligned stride, BGR), `..dc` frames
      * through `javax.imageio` (MJPEG). Integer ITU-R 601 luma and
      * integer cell assignment — deterministic on any JVM. None if the
      * frame doesn't decode. */
    def frameLumaGrid(avi: Avi, fourcc: String, frame: Array[Byte],
        grid: Int): Option[Array[Long]] = {
      val sums = new Array[Long](grid * grid)
      val counts = new Array[Long](grid * grid)
      def cell(x: Int, y: Int, w: Int, h: Int): Int =
        math.min(grid - 1, y * grid / h) * grid + math.min(grid - 1, x * grid / w)
      val ok: Boolean =
        if (fourcc.endsWith("db") && avi.compression == 0 && avi.bitCount == 24) {
          val w = avi.width; val h = avi.height
          val stride = ((w * 3 + 3) / 4) * 4
          if (frame.length < stride * h) false
          else {
            var ys = 0
            while (ys < h) {
              val y = h - 1 - ys // DIB rows are stored bottom-up
              var x = 0
              while (x < w) {
                val o = ys * stride + x * 3
                val luma = ((frame(o + 2) & 0xff) * 299 + (frame(o + 1) & 0xff) * 587 +
                  (frame(o) & 0xff) * 114) / 1000
                val c = cell(x, y, w, h)
                sums(c) += luma; counts(c) += 1
                x += 1
              }
              ys += 1
            }
            true
          }
        } else {
          // NonFatal, not just IOException: JDK image readers throw
          // RuntimeExceptions (ArrayIndexOutOfBounds, CMMException,
          // IllegalArgument) on malformed frame bytes — any decode
          // failure must take the frame-drop path, never kill the task
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) false
          else {
            val w = img.getWidth; val h = img.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val c = cell(x, y, w, h)
                sums(c) += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                counts(c) += 1
                x += 1
              }
              y += 1
            }
            true
          }
        }
      if (!ok) None
      else Some(Array.tabulate(grid * grid)(i =>
        if (counts(i) == 0) 0L else sums(i) / counts(i)))
    }

    /** Integer mean luminance (0..255) of one frame — [[frameLumaGrid]]
      * at grid 1. */
    def frameMeanLuma(avi: Avi, fourcc: String, frame: Array[Byte]): Option[Long] =
      frameLumaGrid(avi, fourcc, frame, 1).map(_(0))

    /** Deterministic uncompressed-DIB AVI (8×8 BI_RGB, `nFrames` frames at
      * 10 fps) whose pixels derive from the text bytes with a per-frame
      * offset — a REAL video payload that is a pure function of the text,
      * so the demo media table exercises the true AVI parse + DIB decode
      * path end-to-end (the [[Multimodal.pngFromText]] discipline). */
    def aviFromText(text: String, nFrames: Int = 4): Array[Byte] = {
      val src = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val w = 8; val h = 8
      val stride = ((w * 3 + 3) / 4) * 4
      val frameLen = stride * h
      val strlLen = 4 + 8 + 56 + 8 + 40 // 'strl' + strh + strf
      val hdrlLen = 4 + 8 + 56 + 8 + strlLen // 'hdrl' + avih + LIST strl
      val moviLen = 4 + nFrames * (8 + frameLen)
      val riffLen = 4 + 8 + hdrlLen + 8 + moviLen
      val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      fourcc("RIFF"); bb.putInt(riffLen); fourcc("AVI ")
      fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
      fourcc("avih"); bb.putInt(56)
      bb.putInt(100000).putInt(0).putInt(0).putInt(0) // usPerFrame=10fps
        .putInt(nFrames).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); bb.putInt(strlLen); fourcc("strl")
      fourcc("strh"); bb.putInt(56)
      fourcc("vids"); fourcc("DIB ")
      bb.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(10) // scale 1, rate 10
        .putInt(0).putInt(nFrames).putInt(frameLen).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      fourcc("strf"); bb.putInt(40)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(frameLen).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc("LIST"); bb.putInt(moviLen); fourcc("movi")
      var f = 0
      while (f < nFrames) {
        fourcc("00db"); bb.putInt(frameLen)
        var ys = 0
        while (ys < h) {
          val y = h - 1 - ys // DIB rows are stored bottom-up
          var x = 0
          while (x < w) {
            val g = if (src.isEmpty) 0
              else src((f * w * h + y * w + x) % src.length) & 0xff
            bb.put(g.toByte).put(g.toByte).put(g.toByte) // B G R, gray
            x += 1
          }
          var pad = w * 3
          while (pad < stride) { bb.put(0.toByte); pad += 1 }
          ys += 1
        }
        f += 1
      }
      bb.array()
    }
  }

  /** Full JDK decoder: REAL image decode (imageio), REAL PCM-WAV audio
    * decode ([[WavCodec]] → per-time-bin RMS energy in [0,1], true sample
    * rate as `meta_width`, frame count as `meta_height`), REAL AVI video
    * decode ([[AviCodec]] → per-time-bin mean luminance in [0,1], true
    * pixel dimensions as `meta_width`/`meta_height`; DIB frames by direct
    * parse, MJPEG via the JDK JPEG reader). Payloads that fail their
    * decoder — or any single frame that fails — report `decode_ok = false`
    * over stub features so the row stays alive for triage. */
  final class JdkAvDecoder(dim: Int = 16) extends MediaDecoder {
    private val image = new ImageIoDecoder(dim)
    @transient private lazy val stub = new StubDecoder(dim)

    override def features(row: MediaRow): MediaFeatures = row.kind match {
      case "image" => image.features(row)
      case "audio" =>
        WavCodec.parse(row.payload) match {
          case None => stub.features(row).copy(decode_ok = false)
          case Some((rate, channels, samples)) =>
            val frames = samples.length / math.max(1, channels)
            val sumsq = new Array[Double](dim)
            val counts = new Array[Long](dim)
            var f = 0
            while (f < frames) {
              // integer mean over channels (mono mix), integer bin index —
              // deterministic on any JVM
              var acc = 0L; var c = 0
              while (c < channels) { acc += samples(f * channels + c); c += 1 }
              val mono = (acc / channels).toDouble
              val bin = math.min(dim - 1, (f.toLong * dim / math.max(1, frames)).toInt)
              sumsq(bin) += mono * mono; counts(bin) += 1
              f += 1
            }
            val feats = Array.tabulate(dim)(i =>
              if (counts(i) == 0) 0.0f
              else (math.sqrt(sumsq(i) / counts(i)) / 32768.0).toFloat)
            MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
              feats.toSeq, rate, frames, decode_ok = true)
        }
      case "video" =>
        AviCodec.parse(row.payload) match {
          case None => stub.features(row).copy(decode_ok = false)
          case Some(avi) =>
            val n = avi.frames.length
            val sums = new Array[Long](dim)
            val counts = new Array[Long](dim)
            var ok = n > 0
            var f = 0
            while (ok && f < n) {
              val (fourcc, frame) = avi.frames(f)
              AviCodec.frameMeanLuma(avi, fourcc, frame) match {
                case None => ok = false // one bad frame fails the row
                case Some(luma) =>
                  // integer bin index — deterministic on any JVM (the
                  // WAV time-bin discipline)
                  val bin = math.min(dim - 1, (f.toLong * dim / n).toInt)
                  sums(bin) += luma; counts(bin) += 1
              }
              f += 1
            }
            if (!ok) stub.features(row).copy(decode_ok = false)
            else {
              val feats = Array.tabulate(dim)(i =>
                if (counts(i) == 0) 0.0f
                else (sums(i).toDouble / counts(i) / 255.0).toFloat)
              MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
                feats.toSeq, avi.width, avi.height, decode_ok = true)
            }
        }
      case _ => stub.features(row)
    }
  }

  /** Feature extraction over a media Dataset. `mapPartitions` so the
    * decoder is constructed once per partition, not per row. */
  def extractFeatures(
      media: Dataset[MediaRow],
      makeDecoder: () => MediaDecoder = () => new JdkAvDecoder()): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = makeDecoder() // per-partition init (real: load codec/model)
      rows.map(decoder.features)
    }
  }

  /** Byte-level chunk sampling on the OPAQUE payload: every `stride`-th
    * chunk of `chunkBytes` — for formats without a parser. Video rows
    * have a real container-aware alternative: [[sampleFrames]] emits
    * actual decoded-boundary frames. */
  def sampleChunks(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      posexplode(transform(
        filter(sequence(lit(0), (length(col("payload")) / chunkBytes).cast("int")),
          i => i % stride === 0),
        i => substring(col("payload"), i * chunkBytes + 1, lit(chunkBytes))))
        .as(Seq("chunk_idx", "chunk")))

  /** Stub resize: the real implementation decodes, resizes, re-encodes;
    * the stub keeps the dataflow shape (binary in → binary out + metadata
    * preserved) with a deterministic byte downsample to `targetBytes`.
    * Per-partition decoder-style init is unnecessary here — resize is pure
    * per-row — so it stays a narrow map. */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetBytes > 0)
    media.map { r =>
      val p = r.payload
      val out =
        if (p.length <= targetBytes) p
        else {
          val step = p.length.toDouble / targetBytes
          Array.tabulate(targetBytes)(i => p((i * step).toInt))
        }
      r.copy(payload = out)
    }
  }

  /** 64-bit perceptual average-hash (aHash) over REALLY-decoded images:
    * 8×8 mean-luminance grid from [[ImageIoDecoder]] (true pixels, not
    * payload bytes), bit j set iff cell j's luminance exceeds the grid
    * mean. Emitted as two 32-bit halves (media_id → doc_id, sim_lo,
    * sim_hi) so [[Dedup.hammingPairs64]] can band them into near-dup
    * pairs with exact pigeonhole recall — visually-close images collide
    * within a few bits even when their encoded bytes share nothing
    * (re-encode, metadata churn), which is exactly why image dedup hashes
    * pixels, not payloads. Non-image rows and failed decodes drop out. */
  def imageAHash64(media: Dataset[MediaRow]): DataFrame = {
    val feats = extractFeatures(media, () => new ImageIoDecoder(64)).toDF()
      .filter(col("kind") === "image" && col("decode_ok"))
    val mean = aggregate(col("features"), lit(0.0d), (acc, x) => acc + x) / size(col("features"))
    feats
      .withColumn("_m", mean)
      .select(col("media_id").as("doc_id"),
        expr("aggregate(filter(transform(features, (x, j) -> IF(x > _m AND j < 32, j, -1)), j -> j >= 0), " +
          "CAST(0 AS BIGINT), (acc, j) -> acc | shiftleft(CAST(1 AS BIGINT), j))").as("sim_lo"),
        expr("aggregate(filter(transform(features, (x, j) -> IF(x > _m AND j >= 32, j - 32, -1)), j -> j >= 0), " +
          "CAST(0 AS BIGINT), (acc, j) -> acc | shiftleft(CAST(1 AS BIGINT), j))").as("sim_hi"))
  }

  /** REAL video frame sampling: every `stride`-th decoded frame chunk of
    * each AVI payload, with its container fourcc — the keyframe-seek
    * pattern [[sampleChunks]]' byte-level stand-in approximated before
    * [[AviCodec]] existed. `mapPartitions` so the container parse runs
    * once per row; frames explode inside the task (fan-out bounded by
    * frames-per-video / stride). Rows that fail to parse drop out —
    * route them through [[extractFeatures]]' `decode_ok = false` leg for
    * triage. Returns (media_id, frame_idx, fourcc, n_bytes, frame). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(stride >= 1)
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        AviCodec.parse(r.payload).iterator.flatMap { avi =>
          avi.frames.iterator.zipWithIndex.collect {
            case ((fcc, fb), i) if i % stride == 0 =>
              (r.media_id, i.toLong, fcc, fb.length.toLong, fb)
          }
        }
      }
    }.toDF("media_id", "frame_idx", "fourcc", "n_bytes", "frame")
  }

  /** Per-frame 64-bit perceptual average-hash over REALLY-decoded AVI
    * frames: the 8×8 [[AviCodec.frameLumaGrid]] cells, bit j set iff
    * cell j's luminance exceeds the frame's cell mean — the video analog
    * of [[imageAHash64]], emitted in the same two-32-bit-half shape so
    * [[Dedup.hammingPairs64]] can band frames directly. Returns
    * (media_id, frame_idx, sim_lo, sim_hi); unparseable videos and
    * undecodable frames drop out. */
  def videoFrameHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        AviCodec.parse(r.payload).iterator.flatMap { avi =>
          avi.frames.iterator.zipWithIndex.flatMap { case ((fcc, fb), i) =>
            AviCodec.frameLumaGrid(avi, fcc, fb, 8).map { cells =>
              val mean = cells.sum.toDouble / cells.length
              var lo = 0L; var hi = 0L
              var j = 0
              while (j < 64) {
                if (cells(j) > mean) {
                  if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
                }
                j += 1
              }
              (r.media_id, i.toLong, lo, hi)
            }
          }
        }
      }
    }.toDF("media_id", "frame_idx", "sim_lo", "sim_hi")
  }

  /** Video near-duplicate pairs by shared visually-near frames: frame
    * aHashes band through [[Dedup.hammingPairs64]]'s exact pigeonhole
    * blocks (never all-pairs — the image-dedup engine reused at the
    * frame level), matched frames roll up per video pair, and a pair
    * survives when either side has ≥ `minSharedPpm` of its frames
    * matched. Catches re-encodes, watermark/metadata churn and
    * trim-edits (a clip wholly inside a longer video still matches ALL
    * of its own frames → ppm 10⁶ on its side). Frame ids pack as
    * `media_id · 2²⁰ + frame_idx`, guarded by a hard require: a
    * container with ≥ 2²⁰ frame chunks (or a media_id ≥ 2⁴³) would
    * silently alias frames into the wrong video — fail loudly instead
    * (≈ 29 h of 10-fps video per container; route longer assets through
    * chunked ingestion).
    *
    * Returns (vid_a, vid_b, n_match_a, n_match_b, nf_a, nf_b,
    * shared_ppm), vid_a < vid_b. */
  def videoNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3,
      minSharedPpm: Long = 500000L): DataFrame = {
    // persisted across its two consumers (per-video counts + frame sigs),
    // so every video decodes exactly once — but SCOPED to this call: the
    // final pair table (small — surviving near-dup video pairs) is
    // materialized eagerly below and the frame-hash block freed before
    // returning, so the decode cache never outlives the operator
    // (Dedup.nearDupGroupsCounted's free() discipline).
    val fh = videoFrameHashes(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = fh.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    // assert_true is null when the predicate holds, so the guard adds 0
    // to the packed id in the common path and raises on overflow
    val packGuard = assert_true(
      col("frame_idx") < (1L << 20) && col("media_id") >= 0 &&
        col("media_id") < (1L << 43),
      concat(lit("videoNearDupPairs: frame id pack overflow " +
        "(frame_idx >= 2^20 or media_id >= 2^43) for media_id="),
        col("media_id").cast("string")))
    val sigs = fh.select(
      (col("media_id") * (1L << 20) + col("frame_idx") +
        coalesce(packGuard.cast("bigint"), lit(0L))).as("doc_id"),
      col("sim_lo"), col("sim_hi"))
    val framePairs = Dedup.hammingPairs64(sigs, maxHamming)
      .select(expr(s"id_a div ${1L << 20}").as("vid_a"),
        expr(s"id_b div ${1L << 20}").as("vid_b"),
        expr(s"id_a % ${1L << 20}").as("fa"),
        expr(s"id_b % ${1L << 20}").as("fb"))
      .filter(col("vid_a") =!= col("vid_b")) // id_a<id_b ⇒ vid_a ≤ vid_b
    val out = framePairs.groupBy(col("vid_a"), col("vid_b"))
      .agg(countDistinct(col("fa")).as("n_match_a"),
        countDistinct(col("fb")).as("n_match_b"))
      .join(counts.select(col("media_id").as("vid_a"), col("nf").as("nf_a")),
        Seq("vid_a"))
      .join(counts.select(col("media_id").as("vid_b"), col("nf").as("nf_b")),
        Seq("vid_b"))
      .withColumn("shared_ppm",
        greatest(expr("n_match_a * 1000000 div nf_a"),
          expr("n_match_b * 1000000 div nf_b")))
      .filter(col("shared_ppm") >= minSharedPpm)
      .select(col("vid_a"), col("vid_b"), col("n_match_a"), col("n_match_b"),
        col("nf_a"), col("nf_b"), col("shared_ppm"))
      .localCheckpoint(eager = true)
    fh.unpersist(blocking = false)
    out
  }

  /** Deterministic 8×8 grayscale PNG rendered from text bytes — a REAL
    * image payload (the JDK PNG writer emits only IHDR/IDAT/IEND, so the
    * bytes are a pure function of the pixels), letting the demo media
    * table exercise the true `javax.imageio` decode path end-to-end. */
  def pngFromText(text: String): Array[Byte] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val g = if (bytes.isEmpty) 0 else bytes((y * 8 + x) % bytes.length) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Demo/test media table derived from documents: image rows carry a real
    * PNG rendered from the text ([[pngFromText]]), audio rows a real PCM
    * WAV ([[WavCodec.wavFromText]]), video rows a real uncompressed-DIB
    * AVI ([[AviCodec.aviFromText]]) — every kind exercises its true
    * parse/decode path end-to-end. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" => pngFromText(text)
          case "audio" => WavCodec.wavFromText(text)
          case _ => AviCodec.aviFromText(text)
        }
        MediaRow(id, kind, payload, source)
      }
  }
}
