package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (LLM-data-pipeline extension).
  *
  * Media (image/audio/video) travels as opaque `binary` columns with typed
  * metadata — the lakehouse pattern for training-data pipelines. The
  * Spark-side plumbing here is real and tested: schema, per-partition
  * decoder initialization (`mapPartitions`, one decoder instance per
  * partition — the shape you need when the real decoder is an expensive
  * native library or model), batch-friendly row flow, and deterministic
  * partitioning. The *decode step itself* is STUBBED: this container has no
  * image/audio codecs, so [[StubDecoder]] derives deterministic
  * pseudo-features from the bytes. Swapping in a real decoder is a
  * one-class change (implement [[MediaDecoder]]).
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

  /** Feature extraction over a media Dataset. `mapPartitions` so the
    * decoder is constructed once per partition, not per row. */
  def extractFeatures(
      media: Dataset[MediaRow],
      makeDecoder: () => MediaDecoder = () => new StubDecoder()): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = makeDecoder() // per-partition init (real: load codec/model)
      rows.map(decoder.features)
    }
  }

  /** Frame/chunk sampling on the opaque payload: every `stride`-th chunk of
    * `chunkBytes` (deterministic; stands in for video frame sampling —
    * real impl would seek keyframes). */
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

  /** Demo/test media table derived from documents (text bytes as payload —
    * the plumbing doesn't care that it isn't a real JPEG). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))
      .as[MediaRow]
  }
}
