package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions.MinhashP

/** MinHash near-dup detection ON THE STREAM — the q31/q74 banding
  * pipeline as Structured Streaming state, for the "is this crawl page a
  * near-copy of something recent?" admission gate.
  *
  * Shape: the per-document shingle set and minhash signature are NARROW
  * higher-order expressions (graft.operators.Dedup.shingleSetSigs — no
  * shuffle, so they are streaming-legal stateless maps); each document
  * then lands in its LSH band groups, and per band key a
  * `flatMapGroupsWithState` holds the recently-seen co-residents. An
  * arriving document exact-Jaccards against its band's residents —
  * candidate work is banding-bounded exactly like the batch pipeline,
  * never corpus-wide.
  *
  * Exactly-once pair emission WITHOUT a second stateful stage: a pair
  * colliding in several bands would emit once per band, and chaining a
  * streaming dedup after flatMapGroupsWithState is not supported — so
  * each band decides locally whether it is the pair's FIRST colliding
  * band (both signatures are in hand; band collision is a pure function
  * of them) and only that band emits. Deterministic, stateless, global.
  *
  * Bounded lookback contract (the [[graft.operators.Dedup.streamingExactDedup]]
  * trade): a pair is reported iff the earlier document is still within
  * the event-time watermark horizon when the later one arrives; state per
  * band is bounded by that horizon. Pair with the batch q74 incremental
  * index for full-history guarantees.
  */
object StreamingNearDup {

  case class BandIn(bk: String, band_j: Int, ts: java.sql.Timestamp,
      ts_us: Long, doc_id: Long, hs: Seq[Long])
  case class PairHit(id_a: Long, id_b: Long, jaccard: Double, ts_us: Long)
  case class Resident(ts_us: Long, doc_id: Long, hs: Seq[Long], sigs: Seq[Long])
  case class BandState(rows: Seq[Resident])

  /** Scala mirror of [[graft.functions.TextFunctions.minhashPerm]] —
    * identical integer ops, so stream and batch band on the same keys. */
  private[streaming] def sigsOf(hs: Seq[Long], numHashes: Int): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    while (k < hs.length) {
      val hm = hs(k) % MinhashP
      var i = 0
      while (i < numHashes) {
        val v = ((2L * i + 1) * hm + 7919L * (i + 1)) % MinhashP
        if (v < out(i)) out(i) = v
        i += 1
      }
      k += 1
    }
    out
  }

  /** Lowest band index on which the two signatures agree, or -1. */
  private[streaming] def firstCollidingBand(
      a: Seq[Long], b: Seq[Long], rowsPerBand: Int): Int = {
    val nBands = a.length / rowsPerBand
    var j = 0
    while (j < nBands) {
      var r = 0
      var eq = true
      while (eq && r < rowsPerBand) {
        if (a(j * rowsPerBand + r) != b(j * rowsPerBand + r)) eq = false
        r += 1
      }
      if (eq) return j
      j += 1
    }
    -1
  }

  private def jaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val sa = a.toSet
    var ni = 0
    val it = b.iterator
    while (it.hasNext) if (sa.contains(it.next())) ni += 1
    val nu = a.length + b.length - ni
    if (nu == 0) 0.0 else ni.toDouble / nu
  }

  /** (bk, band_j, ts_us, doc_id, hs) band rows — narrow, works on a
    * stream or a batch frame alike. Band keys match the batch pipeline's
    * (same md5 over the same signature components). */
  def bandRows(docs: DataFrame, tsCol: String, idCol: String, textCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sigs = graft.operators.Dedup.shingleSetSigs(
      docs.withColumn("_ts", col(tsCol))
        .withColumn("_ts_us", unix_micros(col(tsCol)))
        .withColumnRenamed(idCol, "_nd_id")
        .withColumn("_carry", struct(col("_ts"), col("_ts_us"), col("_nd_id"))),
      "_carry", textCol, numHashes)
    val nBands = numHashes / rowsPerBand
    val bands = array((0 until nBands).map { b =>
      val key = md5(concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}").cast("string")): _*))
      struct(lit(b).as("band_j"), concat(lit(s"$b:"), key).as("bk"))
    }: _*)
    sigs
      .select(col("doc_id").getField("_ts").as("ts"),
        col("doc_id").getField("_ts_us").as("ts_us"),
        col("doc_id").getField("_nd_id").as("doc_id"),
        col("hs"), explode(bands).as("b"))
      .select(col("b.bk").as("bk"), col("b.band_j").as("band_j"),
        col("ts"), col("ts_us"), col("doc_id"),
        col("hs").cast("array<bigint>").as("hs"))
  }

  /** Streaming near-dup pairs: `docs` is a streaming (or batch) frame
    * with an event-time column; emits (id_a, id_b, jaccard, ts_us) with
    * jaccard >= `minJaccard`, id_a < id_b, ts_us = the later document's
    * event time, each qualifying pair exactly once. Apply the watermark
    * horizon you can afford: state per band is the horizon's residents. */
  def pairs(docs: DataFrame, tsCol: String, idCol: String, textCol: String,
      watermarkDelay: String = "1 hour", numHashes: Int = 8,
      rowsPerBand: Int = 2, minJaccard: Double = 0.5): Dataset[PairHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val streaming = docs.isStreaming
    val bands = bandRows(docs, tsCol, idCol, textCol, numHashes, rowsPerBand)
    // watermark AFTER the narrow band expansion, on the surviving event-
    // time column, so the FMGWS analyzer sees it on its direct input
    val in = (if (streaming) bands.withWatermark("ts", watermarkDelay)
              else bands).as[BandIn]
    in.groupByKey(_.bk)
      .flatMapGroupsWithState[BandState, PairHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk, it, state) =>
          val bandJ = bk.takeWhile(_ != ':').toInt
          val wmUs =
            if (streaming) state.getCurrentWatermarkMs() * 1000L else Long.MinValue
          var rows = state.getOption.map(_.rows.toVector).getOrElse(Vector.empty)
            .filter(_.ts_us >= wmUs) // horizon eviction
          val out = Vector.newBuilder[PairHit]
          it.toVector.sortBy(r => (r.ts_us, r.doc_id)).foreach { r =>
            val sigs = sigsOf(r.hs, numHashes).toSeq
            rows.foreach { c =>
              if (c.doc_id != r.doc_id &&
                firstCollidingBand(sigs, c.sigs, rowsPerBand) == bandJ) {
                val j = jaccard(r.hs, c.hs)
                if (j >= minJaccard)
                  out += PairHit(math.min(r.doc_id, c.doc_id),
                    math.max(r.doc_id, c.doc_id), j,
                    math.max(r.ts_us, c.ts_us))
              }
            }
            rows = rows :+ Resident(r.ts_us, r.doc_id, r.hs, sigs)
          }
          if (rows.isEmpty) state.remove()
          else {
            state.update(BandState(rows))
            // wake when the watermark passes the newest resident, so idle
            // bands clear their state instead of pinning it forever
            if (streaming)
              state.setTimeoutTimestamp(rows.map(_.ts_us).max / 1000L + 1L)
          }
          out.result().iterator
      }
  }
}
