package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.{RangeJoin, TextAnalysis}

/** Round-4 operators in streaming form: the corpus-refinement transforms
  * are narrow, so they run unchanged on a stream; tokenization against a
  * STATIC vocabulary is a stream-static broadcast join; and the interval
  * join's streaming counterpart is Spark's native time-range join with
  * watermark-bounded state. Each test proves stream output ≡ the batch
  * operator on the same data.
  */
class StreamingRefineSpec extends SparkSpec {
  import spark.implicits._

  test("qualityFilter is narrow: streaming output equals batch, row for row") {
    val docs = Seq(
      (1L, (1 to 19).map(i => f"word$i%02d").mkString(" ") + " the"),
      (2L, "too short the doc"),
      (3L, (1 to 25).map(i => f"term$i%02d").mkString(" ")))
    val mem = MemoryStream[(Long, String)](spark)
    val out = TextAnalysis.qualityFilter(mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sqf").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sqf").orderBy($"doc_id").collect().toSeq
    val batch = TextAnalysis.qualityFilter(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("stream-static tokenization: docs stream against a fixed vocabulary") {
    // vocabulary trained on a static corpus; a stream of new docs is mapped
    // to ids against it (the production shape: vocab frozen, corpus flows)
    val train = Seq((1L, "alpha beta alpha"), (2L, "beta gamma beta")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(train, "text", minFreq = 2)
    // beta(3) -> 1, alpha(2) -> 2; gamma below minFreq -> UNK
    val mem = MemoryStream[(Long, String)](spark)
    val toks = mem.toDF().toDF("doc_id", "text")
      .select($"doc_id", posexplode(graft.functions.TextFunctions.tokens($"text")).as(Seq("pos", "w")))
      .join(broadcast(vocab), Seq("w"), "left")
      .select($"doc_id", $"pos", coalesce($"id", lit(0L)).as("tid"))
    val q = toks.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("svm").start()
    mem.addData((10L, "alpha gamma beta"), (11L, "delta beta"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("svm").orderBy($"doc_id", $"pos")
      .select($"doc_id", $"tid").as[(Long, Long)].collect().toSeq
    assert(ids == Seq((10L, 2L), (10L, 0L), (10L, 1L), (11L, 0L), (11L, 1L)))
  }

  test("streaming interval join: native time-range join equals batch banded join") {
    def ts(sec: Long) = new Timestamp((1704067200L + sec) * 1000)
    val errs = Seq((1L, 100L, 500L), (2L, 101L, 900L)) // (user, err_id, sec)
    val clks = Seq(
      (1L, 200L, 450L),  // Δ=50 -> match
      (1L, 201L, 700L),  // Δ=200 -> no
      (2L, 202L, 1010L), // Δ=110 -> match
      (3L, 203L, 500L))  // other user
    val memE = MemoryStream[(Long, Long, Timestamp)](spark)
    val memC = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = RangeJoin.streamingIntervalJoinPairs(
      memE.toDF().toDF("user_id", "err_id", "err_ts"),
      memC.toDF().toDF("user_id", "clk_id", "clk_ts"),
      Seq("user_id"), "err_ts", "clk_ts",
      windowSeconds = 120, watermarkDelay = "10 minutes")
    val q = joined.select($"err_id", $"clk_id").writeStream
      .outputMode(OutputMode.Append()).format("memory").queryName("sij").start()
    memE.addData(errs.map { case (u, i, s) => (u, i, ts(s)) }: _*)
    memC.addData(clks.map { case (u, i, s) => (u, i, ts(s)) }: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sij").as[(Long, Long)].collect().toSeq.sorted

    val batch = RangeJoin.intervalJoinPairs(
      errs.toDF("user_id", "err_id", "err_s")
        .withColumn("err_us", $"err_s" * 1000000L),
      clks.toDF("user_id", "clk_id", "clk_s")
        .withColumn("clk_us", $"clk_s" * 1000000L),
      Seq("user_id"), "err_us", "clk_us", window = 120L * 1000000L)
      .select($"err_id", $"clk_id").as[(Long, Long)].collect().toSeq.sorted
    assert(streamed == batch && streamed == Seq((100L, 200L), (101L, 202L)))
  }

  test("rebalance rates from a batch profile apply to a stream, matching batch") {
    // production shape: the α=0.5 rate table is computed by a batch profile
    // job, frozen, and broadcast against the document stream
    val corpus = graft.sources.Tables(spark, sf("sf0.001"), "documents")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSeq
    val rates = graft.operators.Sampling.sqrtRates(
      corpus.toDF("doc_id", "lang"), "lang")
    val mem = MemoryStream[(Long, String)](spark)
    val out = graft.operators.Sampling.applyRates(
      mem.toDF().toDF("doc_id", "lang"), rates, "doc_id", "lang", seed = 17)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("srb").start()
    mem.addData(corpus: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("srb").select($"doc_id").as[Long].collect().sorted.toSeq
    val batch = graft.operators.Sampling.sqrtRebalance(
        corpus.toDF("doc_id", "lang"), "doc_id", "lang", seed = 17)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("int8 quantization is narrow: streaming codes equal batch codes") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 1.0f, -2.0f)))
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val out = graft.operators.Quantize.int8(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sq8").start()
    mem.addData(vecs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sq8")
      .select($"vec_id", $"scale", $"codes")
      .as[(Long, Double, Seq[Int])].collect().sortBy(_._1).toSeq
    val batch = graft.operators.Quantize.int8(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select($"vec_id", $"scale", $"codes")
      .as[(Long, Double, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
  }
}
