package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Corpus
import graft.sources.Tables

/** The production split of the quality classifier: train the batch
  * perceptron OFFLINE on a labeled target-vs-raw snapshot, then apply
  * the literal weight vector to the ingest STREAM — scoring is a
  * narrow explode plus a per-doc aggregate, legal in Structured
  * Streaming, so the quality filter runs at the front door without a
  * retrain. Gates: stream scores ≡ batch scores doc for doc, and the
  * scorer agrees with the trainer's own margins. */
case class QDoc(doc_id: Long, text: String)

class StreamingQualityFilterSpec extends SparkSpec {
  import spark.implicits._

  test("trained weights score a stream identically to batch") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val target = docs.filter($"doc_id" % 7 === 0)
    val raw = docs.filter($"doc_id" % 7 =!= 0)
    val w = Corpus.qualityPerceptronWeights(raw, target, nBuckets = 512,
      seed = 11, steps = 3)

    // batch reference over a small scoring slice
    val slice = docs.filter($"doc_id" < 40).select($"doc_id", $"text")
    val batch = Corpus.perceptronScore(slice, w, seed = 11)
      .select($"doc_id", $"n_feats", $"score", $"pred")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty && batch.exists(_._3 != 0L))

    // the same docs arriving as a stream, scored under the same weights
    val rows = slice.as[(Long, String)].collect().toSeq.map(QDoc.tupled)
    val mem = MemoryStream[QDoc](spark)
    val q = Corpus.perceptronScore(mem.toDF(), w, seed = 11)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("qscore").start()
    // two triggers: the per-doc aggregate must keep state across them
    val (first, rest) = rows.splitAt(rows.size / 2)
    mem.addData(first: _*); q.processAllAvailable()
    mem.addData(rest: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qscore")
      .select($"doc_id", $"n_feats", $"score", $"pred")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    spark.sql("DROP VIEW IF EXISTS qscore")
    assert(streamed == batch,
      s"stream/batch diverged: ${(streamed diff batch) ++ (batch diff streamed)}")
  }

  test("perceptronScore agrees with qualityPerceptron's own training margins") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val target = docs.filter($"doc_id" % 7 === 0)
    val raw = docs.filter($"doc_id" % 7 =!= 0)
    val trained = Corpus.qualityPerceptron(raw, target, nBuckets = 512,
        seed = 11, steps = 3)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val w = Corpus.qualityPerceptronWeights(raw, target, nBuckets = 512,
      seed = 11, steps = 3)
    val scored = Corpus.perceptronScore(docs, w, seed = 11)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    assert(scored == trained)
  }
}
