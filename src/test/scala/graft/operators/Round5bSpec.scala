package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MisraGriesBuffer

/** Round-5 second batch: Misra-Gries heavy hitters, Zipf coverage,
  * budgeted selection, phrase mining, Spearman, session PMI.
  */
class Round5bSpec extends SparkSpec {

  // ---- Misra-Gries buffer: the mergeable-summaries guarantee ----------

  test("MG buffer retains every item with freq > N/(cap+1), any merge shape") {
    val rnd = new Random(7)
    for (trial <- 1 to 20) {
      val cap = 1 + rnd.nextInt(8)
      val n = 200 + rnd.nextInt(800)
      // skewed stream: small id values are hot
      val stream = Seq.fill(n)(math.min(rnd.nextInt(4) match {
        case 0 => rnd.nextInt(3)
        case 1 => rnd.nextInt(10)
        case _ => rnd.nextInt(50)
      }, 49).toString)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random partitioning into 1..6 chunks, each folded into its own
      // buffer, then merged in a random order — the distributed shape
      val chunks = stream.grouped(1 + rnd.nextInt(stream.size)).toVector
      val bufs = chunks.map { c =>
        val b = new MisraGriesBuffer(cap); c.foreach(b.add(_, 1L)); b
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) => a.mergeIn(b); a }
      val kept = merged.counts.keySet
      val thresh = n.toDouble / (cap + 1)
      exact.foreach { case (item, cnt) =>
        if (cnt > thresh)
          assert(kept.contains(item),
            s"trial $trial: item $item freq=$cnt > $thresh missing (cap=$cap)")
      }
      // estimates never overcount and undercount by at most err
      merged.counts.foreach { case (item, est) =>
        assert(est <= exact(item))
        assert(est >= exact(item) - merged.err)
      }
      assert(merged.counts.size <= cap)
    }
  }

  test("heavyHitters two-pass equals brute-force exact counts") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val k = 150
    val got = TextAnalysis.heavyHitters(docs, "text", k)
      .select("w", "cnt").as[(String, Long)].collect().toMap
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    val n = toks.count()
    val want = toks.groupBy("w").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * k > n }.toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  // ---- Zipf coverage ---------------------------------------------------

  test("zipfCoverage on a constructed distribution") {
    import spark.implicits._
    // 10 a's, 5 b's, 3 c's, 1 d, 1 e  => N=20, vocab=5
    val text = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq("d", "e")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfCoverage(docs, "text").collect().head
    assert(r.getAs[Long]("n_vocab") == 5L)
    assert(r.getAs[Long]("n_tokens") == 20L)
    assert(r.getAs[Long]("top1_ppm") == 500000L)
    assert(r.getAs[Long]("k50") == 1L) // cum(a)=10 covers 50%
    assert(r.getAs[Long]("k90") == 3L) // 10+5+3=18 >= 18
    assert(r.getAs[Long]("k99") == 5L) // needs 19.8 -> all five
  }

  // ---- budgeted selection ---------------------------------------------

  test("budgetSelect keeps the quality-first prefix within the budget") {
    import spark.implicits._
    val df = Seq(
      // group g: weights sum 100, budget 30% = 30
      (1L, "g", 10L, 900L), (2L, "g", 15L, 800L), (3L, "g", 10L, 700L),
      (4L, "g", 65L, 600L),
      // group h: single row heavier than its budget -> nothing kept
      (5L, "h", 10L, 500L)
    ).toDF("id", "grp", "w", "score")
    val got = Sampling.budgetSelect(df, "id", "grp", "w", "score", 3, 10)
      .select("id").as[Long].collect().toSet
    // g: 10 (cum 10 <= 30), 10+15=25 <= 30, +10=35 > 30 stop. h: 10 > 3.
    assert(got == Set(1L, 2L))
  }

  // ---- phrase hits -----------------------------------------------------

  test("phraseHits finds the top trigram and per-doc occurrence counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z x y z q"), // "x y z" twice
      (2L, "a b c x y z"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseHits(docs, "doc_id", "text", 3)
      .select("doc_id", "phrase", "n_hits")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "x y z", 2L), (2L, "x y z", 1L)))
  }

  // ---- Spearman --------------------------------------------------------

  test("spearman matches a naive tie-corrected computation") {
    import spark.implicits._
    val rnd = new Random(11)
    val xs = Seq.fill(60)(rnd.nextInt(8).toLong)
    val ys = xs.map(x => x * 3 + rnd.nextInt(5)) // monotone-ish + noise
    val df = xs.zip(ys).toDF("x", "y")
    val got = Evaluate.spearman(df, "x", "y").collect().head
    def avgRanks(v: Seq[Long]): Seq[Double] = {
      val sorted = v.sorted
      val first = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
      v.map(first)
    }
    val (ra, rb) = (avgRanks(xs), avgRanks(ys))
    val n = xs.size.toDouble
    val (ma, mb) = (ra.sum / n, rb.sum / n)
    val num = ra.zip(rb).map { case (a, b) => (a - ma) * (b - mb) }.sum
    val den = math.sqrt(ra.map(a => (a - ma) * (a - ma)).sum *
      rb.map(b => (b - mb) * (b - mb)).sum)
    val want = num / den
    assert(math.abs(got.getAs[Double]("spearman") - want) < 1e-5)
    assert(got.getAs[Long]("n") == 60L)
  }

  test("spearman is null on a constant column, +1 on identical order") {
    import spark.implicits._
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(Evaluate.spearman(const, "y", "x").collect().head.isNullAt(1))
    val mono = Seq((1L, 10L), (2L, 20L), (5L, 50L)).toDF("x", "y")
    assert(Evaluate.spearman(mono, "x", "y").collect().head
      .getAs[Double]("spearman") == 1.0)
  }

  // ---- streaming Misra-Gries: the buffer IS streaming-aggregation state

  test("freq_items as a streaming aggregate: drained candidates ⊇ heavy items") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.functions.GraftFunctions.freq_items
    val rnd = new scala.util.Random(5)
    val stream = Seq.fill(600)(math.min(rnd.nextInt(3) match {
      case 0 => rnd.nextInt(2)
      case _ => rnd.nextInt(40)
    }, 39).toString)
    val mem = MemoryStream[String](spark)
    val q = mem.toDS().toDF("w")
      .agg(freq_items(col("w"), 9).as("cand"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("mg").start()
    stream.grouped(100).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val last = spark.table("mg").collect().last.getSeq[String](0).toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val thresh = stream.size / 10.0 // cap 9 ⇒ guarantee freq > N/(cap+1)
    exact.foreach { case (w, c) =>
      if (c > thresh) assert(last.contains(w), s"heavy item $w freq=$c missing")
    }
  }

  // ---- session PMI lift (via the declared query on testdata) -----------

  test("q169 lift is exact-integer and marginals are consistent") {
    val out = graft.SparkEntry.queries("q169_session_pmi")(spark, sf("sf0.001"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nab <= na && nab <= nb)
      assert(r.getAs[Long]("lift_ppm") >= 0L)
    }
  }
}
