package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: count and content") {
    val df = Seq(Tuple1("a b c d")).toDF("text")
    val sh = df.select(TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq(Tuple1("a b")).toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("hash32 is deterministic and in [0, 2^32)") {
    val df = Seq(Tuple1("abc")).toDF("s")
    val h1 = df.select(TextFunctions.hash32($"s", 0)).as[Long].head()
    val h2 = df.select(TextFunctions.hash32($"s", 0)).as[Long].head()
    val h3 = df.select(TextFunctions.hash32($"s", 1)).as[Long].head()
    assert(h1 == h2 && h1 != h3)
    assert(h1 >= 0L && h1 < (1L << 32))
  }

  test("languageId predicts the training language for training-identical text") {
    val train = Seq(
      ("aa", "foo bar baz foo bar", "x1"), ("aa", "foo baz foo", "x2"),
      ("bb", "uno dos tres uno", "x3"), ("bb", "dos tres dos", "x4"))
      .toDF("lang", "text", "ignore").withColumn("doc_id", monotonically_increasing_id())
    val test = Seq((100L, "foo bar foo"), (101L, "uno dos tres")).toDF("doc_id", "text")
    val pred = TextAnalysis.languageId(train, test, "doc_id", "text", "lang")
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(pred(100L) == "aa" && pred(101L) == "bb")
  }

  test("qualityScores: ratios are exact and composite is bounded") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScores(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-6)
    val q = r.getAs[Double]("quality")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("tfidf: rare terms outrank common ones; ties break lexicographically") {
    val df = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "common common gamma")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rk")
      .select($"doc_id", $"rk", $"term").as[(Long, Long, String)].collect()
    // every doc's rank-1 term is its unique word (df=1 beats df=3)
    assert(top.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap ==
      Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    // doc 1: tf(common)=2 at rank 2
    assert(top.contains((1L, 2L, "common")))
  }

  test("repetition: duplicate bigram fraction, zero for short docs") {
    val df = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab -> 5 total, 2 distinct
      (2L, "x y z"),          // 2 distinct of 2
      (3L, "single")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScores(df, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"n_ngrams", $"n_distinct", $"rep_ratio")
      .as[(Long, Long, Double)].collect()
    assert(r(0) == ((5L, 2L, 0.6)))
    assert(r(1) == ((2L, 2L, 0.0)))
    assert(r(2) == ((0L, 0L, 0.0)))
  }

  test("chunking: coverage, overlap, and tail-chunk length") {
    val doc = ((1 to 25).map(i => f"t$i%02d")).mkString(" ")
    val docs = Seq((1L, doc), (2L, "short text")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 10, overlap = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: 25 tokens, stride 8 -> starts 0,8,16,24 -> lengths 10,10,9,1
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._3).toSeq == Seq(10L, 10L, 9L, 1L))
    // every token is covered: stride 8 starts reach position 25 via the
    // length-1 tail chunk (short tails carry less than `overlap` re-reads)
    assert(d1.map(_._3).sum == 30L) // 10 + 10 + 9 + 1
    // doc 2: 2 tokens -> one short chunk
    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(r => (r._2, r._3)).toSeq == Seq((0L, 2L)))
    // deterministic hashes
    val again = TextAnalysis.chunkTokens(docs, "doc_id", "text", 10, 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(again.toSeq == out.toSeq)
  }

  test("boilerplate mining: cross-document chunks surface, unique ones don't") {
    val header = (1 to 8).map(i => f"hdr$i%02d").mkString(" ")
    val docs = Seq(
      (1L, header + " unique body one content here now"),
      (2L, header + " different body text entirely other"),
      (3L, "no shared template in this one at all")).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateChunks(docs, "doc_id", "text",
        chunkSize = 8, overlap = 0, minDocs = 2)
      .as[(Long, Long, Long)].collect()
    // exactly the shared 8-token header chunk; owned first by doc 1
    assert(out.length == 1, s"got ${out.toSeq}")
    assert(out.head._2 == 2L && out.head._3 == 1L)
  }

  test("fingerprints: k smallest distinct hashes ascending") {
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, "doc_id", "text", n = 4, k = 5)
      .select($"fingerprint").as[Seq[Long]].head()
    assert(fp.length == 5)
    assert(fp == fp.sorted)
    assert(fp.distinct.length == 5)
  }
}
