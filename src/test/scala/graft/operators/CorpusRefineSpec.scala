package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

/** Round-4 corpus refinement operators: rule-based quality gate, repeated-
  * passage removal, bigram fluency scoring, vocabulary/id mapping. Fixtures
  * are small enough to verify every output cell by hand.
  */
class CorpusRefineSpec extends SparkSpec {
  import spark.implicits._

  private def h32(s: String): Long =
    Seq(Tuple1(s)).toDF("s").select(TextFunctions.hash32($"s", 0)).as[Long].head()

  test("qualityFilter: each rule trips on its own pathology") {
    val good = (1 to 19).map(i => f"word$i%02d").mkString(" ") + " the" // 20 tokens, distinct, has stopword
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "just five short the words"),           // fails pass_len only
      (3L, (1 to 20).map(i => f"term$i%02d").mkString(" ")), // no stopword
      (4L, "the " + Seq.fill(10)("xx yy").mkString(" ")),    // repeated bigrams, 2 distinct tokens + the
      (5L, "the " + (1 to 20).map(_ => "q w e r t").mkString(" ")) // 1-char tokens: avg len < 3
    ).toDF("doc_id", "text")
    val r = QualityRows(TextAnalysis.qualityFilter(docs, "doc_id", "text"))
    assert(r(1L) == ((true, true, true, true, true, true)))
    assert(r(2L)._1 == false && r(2L)._3 == true && r(2L)._6 == false)
    assert(r(3L)._3 == false && r(3L)._1 == true)
    assert(r(4L)._4 == false && r(4L)._5 == false && r(4L)._6 == false)
    assert(r(5L)._2 == false && r(5L)._6 == false)
  }

  private def QualityRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"pass_len", $"pass_word_len", $"pass_stop",
        $"pass_rep", $"pass_distinct", $"verdict")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6, t._7))).toMap

  test("stripBoilerplate: shared chunks removed, unique text kept in order") {
    val docs = Seq(
      (1L, "p p p p u1 u2 u3 u4"), // shared prefix chunk + unique tail
      (2L, "p p p p w1 w2 w3 w4"),
      (3L, "s1 s2 s3 s4 s5 s6"),   // fully unique
      (4L, "p p p p")              // only the shared chunk -> everything removed
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, "doc_id", "text", chunkSize = 4, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_tokens_kept"), r.getAs[Long]("clean_hash")))).toMap
    assert(out(1L) == ((2L, 1L, 4L, h32("u1 u2 u3 u4"))))
    assert(out(2L) == ((2L, 1L, 4L, h32("w1 w2 w3 w4"))))
    assert(out(3L) == ((2L, 0L, 6L, h32("s1 s2 s3 s4 s5 s6"))))
    assert(out(4L) == ((1L, 1L, 0L, h32(""))))
  }

  test("stripBoilerplate restores chunk order after the aggregation") {
    // 3 chunks of 2: middle chunk shared across docs, outer chunks unique —
    // the cleaned text must be first+last in original order, not list order.
    val docs = Seq(
      (1L, "a1 a2 boil er z1 z2"),
      (2L, "b1 b2 boil er y1 y2")).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, "doc_id", "text", chunkSize = 2, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("clean_hash")).toMap
    assert(out(1L) == h32("a1 a2 z1 z2"))
    assert(out(2L) == h32("b1 b2 y1 y2"))
  }

  test("bigramFluency: hand-computed ppm means, half-up rounding") {
    // corpus bigrams: d1 -> (a b, b a, a b), d2 -> (a b, b c)
    // counts: "a b"=3, "b a"=1, "b c"=1, total=5
    // rates(ppm): 600000, 200000, 200000
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramFluency(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("fluency_ppm")))).toMap
    // d1: (600000+200000+600000)/3 = 466666.67 -> half-up 466667
    assert(out(1L) == ((3L, 466667L)))
    // d2: (600000+200000)/2 = 400000 exactly
    assert(out(2L) == ((2L, 400000L)))
  }

  test("bigramFluency: single-token docs emit no row") {
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val ids = TextAnalysis.bigramFluency(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("vocabTokenIds: freq-ranked ids, UNK=0 below min frequency") {
    // counts: b=3, a=3, c=1, z=1; minFreq=2 -> vocab {a->1, b->2}
    // (ties on count break lexicographically: a before b)
    val docs = Seq((1L, "b b a c"), (2L, "b a a z")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabTokenIds(docs, "doc_id", "text", minFreq = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk"),
          r.getAs[Long]("ids_hash")))).toMap
    assert(out(1L) == ((4L, 1L, h32("2,2,1,0"))))
    assert(out(2L) == ((4L, 1L, h32("2,1,1,0"))))
  }

  test("vocabTokenIds: id stream is position-ordered, not shuffle-ordered") {
    // long doc across many partitions-worth of tokens: hash equals the
    // hash of ids in original token order
    val text = (1 to 200).map(i => if (i % 2 == 0) "even" else "odd").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text").repartition(8)
    // counts: even=100, odd=100; tie breaks lexicographically -> even=1, odd=2
    val expectedIds = (1 to 200).map(i => if (i % 2 == 0) "1" else "2").mkString(",")
    val out = TextAnalysis.vocabTokenIds(docs, "doc_id", "text", minFreq = 2)
      .collect().head
    assert(out.getAs[Long]("ids_hash") == h32(expectedIds))
    assert(out.getAs[Long]("n_unk") == 0L)
  }
}
