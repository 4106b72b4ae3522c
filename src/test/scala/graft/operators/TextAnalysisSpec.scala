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

  test("bm25: matches naive integer recomputation; idf and length norm behave") {
    val docs = Seq(
      (1L, "rare word here plus filler tokens to pad this doc"),
      (2L, "common word here and more other filler text now yes"),
      (3L, "common stuff entirely different content with nothing shared here"),
      (4L, "rare rare rare common word padded out to a much longer doc than " +
        "the first one so length normalization has something visible to do"),
      (5L, "unrelated text about other things entirely no hits")
    ).toDF("doc_id", "text")
    val terms = Seq("rare", "common")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Long)].collect().toSeq

    // naive recomputation of the exact ppm fixed-point formula
    val S = 1000000L
    val (k1, b) = (1200000L, 750000L)
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.trim.split("\\s+").toSeq }
    val n = toks.length.toLong
    val tot = toks.map(_._2.size.toLong).sum
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val expect = toks.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val lenPpm = dl * S * S / (tot * S / n)
      val normPpm = S - b + b * lenPpm / S
      val score = terms.map { t =>
        val f = tk.count(_ == t).toLong
        if (f == 0) 0L
        else (n * S / dfm(t)) * (f * (S + k1) * S / (f * S + k1 * normPpm / S)) / S
      }.sum
      if (score > 0) Some((id, dl, score)) else None
    }.sortBy(r => (-r._3, r._1)).toSeq
    assert(got.sortBy(r => (-r._3, r._1)) == expect, s"got $got expect $expect")

    val byId = got.map(r => r._1 -> r._3).toMap
    // df(rare)=2 < df(common)=3: one rare hit outscores one common hit
    assert(byId(1L) > byId(2L))
    // doc 5 has no query terms -> absent
    assert(!byId.contains(5L))
    // k bound respected
    assert(TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k = 2)
      .count() == 2)
  }

  test("textrank: matches naive fixed-point power iteration") {
    val docs = Seq(
      (1L, "hub spoke1 hub spoke2 hub spoke3"),
      (2L, "spoke1 leaf spoke1"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(docs, "doc_id", "text",
        iters = 5, k = 10)
      .as[(String, Long)].collect().toSeq

    // naive recomputation: same edges, same integer-ppm recurrence
    val adj = Seq(("hub", "spoke1"), ("spoke1", "hub"), ("hub", "spoke2"),
      ("spoke2", "hub"), ("hub", "spoke3"), ("spoke1", "leaf"),
      ("leaf", "spoke1"))
    val edges = adj.map { case (a, b) => (Seq(a, b).min, Seq(a, b).max) }
      .groupBy(identity).map { case ((u, v), g) => (u, v, g.size.toLong) }.toSeq
    val sym = edges ++ edges.map { case (u, v, w) => (v, u, w) }
    val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    var pr = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      pr = sym.groupBy(_._2).map { case (v, es) =>
        val sc = es.map { case (u, _, w) => pr(u) * w / deg(u) }.sum
        v -> (150000L + 850000L * sc / 1000000L)
      }
    }
    val expect = pr.toSeq.sortBy { case (n, p) => (-p, n) }
    assert(got == expect, s"got $got expect $expect")
    // hub has the highest degree -> highest rank; 'solo' never appears
    assert(got.head._1 == "hub")
    assert(!got.exists(_._1 == "solo"))
  }

  test("bpe merges: hand-computed rules, frequency-weighted, ordered ties") {
    import spark.implicits._
    // words: aaab x3, ab x2
    // step 1: (a,a)=6 beats (a,b)=5 -> merge aa; aaab => [aa, a, b]
    // step 2: (a,b)=3+2=5 beats (aa,a)=3 -> merge ab; => [aa, ab] / [ab]
    // step 3: only (aa,ab)=3 remains
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, "doc_id", "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
  }

  test("bpe merges: greedy fold on overlapping runs (aaaa -> [aa, aa])") {
    import spark.implicits._
    // the replace-encoding danger case: 'a a a a' must merge to BOTH
    // disjoint pairs in one application, like the Sennrich greedy fold
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, "doc_id", "text", nMerges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpe merges: driver-local learner ≡ distributed loop (ties, overlaps, unicode)") {
    import spark.implicits._
    // covers: frequency-weighted counts, count ties broken (lhs, rhs)
    // ascending, overlap runs (greedy left-to-right fold), multi-byte
    // symbols, and merge exhaustion before nMerges (the empty-argmax
    // regime where remaining steps emit no rule)
    val docs = Seq(
      (1L, "aaab aaab ab"), (2L, "aaab ab"), (3L, "aaaa"),
      (4L, "ééxé zz zz"), (5L, "ba ba ab")).toDF("doc_id", "text")
    def run(maxWords: Long) =
      TextAnalysis.bpeMerges(docs, "doc_id", "text", nMerges = 12,
          driverMaxWords = maxWords)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val local = run(1L << 18)
    val dist = run(0L) // vocab > 0 forces the distributed loop
    assert(local == dist, s"local=$local dist=$dist")
    assert(local.size < 12, "fixture must exercise merge exhaustion")
  }

  test("bpe encode: learned rules compress known words; merges stay in-word") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "doc_id", "text", nMerges = 3)
    // rules (a,a) (a,b) (aa,ab): aaab -> [aaab]; ab -> [ab]
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 10L, 3L, 300000L),  // 3 words -> 3 subwords, 10 chars
      (2L, 2L, 6L, 2L, 333333L)))
    // word boundaries block merges: 'a b' never fuses across the gap
    val cross = Seq((1L, "a b")).toDF("doc_id", "text")
    val m2 = TextAnalysis.bpeMerges(
      Seq((1L, "ab ab")).toDF("doc_id", "text"), "doc_id", "text", 1)
    val enc = TextAnalysis.bpeEncode(cross, "doc_id", "text", m2)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(enc == ((1L, 2L, 2L, 2L, 1000000L))) // still two subwords
  }

  test("bigram LM score: Laplace-smoothed conditional ppm, hand-computed") {
    import spark.implicits._
    // train: "a b a b c" → bigrams ab, ba, ab, bc; V = {a,b,c} = 3
    // c12: (a,b)=2 (b,a)=1 (b,c)=1; c1: a=2 b=2
    val train = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // holdout "a b d": (a,b) → (2+1)*1e6 div (2+3) = 600000
    //                  (b,d) → (0+1)*1e6 div (2+3) = 200000
    // avg = (2*800000+2) div 4 = 400000 (half-up), min = 200000
    val ho = Seq((2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(train, ho, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 2L, 400000L, 200000L)))
    // unseen prefix: "d d" → (0+1)*1e6 div (0+3) = 333333
    val ho2 = Seq((3L, "d d")).toDF("doc_id", "text")
    val out2 = TextAnalysis.bigramLmScore(train, ho2, "doc_id", "text")
      .as[(Long, Long, Long, Long)].head()
    assert(out2 == ((3L, 1L, 333333L, 333333L)))
    // sub-2-token holdout docs emit no row
    val ho3 = Seq((4L, "a"), (5L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramLmScore(train, ho3, "doc_id", "text").count() == 0L)
  }

  test("DSIR importance weights: target-only docs outweigh raw-only docs") {
    import spark.implicits._
    import graft.functions.TextFunctions.hash32
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val raw = Seq(
      (1L, "alpha alpha beta"), (2L, "gamma gamma delta"),
      (3L, "alpha gamma")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1L)
    val out = TextAnalysis.importanceWeights(raw, target, "doc_id", "text",
        buckets = 64)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.map(_._2) == Seq(3L, 3L, 2L)) // token counts
    val byId = out.map(o => o._1 -> o._3).toMap
    // doc 1 is the target itself; doc 2 shares no tokens with it
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L))
    // the flag is exactly weight >= 1e6 (with B=64 add-1 smoothing the
    // absolute ratios sit below 1 at this toy scale — only the ORDER is
    // scale-free)
    out.foreach(o => assert(o._4 == (o._3 >= 1000000L)))
    // brute-force recomputation of one bucket's ratio: doc 2's tokens
    val b = spark.range(1).select(
      pmod(hash32(lit("gamma"), 7), lit(64L))).as[Long].head()
    // Nt=3, Nr=8, B=64; gamma: ct=0, cr=3 (if no collision with others)
    val collisions = Seq("alpha", "beta", "delta").map(w =>
      spark.range(1).select(pmod(hash32(lit(w), 7), lit(64L))).as[Long].head())
    assume(!collisions.contains(b))
    val expected = (0L + 1L) * (8L + 64L) * 1000000L / ((3L + 1L) * (3L + 64L))
    val rppmGamma = expected // (1 * 72 * 1e6) / (4 * 67)
    assert(rppmGamma == 268656L)
    // empty text normalizes to the single empty token (split convention,
    // same in DuckDB's string_split) — one-row result, n_tokens = 1
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val er = TextAnalysis.importanceWeights(
      raw.union(empty), target, "doc_id", "text", 64)
      .filter(col("doc_id") === 9L)
      .as[(Long, Long, Long, Boolean)].head()
    assert(er._2 == 1L)
  }

  test("tokenizerFertility: exact integer subwords/word and chars/subword") {
    // "ab cd, x9" normalizes to "ab cd, x9": words = [ab, cd,, x9] (3),
    // subwords = ab|cd|,|x|9 (5), chars (no spaces) = 7
    val docs = Seq(("en", "ab cd, x9"), ("en", "one"), ("zz", "a-b"))
      .toDF("lang", "text")
    val out = TextAnalysis.tokenizerFertility(docs, "text", "lang")
      .orderBy(col("grp"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // en: words 3+1=4, subwords 5+1=6, chars 7+3=10
    assert(out(0) == (("en", 2L, 4L, 6L, 10L,
      6L * 1000000L / 4L, 10L * 1000000L / 6L)))
    // zz "a-b": 1 word, subwords a|-|b = 3, chars 3
    assert(out(1) == (("zz", 1L, 1L, 3L, 3L, 3000000L, 1000000L)))
  }

  test("simpsonDiversity: exact rational ppm concentration") {
    val docs = Seq(
      (1L, "a a a a"),           // all same type: D = 1 -> 1000000
      (2L, "a b c d"),           // all distinct: D = 0
      (3L, "a a b b"),           // 2*(2*1)/(4*3) = 4/12 -> 333333
      (4L, "x")).toDF("doc_id", "text") // n <= 1 guard
    val out = TextAnalysis.simpsonDiversity(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"n_tokens", $"n_types", $"simpson_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((4L, 1L, 1000000L), (4L, 4L, 0L), (4L, 2L, 333333L), (1L, 1L, 0L)))
  }

  test("ngramNovelty: first-owner shares, exact dup scores zero, short docs absent") {
    val docs = Seq(
      (0L, "a b c d e"),  // 3 shingles, all first here -> 1e6
      (1L, "a b c d e"),  // exact dup -> 0 novel
      (2L, "c d e f g"),  // {cde,def,efg}: cde owned by doc 0 -> 2/3
      (3L, "x y")         // too short for a 3-shingle -> no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_shingles", $"n_novel", $"novelty_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 3L, 1000000L), (1L, 3L, 0L, 0L), (2L, 3L, 2L, 666666L)))
  }

  test("tokenBurstiness: zeros-included VMR, hand-computed") {
    // N = 3 docs. "x": counts (3,0,0) -> mean 1, var 2 -> VMR 2.0
    //             "y": counts (1,1,1) -> var 0   -> VMR 0
    //             "z": counts (2,1,0) -> Σc=3, Σc²=5 -> (15−9)/(9) = 2/3
    val docs = Seq(
      (0L, "x x x y z z"),
      (1L, "y z"),
      (2L, "y")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenBurstiness(docs, "doc_id", "text", k = 3)
      .select($"w", $"n_docs", $"total", $"vmr_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    // order: total desc (x:3, y:3, z:3) -> ties by token
    assert(out == Seq(
      ("x", 1L, 3L, 2000000L), ("y", 3L, 3L, 0L), ("z", 2L, 3L, 666666L)))
  }

  test("repetitionStats: hand-computed top-gram and duplicate-trigram shares") {
    val docs = Seq(
      (1L, "a a a b"),       // top1 3/4; bigrams [a a, a a, a b] top 2/3;
                             // trigrams [a a a, a a b] dup 0/2
      (2L, "x y z w"),       // all distinct: top1 1/4, top2 1/3, dup3 0
      (3L, "p q p q p q p q"), // top1 4/8; bigrams pq*4,qp*3 top 4/7;
                             // trigrams pqp*3,qpq*3 dup 6/6
      (4L, "solo"),          // 1 token: no bigrams/trigrams -> 0s
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"top1_ppm", $"top2_ppm", $"dup3_ppm",
        $"passes")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 750000L, 666666L, 0L, false),
      (2L, 4L, 250000L, 333333L, 0L, false), // tiny doc: top2 over threshold
      (3L, 8L, 500000L, 571428L, 1000000L, false),
      (4L, 1L, 1000000L, 0L, 0L, false))) // top1 = 100% of its 1 token
  }

  test("tokenEntropy: exact at anchors, diverse text above repeated text") {
    val docs = Seq(
      (0L, "a b c d"),              // uniform over 4: exactly 2 bits
      (1L, "a a a a"),              // one type: exactly 0 bits
      (2L, "a a b b"),              // uniform over 2: exactly 1 bit
      (3L, "the quick brown fox jumps over the lazy dog"), // 8 types / 9 toks
      (4L, "spam spam spam spam spam spam spam spam ham"), // heavy repeat
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // powers of two are EXACT in the fixed-point log (bit-length anchors)
    assert(out(0L) == ((0L, 4L, 4L, 2 * 65536L)), s"uniform-4: ${out(0L)}")
    assert(out(1L) == ((1L, 4L, 1L, 0L)), s"constant: ${out(1L)}")
    assert(out(2L) == ((2L, 4L, 2L, 65536L)), s"uniform-2: ${out(2L)}")
    // H(8/9 distinct) ≈ 2.948 bits; H(8 spam + 1 ham of 9) ≈ 0.503 bits
    assert(math.abs(out(3L)._4 - 2.948 * 65536) < 200, s"prose: ${out(3L)}")
    assert(math.abs(out(4L)._4 - 0.503 * 65536) < 200, s"spam: ${out(4L)}")
    assert(out(3L)._4 > out(4L)._4 + 2 * 65536)
  }

  test("lmSurprisal: reference-like text scores fewer bits than gibberish") {
    val lm = Seq(
      (10L, "the cat sat on the mat and the dog sat on the rug"),
      (11L, "the cat and the dog sat on the mat"),
      (12L, "the dog sat on the rug and the cat sat"),
      // vocabulary filler: pushes V up so the unseen-bigram floor
      // log2(c1+V) sits several bits above the seen-bigram cost
      (13L, (1 to 60).map(i => s"filler$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "the cat sat on the rug"),           // all bigrams LM-seen
      (1L, "zyx wvu tsr qpo nml kji"),          // nothing seen: 1/V floor
      (2L, "mat"),                              // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmSurprisal(docs, lm, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(0L)._1 == 5L && m(1L)._1 == 5L)
    assert(m(2L) == ((0L, 0L)), "no bigrams -> zero row, doc still present")
    // fluent text must be cheaper than unseen gibberish by over a whole
    // bit per bigram (bits_fp is bits-per-bigram x 65536; add-one
    // smoothing with the filler vocabulary taxes seen bigrams too, so
    // the structural gap here is ~1.8 bits, not the unsmoothed ~4)
    assert(m(0L)._2 + 65536 < m(1L)._2,
      s"fluent ${m(0L)._2} !<< gibberish ${m(1L)._2}")
    // surprisal is non-negative by construction (p_ppb <= 1e9)
    assert(out.forall(_._3 >= 0L))
    // deterministic across reruns
    val rerun = TextAnalysis.lmSurprisal(docs, lm, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rerun.toSeq == out.toSeq)
  }

  test("surprisalFromCounts: exact past the ppb ceiling, verbatim within it") {
    import graft.functions.FixedPoint.{log2FpRef, log2FpRefWide}
    // fabricated (c12+1, c1+V) count pairs: rows 0-1 within ppb, rows
    // 2-4 past it (prefix masses a 100 TB reference corpus produces) —
    // the per-row branch must mix both forms in one dataset
    val staged = Seq(
      (0L, 6L, 900000000L),
      (1L, 1L, 1000000000L),              // exactly at the ceiling: ppb
      (2L, 1L, 1000000001L),              // one past it: wide
      (3L, 123456789L, 30000000000000L),  // 3e13 = the 100 TB token mass
      (4L, 29999999999999L, 30000000000000L),
    ).toDF("doc_id", "c12p", "c1v")
    val out = TextAnalysis.surprisalFromCounts(staged)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 1959352L - log2FpRef(6L * 1000000000L / 900000000L))
    assert(out(1L) == 1959352L - log2FpRef(1L)) // = log2fp(1e9) exactly
    assert(out(2L) == log2FpRefWide(1000000001L) - log2FpRefWide(1L))
    assert(out(3L) ==
      log2FpRefWide(30000000000000L) - log2FpRefWide(123456789L))
    assert(out(4L) ==
      log2FpRefWide(30000000000000L) - log2FpRefWide(29999999999999L))
    // surprisal stays non-negative and ~ -log2(p) in both branches
    assert(out.values.forall(_ >= 0L))
    val bits3 = out(3L).toDouble / 65536.0
    val expect3 = math.log(30000000000000.0 / 123456789.0) / math.log(2.0)
    assert(math.abs(bits3 - expect3) < 1e-3, s"$bits3 vs $expect3")
  }

  test("perplexityBuckets: whole-bin tercile cuts partition the corpus monotonically") {
    val docs = graft.sources.Tables(spark, sf("sf0.01"), "documents")
    val lm = docs.filter($"doc_id" % 5 =!= 0)
    val out = TextAnalysis.perplexityBuckets(docs, lm, "doc_id", "text")
      .select($"doc_id", $"bits_fp", $"bucket", $"kept")
      .as[(Long, Long, String, Boolean)].collect().toSeq
    val nd = docs.count()
    assert(out.length == nd, "one row per doc, none dropped")
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // whole-bin cuts: a bucket never exceeds its cumulative cap, and
    // the score ranges are monotone head <= middle <= tail
    assert(byBucket("head").size <= nd / 3)
    assert(byBucket("head").size + byBucket("middle").size <= 2 * nd / 3)
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    out.foreach { case (_, _, b, kept) => assert(kept == (b != "tail")) }
    // deterministic: integer scores, whole-bin boundaries
    val rerun = TextAnalysis.perplexityBuckets(docs, lm, "doc_id", "text")
      .select($"doc_id", $"bits_fp", $"bucket", $"kept")
      .as[(Long, Long, String, Boolean)].collect().toSeq
    assert(rerun.toSet == out.toSet)
  }
}
