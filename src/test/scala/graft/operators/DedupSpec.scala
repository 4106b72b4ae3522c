package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "  The  QUICK brown fox jumps over the lazy dog "), // exact dup after norm
    (2L, "the quick brown fox jumps over the lazy cat"),     // near dup of 0/1
    (3L, "completely different words entirely here today now friend"),
  ).toDF("doc_id", "text")

  test("exactGroups collapses normalization-equivalent duplicates") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .orderBy($"keep_id").as[(Long, Long)].collect().toSeq
    assert(g == Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("minhash LSH finds the near-duplicate pair") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))              // identical → always banded
    assert(!pairs.exists(p => p._2 == 3L))        // unrelated doc never pairs
  }

  test("simhash of identical docs has Hamming distance 0; dissimilar docs don't") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(!out.contains((0L, 3L)))
  }

  test("shingleJaccard computes exact jaccard") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.shingleJaccard(docs, pairs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 1L)) === 1.0)          // identical shingle sets
    assert(!j.contains((0L, 3L)))        // zero intersection → no row
  }

  test("embeddingNearDup: LSH banding finds near-identical vectors without O(n^2)") {
    // synthetic near-dup regime: 50 bases x 3 noisy copies, true pairs at
    // cosine ~0.99+ (sign-LSH collision prob per bit ~1 there)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).flatMap { g =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 3).map { c =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.02).toFloat).toSeq
        ((g * 3 + c).toLong, v)
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, minCosine = 0.95, dim = 64)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val truePairs = (0 until 50).flatMap { g =>
      val ids = (0 until 3).map(c => (g * 3 + c).toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val recall = (truePairs & pairs).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"recall $recall")
    // rescoring keeps only genuinely similar pairs
    assert(pairs.forall { case (a, b) => a / 3 == b / 3 }, "no cross-group pairs")
  }

  test("nearDupGroups: transitive chains collapse to one component") {
    // component logic on explicit pairs: 10-11-12 chained, 20-21 separate
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val groups = Dedup.nearDupGroups(pairs).as[(Long, Long)].collect().toMap
    assert(groups(11L) == 10L && groups(12L) == 10L && groups(10L) == 10L)
    assert(groups(21L) == 20L)
  }

  test("nearDupGroups: long chain converges through the contracted graph") {
    // a 24-vertex path is the adversarial residual for star contraction:
    // cliques collapse in the contraction pass, but a monotone-id chain
    // shrinks only by a constant (l0(v) = v-1 drops one vertex) — this
    // exercises the propagation loop over the contracted graph
    val chain = (0 until 23).map(i => (100L + i, 101L + i))
    // driverMaxEdges = 0 forces the DISTRIBUTED loop (the round-12
    // driver union-find fallback would otherwise absorb this residual)
    val (groups, rounds) = Dedup.nearDupGroupsCounted(
      chain.toDF("id_a", "id_b"), driverMaxEdges = 0)
    val m = groups.as[(Long, Long)].collect().toMap
    assert((100 to 123).forall(i => m(i.toLong) == 100L), s"labels: $m")
    // pointer doubling covers ~2^rounds hops of the ~22-edge contracted
    // path, so convergence must land well under one round per edge
    assert(rounds > 0 && rounds <= 14, s"rounds: $rounds")
  }

  test("nearDupGroups: cliques and stars collapse with ZERO propagation rounds") {
    // every component here is a star/clique — one contraction pass labels
    // everything, the propagation loop must not run at all (the round
    // count is the cluster-portable cost: each round is one Spark job)
    val pairs = (Seq((1L, 2L), (1L, 3L), (2L, 3L)) ++          // clique
      (10 to 15).map(i => (5L, i.toLong))).toDF("id_a", "id_b") // star
    val (groups, rounds) = Dedup.nearDupGroupsCounted(pairs)
    val m = groups.as[(Long, Long)].collect().toMap
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 1L)
    assert((10 to 15).forall(i => m(i.toLong) == 5L) && m(5L) == 5L)
    assert(rounds == 0, s"rounds: $rounds")
  }

  test("nearDupSurvivors: one survivor per near-identical group, others untouched") {
    val base = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    val v1 = base.replace("w30", "zzz")            // ~ base
    val v2 = v1.replace("w01", "yyy")               // ~ v1 (and ~ base)
    val docs = Seq((10L, base), (11L, v1), (12L, v2),
      (13L, "completely unrelated words entirely different content here")).toDF("doc_id", "text")
    val survivors = Dedup.nearDupSurvivors(docs, "doc_id", "text", minJaccard = 0.5)
      .as[Long].collect().toSet
    assert(survivors == Set(10L, 13L), s"survivors: $survivors")
  }

  test("simhash blockBits prunes the pair space") {
    val all = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64, blockBits = 0).count()
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64, blockBits = 8).count()
    assert(blocked <= all)
  }

  test("simhashPairsBlocked ≡ all-pairs simhash (pigeonhole recall is exact)") {
    // richer corpus: 40 docs, some near-identical (small Hamming), most far
    val base = (1 to 25).map(i => f"word$i%02d")
    val many = (0 until 40).map { d =>
      val toks = base.map(w => if (d % 7 == 0 && w == "word03") s"alt$d" else w)
      (d.toLong, (toks :+ s"tail${d % 5}").mkString(" "))
    }.toDF("doc_id", "text")
    for (mh <- Seq(0, 3, 7)) {
      val exact = Dedup.simhashPairs(many, "doc_id", "text", maxHamming = mh, blockBits = 0)
        .as[(Long, Long, Long)].collect().toSet
      val blocked = Dedup.simhashPairsBlocked(many, "doc_id", "text", maxHamming = mh)
        .as[(Long, Long, Long)].collect().toSet
      assert(blocked == exact, s"maxHamming=$mh: blocked ${blocked.size} vs exact ${exact.size}")
    }
  }

  test("embeddingNearDup band path ≡ exact all-pairs path on a near-dup corpus") {
    // The LSH contract: for TRUE near-duplicates (cosine ≥ ~0.95, bit
    // collision prob ≥ 0.90) the 16x8 banding recalls every pair —
    // band-path output equals the exact O(n²) rescore at test scale.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).flatMap { g =>
      val b = Array.fill(64)(rnd.nextGaussian())
      (0 until 3).map(c => ((g * 3 + c).toLong,
        b.map(x => (x + rnd.nextGaussian() * 0.02).toFloat).toSeq))
    }
    val emb = rows.toDF("vec_id", "embedding")
    import graft.functions.GraftFunctions.cosine_sim
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val exact = a.join(b, $"id_a" < $"id_b")
      .withColumn("sim", cosine_sim($"va", $"vb"))
      .filter($"sim" >= 0.95)
      .select($"id_a", $"id_b", $"sim")
      .as[(Long, Long, Double)].collect().toSet
    val banded = Dedup.embeddingNearDup(emb, minCosine = 0.95, dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    assert(banded == exact, s"banded ${banded.size} vs exact ${exact.size}")
  }

  test("portable rhp signatures are md5-reproducible and stable") {
    import graft.functions.{PortableSigns, GraftFunctions}
    // sign derivation matches the documented md5 spelling
    assert(Set(1.0, -1.0).contains(PortableSigns.sign(0, 0, 42L)))
    val v = Seq((1L, Seq(1.0f, -2.0f, 0.5f, 3.0f)))
      .toDF("vec_id", "embedding")
    val s1 = v.select(GraftFunctions.rhp_signature($"embedding", 8, 4, 42L, portable = true))
      .as[Long].head()
    val s2 = v.select(GraftFunctions.rhp_signature($"embedding", 8, 4, 42L, portable = true))
      .as[Long].head()
    assert(s1 == s2 && s1 >= 0L && s1 < 256L)
  }

  test("editDistancePairs ≡ naive within-block join, incl. cross-band lengths") {
    // lengths 5 and 7 fall in different width-3 bands (1 vs 2) yet are
    // within edit distance 2 — the adjacent-band explode must catch them
    val d = Seq(
      (1L, "abcde", "B1"), (2L, "abcdefg", "B1"), // dist 2, bands 1/2
      (3L, "abcde", "B1"),                        // dist 0 to id 1
      (4L, "zzzzz", "B1"),                        // far from all
      (5L, "abcde", "B2"),                        // other block: no pair
    ).toDF("id", "name", "blk")
    val banded = Dedup.editDistancePairs(d, "id", "name", "blk", maxEdit = 2)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)].collect().toSet
    val rows = d.as[(Long, String, String)].collect()
    val naive = (for {
      (ia, na, ba) <- rows; (ib, nb, bb) <- rows
      if ba == bb && ia < ib
      dist = {
        val m = Array.tabulate(na.length + 1, nb.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to na.length; j <- 1 to nb.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (na(i - 1) == nb(j - 1)) 0 else 1))
        m(na.length)(nb.length)
      }
      if dist <= 2
    } yield (ia, ib, dist)).toSet
    assert(banded == naive && naive.contains((1L, 2L, 2)))
  }

  test("crossNearDupPairs: finds planted cross-corpus near-dups, never pairs within a side") {
    val left = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unrelated benchmark question here today"),
    ).toDF("doc_id", "text")
    val right = Seq(
      (200L, "the quick brown fox jumps over the lazy cat"), // near-dup of 100
      (201L, "the quick brown fox jumps over the lazy dog"), // exact dup of 100
      (202L, "different training text with other words entirely"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossNearDupPairs(left, right, "doc_id", "text",
        minJaccard = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 201L)), "exact cross-dup missed")
    assert(pairs.contains((100L, 200L)), "near cross-dup missed")
    assert(pairs.forall { case (a, b) => a < 200 && b >= 200 },
      "a pair stayed within one side")
  }

  test("sourceOverlap: shared shingle counts and containment on a known fixture") {
    val d = Seq(
      (1L, "a b c d", "srcA"), // shingles {a b c, b c d}
      (2L, "a b c x", "srcB"), // shingles {a b c, b c x}
      (3L, "p q r s", "srcC"), // disjoint
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(d, "doc_id", "text", "source")
      .as[(String, String, Long, Long)].collect().toSeq
    // only (srcA, srcB) overlap: 1 shared of min(2, 2) -> 500000 ppm
    assert(out == Seq(("srcB", "srcA", 1L, 500000L)) ||
      out == Seq(("srcA", "srcB", 1L, 500000L)))
  }

  test("semanticDupes ≡ naive within-cell earlier-similar rule") {
    // two clean clusters; ids 0 and 1 are the two cluster archetypes so
    // the portable init (lowest-id vectors) starts at the true centers
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.0, 0.0, 0.0) else Array(0.0, 1.0, 0.0, 0.0)
      (i.toLong, base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Dedup.semanticDupes(emb, nCells = 2, minCosine = 0.9)
      .select($"vec_id", $"kept_by").as[(Long, Long)].collect().toMap
    // naive recomputation: same cells (parity of the archetype), all
    // within-cluster cosines are > 0.9 here, so everything except each
    // cluster's lowest id is removed, kept by that lowest id
    val expected = (2 until 40).map(i => (i.toLong, (i % 2).toLong)).toMap
    assert(out == expected)
  }

  test("longestSharedSpan: exact run lengths on known fixtures") {
    // pair (10,11): "one two three four" shared -> span 4 (plus "zz" alone)
    // pair (10,12): tokens shared only out of order -> span 1
    // pair (13,14): no shared tokens -> absent from output
    val d = Seq(
      (10L, "one two three four zz"),
      (11L, "aa one two three four"),
      (12L, "four three one"),
      (13L, "left side words"),
      (14L, "right bank terms"),
    ).toDF("doc_id", "text")
    val pairs = Seq((10L, 11L), (10L, 12L), (13L, 14L)).toDF("id_a", "id_b")
    val out = Dedup.longestSharedSpan(d, pairs, "doc_id", "text")
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 11L, 4L), (10L, 12L, 1L)))
  }

  test("longestSharedSpan: span of a doc paired with itself is its length") {
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val pairs = Seq((1L, 1L)).toDF("id_a", "id_b")
    val out = Dedup.longestSharedSpan(d, pairs, "doc_id", "text")
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 1L, 7L)))
  }

  test("prefixJaccardPairs ≡ brute-force all-pairs at several thresholds") {
    import graft.functions.TextFunctions.{shingles, tokens}
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
    def brute(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long)] = {
      val sets = docs
        .select($"doc_id", tokens($"text").as("tok"))
        .select($"doc_id", array_distinct(shingles($"tok", 3)).as("hs"))
      sets.as("a").join(sets.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          size(array_intersect($"a.hs", $"b.hs")).cast("long").as("ni"),
          (size($"a.hs") + size($"b.hs") - size(array_intersect($"a.hs", $"b.hs")))
            .cast("long").as("nu"))
        .filter($"ni" * tauDen >= $"nu" * tauNum)
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    def fast(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long)] =
      Dedup.prefixJaccardPairs(docs, "doc_id", "text", tauNum, tauDen)
        .select($"id_a", $"id_b", $"ni", $"nu")
        .as[(Long, Long, Long, Long)].collect().toSet
    for ((n, d) <- Seq((3, 5), (4, 5), (9, 10)))
      assert(fast(n, d) == brute(n, d), s"tau=$n/$d")
  }

  test("prefixJaccardPairs plans no cartesian/nested-loop stage") {
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
    val p = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("containmentPairs ≡ brute-force directed containment at several thresholds") {
    import graft.functions.TextFunctions.{shingles, tokens}
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
    def brute(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long)] = {
      val sets = docs
        .select($"doc_id", tokens($"text").as("tok"))
        .select($"doc_id", array_distinct(shingles($"tok", 3)).as("hs"))
        .filter(size($"hs") > 0)
      sets.as("a").join(sets.as("b"), $"a.doc_id" =!= $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          size($"a.hs").cast("long").as("na"),
          size(array_intersect($"a.hs", $"b.hs")).cast("long").as("ni"))
        .filter($"ni" * tauDen >= $"na" * tauNum)
        .as[(Long, Long, Long, Long)].collect().toSet
    }
    def fast(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long)] =
      Dedup.containmentPairs(docs, "doc_id", "text", tauNum, tauDen)
        .select($"id_a", $"id_b", $"na", $"ni")
        .as[(Long, Long, Long, Long)].collect().toSet
    for ((n, d) <- Seq((4, 5), (9, 10), (1, 1)))
      assert(fast(n, d) == brute(n, d), s"tau=$n/$d")
  }

  test("containmentPairs: snippet quoted inside a large doc fires; symmetric Jaccard never can") {
    val snippet = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 80).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (10L, snippet),
      (11L, s"$filler $snippet"), // snippet embedded whole in a 10x larger doc
      (12L, "totally unrelated content about something else entirely friend"),
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text", 9, 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(cont.contains((10L, 11L)))     // small ⊂ big detected
    assert(!cont.contains((11L, 10L)))    // big not contained in small
    assert(!cont.exists(p => p._1 == 12L || p._2 == 12L))
    // the same pair is invisible to the symmetric-Jaccard scale path even
    // at its lowest declared threshold: J ≈ |Sa|/|Sb| is diluted away
    val jac = Dedup.prefixJaccardPairs(corpus, "doc_id", "text", 3, 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((10L, 11L)))
  }

  test("dedupWeights: component members split the unit mass; singletons keep it") {
    val w = Dedup.dedupWeights(docs, "doc_id", "text")
      .select($"doc_id", $"comp", $"comp_size", $"weight_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    // docs 0/1/2 form one component (exact dup + J=0.75 near dup), 3 is solo
    assert(w == Set(
      (0L, 0L, 3L, 333333L), (1L, 0L, 3L, 333333L), (2L, 0L, 3L, 333333L),
      (3L, 3L, 1L, 1000000L)))
  }

  test("containmentPairs plans no cartesian/nested-loop stage") {
    val docs = graft.sources.Tables(spark, sf("sf0.001"), "documents")
    val p = Dedup.containmentPairs(docs, "doc_id", "text", 4, 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("spanCoverage: exact interval union (merge at gap <= k, split past it)") {
    // k=3: positions 0 and 2 overlap ([0,2] vs [2,4]) -> one span of 5;
    // position 9 is its own span of 3
    val pos = Seq((1L, 0), (1L, 2), (1L, 9)).toDF("doc_id", "pos")
    val out = Dedup.spanCoverage(pos, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 8L)))
  }

  test("repeatedSpans: cross-doc spans merge, within-doc-only repeats don't count") {
    val d = Seq(
      (0L, "a b c d e f g h"),                 // shares "a b c d e" with 1
      (1L, "x x a b c d e y"),
      (2L, "p q r s t u v w"),                 // nothing shared
      (3L, "a b c z z z z a b c"),             // "a b c" twice (dup'd via 0/1);
                                               // "z z z" repeats ONLY here -> not counted
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 8L, 1L, 5L, 625000L),   // one span "a b c d e"
      (1L, 8L, 1L, 5L, 625000L),
      (2L, 8L, 0L, 0L, 0L),
      (3L, 10L, 2L, 6L, 600000L))) // two "a b c" islands, gap 7 > k
  }

  test("exciseRepeatedSpans removes exactly the reported spans and rebuilds in order") {
    val d = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x x a b c d e y"),
      (2L, "p q r s t u v w"),
      (3L, "a b c z z z z a b c"),
    ).toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 8L, 3L, "f g h"),       // span [0,4] excised
      (1L, 8L, 3L, "x x y"),       // span [2,6] excised
      (2L, 8L, 8L, "p q r s t u v w"),
      (3L, 10L, 4L, "z z z z")))   // both "a b c" spans excised
  }

  test("semanticDedupExemplars: transitive groups, centroid-outlier election") {
    def unit(xs: Double*): Array[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    // two well-separated clusters; ids interleave so the portable k-means
    // init (two lowest ids) seeds one centroid per true cluster
    val vecs = Seq(
      (0L, unit(1.0, 0.0, 0.0, 0.0)),     // cluster A
      (1L, unit(0.0, 0.0, 1.0, 0.0)),     // cluster B
      (2L, unit(0.98, 0.2, 0.0, 0.0)),    // A: cos(0,2)≈0.98
      (3L, unit(0.0, 0.0, 0.995, 0.0999)),// B: cos(1,3)≈0.995
      (4L, unit(0.9, 0.436, 0.0, 0.0)),   // A: cos(2,4)≈0.97, cos(0,4)=0.9
      (5L, unit(0.0, 0.0, 0.9, 0.436)),   // B: cos(1,5)=0.9, cos(3,5)≈0.94
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExemplars(vecs, nCells = 2, minCosine = 0.8)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val comp = out.map(r => r._1 -> r._2).toMap
    val kept = out.filter(_._3).map(_._1).toSet
    // transitive: the A-chain {0,2,4} is ONE group even though cos(0,4)
    // only qualifies via 2; both groups label with their min id
    assert(Seq(0L, 2L, 4L).forall(comp(_) == 0L), s"comp: ${comp.toSeq.sorted}")
    assert(Seq(1L, 3L, 5L).forall(comp(_) == 1L), s"comp: ${comp.toSeq.sorted}")
    // the paper's election: keep the member LEAST similar to its cell
    // centroid — the edge vectors 4 and 5, not the central ones
    assert(kept == Set(4L, 5L), s"kept: $kept")
    // deterministic across reruns (portable k-means + fixed-order cosine)
    val rerun = Dedup.semanticDedupExemplars(vecs, nCells = 2, minCosine = 0.8)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rerun.toSeq == out.toSeq)
  }

  private def unitV(xs: Double*): Array[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat).toArray
  }

  test("semanticDedupExemplars: exact-duplicate collapse is lossless on a copy-heavy skewed cell") {
    // the 100 TB pathology in miniature: a crawl dumps byte-identical
    // embeddings — ids 0/2/4/6 are EXACT copies (cluster A), 8 a true
    // near-dup of A; ids 1/3 exact copies (cluster B), 5 a near-dup of B
    val a = unitV(1.0, 0.0, 0.0, 0.0)
    val b = unitV(0.0, 0.0, 1.0, 0.0)
    val vecs = Seq(
      (0L, a), (2L, a), (4L, a), (6L, a),
      (8L, unitV(0.98, 0.2, 0.0, 0.0)),
      (1L, b), (3L, b),
      (5L, unitV(0.0, 0.0, 0.9, 0.436)),
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExemplars(vecs, nCells = 2, minCosine = 0.8)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val comp = out.map(r => r._1 -> r._2).toMap
    // copies ride delegate edges, the near-dup rides the pairwise edge:
    // components are exactly what the uncollapsed all-pairs stage finds
    assert(Seq(0L, 2L, 4L, 6L, 8L).forall(comp(_) == 0L), s"comp: ${comp.toSeq.sorted}")
    assert(Seq(1L, 3L, 5L).forall(comp(_) == 1L), s"comp: ${comp.toSeq.sorted}")
    // election unchanged by the collapse: the centroid outliers (the
    // near-dups, not the identical mass the centroid sits on) are kept
    val kept = out.filter(_._3).map(_._1).toSet
    assert(kept == Set(8L, 5L), s"kept: $kept")
  }

  test("semanticDedupExemplars: sub-band skew guard caps an oversized cell, copies stay grouped") {
    // one giant cell (nCells = 1) of 6 distinct directions + 3 exact
    // copies; maxCellSize = 2 forces ceil(log2(6/2)) = 2 sub-band bits.
    // Copies collapse BEFORE banding, so the guard bounds distinct², and
    // the delegate edges keep every copy grouped no matter the banding.
    val a = unitV(1.0, 0.2, 0.0, 0.1)
    val vecs = Seq(
      (0L, a), (1L, a), (2L, a),
      (3L, unitV(0.0, 1.0, 0.0, 0.0)),
      (4L, unitV(0.0, 0.0, 1.0, 0.0)),
      (5L, unitV(0.0, 0.0, 0.0, 1.0)),
      (6L, unitV(1.0, 0.21, 0.0, 0.1)),   // near-dup of a: cos ~ 0.9999
      (7L, unitV(0.5, -0.5, 0.5, -0.5)),
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.95,
        maxCellSize = 2)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 8)
    val comp = out.map(r => r._1 -> r._2).toMap
    // exact copies always co-grouped (collapse edges bypass the bands)
    assert(Seq(0L, 1L, 2L).forall(comp(_) == 0L), s"comp: ${comp.toSeq.sorted}")
    // the cosine-0.9999 near-dup of the CELL HUB (id 0 is the cell's
    // min delegate) is always recovered: co-banded with the hub it
    // meets it in the within-band join, otherwise the hub spokes pair
    // them directly
    assert(comp(6L) == 0L, s"comp: ${comp.toSeq.sorted}")
    // the dissimilar directions never merge
    assert(Seq(3L, 4L, 5L, 7L).forall(comp(_) != 0L), s"comp: ${comp.toSeq.sorted}")
    // exactly one exemplar per group, deterministic on rerun
    val perComp = out.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(perComp.values.forall(_ == 1), s"exemplars per comp: $perComp")
    val rerun = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.95,
        maxCellSize = 2)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rerun.toSeq == out.toSeq)
  }

  test("semanticDedupExemplars: an over-cap tight BLOCK keeps its group across centered bands") {
    // the regime the round-10 guard redesign exists for: one cell that
    // IS a single tight near-duplicate block, larger than the cap. Its
    // centered residuals are pure noise, so the uniform sub-bands split
    // it — and the band-hub star must re-connect every band so the
    // reported GROUP equals the unbanded one. 8 distinct members, all
    // pairwise cosine > 0.999, maxCellSize = 2 → 2 sub-band bits.
    def jig(eps: Double*) = unitV(
      1.0 + eps(0), 0.2 + eps(1), eps(2), 0.1 + eps(3))
    val vecs = (0L until 8L).map { i =>
      val e = (0 until 4).map(j => 0.0005 * ((i * 4 + j) % 7) - 0.0015)
      (i, jig(e: _*))
    }.toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.99,
        maxCellSize = 2)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 8)
    // one component, labeled by the min id, regardless of banding
    assert(out.forall(_._2 == 0L), s"comps: ${out.map(r => r._1 -> r._2).toSeq}")
    assert(out.count(_._3) == 1, s"kept: ${out.filter(_._3).toSeq}")
    // and the verdict matches the unbanded run (cap high enough)
    val unbanded = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.99)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == unbanded.toSeq)
  }

  test("semanticDedupExemplars: a tight block NOT holding the min id reconnects (centroid-nearest hub)") {
    // the round-10 ADVICE hole: with the hub picked as the MIN-ID
    // delegate, an over-cap tight block that doesn't contain it gets no
    // qualifying spokes and can fragment across the bands. The hub is
    // now the CENTROID-NEAREST delegate: the dominating block owns the
    // cell centroid, so the hub sits inside it regardless of ids. Low
    // ids 0/1 are dissimilar outliers; the 8-member tight block lives
    // at ids 2..9 and must still come out as ONE group.
    def jig(i: Long) = {
      val e = (0 until 4).map(j => 0.0005 * ((i * 4 + j) % 7) - 0.0015)
      unitV(e(0), 0.2 + e(1), 1.0 + e(2), 0.1 + e(3))
    }
    val vecs = (Seq(
      (0L, unitV(1.0, 0.0, 0.0, 0.0)),
      (1L, unitV(0.0, 1.0, 0.0, 0.0))) ++
      (2L until 10L).map(i => (i, jig(i)))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.99,
        maxCellSize = 2)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 10)
    val comp = out.map(r => r._1 -> r._2).toMap
    assert((2L until 10L).forall(comp(_) == 2L),
      s"block fragmented: ${comp.toSeq.sorted}")
    assert(comp(0L) != 2L && comp(1L) != 2L)
    // and the verdict matches the unbanded run (cap high enough)
    val unbanded = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.99)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == unbanded.toSeq)
  }

  test("semanticDedupExemplars: auto cell count (nCells = 0) derives k from the corpus") {
    // 8 vectors / targetCellSize 4096 -> floor to the minimum of 8 cells;
    // k-means caps at the corpus size, every exact-copy class still folds
    val a = unitV(1.0, 0.0, 0.0, 0.0)
    val vecs = Seq(
      (0L, a), (1L, a), (2L, a),
      (3L, unitV(0.0, 1.0, 0.0, 0.0)),
      (4L, unitV(0.0, 0.0, 1.0, 0.0)),
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupExemplars(vecs, minCosine = 0.9)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 5)
    val comp = out.map(r => r._1 -> r._2).toMap
    assert(Seq(0L, 1L, 2L).forall(comp(_) == 0L), s"comp: ${comp.toSeq.sorted}")
    assert(comp(3L) == 3L && comp(4L) == 4L)
  }

  test("semanticRecallAudit: exact ground truth vs co-celled fraction per cell count") {
    val vecs = Seq(
      (0L, unitV(1.0, 0.0, 0.0, 0.0)),
      (1L, unitV(0.0, 0.0, 1.0, 0.0)),
      (2L, unitV(0.98, 0.2, 0.0, 0.0)),    // pair (0,2): cos ~ 0.98
      (3L, unitV(0.0, 0.0, 0.995, 0.0999)),// pair (1,3): cos ~ 0.995
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticRecallAudit(vecs, cellCounts = Seq(1, 2),
        minCosine = 0.8, sampleMod = 1)
      .orderBy($"n_cells")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // 1 cell: everything co-celled; 2 cells: the portable k-means seeds
    // on ids 0/1 and separates the clusters without splitting either pair
    assert(out == Seq(
      (1, 2L, 2L, 1000000L),
      (2, 2L, 2L, 1000000L)))
  }

  test("exciseRepeatedSpans keepOne: lowest-id holder keeps each duplicated gram") {
    val d = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x x a b c d e y"),
      (2L, "p q r s t u v w"),
      (3L, "a b c z z z z a b c"),
    ).toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2,
        keepOne = true)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 0 is the min-id holder of every duplicated gram it contains
    // ("a b c", "b c d", "c d e") → fully intact, where remove-all cut it
    assert(out(0) == ((0L, 8L, 8L, "a b c d e f g h")))
    // doc 1 owns none of its duplicated grams (doc 0 holds them all) →
    // same excision as remove-all
    assert(out(1) == ((1L, 8L, 3L, "x x y")))
    assert(out(2) == ((2L, 8L, 8L, "p q r s t u v w")))
    // doc 3 owns nothing ("a b c" is doc 0's) → both copies excised; and
    // crucially BOTH its occurrences go (ownership is per doc, not per
    // occurrence — the owner is doc 0, not doc 3's first copy)
    assert(out(3) == ((3L, 10L, 4L, "z z z z")))
    // determinism: owner election is min over unique ids — rerun is equal
    val rerun = Dedup.exciseRepeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2,
        keepOne = true).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rerun == out)
  }

  test("exciseRepeatedSpans keepOne: owner keeps span even when remove-all empties it") {
    // identical boilerplate docs: remove-all excises both to empty; the
    // keep-one owner (min id = 7) survives whole, the copy (9) is emptied
    val d = Seq((9L, "one two three four five six"),
                (7L, "one two three four five six"),
                (8L, "unrelated filler words here now ok")).toDF("doc_id", "text")
    val keep = Dedup.exciseRepeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2,
        keepOne = true).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(keep == Seq(
      (7L, 6L, 6L, "one two three four five six"),
      (8L, 6L, 6L, "unrelated filler words here now ok"),
      (9L, 6L, 0L, "")))
  }

  test("exciseRepeatedSpans: boilerplate-heavy doc (500 sentence repeats) stays linear") {
    // adversarial shape for the span anti-join: one doc is 500 repetitions
    // of a 6-token sentence (3000 tokens), duplicated in a second doc so
    // every gram qualifies. The doc_id-only equi-join evaluated
    // tokens × spans residual predicates per doc; the bucketed join keys
    // on (doc_id, p div k) so fanout is O(tokens + coverage). Correctness:
    // adjacent repeats merge into ONE maximal span covering the whole doc
    // (gap between duplicated gram starts is 1 <= k), so both docs excise
    // to empty, and the many-separate-spans doc excises exactly its spans.
    val sentence = "alpha beta gamma delta epsilon zeta"
    val boiler = Array.fill(500)(sentence).mkString(" ")
    // doc 2: 50 DISJOINT duplicated spans ("s<i> …") separated by unique
    // filler runs longer than k, so spans stay separate islands
    val spiky = (0 until 50).flatMap(i =>
      Seq("mark one two three four") ++ (0 until 5).map(j => s"u${i}_$j")).mkString(" ")
    val spiky2 = (0 until 50).flatMap(i =>
      Seq("mark one two three four") ++ (0 until 5).map(j => s"v${i}_$j")).mkString(" ")
    val d = Seq((0L, boiler), (1L, boiler), (2L, spiky), (3L, spiky2)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Dedup.exciseRepeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out(0) == ((0L, 3000L, 0L, "")) && out(1) == ((1L, 3000L, 0L, "")))
    // spiky docs: each "mark one two three four" run is one 5-token span
    assert(out(2)._2 == 500L && out(2)._3 == 250L && !out(2)._4.contains("mark"))
    assert(out(3)._3 == 250L)
    // generous wall guard (CI boxes are noisy); the quadratic form is
    // categorically slower on this shape, not marginally
    assert(sec < 30.0, s"excise took $sec s on the boilerplate fixture")
  }

  test("driver union-find fallback == distributed pointer-doubling loop") {
    // the round-12 job-count cut: a driver-sized contracted residual is
    // collected and union-found locally; labels must equal the loop's
    // on the adversarial geometries (chain, fused star+chain, clique)
    val edges = ((0 until 23).map(i => (100L + i, 101L + i)) ++      // chain
      Seq((5L, 101L), (5L, 6L), (5L, 7L)) ++                          // star into it
      Seq((200L, 201L), (201L, 202L), (200L, 202L))).toDF("id_a", "id_b")
    val viaDriver = Dedup.nearDupGroupsCounted(edges)._1
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.nearDupGroupsCounted(edges, driverMaxEdges = 0)._1
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaLoop, s"driver: $viaDriver\nloop: $viaLoop")
    assert(viaDriver(123L) == 5L && viaDriver(200L) == 200L)
  }
}
