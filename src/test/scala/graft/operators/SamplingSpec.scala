package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("sf0.01"), "documents")

  test("hashSample is deterministic and lands near the target rate") {
    val a = Sampling.hashSample(docs, "doc_id", 20, seed = 1)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs, "doc_id", 20, seed = 1)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "same seed, same rows")
    val n = docs.count().toDouble
    assert(a.length > n * 0.12 && a.length < n * 0.28,
      s"20% target, got ${a.length}/$n")
    // a different seed draws a different set
    val c = Sampling.hashSample(docs, "doc_id", 20, seed = 2)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }

  test("sampled set is monotone in the rate (bucket nesting)") {
    val small = Sampling.hashSample(docs, "doc_id", 10, seed = 3)
      .select($"doc_id").as[Long].collect().toSet
    val big = Sampling.hashSample(docs, "doc_id", 40, seed = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), "pct=10 rows must all appear at pct=40")
  }

  test("stratified rates apply per stratum") {
    val s = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 0), defaultPct = 100, seed = 7)
    assert(s.filter($"lang" === "en").count() == 0)
    val nonEn = docs.filter($"lang" =!= "en").count()
    assert(s.count() == nonEn, "non-en strata kept at 100%")
  }

  test("deterministicShuffle: a contiguous permutation equal to the global hash order") {
    import graft.functions.TextFunctions.hash32
    val out = Sampling.deterministicShuffle(docs, "doc_id", seed = 13, numBuckets = 16)
      .select($"shuffle_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    val n = docs.count()
    assert(out.map(_._1).toSeq == (1L to n).toSeq, "positions are 1..n with no gaps")
    // bucketed offset+rank must equal the single global-order rank
    val expected = docs.select($"doc_id",
        hash32($"doc_id".cast("string"), 13).as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
      .zipWithIndex.map { case ((id, _), i) => (i + 1L, id) }.toSeq
    assert(out.toSeq == expected)
    // reruns identical; different seed -> different permutation
    val again = Sampling.deterministicShuffle(docs, "doc_id", seed = 13, numBuckets = 16)
      .select($"shuffle_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
    val other = Sampling.deterministicShuffle(docs, "doc_id", seed = 14, numBuckets = 16)
      .select($"shuffle_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(other.toSeq != out.toSeq)
  }

  test("capPerGroup: enforces the cap, keeps groups under it whole, reruns agree") {
    val capped = Sampling.capPerGroup(docs, "doc_id", "source", 10, seed = 7)
    val perSrc = capped.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(perSrc.values.forall(_ <= 10), perSrc.toString)
    // every source in this table has 25 docs — all must hit the cap exactly
    assert(perSrc.values.forall(_ == 10), perSrc.toString)
    val again = Sampling.capPerGroup(docs, "doc_id", "source", 10, seed = 7)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(again == capped.select($"doc_id").as[Long].collect().sorted.toSeq)
    // a cap above the group size keeps everything
    assert(Sampling.capPerGroup(docs, "doc_id", "source", 100, seed = 7).count()
      == docs.count())
  }

  test("sqrtRebalance: min group survives whole, others thin toward √-tempered shares") {
    val langCounts = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val mn = langCounts.values.min
    val out = Sampling.sqrtRebalance(docs, "doc_id", "lang", seed = 17)
    val outCounts = out.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    // rate for the min-count group is exactly 10^6 ppm -> nothing dropped
    val minLang = langCounts.minBy(_._2)._1
    assert(outCounts(minLang) == mn, s"min group must pass whole: $outCounts")
    // every other group is downsampled and lands near sqrt(mn*cnt)
    langCounts.foreach { case (l, cnt) =>
      if (l != minLang) {
        val expected = math.sqrt(mn.toDouble * cnt)
        assert(outCounts(l) <= cnt)
        assert(math.abs(outCounts(l) - expected) < expected * 0.35 + 5,
          s"$l: got ${outCounts(l)}, expected ~$expected")
      }
    }
  }

  test("repeatByWeight: expected multiplicity, determinism, copy numbering") {
    val weighted = docs.withColumn("weight_ppm", lit(2500000L)) // 2.5 epochs
    val out = Sampling.repeatByWeight(weighted, "doc_id", "weight_ppm", seed = 19)
    val n = docs.count().toDouble
    val total = out.count().toDouble
    assert(total > n * 2.3 && total < n * 2.7, s"2.5x target, got ${total / n}x")
    // every doc gets at least floor(w)=2 copies, numbered 1..k
    val perDoc = out.groupBy($"doc_id").agg(
      count(lit(1)).as("k"), min($"copy").as("lo"), max($"copy").as("hi"))
    assert(perDoc.filter($"k" < 2 || $"k" > 3 || $"lo" =!= 1 || $"hi" =!= $"k").isEmpty)
    // pure function of (id, weight, seed)
    val again = Sampling.repeatByWeight(weighted, "doc_id", "weight_ppm", seed = 19)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("repeatByWeight downsamples below 1.0 with the same rule") {
    val weighted = docs.withColumn("weight_ppm", lit(400000L)) // 0.4 epochs
    val out = Sampling.repeatByWeight(weighted, "doc_id", "weight_ppm", seed = 19)
    val n = docs.count().toDouble
    val total = out.count().toDouble
    assert(total > n * 0.3 && total < n * 0.5, s"0.4x target, got ${total / n}x")
    assert(out.filter($"copy" =!= 1).isEmpty, "at most one copy below w=1")
    // the kept set IS weightedHashSample's set (same hash rule)
    val kept = Sampling.weightedHashSample(weighted, "doc_id", "weight_ppm", seed = 19)
      .select($"doc_id")
    assert(out.select($"doc_id").exceptAll(kept).isEmpty &&
      kept.exceptAll(out.select($"doc_id")).isEmpty)
  }

  test("repeatByWeight plan is a zero-shuffle map-side explode") {
    // plain scan (the Tables fixture repartitions small local files)
    val weighted = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .withColumn("weight_ppm", lit(1500000L))
    val plan = Sampling.repeatByWeight(weighted, "doc_id", "weight_ppm", seed = 19)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("component-keyed split never separates a near-dup pair (q125 rule)") {
    import graft.functions.TextFunctions.hash32
    import org.apache.spark.sql.functions.{coalesce, col, when}
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .localCheckpoint()
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    val split = docs.select(col("doc_id"))
      .join(Dedup.nearDupGroups(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keep_id"), col("doc_id")).as("comp"))
      .select(col("doc_id"),
        when(hash32(col("comp").cast("string"), 9) % 100 < 80, "train")
          .otherwise("test").as("split"))
    val crossSplit = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
    assert(crossSplit.isEmpty,
      "a near-dup pair crossed the train/test boundary")
    // while the q34 doc-id-keyed rule DOES leak on the same corpus
    val docSplit = docs.select(col("doc_id"),
      when(hash32(col("doc_id").cast("string"), 9) % 100 < 80, "train")
        .otherwise("test").as("split"))
    val leaked = pairs
      .join(docSplit.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(docSplit.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
    assert(!leaked.isEmpty,
      "fixture too clean to demonstrate doc-keyed leakage")
  }

  test("hashNegatives: deterministic, anchor-free, bucket-pool argmin") {
    import graft.functions.TextFunctions.hash32
    val ids = (0L until 40L).toDF("id")
    val anchors = ids.filter(col("id") % 4 === 0)
    val out = Sampling.hashNegatives(anchors, ids, "id", k = 3, buckets = 4)
      .as[(String, Long, String)].collect().sortBy(r => (r._1.toLong, r._2))
    // ≤ k slots per anchor, a negative is never its own anchor
    assert(out.groupBy(_._1).forall(_._2.length <= 3))
    assert(out.forall { case (a, _, n) => a != n })
    // rerun-stable (no RNG state)
    val again = Sampling.hashNegatives(anchors, ids, "id", k = 3, buckets = 4)
      .as[(String, Long, String)].collect().sortBy(r => (r._1.toLong, r._2))
    assert(out.toSeq == again.toSeq)
    // each pick is the pair-hash argmin within the slot's candidate bucket
    val bucketOf = ids.select(col("id").cast("string").as("c"),
        (hash32(col("id").cast("string"), 21) % 4).as("b"))
      .as[(String, Long)].collect().toMap
    val pairH = (a: String, c: String) =>
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s"$a:$c#23".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)
    out.foreach { case (a, slot, n) =>
      val pool = bucketOf.collect {
        case (c, b) if b == bucketOf(n) && c != a => c }
      assert(pool.minBy(c => (pairH(a, c), c)) == n,
        s"anchor $a slot $slot: $n is not the bucket argmin")
    }
  }

  test("neymanAllocation: hand-checked weights, zero-variance stratum, budget cap") {
    // stratum a: values 0,0,10,10 (n=4, nΣx²−(Σx)² = 4·200−400 = 400, w=20)
    // stratum b: constant 7s (σ=0 → w=0 → alloc 0)
    // stratum c: 0,6 (n=2, 2·36−36 = 36, w=6)
    val df = Seq(("a", 0L), ("a", 0L), ("a", 10L), ("a", 10L),
      ("b", 7L), ("b", 7L), ("b", 7L), ("b", 7L),
      ("c", 0L), ("c", 6L)).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", budget = 130L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_h"), r.getAs[Long]("w_h"),
         r.getAs[Long]("alloc_n"), r.getAs[Long]("prop_n"))).toMap
    assert(out("a") === ((4L, 20L, 130L * 20 / 26, 130L * 4 / 10)))
    assert(out("b") === ((4L, 0L, 0L, 130L * 4 / 10)))
    assert(out("c") === ((2L, 6L, 130L * 6 / 26, 130L * 2 / 10)))
    // floor divisions never overspend
    assert(out.values.map(_._3).sum <= 130L)
    assert(out.values.map(_._4).sum <= 130L)
  }

  test("diverseSample: at most perCell per trained cell, cells covered, deterministic") {
    val e = graft.sources.Tables(spark, sf("sf0.01"), "embeddings")
    val out = Sampling.diverseSample(e, perCell = 10, nCells = 8)
      .as[(Long, Int)].collect().toSeq
    val perCell = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perCell.values.forall(_ <= 10), s"cap violated: $perCell")
    // every non-empty cell contributes (corpus >> cells·perCell here,
    // so each trained cell fills its quota)
    assert(perCell.size >= 2 && out.size == perCell.size * 10)
    // sampled ids are real corpus ids
    val ids = e.select($"vec_id").as[Long].collect().toSet
    assert(out.map(_._1).forall(ids))
    val rerun = Sampling.diverseSample(e, perCell = 10, nCells = 8)
      .as[(Long, Int)].collect().toSeq
    assert(rerun.toSet == out.toSet)
  }
}
