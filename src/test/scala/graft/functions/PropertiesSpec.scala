package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.functions.GraftFunctions._

/** Property-based checks (SURVEY §5 test strategy item 2): algebraic laws
  * the vector/text operators must satisfy for any input, evaluated through
  * the real expressions over seeded ScalaCheck generators (scalatestplus
  * isn't on the offline classpath, so cases are drawn explicitly).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Seq[Double]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(-50.0, 50.0)))

  test("cosine: symmetric, bounded, scale-invariant for positive scale") {
    val cases = samples(Gen.zip(vecGen, vecGen, Gen.choose(0.1, 10.0)), 15)
    cases.foreach { case (a0, b0, s) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val rows = Seq((a, b), (b, a), (a.map(_ * s), b)).toDF("x", "y")
        .select(cosine_sim($"x", $"y")).as[Double].collect()
      assert(rows(0) === rows(1), s"symmetry: $a $b") // bit-exact: same loop order
      assert(rows.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
      assert(math.abs(rows(2) - rows(0)) < 1e-9, s"scale invariance: $a $b $s")
    }
  }

  test("cosine of a vector with itself is 1 (or 0 for the zero vector)") {
    (samples(vecGen, 10) :+ Seq(0.0, 0.0)).foreach { a =>
      val c = Seq((a, a)).toDF("x", "y").select(cosine_sim($"x", $"y")).as[Double].head()
      if (a.forall(_ == 0.0)) assert(c === 0.0)
      else assert(math.abs(c - 1.0) < 1e-9, s"self-cosine: $a -> $c")
    }
  }

  test("l2_normalize output has unit norm (or stays zero)") {
    (samples(vecGen, 10) :+ Seq(0.0)).foreach { a =>
      val n = Seq(Tuple1(a)).toDF("x")
        .select(l2_norm(l2_normalize($"x"))).as[Double].head()
      if (a.forall(_ == 0.0)) assert(n === 0.0) else assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("top_k_by_score equals sort-take for any scores") {
    val pairGen = Gen.listOfN(40, Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L)))
    samples(pairGen, 8).foreach { items =>
      val got = items.toDF("score", "id").repartition(3)
        .groupBy(lit(1)).agg(top_k_by_score($"score", $"id", 4).as("t"))
        .select(explode($"t").as("p")).select($"p.score", $"p.id")
        .as[(Double, Long)].collect().toSeq
      val exp = items.sortBy { case (s, i) => (-s, i) }.take(4)
      assert(got == exp, s"items=$items")
    }
  }

  test("top_k_by_score ranks NaN greatest and ties -0.0 with 0.0 (total order)") {
    val items = Seq(
      (Double.NaN, 7L), (5.0, 1L), (Double.NaN, 3L), (5.0, 0L),
      (-0.0, 10L), (0.0, 9L), (-1.0, 2L))
    val got = items.toDF("score", "id").repartition(3)
      .groupBy(lit(1)).agg(top_k_by_score($"score", $"id", 6).as("t"))
      .select(explode($"t").as("p")).select($"p.id")
      .as[Long].collect().toSeq
    // NaN > everything (id tiebreak), then 5.0s, then the zero tie by id
    assert(got == Seq(3L, 7L, 0L, 1L, 9L, 10L), s"got $got")
  }

  test("tumbling windows conserve row counts (bucketing law)") {
    samples(Gen.listOfN(30, Gen.choose(0L, 10000L)), 6).foreach { secs =>
      val df = secs.toDF("sec").select(timestamp_seconds($"sec").as("ts"))
      val total = df.groupBy(window($"ts", "60 seconds")).count()
        .agg(sum($"count")).as[Long].head()
      assert(total == secs.length)
    }
  }

  test("top-k buffer law: admit/merge/eval equals sort-take under Spark's total order, any NaN mix") {
    // reference ranking: Spark total order (NaN greatest), nulls per
    // nullsFirst; compare multisets of kept scores
    val scoreGen: Gen[Option[Double]] = Gen.frequency(
      6 -> Gen.choose(-100.0, 100.0).map(Some(_)),
      1 -> Gen.const(Some(Double.NaN)),
      1 -> Gen.const(None))
    val caseGen = for {
      n <- Gen.choose(0, 40)
      scores <- Gen.listOfN(n, scoreGen)
      k <- Gen.choose(1, 8)
      asc <- Gen.oneOf(true, false)
      nullsFirst <- Gen.oneOf(true, false)
      splitAt <- Gen.choose(0, n)
    } yield (scores, k, asc, nullsFirst, splitAt)

    def expected(scores: Seq[Option[Double]], k: Int, asc: Boolean,
        nullsFirst: Boolean): Seq[Option[Double]] = {
      val (nulls, nonNull) = scores.partition(_.isEmpty)
      val sorted = nonNull.sortWith((x, y) =>
        if (asc) java.lang.Double.compare(x.get, y.get) < 0
        else java.lang.Double.compare(x.get, y.get) > 0)
      val all = if (nullsFirst) nulls ++ sorted else sorted ++ nulls
      all.take(k)
    }

    def canon(s: Seq[Option[Double]]): Map[String, Int] =
      s.groupBy {
        case None => "null"
        case Some(d) if d.isNaN => "nan"
        case Some(d) => d.toString
      }.view.mapValues(_.length).toMap

    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, InterpretedOrdering, NullsFirst, NullsLast, SortOrder}
    import org.apache.spark.sql.types.DoubleType

    def mkOrd(asc: Boolean, nullsFirst: Boolean): Ordering[InternalRow] =
      new InterpretedOrdering(Seq(SortOrder(
        BoundReference(0, DoubleType, nullable = true),
        if (asc) Ascending else Descending,
        if (nullsFirst) NullsFirst else NullsLast, Seq.empty)))
    def row(x: Option[Double]): InternalRow =
      InternalRow.fromSeq(Seq(x.map(Double.box).orNull))

    samples(caseGen, 60).foreach { case (scores, k, asc, nullsFirst, splitAt) =>
      // drive two buffers (split input), merge, eval — the full agg path
      val ord = mkOrd(asc, nullsFirst)
      val b1 = new RowTopKBuffer(k, ord)
      val b2 = new RowTopKBuffer(k, ord)
      def feed(b: RowTopKBuffer, xs: Seq[Option[Double]]): Unit = xs.foreach { x =>
        val r = row(x)
        if (b.wouldAdmit(r)) b.insert(r)
      }
      val (xs1, xs2) = scores.splitAt(splitAt)
      feed(b1, xs1); feed(b2, xs2)
      var i = 0
      while (i < b2.size) { b1.insert(b2.rows(i)); i += 1 }
      val kept: Seq[Option[Double]] = b1.sortedRows.toSeq.take(k)
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(canon(kept) == canon(expected(scores, k, asc, nullsFirst)),
        s"k=$k asc=$asc nullsFirst=$nullsFirst scores=$scores")
    }
  }

  test("Md5Hash32 expression bit-matches the conv/substring/md5 chain (the oracle spelling)") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '#', 'é', '中', '\t')))
      .map(_.mkString)
    val cases = samples(Gen.zip(strGen, Gen.choose(0, 7)), 40) :+ ("", 0)
    cases.foreach { case (s, seed) =>
      val row = Seq(Tuple1(s)).toDF("s")
      val viaChain = row.select(
        conv(substring(md5(concat($"s", lit("#" + seed))), 1, 8), 16, 10)
          .cast("bigint")).as[Long].head()
      val viaExpr = row.select(TextFunctions.hash32($"s", seed)).as[Long].head()
      assert(viaExpr == viaChain, s"mismatch for ${s.take(30)}#$seed")
    }
  }

  test("portable rhp signature: expression equals a JVM-side sign recomputation") {
    // the oracle contract in miniature: signature bit b = sign of the
    // sequential fold of ±v(i), signs from PortableSigns — any engine
    // reproducing those two rules gets the identical bigint
    val vGen = Gen.choose(2, 16).flatMap(n => Gen.listOfN(n, Gen.choose(-5.0, 5.0)))
    samples(Gen.zip(vGen, Gen.choose(0L, 99L)), 25).foreach { case (v, seed) =>
      val dim = v.length
      val viaExpr = Seq(Tuple1(v.map(_.toFloat))).toDF("v")
        .select(GraftFunctions.rhp_signature($"v", 8, dim, seed, portable = true))
        .as[Long].head()
      val expected = (0 until 8).foldLeft(0L) { (sig, b) =>
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += v(i).toFloat.toDouble * PortableSigns.sign(b, i, seed); i += 1
        }
        if (dot >= 0.0) sig | (1L << b) else sig
      }
      assert(viaExpr == expected, s"v=$v seed=$seed")
    }
  }

  test("pigeonhole simhash blocking law: blocked ≡ all-pairs for random corpora") {
    import graft.operators.Dedup
    val wordGen = Gen.choose(1, 30).map(i => f"w$i%02d")
    val docGen = Gen.choose(5, 20).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    samples(Gen.listOfN(12, docGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      for (mh <- Seq(1, 4)) {
        val exact = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = mh, blockBits = 0)
          .as[(Long, Long, Long)].collect().toSet
        val blocked = Dedup.simhashPairsBlocked(docs, "doc_id", "text", maxHamming = mh)
          .as[(Long, Long, Long)].collect().toSet
        assert(blocked == exact, s"maxHamming=$mh texts=${texts.take(3)}…")
      }
    }
  }

  test("minhash permutations stay in [0, p) and are distinct families") {
    val hGen = Gen.choose(0L, (1L << 32) - 1)
    samples(hGen, 20).foreach { h =>
      val perms = (0 until 8).map(i =>
        Seq(Tuple1(h)).toDF("h").select(TextFunctions.minhashPerm($"h", i)).as[Long].head())
      assert(perms.forall(p => p >= 0 && p < TextFunctions.MinhashP))
      assert(perms.distinct.size == 8, s"h=$h perms=$perms")
    }
  }

  test("balancers and quantization are partition-invariant (pure functions of rows)") {
    import graft.operators.{Quantize, Sampling}
    val docs = (1L to 200L).map(i => (i, s"s${i % 7}")).toDF("doc_id", "source")
    def capIds(parts: Int) = Sampling.capPerGroup(
        docs.repartition(parts), "doc_id", "source", 5, seed = 3)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(capIds(1) == capIds(7) && capIds(7) == capIds(32))

    def rebIds(parts: Int) = Sampling.sqrtRebalance(
        docs.withColumn("source", concat(lit("g"), ($"doc_id" % 3).cast("string")))
          .repartition(parts), "doc_id", "source", seed = 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(rebIds(1) == rebIds(13))

    val vecs = samples(vecGen, 12).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    def codes(parts: Int) = Quantize.int8(vecs.repartition(parts), "vec_id", "embedding")
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(codes(1) == codes(9))
  }

  test("half-up int8 codes: |x - c·s/127| <= s/254 + eps for generated vectors") {
    import graft.operators.Quantize
    val vecs = samples(vecGen, 20).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val rows = Quantize.int8(vecs, "vec_id", "embedding")
      .join(vecs, "vec_id")
      .select($"embedding", $"scale", $"codes")
      .as[(Seq[Float], Double, Seq[Int])].collect()
    rows.foreach { case (x, s, c) =>
      if (s > 0) x.zip(c).foreach { case (xi, ci) =>
        val err = math.abs(xi.toDouble - ci * s / 127.0)
        assert(err <= s / 254.0 + 1e-12, s"err=$err s=$s xi=$xi ci=$ci")
      }
    }
  }

  test("Md5Hash128 slots bit-match the per-slot expression and the oracle substr spelling") {
    import graft.functions.TextFunctions.{hash128, hash32slot}
    val strs = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 10) :+ "x"
    strs.foreach { s =>
      val df = Seq(s).toDF("s")
      val arr = df.select(hash128($"s", 7)).as[Seq[Long]].head()
      (0 until 4).foreach { i =>
        val slot = df.select(hash32slot($"s", 7, i)).as[Long].head()
        val oracle = df.select(
          conv(substring(md5(concat($"s", lit("#7"))), 1 + 8 * i, 8), 16, 10)
            .cast("long")).as[Long].head()
        assert(arr(i) == slot && slot == oracle, s"slot $i of '$s'")
      }
    }
  }

  test("count-min law: estimates dominate exact counts; every grid row sums to N") {
    import graft.operators.Sketch
    val wordsGen = Gen.listOfN(60, Gen.oneOf("a", "b", "c", "dd", "ee", "f", "g"))
    samples(wordsGen, 4).foreach { ws =>
      val df = ws.toDF("w")
      val grid = Sketch.countMin(df, "w", depth = 4, width = 8)
      val rowSums = grid.groupBy($"d").agg(sum($"c")).as[(Int, Long)].collect()
      assert(rowSums.length == 4 && rowSums.forall(_._2 == ws.length.toLong))
      val exact = df.groupBy($"w").count()
      val est = Sketch.estimate(grid, exact, "w", 4, 8)
        .join(exact, Seq("w")).select($"w", $"cm_est", $"count")
        .as[(String, Long, Long)].collect()
      est.foreach { case (w, e, ex) => assert(e >= ex, s"$w: $e < $ex") }
    }
  }

  test("KMV law: below-k groups report exactly; estimates are positive") {
    import graft.operators.Sketch
    val keysGen = Gen.listOfN(30, Gen.choose(0, 11)).map(_.map(i => s"k$i"))
    samples(keysGen, 4).foreach { ks =>
      val df = ks.toDF("key").withColumn("g", lit("all"))
      val exact = ks.distinct.size.toLong
      // k larger than any possible cardinality -> exact path
      val below = Sketch.kmvDistinct(df, "key", "g", k = 64).as[(String, Long)].head()
      assert(below._2 == exact, s"below-k: ${below._2} != $exact")
      val est = Sketch.kmvDistinct(df, "key", "g", k = 4).as[(String, Long)].head()
      assert(est._2 > 0)
    }
  }

  test("binPercentiles picks the bin of the type-1 order statistic, any data") {
    import graft.operators.Histogram
    val valsGen = Gen.listOfN(25, Gen.choose(0.0, 100.0))
    samples(valsGen, 4).foreach { vs =>
      val df = vs.map(("g", _)).toDF("k", "v")
      Seq(250000, 500000, 900000).foreach { p =>
        val lo = Histogram.binPercentiles(df, "k", "v", 10.0, Seq(p))
          .select(col(s"p_$p")).as[Double].head()
        val sorted = vs.sorted
        val exact = sorted(((sorted.size.toLong * p + 999999L) / 1000000L).toInt - 1)
        assert(lo <= exact && exact < lo + 10.0, s"p=$p lo=$lo exact=$exact")
      }
    }
  }

  test("tvDrift is bounded in [0, 1e6] and symmetric under side swap") {
    import graft.operators.Histogram
    val rowsGen = Gen.listOfN(40, Gen.zip(Gen.choose(0.0, 30.0), Gen.oneOf(true, false)))
    samples(rowsGen, 4).foreach { rs =>
      val df = rs.map { case (v, p) => ("g", v, p) }.toDF("k", "v", "p")
      def tv(c: org.apache.spark.sql.Column) =
        Histogram.tvDrift(df, "k", "v", c, 5.0).select($"tvd_ppm").as[Long].collect()
      val ab = tv($"p"); val ba = tv(!$"p")
      assert(ab.forall(t => t >= 0 && t <= 1000000))
      assert(ab.toSeq == ba.toSeq, "TVD must be symmetric in the two sides")
    }
  }
}
