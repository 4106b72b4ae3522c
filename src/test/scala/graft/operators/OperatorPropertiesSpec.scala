package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based checks for the round-5 operator batch: equivalences and
  * invariants over seeded ScalaCheck generators (drawn explicitly — the
  * scalatestplus bridge isn't on the offline classpath).
  */
class OperatorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  // random docs over a tiny vocabulary → dense shingle collisions
  private val docGen: Gen[Seq[String]] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    Gen.choose(4, 14).flatMap(n => Gen.listOfN(n, word)).map(ws => Seq(ws.mkString(" ")))
  }
  private val corpusGen: Gen[Seq[(Long, String)]] =
    Gen.choose(5, 12).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (d, i) => (i.toLong, d.head) })

  test("property: containmentPairs ≡ brute force on random corpora and thresholds") {
    import graft.functions.TextFunctions.{shingles, tokens}
    val cases = samples(Gen.zip(corpusGen, Gen.oneOf((1, 2), (3, 4), (1, 1))), 6)
    cases.foreach { case (corpus, (tn, td)) =>
      val docs = corpus.toDF("doc_id", "text")
      val sets = docs.select($"doc_id", tokens($"text").as("tok"))
        .select($"doc_id", array_distinct(shingles($"tok", 3)).as("hs"))
        .filter(size($"hs") > 0)
      val brute = sets.as("a").join(sets.as("b"), $"a.doc_id" =!= $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          size($"a.hs").cast("long").as("na"),
          size(array_intersect($"a.hs", $"b.hs")).cast("long").as("ni"))
        .filter($"ni" * td >= $"na" * tn)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val fast = Dedup.containmentPairs(docs, "doc_id", "text", tn, td)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(fast == brute, s"tau=$tn/$td corpus=$corpus")
    }
  }

  test("property: quantileNormalize preserves group sizes, draws from the global multiset, keeps within-group order") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 30L))
    val dataGen = Gen.choose(6, 40).flatMap(n => Gen.listOfN(n, rowGen))
      .map(_.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) })
    samples(dataGen, 6).foreach { rows =>
      val df = rows.toDF("id", "grp", "v")
      val out = Normalize.quantileNormalize(df, "id", "grp", "v")
        .as[(Long, String, Long, Long)].collect()
      // sizes preserved per group
      assert(out.groupBy(_._2).view.mapValues(_.size).toMap ==
        rows.groupBy(_._2).view.mapValues(_.size).toMap)
      // every normalized value is an actual corpus value
      val pool = rows.map(_._3).toSet
      assert(out.forall(r => pool.contains(r._4)))
      // within a group, the map is monotone in (v, id) order
      out.groupBy(_._2).values.foreach { g =>
        val sorted = g.sortBy(r => (r._3, r._1))
        assert(sorted.sliding(2).forall {
          case Array(x, y) => x._4 <= y._4
          case _ => true
        }, s"monotone violated in $sorted")
      }
    }
  }

  test("property: hourlyAcf ≡ naive recomputation, |acf| ≤ 1") {
    val seriesGen = Gen.choose(5, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 500)))
    samples(seriesGen, 6).foreach { xs =>
      val events = xs.zipWithIndex.map { case (v, h) =>
        (7L, new java.sql.Timestamp(h * 3600000L), v / 100.0)
      }
      val out = Timeseries.hourlyAcf(events.toDF("user_id", "ts", "value"),
          "user_id", "ts", "value", maxLag = 2)
        .as[(Long, Int, Option[Double], Long)].collect()
        .map(r => r._2 -> r._3).toMap
      val cents = xs.map(_.toDouble) // value*100 = the int itself
      def naive(k: Int): Option[Double] = {
        val n = cents.length
        if (n <= k) return None
        val m = cents.sum / n
        val den = cents.map(x => (x - m) * (x - m)).sum
        if (den == 0) None
        else Some((0 until n - k).map(t => (cents(t) - m) * (cents(t + k) - m)).sum / den)
      }
      for (k <- 1 to 2) {
        (out(k), naive(k)) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-5, s"lag $k xs=$xs")
            assert(math.abs(a) <= 1.0 + 1e-6)
          case (a, b) => assert(a.isEmpty == b.isEmpty, s"lag $k xs=$xs")
        }
      }
    }
  }

  test("property: grid2d preserves total count; shares bounded by 1e6") {
    val ptGen = Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0L, 1500L))
    val dataGen = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, ptGen))
    samples(dataGen, 6).foreach { pts =>
      val out = Histogram.grid2d(pts.toDF("x", "y"), "x", 700L, 4, "y", 300L, 3)
        .as[(Long, Long, Long, Long)].collect()
      assert(out.map(_._3).sum == pts.size)
      assert(out.forall(r => r._4 >= 0 && r._4 <= 1000000L))
      assert(out.forall(r => r._1 <= 4 && r._2 <= 3))
      assert(out.map(_._4).sum <= 1000000L)
    }
  }

  test("property: spanCoverage ≡ brute-force interval union on random position sets") {
    val k = 3
    val posGen: Gen[Seq[Int]] = Gen.choose(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0, 30))).map(_.distinct.sorted)
    val caseGen: Gen[Seq[(Long, Seq[Int])]] = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, posGen))
      .map(_.zipWithIndex.map { case (ps, i) => (i.toLong, ps) })
    samples(caseGen, 8).foreach { docs =>
      val rows = docs.flatMap { case (id, ps) => ps.map(p => (id, p)) }
      val got = Dedup.spanCoverage(rows.toDF("doc_id", "pos"), k)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      docs.filter(_._2.nonEmpty).foreach { case (id, ps) =>
        // brute force: materialize the union of [p, p+k-1] token sets
        val covered = ps.flatMap(p => p until p + k).toSet
        val nSpans = covered.toSeq.sorted
          .foldLeft((0L, Int.MinValue)) { case ((n, prev), t) =>
            (if (t == prev + 1) n else n + 1, t)
          }._1
        assert(got(id) == ((nSpans, covered.size.toLong)),
          s"doc=$id positions=$ps got=${got(id)}")
      }
    }
  }
}
