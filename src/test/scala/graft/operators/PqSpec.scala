package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings").cache()
  private val M = 8
  private val DIM = 64

  test("encode: codes are m ints in [0, nCodes); a centroid encodes to itself") {
    val cb = Pq.labelCodebook(emb, "label", "embedding", M, DIM)
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", M, DIM)
    val rows = codes.select($"codes").as[Seq[Int]].collect()
    assert(rows.nonEmpty && rows.forall(c => c.length == M && c.forall(x => x >= 0 && x < 10)))

    // a vector that IS label l's centroid must encode to (l, l, ..., l) —
    // centroids live in micro-unit space, so map back through /1e6 (the
    // float round-trip moves each component < 1 unit, far under the
    // centroid separation)
    val centVec = cb.orderBy($"s")
      .filter($"code" === 3).select($"centroid").as[Seq[Double]].collect()
      .flatten.map(c => (c / 1e6).toFloat).toSeq
    val one = Seq((999000L, centVec)).toDF("vec_id", "embedding")
    val c = Pq.encode(one, cb, "vec_id", "embedding", M, DIM)
      .select($"codes").as[Seq[Int]].head()
    assert(c == Seq.fill(M)(3))
  }

  test("ADC recall against exact kNN is usable at k=10") {
    val cb = Pq.labelCodebook(emb, "label", "embedding", M, DIM)
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", M, DIM)
    val queries = emb.filter($"vec_id" < 20)
    val adc = Pq.adcSearch(cb, codes, queries, k = 10, m = M, dim = DIM)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact nearest by L2 == nearest by cosine only for normalized vectors,
    // so compare against exact squared-L2 top-10 computed directly
    val exact = {
      val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val q = queries.select($"vec_id".as("qid"), $"embedding".cast("array<double>").as("qv"))
      q.crossJoin(e).filter($"qid" =!= $"vec_id")
        .withColumn("d2", aggregate(zip_with($"qv", $"v", (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, t) => acc + t))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"d2".asc, $"vec_id".asc)))
        .filter($"rk" <= 10)
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val recalls = exact.keys.toSeq.map(q => adc(q).intersect(exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    // 10 label centroids per subspace is deliberately coarse quantization
    // (measured ~0.19 here); random guessing on this corpus is ~0.02. The
    // production k-means codebook (more codes) is what buys recall — its
    // reconstruction-error win is asserted in the next test.
    assert(mean >= 0.1, s"mean recall@10 = $mean must clearly beat random (~0.02)")
  }

  test("trained k-means codebook beats the label codebook on reconstruction error") {
    def mse(cb: org.apache.spark.sql.DataFrame): Double = {
      val codes = Pq.encode(emb, cb, "vec_id", "embedding", M, DIM)
      // reconstruction error = sum over subspaces of d2(subvector, assigned
      // centroid), in the same micro-unit space the codebooks live in
      val sub = emb
        .select($"vec_id", transform($"embedding".cast("array<double>"),
          x => floor(x * 1000000.0).cast("double")).as("sv"))
        .select($"vec_id",
          posexplode(transform(sequence(lit(0), lit(M - 1)),
            s => slice($"sv", s * (DIM / M) + 1, lit(DIM / M))))
            .as(Seq("s", "sub")))
      sub.join(codes, "vec_id")
        .withColumn("code", element_at($"codes", $"s" + 1))
        .join(broadcast(cb), Seq("s", "code"))
        .withColumn("d2", aggregate(zip_with($"sub", $"centroid", (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, t) => acc + t))
        .agg(avg($"d2")).as[Double].head()
    }
    val label = mse(Pq.labelCodebook(emb, "label", "embedding", M, DIM))
    val trained = mse(Pq.trainCodebook(emb, "vec_id", "embedding", M, DIM, k = 16, seed = 7L))
    assert(trained < label,
      s"k-means codebook (16 codes, mse=$trained) must beat 10 label centroids (mse=$label)")
  }
}
