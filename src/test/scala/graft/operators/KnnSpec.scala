package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings").cache()

  test("exact kNN: nearest neighbor of a vector in a toy corpus") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(-1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Knn.exact(corpus, corpus.filter($"vec_id" === 0), k = 2)
      .orderBy($"rk").select($"neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("exact kNN matches a window-function reference implementation") {
    val q = emb.filter($"vec_id" < 5)
    val got = Knn.exact(emb, q, k = 10)
      .select($"query_id", $"rk", $"neighbor_id")
      .orderBy($"query_id", $"rk").collect().toSeq
    // reference: full cross join + global window (fine at test scale)
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.cosine_sim
    val a = q.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val b = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("nv"))
    val w = Window.partitionBy($"query_id").orderBy($"s".desc, $"neighbor_id".asc)
    val exp = a.join(b, $"query_id" =!= $"neighbor_id")
      .withColumn("s", cosine_sim($"qv", $"nv"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .select($"query_id", $"rk", $"neighbor_id")
      .orderBy($"query_id", $"rk").collect().toSeq
    assert(got == exp)
  }

  test("exactWithin restricts neighbors to the same group") {
    val out = Knn.exactWithin(emb, "label", k = 3)
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    out.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().foreach {
      case (q, n) => assert(labels(q) == labels(n), s"$q -> $n crossed labels")
    }
  }

  test("approxLsh achieves reasonable recall@10 vs exact") {
    val q = emb.filter($"vec_id" < 20)
    val exact = Knn.exact(emb, q, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Knn.approxLsh(emb, q, k = 10, dim = 64, nBits = 16, hammingRadius = 7)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("approxLsh prunes the candidate set (it is actually approximate)") {
    val q = emb.filter($"vec_id" < 20)
    val approx = Knn.approxLsh(emb, q, k = 500, dim = 64, nBits = 16, hammingRadius = 4)
    // with a tight radius, far fewer than |corpus| candidates survive per query
    val meanCand = approx.groupBy($"query_id").count()
      .agg(avg($"count")).as[Double].head()
    val n = emb.count().toDouble
    assert(meanCand < n * 0.8, s"avg candidates $meanCand vs corpus $n")
  }

  test("recallAtK: identical results score 1e6; disjoint 0; missing queries 0") {
    val gt = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 20L)) // q3 absent entirely
      .toDF("query_id", "neighbor_id")
    val r = Knn.recallAtK(gt, approx).orderBy($"query_id")
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 500000L), (2L, 1000000L), (3L, 0L)))
    val perfect = Knn.recallAtK(gt, gt).select($"recall_ppm").as[Long].collect()
    assert(perfect.forall(_ == 1000000L))
  }

  test("hardNegatives: top-k closest different-label rows, equals brute force") {
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val q = e.filter($"vec_id" < 5)
    val got = Knn.hardNegatives(e, q, k = 4).cache()
    // every result crosses labels
    val lbl = e.select($"vec_id", $"label")
    val crossed = got
      .join(lbl.select($"vec_id".as("query_id"), $"label".as("ql")), "query_id")
      .join(lbl.select($"vec_id".as("neighbor_id"), $"label".as("nl")), "neighbor_id")
    assert(crossed.filter($"ql" === $"nl").count() == 0)
    assert(got.groupBy($"query_id").count().select($"count").as[Long].collect().forall(_ == 4))
    // brute force cross-check on one query
    import graft.functions.GraftFunctions.cosine_sim
    val q0 = e.filter($"vec_id" === 0).select($"embedding".as("qv"), $"label".as("ql"))
    val brute = e.crossJoin(q0).filter($"label" =!= $"ql")
      .select($"vec_id", cosine_sim($"embedding", $"qv").as("s"))
      .orderBy($"s".desc, $"vec_id").limit(4)
      .select($"vec_id").as[Long].collect().toSeq
    val ours = got.filter($"query_id" === 0).orderBy($"rk")
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(ours == brute)
  }

  test("kCenterCoreset: running-min frame matches the naive per-round recompute") {
    import graft.functions.GraftFunctions.cosine_sim
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val k = 8
    val got = Knn.kCenterCoreset(e, "vec_id", "embedding", k = k)
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // reference: the pre-round-6 O(k²) form — round r evaluates
    // least(...) over ALL r−1 centers; picks AND rounded dists must be
    // identical (min of least-folded doubles == min over all distances)
    val base = e.select($"vec_id".cast("long").as("id"), $"embedding".as("v"))
    val first = base.orderBy($"id").limit(1).head()
    var ids = Vector(first.getLong(0))
    var vecs = Vector(first.getSeq[Float](1))
    var ref = Vector((1L, first.getLong(0), 0.0))
    for (step <- 2 to k) {
      val md = vecs
        .map(cv => lit(1.0) - cosine_sim($"v", array(cv.map(x => lit(x)): _*)))
        .reduce((a, b) => least(a, b))
      val next = base.filter(!$"id".isInCollection(ids))
        .select($"id", $"v", md.as("md"))
        .orderBy($"md".desc, $"id").limit(1).head()
      ids :+= next.getLong(0)
      vecs :+= next.getSeq[Float](1)
      ref :+= ((step.toLong, next.getLong(0),
        java.math.BigDecimal.valueOf(next.getDouble(2))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
    }
    assert(got === ref)
  }

  test("kCenterCoreset: k > n early-stops with the picks so far; empty input is empty") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .orderBy($"vec_id").limit(3)
    val got = Knn.kCenterCoreset(e, "vec_id", "embedding", k = 10)
    assert(got.count() === 3)
    assert(got.select($"vec_id").distinct().count() === 3)
    val empty = Knn.kCenterCoreset(e.filter(lit(false)), "vec_id", "embedding", k = 2)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("step", "vec_id", "dist"))
  }

  test("kCenterCoreset: greedy invariants and determinism") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val a = Knn.kCenterCoreset(e, "vec_id", "embedding", k = 6)
      .orderBy($"step").collect()
    val b = Knn.kCenterCoreset(e, "vec_id", "embedding", k = 6)
      .orderBy($"step").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val ids = a.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length === 6)
    // seed is the lowest id; coverage radius never grows (greedy invariant)
    assert(ids.head === e.agg(org.apache.spark.sql.functions.min($"vec_id"))
      .head().getLong(0))
    val dists = a.drop(1).map(_.getAs[Double]("dist"))
    dists.sliding(2).foreach {
      case Array(x, y) => assert(x >= y, s"radius grew: $x -> $y")
      case _ => ()
    }
  }
}
