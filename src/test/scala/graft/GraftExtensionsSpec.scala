package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-registered functions work in plain SQL") {
    // withExtensions only applies to a NEW session: retire any shared one
    // first (tests run sequentially; later suites getOrCreate a fresh one).
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |       l2_norm(array(3.0D, 4.0D)) AS n,
          |       hamming_dist(255L, 15L) AS h""".stripMargin).head()
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) === 5.0)
      assert(r.getInt(2) === 4)
      val r2 = spark.sql(
        """SELECT l2_norm(hash_featurize(map('a', 1.0D, 'b', 2.0D), 16)) AS n,
          |       rhp_signature(array(1.0D, -1.0D), 8, 2, 42L) AS sig""".stripMargin).head()
      assert(math.abs(r2.getDouble(0) - 1.0) < 1e-5)
      assert(r2.getLong(1) >= 0L && r2.getLong(1) < 256L)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
