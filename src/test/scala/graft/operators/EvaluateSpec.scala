package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class EvaluateSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Boolean, Long)]): (Long, Long, Long, Long, Long) =
    Evaluate.binaryAuc(rows.toDF("y", "sc"), col("y"), "sc")
      .as[(Long, Long, Long, Long, Long, Double)].head() match {
        case (np, nn, c, t, ppm, _) => (np, nn, c, t, ppm)
      }

  test("perfect separation -> AUC 1.0") {
    val r = auc(Seq((true, 10L), (true, 9L), (false, 1L), (false, 2L)))
    assert(r == ((2L, 2L, 4L, 0L, 1000000L)))
  }

  test("inverted separation -> AUC 0.0") {
    val r = auc(Seq((true, 1L), (false, 10L), (false, 9L)))
    assert(r == ((1L, 2L, 0L, 0L, 0L)))
  }

  test("all scores tied -> AUC 0.5") {
    val r = auc(Seq((true, 5L), (true, 5L), (false, 5L)))
    assert(r == ((2L, 1L, 0L, 2L, 500000L)))
  }

  test("mixed case matches hand count") {
    // pos scores {3, 1}, neg scores {2, 1}
    // pairs: (3,2)+ (3,1)+ (1,2)- (1,1)=  -> conc 2, tied 1 of 4
    // AUC = (2 + 0.5) / 4 = 0.625
    val r = auc(Seq((true, 3L), (true, 1L), (false, 2L), (false, 1L)))
    assert(r == ((2L, 2L, 2L, 1L, 625000L)))
  }
}
