package graft.core

import graft.SparkSpec
import graft.sources.IoTSimulator

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed pipeline: readings -> snapshots -> verdicts with case-class rows") {
    val r = TypedApi.readings(IoTSimulator.readings(spark, 50))
    val snaps = TypedApi.snapshots(r, dim = 16)
    val s0: Snapshot = snaps.head()
    assert(s0.metrics.nonEmpty && s0.embedding.length == 16)
    val verdicts = TypedApi.pipeline(spark, r, dim = 16,
      cfg = DetectionConfig.Standalone)
    val v: TypedApi.Verdict = verdicts.head()
    assert(v.similarity_to_profile >= -1.0 && v.similarity_to_profile <= 1.0)
    assert(verdicts.count() == 250)
    // clean run: nothing anomalous
    assert(verdicts.filter(_.is_anomalous).count() == 0)
  }
}
