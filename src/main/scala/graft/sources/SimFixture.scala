package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The simulator snapshot fixture shared by the flagship pipeline queries
  * (q50/q55/q56) and their DuckDB oracles.
  *
  * The simulator is deterministic (closed-form signal, hash-seeded noise —
  * [[IoTSimulator.readings]]), so its snapshot table is a pure function of
  * the parameters below. Staging it to parquet and reading it back makes
  * the floats BIT-IDENTICAL for both consumers: the Spark queries read
  * this file, and the static oracle SQL reads the same file via
  * `read_parquet`, so every downstream comparison (z-scores vs thresholds,
  * cosine vs thresholds, rank ties) starts from the same bits. This is
  * what turns the three pipeline queries from rows-only checks into full
  * hash-gated oracles — the detection math itself (reference semantics
  * `pipeline/detect_anomalies_all.py:66-246`, `find_similar_states.py:
  * 86-315`) is recomputed independently by DuckDB.
  */
object SimFixture {

  /** FIXED absolute path — not `java.io.tmpdir` — because the static
    * oracle SQL in `SparkEntry.oracleSql` must name the same literal.
    * Bump the `_v1` suffix whenever the simulator or snapshotter
    * arithmetic changes, so a stale fixture from an older build can
    * never satisfy (or fail) the new oracle. */
  val Path = "/tmp/graft_sim_snapshots_v1"

  /** Glob the oracle SQL uses to read [[Path]]. */
  val OracleGlob = s"$Path/*.parquet"

  @volatile private var staged = false

  /** The q50/q55/q56 input: 360 ticks at 10 s, the 5-device default
    * fleet, a compressor failure injected on RTU-001 over ticks
    * [240, 300), 128-dim hash-projection embeddings. Staged at most
    * once per JVM (first caller pays the ~2 s stage; Bench's timed
    * re-runs and the sibling queries reuse the file), and a COMPLETE
    * fixture on disk (`_SUCCESS` present) is reused rather than
    * rewritten: the content is a pure function of this code version
    * (the `_v1` suffix — bump it on any generator change), and
    * skipping the rewrite means a second JVM can never yank the files
    * out from under a reader mid-scan. */
  def snapshots(s: SparkSession): DataFrame = {
    if (!staged) synchronized {
      if (!staged) {
        if (!new java.io.File(s"$Path/_SUCCESS").exists()) {
          val readings = IoTSimulator.readings(s, nTicks = 360,
            injections = IoTSimulator.compressorFailure("RTU-001", 240, 300))
          graft.operators.Snapshotter.snapshots(readings, dim = 128)
            .orderBy(col("device_id"), col("snapshot_time"))
            .coalesce(1)
            .write.mode("overwrite").parquet(Path)
        }
        staged = true
      }
    }
    s.read.parquet(Path)
  }
}
