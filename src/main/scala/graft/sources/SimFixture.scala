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

  /** Fixture parameters — part of the path fingerprint below. */
  private val NTicks = 360
  private val InjectDevice = "RTU-001"
  private val InjectFrom = 240L
  private val InjectUntil = 300L
  private val Dim = 128
  /** Manual belt on top of the automatic fingerprint, for changes the
    * bytecode digest cannot see (e.g. a constants table moved to a class
    * outside [[fingerprint]]'s closure). */
  private val GenVersion = 2

  /** Content fingerprint of the generator: md5 over the fixture
    * parameters, [[GenVersion]], and the BYTECODE of the three classes
    * whose arithmetic determines the staged bits (simulator, snapshotter,
    * hash featurizer). Any recompile that changes their code changes the
    * digest — so a stale fixture from an older build can never satisfy
    * (or fail) the new oracle, with no hand-bumped suffix to forget
    * (round-10 ADVICE: the `_v1` bump was a silent-staleness hazard).
    * Classpath resources can be missing in exotic deployments (shaded
    * jars); then the digest honestly degrades to params + GenVersion. */
  private lazy val fingerprint: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$NTicks|$InjectDevice|$InjectFrom|$InjectUntil|$Dim|$GenVersion"
      .getBytes("UTF-8"))
    Seq("graft/sources/IoTSimulator$.class",
        "graft/operators/Snapshotter$.class",
        "graft/functions/HashFeaturize$.class").foreach { res =>
      val in = getClass.getClassLoader.getResourceAsStream(res)
      if (in != null)
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
    }
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** FIXED absolute path — not `java.io.tmpdir` — because the static
    * oracle SQL in `SparkEntry.oracleSql` must name the same literal.
    * The suffix is the [[fingerprint]] of the generator code + params,
    * so the path changes automatically whenever the staged content
    * would. */
  lazy val Path = s"/tmp/graft_sim_snapshots_$fingerprint"

  /** Glob the oracle SQL uses to read [[Path]]. */
  lazy val OracleGlob = s"$Path/*.parquet"

  @volatile private var staged = false

  /** The q50/q55/q56 input: 360 ticks at 10 s, the 5-device default
    * fleet, a compressor failure injected on RTU-001 over ticks
    * [240, 300), 128-dim hash-projection embeddings. Staged at most
    * once per JVM (first caller pays the ~2 s stage; Bench's timed
    * re-runs and the sibling queries reuse the file), and a COMPLETE
    * fixture on disk (`_SUCCESS` present) is reused rather than
    * rewritten — the content is a pure function of the fingerprinted
    * code version, and skipping the rewrite means a reader can never
    * have the files yanked out from under a mid-flight scan.
    *
    * Concurrency: the stage writes to a process-private sibling dir and
    * RENAMES it into place (atomic on one filesystem), so two fresh
    * JVMs racing the `_SUCCESS` check can never interleave partial
    * writes at [[Path]] — the loser's rename fails against the winner's
    * complete directory and its staging dir is discarded. */
  def snapshots(s: SparkSession): DataFrame = {
    if (!staged) synchronized {
      if (!staged) {
        val dest = new java.io.File(Path)
        if (!new java.io.File(dest, "_SUCCESS").exists()) {
          gcStaleFixtures(dest.getParentFile)
          val tmp = new java.io.File(
            s"${Path}.stage-${java.util.UUID.randomUUID().toString.take(8)}")
          val readings = IoTSimulator.readings(s, nTicks = NTicks,
            injections = IoTSimulator.compressorFailure(
              InjectDevice, InjectFrom, InjectUntil))
          graft.operators.Snapshotter.snapshots(readings, dim = Dim)
            .orderBy(col("device_id"), col("snapshot_time"))
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp.getPath)
          if (!tmp.renameTo(dest)) {
            // lost the race: a complete fixture (same fingerprint ⇒ same
            // bits) appeared first — use it, drop ours. Our staging dir
            // is removed on EVERY failed-rename path (leaking it on the
            // error path would accumulate a fixture per failure).
            val winnerComplete = new java.io.File(dest, "_SUCCESS").exists()
            rm(tmp)
            if (!winnerComplete) sys.error(s"SimFixture: cannot stage $Path")
          }
        }
        staged = true
      }
    }
    // Refresh the fixture's age on EVERY read: the stale-fixture GC
    // below is age-gated, and without the touch a fixture staged >6h
    // ago by a still-running older-build JVM could be collected by a
    // newer build's first stage mid-scan (round-11 ADVICE — the age
    // gate alone only protects fixtures younger than the cutoff). An
    // actively-read fixture now never ages past the cutoff.
    new java.io.File(Path).setLastModified(System.currentTimeMillis())
    s.read.parquet(Path)
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  /** GC for superseded fixtures: every fingerprint change mints a new
    * `/tmp/graft_sim_snapshots_<fp>` and, without this, abandons the old
    * one (plus any crashed JVM's `.stage-*` leftovers) forever. Runs
    * once, only when THIS build is about to stage its own fixture.
    * Age-gated at 6 h, and [[snapshots]] touches its fixture's mtime on
    * every read — together: an ACTIVELY-READ fixture never ages past
    * the cutoff, so only genuinely abandoned dirs are collected. */
  private def gcStaleFixtures(tmpDir: java.io.File): Unit = try {
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    Option(tmpDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      val stale = f.getName.startsWith("graft_sim_snapshots_") &&
        !f.getPath.startsWith(Path) && f.lastModified < cutoff
      if (stale) rm(f)
    }
  } catch { case _: Throwable => () } // GC is best-effort, never fatal
}
