package graft

/** The bench sweep's committed-mark machinery, factored out of
  * [[Bench]] so the trigger arithmetic is unit-testable with synthetic
  * records (round-11 verdict: the mark-ratchet fix must be spec-gated,
  * not just rewired).
  *
  * A "mark" is a query's committed clean wall time; the sweep
  * re-measures any query reading far above its mark even when its
  * segment's load calibration looked flat (a single long query can BE
  * its segment's load and hide from the calibration stamps). Marks are
  * min-merged across the last few COMMITTED records: load only ever
  * inflates a reading, so the minimum is the closest available estimate
  * of the true clean time, and a regression that lands in one committed
  * record cannot become its own alibi (the round-11 q255 ratchet).
  */
private[graft] object BenchMarks {

  /** Extract the per-query seconds map from one bench record. Records
    * for another scale factor parse to empty — an sf0.001 smoke record
    * would otherwise mark every sf0.1 reading hot. Regex-parsed on
    * purpose (no JSON lib in the unmanaged classpath); a malformed
    * record just contributes no marks. */
  def parse(txt: String, sfDir: String): Map[String, Double] =
    try {
      val qStart = txt.indexOf("\"queries\":{")
      if (qStart < 0 || !txt.contains(s""""sf":"$sfDir"""")) Map.empty
      else {
        val body = txt.substring(qStart + 11, txt.indexOf('}', qStart))
        "\"(q[0-9]+)\":([0-9.]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** Per-query MINIMUM across records. */
  def merge(records: Seq[Map[String, Double]]): Map[String, Double] =
    records.flatten.groupMapReduce(_._1)(_._2)(math.min)

  /** The mark-based retake trigger: a reading more than 2x its mark AND
    * above half a second absolute (sub-second queries are retaken by
    * the segment trigger when their window is hot; chasing 2x on a
    * 0.1 s reading would burn the retake cap on scheduler noise).
    * `results` carries full query names; marks are keyed short. */
  def suspects(results: Seq[(String, Double)],
      marks: Map[String, Double]): Seq[String] =
    results.collect {
      case (n, sec)
          if marks.get(n.takeWhile(_ != '_'))
            .exists(m => sec > 2.0 * m && sec > 0.5) => n
    }

  /** The raw texts of `bench_full.json` at the last `n` commits that
    * touched it, newest first — the committed history, never the
    * working tree (a same-checkout sweep overwrites the file before a
    * second sweep would read it). Falls back to the working-tree file
    * when git is unavailable (e.g. an exported tree), and to no marks
    * at all when neither exists — absent marks just disable the
    * mark-based retakes. */
  def committedRecords(n: Int): Seq[String] = {
    val viaGit: Seq[String] =
      try {
        import scala.sys.process._
        val devNull = ProcessLogger(_ => ())
        val shas = Process(Seq("git", "log", "-n", n.toString,
            "--format=%H", "--", "bench_full.json")).!!(devNull)
          .split("\\s+").toSeq.filter(_.nonEmpty)
        shas.flatMap { sha =>
          try Some(Process(Seq("git", "show", s"$sha:bench_full.json")).!!(devNull))
          catch { case _: Throwable => None }
        }
      } catch { case _: Throwable => Nil }
    if (viaGit.nonEmpty) viaGit
    else
      try Seq(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_full.json")), "UTF-8"))
      catch { case _: Throwable => Nil }
  }
}
