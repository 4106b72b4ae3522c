package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed-mark retake trigger, exercised with synthetic records
  * (round-11 verdict item: the mark-ratchet fix must be unit-tested,
  * not just rewired — a regression that grew across two committed
  * sweeps must still trigger). */
class BenchMarksSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private def record(sfDir: String, marks: (String, Double)*): String =
    s"""{"metric":"total","value":1,"queries":{${
      marks.map { case (q, s) => s""""$q":$s""" }.mkString(",")
    }},"sf":"$sfDir"}"""

  test("parse extracts per-query marks and guards on the scale factor") {
    val marks = BenchMarks.parse(record(sf, "q01" -> 0.31, "q255" -> 1.73), sf)
    assert(marks == Map("q01" -> 0.31, "q255" -> 1.73))
    // another sf's record contributes nothing — an sf0.001 smoke record
    // would mark every sf0.1 reading hot
    assert(BenchMarks.parse(
      record("/root/testdata/sf0.001", "q01" -> 0.02), sf).isEmpty)
    assert(BenchMarks.parse("not json at all", sf).isEmpty)
  }

  test("merge takes the per-query minimum across records") {
    val merged = BenchMarks.merge(Seq(
      Map("q255" -> 3.88, "q161" -> 8.81),
      Map("q255" -> 1.73, "q161" -> 11.2, "q74" -> 2.64)))
    assert(merged == Map("q255" -> 1.73, "q161" -> 8.81, "q74" -> 2.64))
  }

  test("suspects fire above 2x the mark AND above 0.5s absolute") {
    val marks = Map("q10" -> 1.0, "q11" -> 0.1, "q12" -> 1.0)
    val out = BenchMarks.suspects(Seq(
      "q10_a" -> 2.5,  // 2.5x mark, above absolute floor -> suspect
      "q11_b" -> 0.4,  // 4x mark but under 0.5s -> segment trigger's job
      "q12_c" -> 1.9,  // under 2x -> clean
      "q99_d" -> 50.0, // no mark -> no trigger
    ), marks)
    assert(out == Seq("q10_a"))
  }

  test("a regression that grew across two committed records still triggers") {
    // the round-11 q255 ratchet: clean 1.73 in the older record, the
    // regressed 3.45 committed once — latest-only marks would make a
    // 3.88 reading look fine (under 2x of 3.45); min-merged marks keep
    // the 1.73 and the 3.88 reading stays a suspect
    val marks = BenchMarks.merge(Seq(
      BenchMarks.parse(record(sf, "q255" -> 3.45), sf),
      BenchMarks.parse(record(sf, "q255" -> 1.73), sf)))
    assert(BenchMarks.suspects(Seq("q255_perplexity_buckets" -> 3.88), marks)
      == Seq("q255_perplexity_buckets"))
  }
}
