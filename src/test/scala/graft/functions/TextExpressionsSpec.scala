package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-parity gate for the round-12 native text/vector expressions
  * against the RETIRED built-in compositions they replace (the DuckDB
  * oracles keep the retired spellings, so this equality is what keeps
  * the whole text family hash-checked). */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // the retired spellings, verbatim
  private def normTextOld(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")
  private def tokensOld(c: Column): Column = split(normTextOld(c), " ")
  private def shinglesOld(tok: Column, n: Int): Column =
    when(size(tok) >= n,
      transform(sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(tok, i + j)): _*)))
      .otherwise(array())
  private def microUnitsOld(vec: Column): Column =
    transform(vec.cast("array<double>"), x => floor(x * 1000000.0).cast("double"))

  private val adversarial: Seq[String] = Seq(
    "", " ", "  ", "\t", "\n", "\r\n", "",
    "a", "a b", "a  b", " a b ", "\ta b\n", "a\t\tb", "a\rb",
    "Hello WORLD", "ÄÖÜ Straße ẞ", "İstanbul ık", "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΎΣ",
    "ФЫВА олдж", "ＡＢＣ ｄｅｆ", "a b", "emoji 😀 test",
    "xy", "tab\tsep\tvals", "many   spaces   here ",
    "trailing tab\t", "\tleading tab", "midvtab", "a b c d e f g h",
    "ALL CAPS SENTENCE WITH WORDS", null)

  test("graft_tokens / graft_norm_text == retired regex spellings") {
    val df = adversarial.toDF("t")
      .select(col("t"),
        TextFunctions.normText(col("t")).as("nn"), normTextOld(col("t")).as("no"),
        TextFunctions.tokens(col("t")).as("tn"), tokensOld(col("t")).as("to"))
      .collect()
    df.foreach { r =>
      assert(r.get(1) == r.get(2), s"normText mismatch on ${r.get(0)}: '${r.get(1)}' vs '${r.get(2)}'")
      assert(r.get(3) == r.get(4), s"tokens mismatch on ${r.get(0)}: ${r.get(3)} vs ${r.get(4)}")
    }
  }

  test("graft_tokens / graft_norm_text parity on the sf0.001 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
        TextFunctions.normText(col("text")).as("nn"), normTextOld(col("text")).as("no"),
        TextFunctions.tokens(col("text")).as("tn"), tokensOld(col("text")).as("to"))
      .filter(not(col("nn") <=> col("no")) || not(col("tn") <=> col("to")))
    assert(bad.isEmpty, "corpus parity")
  }

  test("graft_shingles == retired transform spelling (n = 2, 3, 8; null and short inputs)") {
    val toks = Seq(
      Seq("a"), Seq("a", "b"), Seq("a", "b", "c"), Seq.empty[String],
      Seq("x", "y", "z", "w", "v", "u", "t", "s", "r"),
      Seq("dup", "dup", "dup"), Seq(""), Seq("", "", "")).map(Option(_)) :+
      Option.empty[Seq[String]]
    val df = toks.toDF("tok")
    Seq(2, 3, 8).foreach { n =>
      val out = df.select(
          TextFunctions.shingles(col("tok"), n).as("sn"),
          shinglesOld(col("tok"), n).as("so"))
        .collect()
      out.foreach(r => assert(r.get(0) == r.get(1), s"n=$n: ${r.get(0)} vs ${r.get(1)}"))
    }
    // corpus-level: the exact downstream shape (distinct hashed 3-shingles)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.tokens(col("text")).as("tok"))
    val bad = docs.select(
        TextFunctions.shingles(col("tok"), 3).as("sn"),
        shinglesOld(col("tok"), 3).as("so"))
      .filter(not(col("sn") <=> col("so")))
    assert(bad.isEmpty, "corpus shingle parity")
  }

  test("fused shingle-hash / minhash-min / stop-count / sum-lengths == retired spellings") {
    import graft.functions.TextFunctions.{hash32, minhashPerm}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tok"))
    // fused hashed shingles vs transform + per-element md5_hash32
    val hsBad = docs.select(
        array_distinct(TextFunctions.shingleHashes(col("tok"), 3, 0)).as("hn"),
        array_distinct(transform(shinglesOld(col("tok"), 3), s => hash32(s, 0))).as("ho"))
      .filter(not(col("hn") <=> col("ho")))
    assert(hsBad.isEmpty, "shingle-hash parity")
    // fused minhash min vs array_min(transform(...)) across all 8 perms
    val hs = docs.select(
      array_distinct(TextFunctions.shingleHashes(col("tok"), 3, 0)).as("hs"))
    val mhChecks = (0 until 8).flatMap(i => Seq(
      TextFunctions.minhashMin(col("hs"), i).as(s"n$i"),
      array_min(transform(col("hs"), h => minhashPerm(h, i))).as(s"o$i")))
    val mhBad = hs.select(mhChecks: _*)
      .filter((0 until 8).map(i => not(col(s"n$i") <=> col(s"o$i"))).reduce(_ || _))
    assert(mhBad.isEmpty, "minhash-min parity")
    // empty / null inputs
    val edge = Seq(Option(Seq.empty[Long]), None, Option(Seq(5L, 0L, 2147483646L)))
      .toDF("hs")
    val eo = edge.select(TextFunctions.minhashMin(col("hs"), 3).as("n"),
        array_min(transform(col("hs"), h => minhashPerm(h, 3))).as("o")).collect()
    eo.foreach(r => assert(r.get(0) == r.get(1), s"${r.get(0)} vs ${r.get(1)}"))
    // stop count + sum of token lengths vs the retired filter/aggregate
    val stopArr = array(graft.operators.TextAnalysis.stopwords.map(lit): _*)
    val qBad = docs.select(
        graft.internal.Bridge.column(StopCount(
          graft.internal.Bridge.expression(col("tok")), graft.operators.TextAnalysis.stopwords)).as("sn"),
        size(filter(col("tok"), w => array_contains(stopArr, w))).cast("bigint").as("so"),
        graft.internal.Bridge.column(SumTokenLengths(
          graft.internal.Bridge.expression(col("tok")))).as("ln"),
        aggregate(col("tok"), lit(0L), (acc, w) => acc + length(w)).as("lo"))
      .filter(not(col("sn") <=> col("so")) || not(col("ln") <=> col("lo")))
    assert(qBad.isEmpty, "quality-stat parity")
  }

  test("graft_micro_units == retired transform spelling on the embeddings") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = vecs.select(
        GraftFunctions.micro_units(col("embedding")).as("mn"),
        microUnitsOld(col("embedding")).as("mo"))
      .filter(not(col("mn") <=> col("mo")))
    assert(bad.isEmpty, "micro-unit parity")
    // edge values: negatives, exact integers, tiny magnitudes, null elems
    val edge = Seq(Option(Seq(Option(0.0), Option(-0.5), Option(1e-7), Option(-1e-7),
      Option(123.456789), Option(-123.456789), None, Option(1.0), Option(-1.0))))
      .toDF("v")
    val eo = edge.select(
        GraftFunctions.micro_units(col("v")).as("mn"),
        microUnitsOld(col("v")).as("mo")).collect()
    eo.foreach(r => assert(r.get(0) == r.get(1), s"${r.get(0)} vs ${r.get(1)}"))
  }
}
