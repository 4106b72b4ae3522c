package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Train/test decontamination at corpus scale.
  *
  * The exact form (q35) joins every training shingle hash against every
  * test shingle hash — correct, but the join shuffles the full training
  * shingle set even though almost none of it collides. [[viaBloom]] is the
  * 100 TB shape: build a Bloom filter over the (small) test-set shingle
  * hashes, broadcast it, and let every scan task discard clean shingles
  * locally; only the surviving sliver is exactly verified with the join.
  * Bloom filters have no false negatives, so the result is IDENTICAL to
  * the exact join — false positives are removed by the verify step
  * (asserted in DecontaminateSpec).
  *
  * LLM-pipeline extension; the blocking pattern mirrors the reference's
  * filter-before-search discipline (SURVEY §3.3).
  */
object Decontaminate {

  /** Distinct word-`n`-gram hashes per document. */
  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), n)).as("sh"))
      .select(col("doc_id"), hash32(col("sh"), 0).as("h"))
      .distinct()

  /** Training documents that share at least one word-`n`-gram with any test
    * document (the contaminated set), with the number of shared shingles.
    * Exact semantics, bloom-accelerated. */
  def contaminated(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 4,
      fpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    // three consumers (count, bloom build, exact-verify semi-join) — persist
    // so the test corpus is tokenized once, not three times
    val testH = shingleHashes(test, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainH = shingleHashes(train, idCol, textCol, n)

    // Bloom sketch of the test shingle universe, built distributed and
    // collected to the driver (bytes ~ 1.2·n·ln(1/fpp)/ln²2 — a 1M-shingle
    // test set at 1% fpp is ~1.2 MB, broadcastable at any train scale).
    val nTest = testH.count()
    if (nTest == 0) {
      // no test shingles -> nothing can be contaminated (and
      // stat.bloomFilter NPEs on an empty frame); empty frame keeps the
      // input's id type
      return trainH.select(col("doc_id")).limit(0).withColumn("n_shared", lit(0L))
    }
    val bf = testH.stat.bloomFilter("h", nTest, fpp)

    // the bloom probe keys ONLY on the (always-bigint) hash column, so doc
    // ids of any type (string, uuid, ...) pass through untouched.
    // Round 13 (§4): the probe is the codegen'd BloomFilterMightContain
    // expression over the serialized filter literal — the retired
    // Row-closure filter deserialized every train shingle row to an
    // external Row and broke whole-stage codegen across scan→filter→join.
    // Same filter bits, same probe math (mightContainLong), so the
    // candidate set — and after exact verify, the output — is identical.
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val candidates = trainH.filter(graft.internal.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        graft.internal.Bridge.expression(lit(bfBytes)),
        graft.internal.Bridge.expression(col("h")))))

    // exact verify: drop bloom false positives
    candidates
      .join(testH.select(col("h")).distinct(), Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** `train` minus the contaminated set. */
  def clean(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 4,
      fpp: Double = 0.01): DataFrame =
    train.join(
      contaminated(train, test, idCol, textCol, n, fpp)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** SPAN-level contamination: for every training doc, the maximal token
    * spans whose word-`n`-grams collide with the test/eval corpus — the
    * GPT-3/PaLM decontamination readout, where the unit excised is the
    * overlapping SPAN, not the whole document ([[contaminated]] gives the
    * doc-level verdict; this says how much of each doc, and in how many
    * pieces). Output: one row per training doc (zero rows included) with
    * `n_contam_spans`, `contam_tokens` (exact interval-union token mass,
    * via [[Dedup.spanCoverage]]) and integer-ppm `contam_ppm`.
    *
    * Scale shape: test grams are a distinct hash set (small — eval sets
    * are MBs at 100 TB train scale), so the position probe is an equi
    * semi-join of train posting positions against it; everything after
    * runs per-doc. One posexplode over train, one shuffle on the gram
    * hash, one on doc_id — no pair stage anywhere. */
  def spanContamination(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 2)
    val toks = train.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
    val lens = toks.select(col("doc_id"), size(col("tok")).cast("bigint").as("n_tokens"))
    val trainPos = toks
      .select(col("doc_id"), posexplode(shingles(col("tok"), n)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), hash32(col("s"), 0).as("h"))
    val testH = test
      .select(tokens(col(textCol)).as("tok"))
      .select(explode(shingles(col("tok"), n)).as("s"))
      .select(hash32(col("s"), 0).as("h")).distinct()
    val hitPos = trainPos.join(testH, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    lens.join(Dedup.spanCoverage(hitPos, n), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_contam_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("contam_tokens"))
      .withColumn("contam_ppm",
        when(col("n_tokens") > 0,
          expr("contam_tokens * 1000000 div n_tokens")).otherwise(lit(0L)))
  }

  /** Span-level decontamination EXCISION — the transform behind
    * [[spanContamination]]'s report: every maximal training span whose
    * word-`n`-grams collide with the test/eval corpus is removed and the
    * surviving tokens re-assembled (one row per training doc:
    * doc_id, n_tokens, n_kept, cleaned_text — untouched and
    * fully-excised docs included).
    *
    * Two policies, selected by `keepOne`:
    *
    *  - `keepOne = false` (default): ALL training occurrences of a
    *    colliding gram are excised — the strict GPT-3/PaLM posture,
    *    since ANY surviving copy still leaks the eval content into
    *    training. The excised mass reconciles row for row with
    *    [[spanContamination]].
    *  - `keepOne = true`: canonical-copy semantics at the gram grain
    *    (the [[Dedup.exciseRepeatedSpans]] `keepOne` policy, pointed at
    *    the eval collision set): each colliding gram is owned by the
    *    LOWEST-id training doc holding it and the owner's occurrences
    *    survive. This is NOT a decontamination relaxation to use on
    *    benchmark answers — it is for the boilerplate-collision case
    *    (licenses, famous quotes, legal headers that legitimately occur
    *    in both corpora), where stripping every copy would excise
    *    canonical public text from the corpus. Owner election is a min
    *    over the distinct (doc, gram) set — deterministic, no ties.
    *
    * Scale shape: identical to [[spanContamination]] (one posexplode,
    * one equi probe of train positions against the distinct — and
    * small — test gram set, everything after per-doc) plus
    * [[Dedup.exciseAtPositions]]'s bucketed anti-join; keepOne adds one
    * min aggregate keyed on the gram hash. In keepOne mode the posting
    * frame feeds two consumers, so it is persisted SCOPED to this call:
    * the hit positions materialize eagerly and the posting block is
    * freed before returning (the [[Dedup]] cache discipline). */
  def exciseContaminatedSpans(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      keepOne: Boolean = false): DataFrame = {
    require(n >= 2)
    val toks = train.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
    val trainPos0 = toks
      .select(col("doc_id"), posexplode(shingles(col("tok"), n)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), hash32(col("s"), 0).as("h"))
    val testH = test
      .select(tokens(col(textCol)).as("tok"))
      .select(explode(shingles(col("tok"), n)).as("s"))
      .select(hash32(col("s"), 0).as("h")).distinct()
    val hits =
      if (keepOne) {
        val trainPos = trainPos0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val owners = trainPos.select(col("doc_id"), col("h")).distinct()
          .join(testH, Seq("h"), "left_semi")
          .groupBy(col("h")).agg(min(col("doc_id")).as("_own"))
        val out = trainPos.join(owners, Seq("h"))
          .filter(col("doc_id") =!= col("_own"))
          .select(col("doc_id"), col("pos"))
          .localCheckpoint(eager = true)
        trainPos.unpersist(blocking = false)
        out
      } else
        trainPos0.join(testH, Seq("h"), "left_semi")
          .select(col("doc_id"), col("pos"))
    Dedup.exciseAtPositions(toks, hits, n)
  }
}
