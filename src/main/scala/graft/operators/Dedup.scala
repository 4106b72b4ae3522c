package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.GraftFunctions.hamming_dist

/** Document deduplication operators (LLM-data-pipeline extension).
  *
  * Four strategies with different cost/recall trade-offs, all shuffle-lean:
  *
  *  - [[exactGroups]]: hash-groupBy on canonical text — one shuffle on a
  *    16-byte key regardless of document size.
  *  - [[minhashSignatures]] + [[minhashCandidates]] + [[nearDupPairs]]:
  *    MinHash+LSH banding. Candidate generation is an equi-join on band
  *    keys (shuffle on small hashes, never a cross join), then candidates
  *    only are exactly re-scored with shingle Jaccard. This is the 100 TB
  *    near-dup path: cost ~ O(docs x shingles) + O(candidate pairs).
  *  - [[simhash64]] + [[simhashPairs]]: 64-bit simhash fingerprints;
  *    Hamming-close pairs. Fingerprints are 16 bytes/doc — the all-pairs
  *    stage must be blocked/banded at scale (see `blockBits` param).
  *  - embedding cosine near-dup lives in [[Knn]] / queries q24.
  *
  * All hashes are md5-portable (see [[graft.functions.TextFunctions]]), so
  * the DuckDB oracle reproduces signatures exactly.
  */
object Dedup {

  /** Persist a fan-out intermediate consumed by several plan branches.
    * Catalyst does not share non-exchange subtrees across branches, so a
    * multiply-consumed derived table would otherwise be recomputed once
    * per consumer. MEMORY_AND_DISK spills instead of OOMing; at cluster
    * scale the same role is played by a persisted bucketed table
    * ([[writeNearDupIndex]]). Bench/Verify drop leftover blocks between
    * queries. Compute-once-read-thrice beats recompute-per-consumer 5x
    * here (array columns read back through the boxed columnar path, but
    * the tokenize+shingle chain is far heavier still); measurements of a
    * query that persists MUST start from a clean cache state — running
    * against a STALE copy of the same plan re-caches through the slow
    * boxed read and costs 2.4x the clean pass (see Bench's per-run
    * cleanup). */
  private def shared(df: DataFrame): DataFrame =
    // Round 13: LAZY localCheckpoint instead of persist. Two measured
    // reasons (§2.2/§5): (a) the columnar InMemoryRelation stores/reads
    // array columns through the slow boxed path — the checkpoint keeps
    // raw UnsafeRows; (b) a cached plan pins the raw shuffle-partition
    // count on every re-read, where the checkpointed RDD inherits the
    // AQE-coalesced (byte-sized) partitioning, so downstream stages stop
    // paying 32 scheduling slots for MB-sized tables (the family ran
    // up to 2× faster on 8 cores than 32 before this). Lazy, not eager:
    // the first consuming job materializes it with its other stages
    // overlapped, where an eager checkpoint is one serial job per frame
    // (A/B: q31 0.95 vs 0.72 s, q161 ~9.1 vs ~8.0 s median). Same
    // MEMORY_AND_DISK storage, same clean-state measurement rules.
    df.localCheckpoint(eager = false)

  /** Exact duplicate groups by canonical text: (keep_id = min doc id,
    * n_copies). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(normText(col(textCol))).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Streaming exact dedup: emit only the FIRST arrival of each canonical
    * text, state bounded by the event-time watermark (duplicates later
    * than `watermarkDelay` behind the max seen event time may re-emit —
    * the standard replay-window trade for bounded state at 100 TB; pair
    * with a periodic batch [[exactGroups]] sweep for full-history
    * guarantees). Built on dropDuplicatesWithinWatermark — plain
    * dropDuplicates(key) would never evict state (eviction requires the
    * event-time column in the key); the WithinWatermark variant evicts
    * each fingerprint once the watermark passes it, which is exactly the
    * bounded-state contract above. */
  def streamingExactDedup(
      docs: DataFrame, tsCol: String, textCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("_fp", md5(normText(col(textCol))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Per-document minhash signature columns sig0..sig{n-1} over word
    * 3-shingles: one md5 base hash per shingle, then the universal-hash
    * permutation family ([[graft.functions.TextFunctions.minhashPerm]]). */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, numHashes: Int): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), 3)).as("sh"))
      .select(col("doc_id"), hash32(col("sh"), 0).as("h"))
    val aggs = (0 until numHashes).map(i => min(minhashPerm(col("h"), i)).as(s"sig$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, bk): one row per LSH band, bk = "bandIndex:md5(band
    * signature components)" — the single-column band key banding joins
    * (and the persisted index) key on. */
  private def bandKeyRows(sigs: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val bands = array((0 until nBands).map { b =>
      val key = md5(concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}").cast("string")): _*))
      concat(lit(s"$b:"), key)
    }: _*)
    sigs.select(col("doc_id"), explode(bands).as("bk"))
  }

  /** LSH banding: docs sharing any band of `rowsPerBand` consecutive
    * signature components become candidate pairs (id_a < id_b, distinct).
    * Equi-join on the band key — no cross join anywhere. */
  def minhashCandidates(sigs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val e = bandKeyRows(sigs, numHashes, rowsPerBand)
    e.as("x").join(e.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact word-3-shingle Jaccard for given (id_a, id_b) pairs. Shingles
    * are compared by 32-bit hash (collisions negligible; shuffles carry
    * 8-byte keys instead of strings). */
  def shingleJaccard(
      docs: DataFrame, pairs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ds = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"), explode(shingles(col("tok"), 3)).as("sh0"))
      .select(col("doc_id"), hash32(col("sh0"), 0).as("sh"))
      .distinct()
    val cachedDs = shared(ds)
    val counts = cachedDs.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val inter = pairs
      .join(ds.select(col("doc_id").as("id_a"), col("sh").as("sha")).hint("shuffle_hash"), Seq("id_a"))
      .join(ds.select(col("doc_id").as("id_b"), col("sh").as("shb")).hint("shuffle_hash"), Seq("id_b"))
      .filter(col("sha") === col("shb"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ni"))
    inter
      .join(counts.select(col("doc_id").as("id_a"), col("ns").as("na")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("ns").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
  }

  /** (doc_id, hs, ns, sig0..sig{n-1}): per-doc distinct shingle-hash set,
    * its size, and the minhash signature derived from it. Fully NARROW —
    * the set, its size and every signature component are higher-order
    * array expressions over the row's own text (shingle → hash →
    * array_distinct → per-permutation array_min; min ignores duplicates,
    * so minhash over the set == over the multiset), so building
    * signatures costs ZERO shuffles at any corpus size (the old
    * explode + collect_set form paid a corpus-sized exchange here).
    * Per-doc set size is bounded by document length. Also the form that
    * makes the same signatures computable on a STREAM (narrow maps are
    * streaming-legal with no state) — see [[streamingNearDupPairs]]. */
  private[graft] def shingleSetSigs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int): DataFrame = {
    val sigCols = Seq(col("doc_id"), col("hs"),
      size(col("hs")).cast("bigint").as("ns")) ++
      (0 until numHashes).map(i =>
        minhashMin(col("hs"), i).as(s"sig$i"))
    // NB: `shingles(tokens(...))` inline is fine HERE — the whole chain
    // sits inside one projection where whole-stage codegen's subexpression
    // elimination evaluates the token split once (measured: inline 0.7s vs
    // 1.1s with a materializing projection barrier on q31/sf0.1). The
    // shingles() scaladoc warning applies when the token array crosses
    // OPERATOR boundaries (explode/groupBy), not within a single project.
    docs
      // docs shorter than the shingle width have no signature (the old
      // explode form dropped them implicitly; without this they'd all
      // share null sigs, band together, and 0/0 the Jaccard). hs is empty
      // iff the text has < 3 whitespace-separated chunks — tested with an
      // early-exit regex FIND, not a filter on size(hs): that variant
      // gets the whole shingle+hash+distinct chain substituted into the
      // pushed-down predicate and tokenizes every document twice
      // (measured 2x on the q38/q74/q79/q125 family).
      .filter(col(textCol).rlike("\\S\\s+\\S+\\s+\\S"))
      .select(col(idCol).as("doc_id"),
        array_distinct(shingleHashes(tokens(col(textCol)), 3, 0)).as("hs"))
      .select(sigCols: _*)
  }

  /** Exact Jaccard rescore of candidate (id_a, id_b) pairs against the
    * per-doc shingle sets: the two set arrays ride the join (candidate
    * volume is banding-bounded), the intersection is narrow. */
  private def jaccardOnCandidates(cand: DataFrame, sets: DataFrame,
      minJaccard: Double): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("hs").as("ha"),
        col("ns").as("na")).hint("shuffle_hash"), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("hs").as("hb"),
        col("ns").as("nb")).hint("shuffle_hash"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("na"), col("nb"),
        size(array_intersect(col("ha"), col("hb"))).cast("bigint").as("ni"))
      .select(col("id_a"), col("id_b"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** Full MinHash-LSH near-dup pipeline: candidates by banding, then exact
    * Jaccard >= `minJaccard` on candidates only. */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val sigs = shared(shingleSetSigs(docs, idCol, textCol, numHashes))
    val cand = minhashCandidates(sigs.drop("hs"), numHashes, rowsPerBand)
    jaccardOnCandidates(cand, sigs, minJaccard)
  }

  /** Bare per-doc shingle-set table (doc_id, hs, ns) — the one
    * corpus-tokenizing pass a multi-stage curation pipeline ([[Corpus]])
    * computes ONCE, persists, and fans out to every dedup stage via the
    * `FromSets` variants below (standalone operators each pay their own
    * pass; composed they must not pay it four times). */
  private[graft] def shingleSets(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        array_distinct(shingleHashes(tokens(col(textCol)), 3, 0)).as("hs"))
      .select(col("doc_id"), col("hs"),
        size(col("hs")).cast("bigint").as("ns"))

  /** The minhash signature projection over a materialized `hs` column —
    * shared by every variant that derives sig0..sig{n-1} from a shingle
    * set. */
  private def minhashSigCols(numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      minhashMin(col("hs"), i).as(s"sig$i"))

  /** [[nearDupPairs]] over a PRE-BUILT (ideally persisted) shingle-set
    * table. `ns > 0` replaces the public path's rlike pre-filter — safe
    * here because the caller materialized `hs`, so the predicate cannot
    * be substituted into a second tokenize of the corpus. */
  private[graft] def nearDupPairsFromSets(sets: DataFrame,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): DataFrame = {
    val sigCols = Seq(col("doc_id"), col("hs"), col("ns")) ++
      minhashSigCols(numHashes)
    // NOT re-persisted: the caller's cached set table already holds the
    // arrays, and re-deriving the signature projection from memory is
    // cheaper than caching `hs` a second time (array columns re-cache
    // through the slow boxed columnar path — see [[shared]]'s scaladoc).
    val sigs = sets.filter(col("ns") > 0).select(sigCols: _*)
    val cand = minhashCandidates(sigs.drop("hs"), numHashes, rowsPerBand)
    jaccardOnCandidates(cand, sigs, minJaccard)
  }

  /** Fuzzy record linkage: same-block pairs within `maxEdit` Levenshtein
    * distance — the entity-resolution / catalog-cleaning staple. EXACT
    * recall without a per-block cross join: edit distance ≥ length
    * difference, so with length bands of width `maxEdit + 1` a
    * qualifying pair sits in the same or an adjacent band — one side
    * explodes to its ≤3 candidate bands and the join is equi on
    * (block, band) with the distance check as a residual. Cost is
    * per-(block, band) occupancy², never block². */
  def editDistancePairs(
      df: DataFrame, idCol: String, nameCol: String, blockCol: String,
      maxEdit: Int): DataFrame = {
    require(maxEdit >= 0, "maxEdit must be non-negative")
    val w = maxEdit + 1
    // 64-bit character-set mask, once per ROW (never per pair): an edit
    // op flips at most 2 presence bits (substitution worst case), so a
    // true pair has bit_count(mask_a ^ mask_b) <= 2·maxEdit — and the
    // mod-64 bucketing can only merge bits, never split them, so the
    // filter stays EXACT while each pair test is one xor+popcount
    // instead of a Levenshtein DP (6.9M -> 1.1M DP calls, 16%, on the
    // q105 part-name corpus).
    val msk = expr(s"aggregate(transform(sequence(1, length(`$nameCol`)), " +
      s"i -> shiftleft(CAST(1 AS BIGINT), ascii(substring(`$nameCol`, i, 1)) % 64)), " +
      "CAST(0 AS BIGINT), (a, x) -> a | x)")
    val dm = df.withColumn("_msk", msk)
    val a = dm.select(col(blockCol).as("blk"), col(idCol).as("id_a"),
      col(nameCol).as("name_a"), col("_msk").as("_ma"),
      (length(col(nameCol)).cast("int") / w).cast("int").as("band"))
    val b = dm.select(col(blockCol).as("blk"), col(idCol).as("id_b"),
        col(nameCol).as("name_b"), col("_msk").as("_mb"),
        (length(col(nameCol)).cast("int") / w).cast("int").as("b0"))
      .select(col("blk"), col("id_b"), col("name_b"), col("_mb"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("band"))
    // The pair expansion happens INSIDE the join task, so the join's
    // input partitioning caps its parallelism: a single-split scan (or an
    // AQE-coalesced tiny exchange) would run the whole occupancy² × DP
    // work serially. Round-robin the probe side across the full session
    // width — the explicit count pins the exchange against size-based
    // coalescing (input bytes are tiny; the EXPANSION is the cost AQE
    // can't see). The banded side stays planner-chosen: broadcast while
    // it fits (catalog-sized blocks), shuffle join beyond.
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    a.repartition(nPart).join(b, Seq("blk", "band"))
      .filter(col("id_a") < col("id_b") &&
        // exact cheap pre-filters: edit distance >= length difference,
        // and the character-set bound above
        abs(length(col("name_a")) - length(col("name_b"))) <= maxEdit &&
        expr(s"bit_count(_ma ^ _mb) <= ${2 * maxEdit}"))
      // thresholded levenshtein: the banded-DP early-exit computes only
      // the 2·maxEdit+1 diagonal stripe and bails at -1 past the budget —
      // O(t·len) per candidate instead of O(len²)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxEdit))
      .filter(col("dist") >= 0 && col("dist") <= maxEdit)
      .select(col("blk").as(blockCol), col("id_a"), col("id_b"), col("dist"))
  }

  /** Cross-corpus near-dup pairs (left × right, e.g. eval-benchmark ×
    * training dump): band signatures for BOTH sides meet in an equi-join
    * on the band key — never left × right — and only collided candidates
    * are exactly Jaccard-rescored against their shingle sets. This is
    * FUZZY decontamination: [[Decontaminate.contaminated]] finds any
    * shared n-gram (exact overlap); this finds near-duplicate documents
    * across the boundary even when no single band of text is shared
    * verbatim with the probe set. Output (id_a from left, id_b from
    * right, jaccard) — ids may overlap between sides; no ordering
    * constraint is applied. */
  def crossNearDupPairs(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): DataFrame = {
    val sa = shared(shingleSetSigs(left, idCol, textCol, numHashes))
    val sb = shared(shingleSetSigs(right, idCol, textCol, numHashes))
    val cand = bandKeyRows(sa.drop("hs"), numHashes, rowsPerBand).as("x")
      .join(bandKeyRows(sb.drop("hs"), numHashes, rowsPerBand).as("y"),
        col("x.bk") === col("y.bk"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sa.select(col("doc_id").as("id_a"), col("hs").as("ha"),
        col("ns").as("na")).hint("shuffle_hash"), Seq("id_a"))
      .join(sb.select(col("doc_id").as("id_b"), col("hs").as("hb"),
        col("ns").as("nb")).hint("shuffle_hash"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("bigint").as("ni"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Persist the near-dup index for [[incrementalNearDupPairs]]: the
    * band table (doc_id, bk) bucketed+sorted by band key and the set
    * table (doc_id, hs, ns) bucketed by doc_id, both in the session
    * catalog. Pay the corpus shuffle ONCE here; every later increment
    * joins against these tables with zero stored-side exchange (the
    * bucketed-join discipline of `Maintenance.writeBucketed`). */
  def writeNearDupIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, numHashes: Int = 8, rowsPerBand: Int = 2,
      nBuckets: Int = 16): Unit = {
    val sigs = shared(shingleSetSigs(docs, idCol, textCol, numHashes))
    Maintenance.writeBucketed(
      bandKeyRows(sigs, numHashes, rowsPerBand), s"${table}_bands", "bk", nBuckets)
    Maintenance.writeBucketed(
      sigs.select(col("doc_id"), col("hs"), col("ns")), s"${table}_sets", "doc_id", nBuckets)
  }

  /** Append a processed delta to the index so the next increment sees it. */
  def appendToNearDupIndex(newDocs: DataFrame, idCol: String, textCol: String,
      table: String, numHashes: Int = 8, rowsPerBand: Int = 2): Unit = {
    val sigs = shared(shingleSetSigs(newDocs, idCol, textCol, numHashes))
    bandKeyRows(sigs, numHashes, rowsPerBand)
      .write.mode("append").insertInto(s"${table}_bands")
    sigs.select(col("doc_id"), col("hs"), col("ns"))
      .write.mode("append").insertInto(s"${table}_sets")
  }

  /** Incremental near-dup: all pairs (id_a < id_b, exact Jaccard >=
    * `minJaccard`) that involve at least one NEW document — new×indexed
    * via a band-key join against the stored band table, new×new via
    * ordinary banding — WITHOUT recomputing anything over the indexed
    * corpus. This is the daily-increment shape at 100 TB: per-run cost is
    * O(delta) + the banding-bounded candidate joins, while the indexed
    * corpus is only ever read through its bucketed band/set tables.
    * Equivalence to the full recompute restricted to new-touching pairs
    * is proven in IncrementalDedupSpec. */
  def incrementalNearDupPairs(newDocs: DataFrame, idCol: String, textCol: String,
      table: String, numHashes: Int = 8, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val sigs = shared(shingleSetSigs(newDocs, idCol, textCol, numHashes))
    val newBands = bandKeyRows(sigs, numHashes, rowsPerBand)
    val oldBands = spark.table(s"${table}_bands")
    val oldSets = spark.table(s"${table}_sets")
    // new × indexed candidates: band-key equi-join, normalized id_a < id_b.
    // Docs present in BOTH the index and the delta pair with themselves on
    // every band — the < filter drops those self-pairs.
    val crossCand = newBands.select(col("doc_id").as("_nid"), col("bk"))
      .join(oldBands.select(col("doc_id").as("_oid"), col("bk")), Seq("bk"))
      .select(
        when(col("_oid") < col("_nid"), col("_oid")).otherwise(col("_nid")).as("id_a"),
        when(col("_oid") < col("_nid"), col("_nid")).otherwise(col("_oid")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    val newCand = minhashCandidates(sigs.drop("hs"), numHashes, rowsPerBand)
    val cand = crossCand.unionByName(newCand).distinct()
    val sets = oldSets.unionByName(sigs.select(col("doc_id"), col("hs"), col("ns")))
      // a doc in both index and delta has identical rows in both (the
      // pipeline is deterministic) — keep one
      .dropDuplicates("doc_id")
    jaccardOnCandidates(cand, sets, minJaccard)
  }

  /** Exact shingle-Jaccard for *all* pairs within a blocking key (e.g.
    * same source/language). Unlike [[shingleJaccard]] (which fans each
    * candidate pair out to its shingles), this joins the exploded shingle
    * sets directly — cost is O(Σ_shingle multiplicity²) within blocks, not
    * O(pairs × shingles) — and only then attaches per-doc counts. The right
    * shape when blocks are large but shingle overlap is sparse. */
  def jaccardWithin(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      minJaccard: Double): DataFrame = {
    val ds = docs
      .select(col(blockCol).as("blk"), col(idCol).as("doc_id"),
        tokens(col(textCol)).as("tok"))
      .select(col("blk"), col("doc_id"), explode(shingles(col("tok"), 3)).as("sh0"))
      .select(col("blk"), col("doc_id"), hash32(col("sh0"), 0).as("sh"))
      .distinct()
    val cachedDs = shared(ds)
    val counts = cachedDs.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val inter = cachedDs.select(col("blk"), col("doc_id").as("id_a"), col("sh"))
      .join(cachedDs.select(col("blk"), col("doc_id").as("id_b"), col("sh")).hint("shuffle_hash"),
        Seq("blk", "sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ni"))
    inter
      .join(counts.select(col("doc_id").as("id_a"), col("ns").as("na")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("ns").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 64-bit simhash as two 32-bit halves (lo, hi) — term-frequency-weighted
    * bit-majority over token hashes. Two halves sidestep int64 sign issues
    * and keep the oracle SQL portable. */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .withColumn("h0", hash32(col("w"), 0))
      .withColumn("h1", hash32(col("w"), 1))
    val votes = tf
      .select(col("doc_id"), col("c"), col("h0"), col("h1"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(
        sum(when(expr("(h0 >> b) & 1") === 1, col("c")).otherwise(-col("c"))).as("v0"),
        sum(when(expr("(h1 >> b) & 1") === 1, col("c")).otherwise(-col("c"))).as("v1"))
    votes.groupBy(col("doc_id")).agg(
      sum(when(col("v0") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("sim_lo"),
      sum(when(col("v1") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("sim_hi"))
  }

  /** Transitive closure of near-dup pairs: connected components over the
    * similarity graph, so chains (A≈B, B≈C, A̸≈C) still collapse to one
    * survivor. Returns (doc_id, keep_id) for every doc in some component;
    * keep_id is the component's lowest doc id (keep-first policy). Uses
    * DataFrame min-label propagation — O(diameter) rounds, and near-dup
    * graphs have tiny diameters. */
  def nearDupGroups(pairs: DataFrame): DataFrame =
    nearDupGroupsCounted(pairs)._1

  /** [[nearDupGroups]] plus its propagation round count — the
    * cluster-portable cost number (each round is one Spark job; per-job
    * latency is what a busy cluster multiplies). Published per scale
    * tier in SCALE.md via [[graft.ScaleProbe]]. */
  private[graft] def nearDupGroupsCounted(pairs: DataFrame,
      driverMaxEdges: Int = 1 << 16): (DataFrame, Int) = {
    // STAR CONTRACTION, then min-label propagation on the contracted
    // graph, both on DataFrames.
    //
    // Round latency, not data volume, is what made this operator the
    // engine's one scale-killer: each propagation round is a full Spark
    // job + a convergence probe, and under cluster-level per-job overhead
    // (or a loaded box) the ROUND COUNT is the cost — round-6 bench data
    // showed this query family inflating 9-12× under load while the
    // median query inflated 1.46×. Near-dup graphs are near-cliques, so
    // almost all of their structure collapses in ONE aggregation:
    //
    //  1. Star contraction (1 shuffle): every vertex v takes
    //     l0(v) = min(v ∪ N(v)). Each clique collapses to its minimum
    //     outright; chains shrink only by a constant in the worst case
    //     (a monotone-id path has l0(v) = v-1, removing one vertex) —
    //     the O(log d) round bound on residual structure comes from the
    //     pointer doubling below, not from contraction. The component's
    //     global minimum m always has l0(m) = m, so the true label
    //     survives contraction.
    //  2. Contracted edges (1 join pass): original edges map through l0;
    //     self-loops drop, duplicates collapse. Connectivity between
    //     l0-representatives is preserved (any original path maps to a
    //     contracted walk), so components of the contracted graph =
    //     components of the original, under l0.
    //  3. For the typical dup graph the contracted edge set is EMPTY —
    //     zero propagation rounds, the whole labeling was 3 jobs flat.
    //     Residual structure (long chains) runs the loop below on the
    //     contracted graph with far fewer vertices.
    //
    // The propagation loop on the residual is POINTER-DOUBLING min-label:
    // each round propagates labels one edge hop AND shortcuts through the
    // label table (lbl := lbl(lbl)), so the distance a component-minimum
    // has covered roughly doubles per round — O(log diameter) rounds,
    // not O(diameter) (a 24-vertex path converges in 5 rounds where
    // one-hop propagation took 23). The old label rides the aggregation
    // as a marker column, so the convergence check stays a narrow filter
    // over just-checkpointed partitions, and eager localCheckpoint
    // truncates lineage each round.
    val sc = pairs.sparkSession.sparkContext
    // eager = one Spark job NOW; lazy = materialize-and-pin on first use
    // inside whichever job reads it first (registration still happens at
    // call time, so the id diff below stays attributable per frame)
    def checkpointed(df: DataFrame, eager: Boolean = true): (DataFrame, Set[Int]) = {
      val pre = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(eager = eager)
      (out, sc.getPersistentRDDs.keySet.toSet.diff(pre.toSet))
    }
    def free(ids: Set[Int]): Unit = {
      val live = sc.getPersistentRDDs
      ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    }
    val edges = pairs.select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
    // sym and l0 are LAZY checkpoints: the single eager job below (cSym)
    // computes each exactly once and pins it — where an eager checkpoint
    // per frame was a sequential Spark job per frame, and the job COUNT
    // is what a loaded box / busy cluster multiplies (the round-7
    // lesson). Labeling now costs 1 eager job, down from 3.
    val (sym, symIds) = checkpointed(
      edges.union(edges.select(col("b").as("a"), col("a").as("b"))),
      eager = false)
    // star contraction: l0 = min over self and neighbors (sym is
    // symmetric, so grouping on `a` sees every vertex with all its
    // neighbors as `b`)
    val (l0, _) = checkpointed(
      sym.groupBy(col("a")).agg(min(col("b")).as("_mb"))
        .select(col("a").as("id"), least(col("a"), col("_mb")).as("l0")),
      eager = false)
    val (cSym, cSymIds) = checkpointed(
      sym.join(l0.select(col("id"), col("l0").as("la")), sym("a") === col("id")).drop("id")
        .join(l0.select(col("id"), col("l0").as("lb")), col("b") === col("id")).drop("id")
        .filter(col("la") =!= col("lb"))
        .select(col("la").as("a"), col("lb").as("b"))
        .distinct())
    // l0 stays pinned (materialized by the cSym job; vertex-sized — the
    // final mapping join reads it lazily); sym's edge-sized blocks free now
    free(symIds)
    var rounds = 0
    // Three regimes on the contracted residual:
    //  - 0 contracted edges (the common near-clique dup graph):
    //    contraction already labeled everything, no loop — probed by the
    //    same narrow limit(1) job as before round 12 (a count here would
    //    scan every cached partition; the probe is one task);
    //  - <= driverMaxEdges (round-12): the residual is DRIVER-SIZED —
    //    collect it and run union-find locally, exactly the bounded-
    //    collect discipline of the IVF centroids / BPE rules / PCA
    //    moments. The distributed loop's per-round cost is ~6 Spark
    //    jobs (hop broadcast, shortcut broadcast, checkpoint,
    //    convergence probe), and a chainy residual runs 4+ rounds —
    //    measured ~25 jobs / >1 s of pure job latency on q246 for a
    //    graph of a few thousand edges. Labels are identical by
    //    construction (min member id per connected component);
    //    DedupSpec pins loop ≡ union-find on the
    //    adversarial chain geometry;
    //  - larger residuals keep the pointer-doubling loop unchanged
    //    (the 100 TB path — nothing about it is local-mode-tuned).
    // cSym holds BOTH directions of each contracted edge, so divide by 2:
    // the threshold is in UNDIRECTED edges, consistent with kCoreCounted
    // (round-12 ADVICE item). rounds stays 0 on the driver-local path —
    // published round counts read 0 for "no distributed propagation ran",
    // whether the residual was empty or driver-absorbed.
    val cLabels: Option[DataFrame] = if (cSym.limit(1).isEmpty) None
    else if (cSym.count() / 2 <= driverMaxEdges) {
      val rows = cSym.select(col("a"), col("b")).collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
        }
        r
      }
      rows.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      // representative = MIN member id per component: roots are unioned
      // min-ward above, so find() already lands on the component minimum
      val verts = new java.util.HashSet[Long]()
      rows.foreach { r => verts.add(r.getLong(0)); verts.add(r.getLong(1)) }
      val labels = new scala.collection.mutable.ArrayBuffer[(Long, Long)](verts.size)
      verts.forEach(v => labels += ((v, find(v))))
      free(cSymIds)
      Some(pairs.sparkSession.createDataFrame(labels.toSeq).toDF("id", "lbl"))
    } else {
      var (labels, labelIds) = checkpointed(
        cSym.select(col("a").as("id")).distinct().select(col("id"), col("id").as("lbl")))
      var converged = false
      val maxRounds = 50 // pointer-doubling covers ~2^rounds hops — 50 is
                         // an astronomically loose guard, kept so a logic
                         // bug fails loudly instead of looping forever
      while (!converged && rounds < maxRounds) {
        // hop: min label over self and neighbors; the old label rides as
        // a marker column (exactly one `own` row per id) so the change
        // flag comes out of the same aggregation
        val prop = cSym.join(labels.select(col("id"), col("lbl")), cSym("a") === col("id"))
          .select(col("b").as("id"), col("lbl"), lit(false).as("own"))
        // persisted (NOT an extra checkpoint job) because the shortcut
        // below self-joins it: the round's single checkpoint job computes
        // each hop partition once and the self-join's second scan reads
        // the cache — a guarantee, where relying on Catalyst's exchange
        // reuse to dedup the doubled subtree is only optimizer behavior.
        val hop = labels.select(col("id"), col("lbl"), lit(true).as("own")).union(prop)
          .groupBy(col("id"))
          .agg(min(col("lbl")).as("lbl"), min(when(col("own"), col("lbl"))).as("old"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // shortcut: lbl := lbl(lbl). Labels are always vertex ids (inits
        // are, and mins of vertex ids stay vertex ids), so every lbl
        // resolves in the table; left join + coalesce guards regardless.
        // Monotone (lbl(x) <= x), so least() only defends against ties.
        val (next, nextIds) = checkpointed(
          hop.join(hop.select(col("id").as("_rid"), col("lbl").as("_rlbl")),
              col("lbl") === col("_rid"), "left")
            .select(col("id"),
              least(col("lbl"), coalesce(col("_rlbl"), col("lbl"))).as("lbl"),
              col("old")))
        hop.unpersist(blocking = false)
        // narrow scan of the checkpointed partitions — no join, no shuffle
        converged = next.filter(col("lbl") < col("old")).limit(1).isEmpty
        free(labelIds)
        labels = next.select(col("id"), col("lbl"))
        labelIds = nextIds
        rounds += 1
      }
      // fail loudly rather than silently returning non-converged components
      // (a component whose diameter exceeds maxRounds would otherwise get a
      // wrong answer with no signal)
      if (!converged) throw new IllegalStateException(
        s"nearDupGroups: label propagation not converged after $maxRounds rounds " +
          "(a component diameter exceeds the guard; raise maxRounds)")
      free(cSymIds)
      Some(labels)
    }
    // map back through the contraction: a vertex's component label is its
    // representative's final label; representatives with no contracted
    // edge (fully collapsed components) keep l0 itself
    val out = cLabels match {
      case None =>
        free(cSymIds)
        l0.select(col("id").as("doc_id"), col("l0").as("keep_id"))
      case Some(lbls) =>
        l0.join(lbls.withColumnRenamed("id", "_cid"),
            col("l0") === col("_cid"), "left")
          .select(col("id").as("doc_id"),
            coalesce(col("lbl"), col("l0")).as("keep_id"))
    }
    (out, rounds)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication over an embedding column — removes documents that say
    * the same thing in different words, which no lexical stage (MinHash,
    * SimHash, exact substring) can see. The paper's recipe, Spark-first:
    *
    *  1. cluster the corpus into `nCells` k-means cells
    *     ([[Ivf.buildPortable]] — deterministic fixed-point Lloyd rounds,
    *     so the whole operator stays oracle-reproducible);
    *  2. within each cell, connect pairs at cosine ≥ `minCosine` and take
    *     transitive groups ([[nearDupGroups]]) — the CELL bounds the
    *     quadratic (the paper's trick: k grows with the corpus so
    *     cell-sized pair blocks stay tractable; cross-cell semantic dups
    *     are the accepted recall loss, exactly as in the paper);
    *  3. keep ONE exemplar per group: the member LEAST similar to its
    *     cell centroid — the paper's "keep outliers" choice (they found
    *     dropping the most-typical members hurts least) — with the raw
    *     fixed-order cosine as the sort key (bit-identical in any
    *     engine) and the lowest id breaking ties.
    *
    * Output, one row per vector: (idCol, cell_id, comp, centroid_sim,
    * is_kept) — comp is the semantic-duplicate group label (min member
    * id; singletons label themselves), centroid_sim the portable
    * micro-unit cosine to the trained centroid (rounded to 6 dp for the
    * readout only; the election compares the raw double).
    *
    * Complements [[semanticDupes]] (the earliest-id pairwise variant —
    * cheaper: no component pass, no election): THIS is the
    * paper-faithful form — transitive groups, the centroid-outlier
    * keep rule, and a per-vector report instead of the removed set.
    *
    * Scale shape — four mechanisms keep the within-cell quadratic
    * bounded by the corpus, not by luck:
    *
    *  1. CELL COUNT SCALES WITH N (the paper's own rule: k ∝ corpus so
    *     cell-sized pair blocks stay tractable). `nCells = 0` (the
    *     default) derives `max(8, ceil(N / targetCellSize))` from one
    *     count job; an explicit `nCells > 0` is honored verbatim (the
    *     declared queries pin 8 for oracle reproducibility).
    *  2. EXACT-DUPLICATE COLLAPSE (lossless): vectors that are
    *     bit-identical within a cell enter the pairwise stage as ONE
    *     delegate (min id); members attach to their delegate by a free
    *     cosine-1 edge. Cosine depends only on the vector values, so
    *     delegate edges reproduce the member edges transitively —
    *     components and the election are unchanged (DedupSpec gates
    *     this on a heavy-duplicate fixture). The common 100 TB
    *     pathology — a crawl dumping millions of byte-identical
    *     embeddings into one cell — costs O(distinct²), not O(copies²).
    *     Zero-norm vectors can never reach `minCosine > 0` (cosine
    *     zero-norm→0.0) and skip the pairwise stage entirely.
    *  3. CENTERED SUB-BANDING + BAND-HUB STAR for oversized cells: a
    *     cell still holding more than `maxCellSize` DISTINCT vectors
    *     after the collapse is split by the low
    *     ceil(log2(size/maxCellSize)) bits of the sign signature of
    *     (micro(v) − cell centroid). Centering is load-bearing:
    *     residual signs are unbiased coins, so the split is UNIFORM
    *     (≈ cap-sized bands, pairs ≈ size·cap/2) for ANY cell
    *     geometry — the raw-vector signature fails exactly where the
    *     guard matters, because a mean-dominated cell agrees on
    *     sign(r·c₀) for most planes and keeps 33-100% of its mass in
    *     the modal band (measured: SemDedupProbe skewed census, and
    *     SCALE.md §SemDeDup-skew). Banding cuts cross-band pairs, so
    *     every delegate of an oversized cell is additionally paired
    *     with the cell's CENTROID-NEAREST delegate (HUB SPOKES — csz
    *     extra screened candidates per cell, linear; max cosine to the
    *     cell centroid, min id on ties): an over-cap tight BLOCK that
    *     OWNS the centroid — the mean-dominated geometry this guard
    *     exists for — contains the hub, so its members' spokes all
    *     qualify and the block re-connects no matter how the bands
    *     scattered it; its reported GROUP matches the unbanded one
    *     (a min-ID hub could land outside the block and fragment it —
    *     the round-10 ADVICE hole, closed here and spec-gated). A
    *     SECOND hub is elected among the delegates whose signatures
    *     disagree with hub 1 past the screen threshold (provably
    *     unable to edge with it), by the same centroid-nearest rule,
    *     and those far delegates spoke to it: a SECONDARY tight block
    *     — one that owns neither the centroid nor hub 1 — re-connects
    *     through hub 2 when it dominates the far set's centroid order
    *     (round-11 verdict item; SemDedupSpanningSpec pins two-block
    *     parity). What banding spends is pair enumeration, not tight-
    *     block recall. The residual narrowing: third-and-beyond
    *     blocks dominated in BOTH centroid orders, and moderate
    *     clusters' member↔member pairs dissimilar to every hub — the
    *     same accepted-recall contract as the paper's own cross-cell
    *     misses. Never active at or below `maxCellSize` — the
    *     declared queries' outputs are bit-unchanged.
    *  3b. `edgesMode = "spanning"` (opt-in; default `"all"` is the
    *     declared-query behavior): oversized cells emit a SPANNING
    *     structure instead of all within-band pairs — one star per
    *     band on the band's centroid-nearest delegate, plus the cell
    *     hub spokes. The guard-active regime is OUTPUT-bound when the
    *     over-cap mass is genuinely duplicate (the census's tight tier
    *     spent its whole 249 s wall materializing 1.3e8 qualified
    *     edges that component labeling doesn't need); spanning keeps
    *     edges per oversized cell ≤ 3·distinct. Declared recall
    *     narrowing: a duplicate group is reported whole iff its
    *     members reach a hub — exact for the centroid-owning block
    *     (band hubs and hub 1 sit inside it) AND for the second-
    *     nearest block (it reaches hub 2, elected over the provably-
    *     hub-1-dissimilar far set); only third-and-beyond blocks
    *     dominated in both centroid orders may fragment; under-cap
    *     cells are IDENTICAL in both modes (SemDedupSpanningSpec
    *     gates two-block parity on the adversarial fixtures and the
    *     under-cap equivalence).
    *  4. SIGN-BIT HAMMING PREFILTER on candidate pairs (recall-safe by
    *     margin): before the 2·dim-flop cosine, pairs are screened on
    *     the 64-bit signatures' hamming distance against
    *     ceil(64·θ/π + 5σ) — five binomial standard deviations past
    *     the expected disagreement AT the threshold angle, so a true
    *     pair is dropped with probability < 1e-6 while far-apart pairs
    *     (the bulk of a coarse cell) fail the one-word popcount and
    *     never reach the cosine. Identical vectors hash identically
    *     (hamming 0): the collapse edges are never at risk. The q246
    *     oracle models the screen EXACTLY (same md5 ±1 planes, same
    *     fold order), so the correctness gate stays bit-exact — the
    *     5σ margin bounds the semantic loss vs an unscreened run, not
    *     the oracle agreement.
    *
    * After those, the plan is: one k-means build (sampled fit at
    * 100 TB), one count+min groupBy keyed by the vector, one
    * within-(sub)cell self-join (equi on (cell_id, band), never
    * corpus²) plus the linear hub-spoke probes, the 1-job component
    * labeling, and two vector-free joins on the id. */
  def semanticDedupExemplars(vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", nCells: Int = 0,
      minCosine: Double = 0.35, iters: Int = 2,
      targetCellSize: Int = 4096, maxCellSize: Int = 16384,
      prefilter: Boolean = true, seed: Long = 2303L,
      edgesMode: String = "all"): DataFrame = {
    import graft.functions.GraftFunctions.{cosine_sim, micro_units, rhp_signature, hamming_dist, l2_norm}
    require(minCosine <= 1.0, "minCosine above 1.0 can match nothing")
    require(edgesMode == "all" || edgesMode == "spanning",
      s"edgesMode must be 'all' or 'spanning', got '$edgesMode'")
    // empty-corpus short-circuit BEFORE the k-means build (the Lloyd
    // init cannot type an empty literal cell array, and there is no
    // dim to read off a cell-less index) — same discipline the
    // round-9 operators establish in EdgeCasesSpec. The explicit-
    // nCells path pays one limit-1 probe; the auto path reuses the
    // count it takes anyway.
    val nCellsEff =
      if (nCells > 0) { if (vecs.isEmpty) 0 else nCells }
      else {
        val n = vecs.count()
        if (n == 0L) 0
        else math.max(8L, (n + targetCellSize - 1) / targetCellSize)
          .min(Int.MaxValue).toInt
      }
    if (nCellsEff == 0)
      return vecs.limit(0).select(col(idCol),
        lit(0).cast("int").as("cell_id"), col(idCol).as("comp"),
        lit(0.0).as("centroid_sim"), lit(false).as("is_kept"))
    val idx = Ivf.buildPortable(vecs, nCellsEff, iters, idCol, vecCol)
    val dim = idx.cells.select(size(col("centroid"))).head().getInt(0)
    val m = idx.assigned.select(col("cell_id"), col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("_v"))
    // zero-norm vectors cosine to 0.0 against everything — with a
    // positive threshold they cannot edge, so they skip the pair stage
    val pairable = if (minCosine > 0) m.filter(l2_norm(col("_v")) > 0) else m
    // exact-duplicate collapse: one delegate (min id) per distinct
    // vector value per cell; members ride a free cosine-1 edge. ONE
    // window pass assigns every row its delegate (cheaper than a
    // groupBy + join-back: no second vector-keyed exchange)
    val withDel = pairable.withColumn("del",
      min(col("vid")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell_id"), col("_v"))))
    val memberEdges = withDel.filter(col("vid") =!= col("del"))
      .select(col("del").as("id_a"), col("vid").as("id_b"))
    // skew guard: distinct-vector census per cell → sub-band bit count
    // (0 for every cell within the cap), as a second window over the
    // delegate rows — no separate aggregate + broadcast-join stage.
    // Oversized cells band on the CENTERED signature — sign bits of
    // (micro(v) − cell centroid). Residuals are zero-mean within the
    // cell, so their sign bits are unbiased coins and the split is
    // UNIFORM (≈ csz / 2^sbits per band) for ANY cell geometry; the
    // raw-vector signature is useless exactly where the guard matters
    // — a mean-dominated cell (every member ≈ c₀ + noise) agrees on
    // sign(r·c₀) for most planes, so its modal band keeps 33-100% of
    // the mass (measured in SemDedupProbe's skewed census) and the
    // "guard" would stay quadratic-in-cell. The UNCENTERED signature
    // is still what the hamming screen compares — true near-dup pairs
    // agree on it regardless of banding.
    val wCell = org.apache.spark.sql.expressions.Window.partitionBy(col("cell_id"))
    val sigged0 = withDel.filter(col("vid") === col("del"))
      .join(broadcast(idx.cells), Seq("cell_id"))
      .withColumn("_csz", sum(lit(1)).over(wCell))
      .withColumn("_sbits",
        when(col("_csz") <= maxCellSize, lit(0))
          .otherwise(least(lit(16),
            ceil(log(2.0, col("_csz").cast("double") / maxCellSize)).cast("int"))))
      .withColumn("_psig",
        rhp_signature(col("_v"), 64, dim, seed, portable = true))
      .withColumn("_rsig",
        when(col("_sbits") > 0, rhp_signature(
          zip_with(micro_units(col("_v")), col("centroid"), (a, b) => a - b),
          64, dim, seed, portable = true)).otherwise(lit(0L)))
      .withColumn("_band",
        expr("_rsig & (shiftleft(CAST(1 AS BIGINT), _sbits) - 1)"))
    // hub spokes: banding cuts cross-band pairs, which would split a
    // legitimate over-cap duplicate GROUP (a tight block is exactly the
    // shape whose residual signs are pure noise → uniform over bands).
    // So EVERY delegate of an oversized cell is additionally paired
    // with the cell's CENTROID-NEAREST delegate (the hub: max cosine to
    // the cell centroid, min id on ties) — csz extra candidates per
    // oversized cell, LINEAR, and they run the same hamming screen (one
    // popcount kills the dissimilar bulk before any cosine). Hub choice
    // is load-bearing for the recall guarantee: in the mean-dominated
    // regime the guard targets, the DOMINATING tight block owns the cell
    // centroid, so the hub sits inside that block and every member's
    // spoke qualifies — the block re-connects through the hub no matter
    // how the bands scattered it (a min-ID hub could land outside the
    // block and leave it fragmented, the round-10 ADVICE hole; DedupSpec
    // covers a tight block NOT containing the min id). What banding
    // spends is pair enumeration, not centroid-owning-block recall;
    // blocks that do NOT own the centroid and moderate clusters pay a
    // declared cross-band loss for member↔member pairs dissimilar to
    // the hub — the same accepted-recall contract as the paper's own
    // cross-cell misses.
    // hamming screen: expected disagreement at the threshold angle plus
    // five binomial sigmas; >= 64 means the screen is a no-op (computed
    // before the hub election — the SECOND hub's "far" membership below
    // reuses it as a proof of dissimilarity)
    val thr = hammingScreenThreshold(minCosine)
    val sigged = sigged0
      // the hub cosine only matters where spokes/stars can fire
      // (_sbits > 0); under-cap cells — every declared query — must not
      // pay an extra per-delegate O(dim) dot product for a hub nobody
      // reads (their _hub degenerates to min id, which is never consumed)
      .withColumn("_hcos",
        when(col("_sbits") > 0,
          cosine_sim(micro_units(col("_v")), col("centroid")))
          .otherwise(lit(0.0)))
      // the sig rides along so the far test below needs no join-back;
      // (nc, del) is already unique per row, so appending it can never
      // change which delegate wins the min
      .withColumn("_hubrec",
        min(struct((-col("_hcos")).as("nc"), col("del").as("del"),
          col("_psig").as("sig"))).over(wCell))
      .withColumn("_hub", col("_hubrec").getField("del"))
      // SECOND-HUB ELECTION (round-11 verdict item 4): a delegate whose
      // sign signature disagrees with the cell hub's past the screen
      // threshold provably cannot qualify an edge with it — its hub
      // spoke is dead weight, and a SECONDARY tight block (one that
      // owns neither the cell centroid nor, in spanning mode, a band
      // hub) is made entirely of such delegates and would fragment
      // across bands. Those "far" delegates elect their own hub by the
      // same rule (centroid-nearest, min id on ties) and spoke to it:
      // the block dominating the far set's centroid order re-connects
      // exactly as the primary block does through hub 1. Cost: |far|
      // extra LINEAR spoke candidates per oversized cell (their dead
      // hub-1 spokes still enumerate, but the one-word popcount screen
      // kills those before any cosine). With thr >= 64 the signature
      // proves nothing and no far set exists (the screen is a no-op
      // there too). Under-cap cells (_sbits = 0) never elect: declared
      // queries are bit-unchanged.
      .withColumn("_far",
        col("_sbits") > 0 &&
          hamming_dist(col("_psig"), col("_hubrec").getField("sig")) > lit(thr))
      .withColumn("_hub2",
        min(when(col("_far"),
          struct((-col("_hcos")).as("nc"), col("del").as("del"))))
          .over(wCell).getField("del"))
      .select(col("cell_id"), col("_band"), col("del"), col("_psig"),
        col("_v"), col("_sbits"), col("_hub"), col("_hcos"),
        col("_far"), col("_hub2"))
    // edgesMode = "spanning": oversized cells (the guard-active, OUTPUT-
    // bound regime — a tight over-cap block qualifies ~every within-band
    // pair, and the census measured the tight tier spending its whole
    // wall materializing that edge mass) emit a SPANNING structure
    // instead of all within-band pairs: one star per band on the band's
    // centroid-nearest delegate, plus the cell-hub spokes below. Linear
    // edges per cell (≤ 2·distinct) in place of size·cap/2, with the
    // DECLARED recall narrowing: a duplicate group is reported whole iff
    // its members reach a hub — the centroid-owning block always does
    // (band hubs and hub 1 sit inside it), the second-nearest block
    // reaches hub 2 (elected over the provably-hub-1-dissimilar far
    // set), and only third-and-beyond blocks dominated in both centroid
    // orders may fragment. Under-cap cells are untouched — identical
    // output in both modes, so the declared queries (which never
    // activate the guard) are bit-unchanged.
    val pairSrc =
      if (edgesMode == "spanning") sigged.filter(col("_sbits") === 0)
      else sigged
    val joined = pairSrc
      .select(col("cell_id"), col("_band"), col("del").as("id_a"),
        col("_psig").as("_pa"), col("_v").as("_va"))
      .join(pairSrc
        .select(col("cell_id"), col("_band"), col("del").as("id_b"),
          col("_psig").as("_pb"), col("_v").as("_vb")),
        Seq("cell_id", "_band"))
      .filter(col("id_a") < col("id_b"))
    // only OVERSIZED cells have spokes: filtering here keeps the hub
    // broadcast empty in the common all-cells-under-cap case (unfiltered
    // it would be one full vector per cell — N/targetCellSize vectors
    // under the auto-k rule, a real broadcast at corpus scale)
    val hubs = sigged
      .filter(col("_sbits") > 0 && col("del") === col("_hub"))
      .select(col("cell_id"), col("del").as("id_a"),
        col("_psig").as("_pa"), col("_v").as("_va"),
        col("_band").as("_hband"))
    val starCand = sigged
      .filter(col("_sbits") > 0 && col("del") =!= col("_hub"))
      .select(col("cell_id"), col("_band"), col("del").as("id_b"),
        col("_psig").as("_pb"), col("_v").as("_vb"))
      .join(broadcast(hubs), Seq("cell_id"))
      // co-banded delegates already met the hub in the within-band join
      .filter(col("_band") =!= col("_hband"))
    // spanning mode's per-band stars: each oversized-cell delegate paired
    // with its band's centroid-nearest delegate (same ordering rule as
    // the cell hub). Equi-join on (cell_id, band) — bands are numerous,
    // no broadcast needed; the hamming screen + cosine verify still run.
    val bandStarCand =
      if (edgesMode != "spanning") None
      else {
        val wBand = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell_id"), col("_band"))
        val withBHub = sigged.filter(col("_sbits") > 0)
          .withColumn("_bhub",
            min(struct((-col("_hcos")).as("nc"), col("del").as("del")))
              .over(wBand).getField("del"))
        val bHubs = withBHub.filter(col("del") === col("_bhub"))
          .select(col("cell_id"), col("_band"), col("del").as("id_a"),
            col("_psig").as("_pa"), col("_v").as("_va"))
        Some(withBHub.filter(col("del") =!= col("_bhub"))
          .select(col("cell_id"), col("_band"), col("del").as("id_b"),
            col("_psig").as("_pb"), col("_v").as("_vb"))
          .join(bHubs, Seq("cell_id", "_band"))
          .select(col("id_a"), col("id_b"),
            col("_pa"), col("_pb"), col("_va"), col("_vb")))
      }
    // second-hub spokes: every far delegate pairs with the far set's own
    // centroid-nearest delegate (see the election above). Same broadcast
    // shape as the hub-1 spokes — hubs2 is one row per oversized cell
    // WITH a far set, empty in the all-under-cap common case. In "all"
    // mode co-banded pairs are already enumerated by the within-band
    // join, so same-band spokes are skipped; in spanning mode they are
    // kept (the band star only guarantees a path through the BAND hub,
    // which a far delegate cannot qualify with unless that hub is far
    // too).
    val hubs2 = sigged
      .filter(col("_far") && col("del") === col("_hub2"))
      .select(col("cell_id"), col("del").as("id_a"),
        col("_psig").as("_pa"), col("_v").as("_va"),
        col("_band").as("_hband"))
    val starCand2Base = sigged
      .filter(col("_far") && col("del") =!= col("_hub2"))
      .select(col("cell_id"), col("_band"), col("del").as("id_b"),
        col("_psig").as("_pb"), col("_v").as("_vb"))
      .join(broadcast(hubs2), Seq("cell_id"))
    val starCand2 =
      if (edgesMode == "all") starCand2Base.filter(col("_band") =!= col("_hband"))
      else starCand2Base
    val cand0 = joined.select(col("id_a"), col("id_b"),
        col("_pa"), col("_pb"), col("_va"), col("_vb"))
      .unionByName(starCand.select(col("id_a"), col("id_b"),
        col("_pa"), col("_pb"), col("_va"), col("_vb")))
      .unionByName(starCand2.select(col("id_a"), col("id_b"),
        col("_pa"), col("_pb"), col("_va"), col("_vb")))
    val cand = bandStarCand.map(cand0.unionByName(_)).getOrElse(cand0)
    val screened =
      if (prefilter && thr < 64)
        cand.filter(hamming_dist(col("_pa"), col("_pb")) <= thr)
      else cand
    val pairs = screened
      .filter(cosine_sim(col("_va"), col("_vb")) >= minCosine)
      .select(col("id_a"), col("id_b"))
      .unionByName(memberEdges)
    val comps = nearDupGroups(pairs)
    val withSim = m.join(broadcast(idx.cells), Seq("cell_id"))
      .withColumn("_ccos", cosine_sim(micro_units(col("_v")), col("centroid")))
      .select(col("vid"), col("cell_id"), col("_ccos"))
    val labeled = withSim
      .join(comps.withColumnRenamed("doc_id", "vid"), Seq("vid"), "left")
      .withColumn("comp", coalesce(col("keep_id"), col("vid")))
    // centroid-outlier election as ONE window min (vs groupBy + join
    // back: same min(struct) semantics, one fewer exchange)
    labeled
      .withColumn("_best",
        min(struct(col("_ccos"), col("vid"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("comp"))))
      .select(col("vid").as(idCol), col("cell_id"), col("comp"),
        round(col("_ccos"), 6).as("centroid_sim"),
        (col("vid") === col("_best").getField("vid")).as("is_kept"))
  }

  /** The sign-bit hamming screen's pass threshold: expected bit
    * disagreement at the threshold angle plus five binomial standard
    * deviations (true-pair loss < 1e-6 per pair). ONE definition on
    * purpose — the operator ([[semanticDedupExemplars]]), the scale
    * probe ([[graft.SemDedupProbe]]) and the q246 oracle builder must
    * never census different screens. */
  private[graft] def hammingScreenThreshold(minCosine: Double, bits: Int = 64): Int = {
    val p = math.acos(math.max(-1.0, math.min(1.0, minCosine))) / math.Pi
    math.ceil(bits * p + 5.0 * math.sqrt(bits * p * (1.0 - p))).toInt
  }

  /** SemDeDup recall calibration (the q195-style audit for the SEMANTIC
    * family): measures the cross-cell miss rate [[semanticDedupExemplars]]
    * accepts — the paper's declared loss — as a function of the cell
    * count. Ground truth = ALL pairs at `cosine >= minCosine` over a
    * bounded audit subset (`idCol % sampleMod == 0`, the q210
    * discipline: the exact all-pairs stage runs on a fixed-size sample,
    * never the corpus); for each candidate cell count the portable
    * k-means is trained on the FULL corpus — the operating partitioning,
    * not a sampled one — and a true pair counts as FOUND iff both
    * endpoints land in the same cell (exactly the pairs the within-cell
    * stage can see). One row per cell count:
    * (n_cells, true_pairs, found_pairs, recall_ppm).
    *
    * Scale shape: the ground-truth pair set is sample² with the sample
    * side broadcast (BNLJ by design, audit-subset-bounded), checkpointed
    * once and probed by id against each assignment — the k trainings
    * and the id joins are all linear in the corpus. */
  def semanticRecallAudit(vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", cellCounts: Seq[Int] = Seq(4, 8, 16),
      minCosine: Double = 0.35, iters: Int = 2,
      sampleMod: Int): DataFrame = {
    import graft.functions.GraftFunctions.cosine_sim
    require(cellCounts.nonEmpty && sampleMod >= 1)
    val sample = vecs.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("_v"))
    val truePairs = broadcast(
        sample.select(col("vid").as("id_a"), col("_v").as("_va")))
      .join(sample.select(col("vid").as("id_b"), col("_v").as("_vb")),
        col("id_a") < col("id_b"))
      .filter(cosine_sim(col("_va"), col("_vb")) >= minCosine)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(eager = true) // pair-ids only; one consumer per k
    cellCounts.map { k =>
      val asg = Ivf.buildPortable(vecs, k, iters, idCol, vecCol).assigned
      val ca = asg.select(col(idCol).as("id_a"), col("cell_id").as("_ca"))
      val cb = asg.select(col(idCol).as("id_b"), col("cell_id").as("_cb"))
      truePairs.join(ca, Seq("id_a")).join(cb, Seq("id_b"))
        .agg(count(lit(1)).as("true_pairs"),
          sum(when(col("_ca") === col("_cb"), 1L).otherwise(0L))
            .as("found_pairs"))
        .select(lit(k).as("n_cells"), col("true_pairs"), col("found_pairs"),
          when(col("true_pairs") > 0,
            expr("found_pairs * 1000000 div true_pairs"))
            .otherwise(lit(0L)).as("recall_ppm"))
    }.reduce(_.unionByName(_))
  }

  /** Incremental semantic dedup — the INGEST-time SemDeDup probe (the
    * q74 daily-increment shape for the EMBEDDING family): arriving
    * vectors are routed to a STORED portable k-means index's cells
    * ([[Ivf.assignVectors]] — a pure shuffle-free map, so the routing is
    * streaming-legal) and compared, under the same sign-bit hamming
    * screen + cosine threshold as [[semanticDedupExemplars]], against
    * the indexed corpus's vectors of that cell ONLY. Per-increment cost
    * is O(|delta| × cell occupancy); the indexed corpus is read through
    * its cell-partitioned layout (cell_id is the partition column when
    * the index was stored via [[Ivf.writeIndex]], so a delta touching
    * few cells prunes the rest — DPP-eligible equi-join), and nothing is
    * ever recomputed over it.
    *
    * Output, one row per delta vector: (idCol, cell_id, dup_of, sim,
    * is_novel) — dup_of the most-similar indexed duplicate (max cosine,
    * lowest id on ties; the exact fixed-fold cosine, rounded to 6 dp on
    * the readout only), NULL with is_novel = true when nothing in the
    * cell reaches `minCosine`. A delta id already present in the index
    * never matches itself.
    *
    * Contract and drift: verdicts are relative to the STORED partitioning
    * — the standing ANN-index contract (cells age as the corpus grows;
    * retrain on cadence, [[semanticRecallAudit]] measures the cross-cell
    * loss per cell count). Streaming: route + probe per micro-batch via
    * foreachBatch (the [[graft.streaming.KafkaFrontDoor]] landing
    * pattern); IncrementalSemanticDedupSpec gates stream ≡ batch and the
    * batch verdicts against a brute-force recompute. */
  def incrementalSemanticDupes(index: Ivf.IvfIndex, delta: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      minCosine: Double = 0.35, prefilter: Boolean = true,
      seed: Long = 2303L): DataFrame = {
    import graft.functions.GraftFunctions.{cosine_sim, rhp_signature, hamming_dist}
    val dimOpt = index.cells.select(size(col("centroid"))).limit(1)
      .collect().headOption.map(_.getInt(0))
    if (dimOpt.isEmpty)
      // empty index: every delta vector is novel (empty-safe, the
      // EdgeCasesSpec discipline — the Lloyd init cannot type an empty
      // literal cell array, so short-circuit before assignVectors)
      return delta.select(col(idCol),
        lit(-1).cast("int").as("cell_id"),
        lit(null).cast(delta.schema(idCol).dataType).as("dup_of"),
        lit(null).cast("double").as("sim"),
        lit(true).as("is_novel"))
    val dim = dimOpt.get
    val thr = hammingScreenThreshold(minCosine)
    val asg = Ivf.assignVectors(index, delta, vecCol)
      .select(col(idCol), col("cell_id"),
        col(vecCol).cast("array<double>").as("_dv"))
    val dSig = asg.withColumn("_dsig",
      rhp_signature(col("_dv"), 64, dim, seed, portable = true))
    val cSig = index.assigned.select(col("cell_id"), col(idCol).as("_cid"),
        col(vecCol).cast("array<double>").as("_cv"))
      .withColumn("_csig",
        rhp_signature(col("_cv"), 64, dim, seed, portable = true))
    val joined = dSig.join(cSig, Seq("cell_id"))
      .filter(col(idCol) =!= col("_cid")) // re-ingest is not its own dup
    val screened =
      if (prefilter && thr < 64)
        joined.filter(hamming_dist(col("_dsig"), col("_csig")) <= thr)
      else joined
    // best indexed duplicate per delta row: ONE map-side-combined min
    // over (-sim, id) — max cosine, lowest id on ties, no window sort
    val hits = screened
      .withColumn("_sim", cosine_sim(col("_dv"), col("_cv")))
      .filter(col("_sim") >= minCosine)
      .groupBy(col(idCol))
      .agg(min(struct((-col("_sim")).as("ns"), col("_cid").as("cid"))).as("_best"))
      .select(col(idCol), col("_best").getField("cid").as("dup_of"),
        (-col("_best").getField("ns")).as("_bsim"))
    asg.select(col(idCol), col("cell_id"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("cell_id"), col("dup_of"),
        round(col("_bsim"), 6).as("sim"), col("dup_of").isNull.as("is_novel"))
  }

  /** Full transitive near-dup dedup: survivors = docs that are their own
    * component minimum (plus all docs untouched by any pair). */
  def nearDupSurvivors(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5): DataFrame = {
    val groups = nearDupGroups(nearDupPairs(docs, idCol, textCol, minJaccard = minJaccard))
    docs.select(col(idCol))
      .join(groups.filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
  }

  /** Canonical-document selection: per near-dup component, keep the member
    * with the highest `scoreCol` (tie-break: lowest id) instead of the
    * arbitrary min-id survivor — what a production dedup stage does when a
    * quality signal exists (drop the mirror copies, keep the cleanest).
    * Documents untouched by any pair are their own component.
    *
    * Output: (comp, rep_id, rep_score, n_members). Scale shape: labels,
    * corpus ids, and scores all join on doc_id, so the three-way plan
    * hash-partitions once on doc_id and reuses that exchange (dup-heavy
    * crawls make the label set a large fraction of the corpus — NOT
    * broadcastable; AQE may still flip it when it is small); the
    * per-component argmax and the member count come out of ONE
    * map-side-combined groupBy (`max_by` on a unique ordering struct) —
    * no window sort, no second pass joined back.
    */
  def componentRepresentatives(docs: DataFrame, idCol: String, textCol: String,
      scores: DataFrame, scoreCol: String): DataFrame = {
    val comps = nearDupGroups(nearDupPairs(docs, idCol, textCol))
    val labeled = docs.select(col(idCol).as("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("keep_id"), col("doc_id")).as("comp"))
    val scored = labeled.join(
      scores.select(col(idCol).as("doc_id"), col(scoreCol).as("_score")), Seq("doc_id"))
    scored.groupBy(col("comp"))
      .agg(
        // highest score, tie-break lowest id: the (score, -id) ordering
        // struct is unique per member, so the argmax is deterministic
        max_by(struct(col("doc_id"), col("_score")),
          struct(col("_score"), -col("doc_id"))).as("rep"),
        count(lit(1)).as("n_members"))
      .select(col("comp"), col("rep.doc_id").as("rep_id"),
        col("rep._score").as("rep_score"), col("n_members"))
  }

  /** Duplication-aware loss weights: every document gets weight
    * 1e6/|its near-dup component| ppm (singletons weigh 1e6), so each
    * semantic unit contributes the same total training mass no matter how
    * many copies the crawl surfaced — the soft alternative to hard
    * survivor selection, and what loss-reweighting trainers consume.
    * Cost = the component labeling (q38's frontier propagation) + one
    * component-keyed count join. */
  def dedupWeights(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val comps = nearDupGroups(nearDupPairs(docs, idCol, textCol))
    val labeled = docs.select(col(idCol).as("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("keep_id"), col("doc_id")).as("comp"))
    val sizes = labeled.groupBy(col("comp")).agg(count(lit(1)).as("comp_size"))
    labeled.join(sizes, Seq("comp"))
      .select(col("doc_id"), col("comp"), col("comp_size"),
        expr("1000000 div comp_size").as("weight_ppm"))
  }

  /** Embedding near-duplicate pairs at scale: sign-random-projection
    * signatures banded into `nBands` buckets; only same-bucket pairs are
    * exactly rescored with cosine. The banding join replaces the O(n²)
    * self-join of an exact variant — candidates per doc scale with bucket
    * occupancy, not corpus size.
    *
    * Approximation contract (declared, LSH-inherent): output = the
    * candidate pairs that collide in ≥1 band, verified `cosine ≥
    * minCosine`. A qualifying pair at bit-collision probability
    * p = 1 − θ/π is recalled with probability 1 − (1 − p^bitsPerBand)^nBands
    * → ~1 for true near-duplicates (cosine ≥ 0.95 ⇒ p ≥ 0.90), lower near
    * a loose threshold. DedupSpec asserts band-path ≡ exact-path on a
    * near-dup corpus at test scale.
    *
    * `portable = true` (default) uses md5-derived ±1 hyperplanes
    * ([[graft.functions.PortableSigns]]) so signatures — and therefore the
    * whole result — are reproduced bit-for-bit by the DuckDB oracle (q24).
    */
  def embeddingNearDup(
      corpus: DataFrame, minCosine: Double,
      dim: Int, nBands: Int = 16, bitsPerBand: Int = 8, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      portable: Boolean = true): DataFrame = {
    import graft.functions.GraftFunctions.{cosine_sim, rhp_signature}
    val sigCols = Seq(col(idCol).as("doc_id"), col(vecCol).as("v")) ++
      (0 until nBands).map(b =>
        rhp_signature(col(vecCol), bitsPerBand, dim, seed + b, portable).as(s"band$b"))
    val sigs = corpus.select(sigCols: _*)
    // band join on IDS ONLY (same discipline as minhashCandidates): the
    // exploded band stream carries 16 bytes/row, not nBands copies of the
    // embedding; vectors are joined back just for the candidate rescore.
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("b"), col(s"band$b").as("s"))): _*)).as("bv"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val vecs = sigs.select(col("doc_id"), col("v"))
    cand
      .join(vecs.select(col("doc_id").as("id_a"), col("v").as("va"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(vecs.select(col("doc_id").as("id_b"), col("v").as("vb"))
        .hint("shuffle_hash"), Seq("id_b"))
      .withColumn("sim", cosine_sim(col("va"), col("vb")))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Pairs of documents whose 64-bit simhashes differ by at most
    * `maxHamming` bits. The pair stage self-joins on `blockBits` leading
    * bits of the low half as a cheap block (exact for maxHamming = 0;
    * probabilistic prune otherwise unless blockBits = 0 → all pairs).
    * Prefer [[simhashPairsBlocked]]: exact recall AND no all-pairs stage. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blockBits: Int = 0): DataFrame = {
    val sh = simhash64(docs, idCol, textCol)
    val a = sh.select(col("doc_id").as("id_a"), col("sim_lo").as("lo_a"), col("sim_hi").as("hi_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sim_lo").as("lo_b"), col("sim_hi").as("hi_b"))
    val block =
      if (blockBits <= 0) lit(true)
      else expr(s"(lo_a >> ${32 - blockBits}) = (lo_b >> ${32 - blockBits})")
    a.join(b, col("id_a") < col("id_b") && block)
      .withColumn("hd",
        (hamming_dist(col("lo_a"), col("lo_b")) + hamming_dist(col("hi_a"), col("hi_b")))
          .cast("bigint"))
      .filter(col("hd") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hd"))
  }

  /** [[simhashPairs]] with EXACT recall and no all-pairs stage: pigeonhole
    * multi-block banding. The 64-bit fingerprint is split into `nBlocks ≥
    * maxHamming + 1` equal bit spans; two fingerprints within Hamming
    * distance `maxHamming` differ in at most `maxHamming` spans, so they
    * MUST agree exactly on at least one — an equi-join on
    * (block index, block value) finds every qualifying pair, and only
    * collided candidates are Hamming-verified. Identical results to the
    * all-pairs variant at O(Σ per-bucket occupancy²) cost instead of
    * O(n²) — the standard simhash sharding scheme at corpus scale. */
  def simhashPairsBlocked(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingPairs64(simhash64(docs, idCol, textCol), maxHamming)

  /** All (id_a < id_b) pairs within `maxHamming` bits over 64-bit
    * signatures carried as two 32-bit halves (doc_id, sim_lo, sim_hi) —
    * the generic engine behind [[simhashPairsBlocked]] and perceptual-hash
    * image dedup ([[Multimodal.imageAHash64]]). EXACT recall via the
    * pigeonhole principle: splitting 64 bits into `maxHamming + 1`-plus
    * blocks means any pair within the budget agrees on at least one whole
    * block, so candidate generation is an equi-join on block values —
    * no all-pairs stage anywhere in the plan. */
  def hammingPairs64(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBlocks = Seq(2, 4, 8, 16, 32).find(_ >= maxHamming + 1).getOrElse(
      throw new IllegalArgumentException(s"maxHamming $maxHamming too large for 64-bit blocks"))
    val w = 64 / nBlocks // 32 % w == 0, so blocks never straddle the halves
    val mask = (1L << w) - 1
    val blocks = array((0 until nBlocks).map { j =>
      val start = j * w
      val half = if (start < 32) "sim_lo" else "sim_hi"
      val off = start % 32
      struct(lit(j).as("j"), expr(s"($half >> $off) & $mask").as("bv"))
    }: _*)
    val e = sigs.select(col("doc_id"), col("sim_lo"), col("sim_hi"), explode(blocks).as("blk"))
    e.as("x").join(e.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.sim_lo").as("lo_a"), col("x.sim_hi").as("hi_a"),
        col("y.sim_lo").as("lo_b"), col("y.sim_hi").as("hi_b"))
      .distinct()
      .withColumn("hd",
        (hamming_dist(col("lo_a"), col("lo_b")) + hamming_dist(col("hi_a"), col("hi_b")))
          .cast("bigint"))
      .filter(col("hd") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hd"))
  }

  /** Longest shared contiguous token run per candidate pair — the
    * diagnostic behind substring-level dedup (how MUCH of a near-dup pair
    * is literally the same passage, not just the same shingle set).
    *
    * Shape: token positions of each side meet in an EQUI-join keyed on
    * (doc id, token), so only genuinely shared tokens materialize; each
    * match lands on a diagonal `d = pos_a - pos_b`, where a contiguous
    * shared run is a gaps-and-islands group (consecutive `pos_a` on one
    * diagonal). The window partitions by (pair, diagonal) — thousands of
    * small sorts, never one global one — and all cost is bounded by the
    * CANDIDATE pairs (banding-bounded), never the corpus cross product.
    * Pairs sharing no token at all are absent from the output.
    *
    * LLM-pipeline extension (passage-level dup length, cf. the
    * suffix-array dedup line of work); pairs come from any candidate
    * generator ([[nearDupPairs]], [[simhashPairsBlocked]], ...). */
  /** Cross-source overlap matrix — "which crawl dumps share content":
    * for every source pair, the number of distinct word-`n`-gram hashes
    * both contain, plus the containment ratio against the smaller side
    * (integer ppm — engine-portable). The corpus reduces to its distinct
    * (source, shingle-hash) set first — one shuffle keyed on the 8-byte
    * hash — and the pair fan-out per hash is bounded by the number of
    * SOURCES (dozens), never documents, so the self-join is O(|hashes| ×
    * sources²) worst case and far less in practice. The source-level
    * rollup of [[Decontaminate]]'s document-level question. */
  def sourceOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, n: Int = 3): DataFrame = {
    val ss = docs
      .select(col(sourceCol).as("source"), tokens(col(textCol)).as("tok"))
      .select(col("source"), explode(shingles(col("tok"), n)).as("sh"))
      .select(col("source"), hash32(col("sh"), 0).as("h"))
      .distinct()
    val counts = ss.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    ss.as("x").join(ss.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(counts.select(col("source").as("source_a"), col("ns").as("na"))),
        Seq("source_a"))
      .join(broadcast(counts.select(col("source").as("source_b"), col("ns").as("nb"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        expr("n_shared * 1000000 div least(na, nb)").as("containment_ppm"))
  }

  /** SemDeDup-style semantic dedup: cluster embeddings into coarse cells
    * (the portable trained k-means from [[Ivf.buildPortable]]), then flag
    * as a duplicate every vector whose cosine to an EARLIER-id vector in
    * the SAME cell reaches `minCosine`. Returns the removed set:
    * (id, kept_by = smallest such earlier id, sim = cosine to it).
    *
    * The cells are the scale bound: the pair space is O(Σ cell²), never
    * corpus², and the self-join is co-partitioned on cell_id — exactly
    * the cluster-then-compare discipline of semantic-dedup pipelines
    * (embedding near-dup via LSH banding, [[embeddingNearDup]], is the
    * alternative when no trained index exists). The earliest-id keep
    * rule (rather than distance-to-centroid) makes the removed set a
    * pure function of the inputs — rerun-stable and oracle-checkable. */
  def semanticDupes(
      vecs: DataFrame, nCells: Int, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.GraftFunctions.cosine_sim
    val asg = Ivf.buildPortable(vecs, nCells, iters = 2, idCol = idCol,
      vecCol = vecCol).assigned
    val a = asg.select(col("cell_id"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = asg.select(col("cell_id"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b.hint("shuffle_hash"), Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cs", cosine_sim(col("va"), col("vb")))
      .filter(col("cs") >= minCosine)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("kept_by"), min_by(col("cs"), col("id_a")).as("sim"))
      .select(col("id_b").as(idCol), col("kept_by"), col("sim"))
  }

  def longestSharedSpan(
      docs: DataFrame, pairs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Only docs that appear in a candidate pair can contribute a span
    // (every downstream join is inner on a pair side), so prune BEFORE
    // tokenizing: the posexplode then costs O(pair-involved docs), not
    // O(corpus) — at scale the pair set is the small output of banding
    // while the corpus explode would dominate the whole query.
    // The pair table feeds two consumers (the id prune and the span
    // join); materialize it once so the candidate-generation pipeline
    // behind it doesn't run twice.
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val inPairs = p
      .select(explode(array(col("id_a"), col("id_b"))).as("pid")).distinct()
    val pos = docs
      .join(broadcast(inPairs), col(idCol) === col("pid"), "left_semi")
      .select(col(idCol).as("doc_id"), posexplode(tokens(col(textCol))).as(Seq("i", "w")))
    val m = p
      .join(pos.select(col("doc_id").as("id_a"), col("i").as("ia"), col("w")), Seq("id_a"))
      .join(pos.select(col("doc_id").as("id_b"), col("i").as("ib"), col("w")), Seq("id_b", "w"))
    val diag = Window.partitionBy(col("id_a"), col("id_b"), col("d")).orderBy(col("ia"))
    m.withColumn("d", col("ia") - col("ib"))
      .withColumn("g", col("ia") - row_number().over(diag))
      .groupBy(col("id_a"), col("id_b"), col("d"), col("g"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("run")).as("max_span"))
  }

  /** AllPairs/PPJoin-style prefix-filtered EXACT similarity self-join:
    * every pair of documents whose distinct word-3-shingle sets have
    * Jaccard ≥ tauNum/tauDen — no banding recall loss, no all-pairs
    * stage. The classic prefix-filter theorem: order each doc's shingles
    * by a global total order (rarest-first: ascending corpus document
    * frequency, shingle text as tie-break) and keep only the first
    * s − ⌈τ·s⌉ + 1 of its s shingles; any pair with Jaccard ≥ τ must
    * collide inside these prefixes, so the candidate join is equi on
    * prefix shingles — cost Σ prefix-multiplicity², concentrated on RARE
    * shingles (common boilerplate shingles sort to the suffix and never
    * join). A symmetric length filter (τ·sa ≤ sb ∧ τ·sb ≤ sa, exact in
    * integers) prunes size-incompatible collisions before the verify.
    *
    * vs [[nearDupPairs]] (MinHash banding, probabilistic recall) and
    * [[jaccardWithin]] (per-block all-shingles join): this is the exact-
    * recall scale path when τ is high — prefixes shrink as τ grows.
    * Equivalence to the brute-force all-pairs join is spec-proven
    * (DedupSpec). Scale: two corpus-sized shuffles (per-doc set build,
    * df count), a window sort bounded per doc, and the prefix equi-join.
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    // Shingles compared by 32-bit hash from here on: every downstream
    // shuffle/sort/set carries 8-byte keys instead of strings, and PPJoin's
    // prefix-filter recall is exact under ANY consistent global order —
    // (df, hash) is as valid an order as (df, string). ONE corpus pass
    // (tokenize → shingle → hash → per-doc set) feeds everything: what
    // gets cached is the doc-count-sized SET table, not the exploded
    // (doc, shingle) rows — the in-doc dedup rides the same groupBy
    // (array_distinct inside the array build), so the separate global
    // distinct() shuffle and the shingle-row-sized persist both disappear.
    // Downstream consumers (df counts, prefix ranking, verify) re-explode
    // the cached arrays — memory-local work, not a rescan of the corpus.
    val sets = shared(docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
      .select(col("doc_id"),
        array_distinct(shingleHashes(col("tok"), 3, 0))
          .as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("bigint").as("ns")))
    val sh = sets.select(col("doc_id"), col("ns"), explode(col("hs")).as("s"))
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // prefix length p = s − ⌈τ·s⌉ + 1, all-integer: ⌈a/b⌉ = (a+b−1) div b.
    // rn (the shingle's 1-based position in the doc's FULL df-sorted list)
    // rides along for PPJoin's positional filter below.
    val prefix = shared(sh
      .join(df, Seq("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <=
        col("ns") - expr(s"(ns * $tauNum + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("doc_id"), col("s"), col("ns"), col("rn")))
    // Positional filter (PPJoin): a collision at positions (i, j) bounds
    // the achievable overlap by 1 + min(na−i, nb−j) — every other common
    // shingle sits strictly later in BOTH sorted lists. J ≥ τ needs
    // overlap α = ⌈τ·(na+nb)/(1+τ)⌉, and the pair's FIRST common prefix
    // shingle always passes when J ≥ τ, so keep-if-ANY-collision-passes
    // preserves exact recall while discarding the (dominant, short-doc)
    // mass of single-rare-shingle coincidences. On the bench corpus this
    // cuts candidates ~19× (193k → 10k) and with them the verify cost.
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.ns") * tauNum <= col("b.ns") * tauDen &&
          col("b.ns") * tauNum <= col("a.ns") * tauDen &&
          (lit(1) + least(col("a.ns") - col("a.rn"), col("b.ns") - col("b.rn")))
            * (tauNum + tauDen) >= (col("a.ns") + col("b.ns")) * tauNum)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("hs").as("ha"),
        col("ns").as("na")).hint("shuffle_hash"), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("hs").as("hb"),
        col("ns").as("nb")).hint("shuffle_hash"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("bigint").as("ni"),
        col("na"), col("nb"))
      // threshold in exact integers: ni/(na+nb−ni) ≥ n/d ⟺ d·ni ≥ n·(na+nb−ni)
      .filter(col("ni") * tauDen >= (col("na") + col("nb") - col("ni")) * tauNum)
      .select(col("id_a"), col("id_b"), col("ni"),
        (col("na") + col("nb") - col("ni")).as("nu"),
        round(col("ni").cast("double") / (col("na") + col("nb") - col("ni")), 6)
          .as("jaccard"))
  }

  /** Directed shingle-set containment join: ordered pairs (id_a, id_b),
    * a ≠ b, with |Sa ∩ Sb| ≥ τ·|Sa| — "document A is (mostly) contained
    * in document B". The asymmetric dup test symmetric Jaccard cannot
    * express: a snippet quoted whole inside a much larger document has
    * Jaccard ≈ |Sa|/|Sb| → 0, so neither MinHash banding (q31, tuned for
    * J ≥ 0.5) nor the PPJoin size filter (q140 prunes |Sa|,|Sb| to within
    * τ of each other) can ever surface it — yet it is exactly the
    * quote-expansion / boilerplate-embedding duplication a training
    * corpus needs removed or down-weighted.
    *
    * Exact recall via the asymmetric prefix filter: order each probe
    * doc's shingles by (global df, hash) and take the first
    * p = |Sa| − ⌈τ·|Sa|⌉ + 1. If B contains none of them,
    * |Sa ∩ Sb| ≤ |Sa| − p < τ·|Sa| — so probing only A's p df-rarest
    * shingles into the full posting table finds every qualifying pair.
    * Unlike the symmetric case the indexed side cannot be prefix-pruned
    * (B's size is unbounded relative to A's), but cost still concentrates
    * on rare shingles: a corpus-frequent shingle is almost never among a
    * doc's df-rarest, so Σ prefixDf(s)·df(s) is rare×rare, never a
    * cross join. Candidates are verified with one exact set
    * intersection; the threshold is all-integer
    * (ni·tauDen ≥ na·tauNum — no float drift at the boundary). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int): DataFrame =
    // One corpus pass builds the cached doc-count-sized set table (same
    // restructure as [[prefixJaccardPairs]]): no global distinct shuffle,
    // no shingle-row-sized persist; consumers re-explode the arrays.
    containmentPairsFromSets(
      shared(shingleSets(docs, idCol, textCol)), tauNum, tauDen)

  /** [[containmentPairs]] over a PRE-BUILT (ideally persisted)
    * shingle-set table — the [[Corpus]] composition path. */
  private[graft] def containmentPairsFromSets(sets: DataFrame,
      tauNum: Int, tauDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val sh = sets.select(col("doc_id"), col("ns"), explode(col("hs")).as("s"))
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // rank EVERY doc's shingles once in the global (df, hash) order: the
    // probe prefix is a filter on rn, and the indexed side keeps its rn
    // for the asymmetric positional filter below
    val ranked = shared(sh
      .join(df, Seq("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .select(col("doc_id"), col("s"), col("ns"), col("rn")))
    // probe prefix: p = ns − ⌈τ·ns⌉ + 1 df-rarest shingles per doc
    val prefix = ranked
      .filter(col("rn") <=
        col("ns") - expr(s"(ns * $tauNum + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("doc_id").as("id_a"), col("s"), col("ns").as("na"),
        col("rn").as("ra"))
    // candidates: A-prefix shingle present anywhere in B; B must hold at
    // least ⌈τ·na⌉ shingles to possibly qualify. Asymmetric positional
    // filter: the FIRST common shingle (global order) sits in A's prefix
    // whenever containment holds, and every other common shingle lies
    // strictly later in BOTH df-sorted lists, so a collision at (ra, rb)
    // bounds overlap by 1 + min(na−ra, nb−rb); requiring that bound to
    // reach ⌈τ·na⌉ discards coincidental single-shingle collisions while
    // keeping exact recall (the first-common collision always passes).
    val cand = prefix
      .join(ranked.select(col("doc_id").as("id_b"), col("s"),
        col("ns").as("nb"), col("rn").as("rb")), Seq("s"))
      .filter(col("id_a") =!= col("id_b") &&
        col("nb") * tauDen >= col("na") * tauNum &&
        (lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")))
          * tauDen >= col("na") * tauNum)
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("hs").as("ha"),
        col("ns").as("na")).hint("shuffle_hash"), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("hs").as("hb")
        ).hint("shuffle_hash"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("na"),
        size(array_intersect(col("ha"), col("hb"))).cast("bigint").as("ni"))
      .filter(col("ni") * tauDen >= col("na") * tauNum)
      // ppm in pure integer arithmetic (div truncates identically in
      // Spark and DuckDB) — no float at the readout either
      .withColumn("containment_ppm", expr("ni * 1000000 div na"))
  }

  /** MinHash estimator calibration: for every LSH candidate pair, compare
    * the signature-agreement estimate of Jaccard (matching slots / k, an
    * unbiased estimator) against the EXACT shingle Jaccard, grouped by
    * agreement level. The sketch-accuracy audit a pipeline runs before
    * trusting banding thresholds at full scale: if `mean_exact_ppm` at a
    * given `n_match` drifts far from `est_ppm`, the signature width or
    * band shape is wrong for this corpus.
    *
    * Scale shape: identical to [[nearDupPairs]] (narrow signatures, band
    * equi-join, candidate-only rescoring) plus one bounded aggregate over
    * the candidate set — numHashes+1 output rows.
    *
    * All arithmetic is integer ppm (estimates are k/numHashes exactly;
    * exact Jaccard is an integer cross-division), so the DuckDB oracle
    * reproduces every cell bit-for-bit.
    */
  def minhashCalibration(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sigs = shared(shingleSetSigs(docs, idCol, textCol, numHashes))
    val cand = minhashCandidates(sigs.drop("hs"), numHashes, rowsPerBand)
    def side(suffix: String, id: String) = {
      val cols = Seq(col("doc_id").as(id), col("hs").as(s"h$suffix"),
        col("ns").as(s"n$suffix")) ++
        (0 until numHashes).map(i => col(s"sig$i").as(s"sig${i}$suffix"))
      sigs.select(cols: _*)
    }
    val matches = (0 until numHashes)
      .map(i => when(col(s"sig${i}a") === col(s"sig${i}b"), 1L).otherwise(0L))
      .reduce(_ + _)
    val pairs = cand
      .join(side("a", "id_a").hint("shuffle_hash"), Seq("id_a"))
      .join(side("b", "id_b").hint("shuffle_hash"), Seq("id_b"))
      .select(
        matches.as("n_match"),
        size(array_intersect(col("ha"), col("hb"))).cast("bigint").as("ni"),
        col("na"), col("nb"))
      .select(col("n_match"),
        expr("ni * 1000000 div (na + nb - ni)").as("ex_ppm"))
    pairs
      .groupBy(col("n_match"),
        (col("n_match") * (1000000L / numHashes)).as("est_ppm"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(ex_ppm) div count(1)").as("mean_exact_ppm"),
        min(col("ex_ppm")).as("min_exact_ppm"),
        max(col("ex_ppm")).as("max_exact_ppm"),
        expr("sum(abs(n_match * " + (1000000L / numHashes) +
          " - ex_ppm)) div count(1)").as("mean_abs_err_ppm"))
      .orderBy(col("n_match"))
  }

  /** Near-dup threshold sweep: how many verified candidate pairs survive
    * each Jaccard cut — the tuning table read before committing a dedup
    * threshold corpus-wide (one banding pass prices every candidate
    * threshold at once; re-running the pipeline per threshold pays the
    * corpus scan k times). Counts use integer cross-multiplication
    * (ni·10 >= union·t10), so no float comparison can disagree between
    * engines. One row out.
    */
  def thresholdSweep(docs: DataFrame, idCol: String, textCol: String,
      tenths: Seq[Int] = Seq(3, 5, 7, 8, 9)): DataFrame = {
    require(tenths.nonEmpty && tenths.forall(t => t >= 1 && t <= 10),
      "thresholds are Jaccard tenths in [1, 10]")
    val sigs = shared(shingleSetSigs(docs, idCol, textCol, 8))
    val cand = minhashCandidates(sigs.drop("hs"), 8, 2)
    val pairs = cand
      .join(sigs.select(col("doc_id").as("id_a"), col("hs").as("ha"),
        col("ns").as("na")).hint("shuffle_hash"), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("hs").as("hb"),
        col("ns").as("nb")).hint("shuffle_hash"), Seq("id_b"))
      .select(
        size(array_intersect(col("ha"), col("hb"))).cast("bigint").as("ni"),
        (col("na") + col("nb")).as("nab"))
    val aggs = count(lit(1)).as("n_candidates") +: tenths.map(t =>
      sum(when(col("ni") * 10 >= (col("nab") - col("ni")) * t, 1L)
        .otherwise(0L)).as(s"n_ge_${t}0"))
    pairs.agg(aggs.head, aggs.tail: _*)
  }

  /** Golden-record survivorship merge: per near-dup component (>= 2
    * members by construction), the merged record an entity-resolution
    * stage emits — majority vote per categorical field (deterministic
    * tie-break: smallest value), longest-text member as the content
    * survivor, additive fields summed. The step AFTER matching (q31) and
    * clustering (q38): what to actually keep.
    *
    * Scale shape: component labels join the corpus once on doc_id; each
    * field's vote is a (comp, value)-keyed count followed by a bounded
    * min_by argmax — no windows, everything map-side combinable.
    *
    * The token-count projection deliberately re-tokenizes instead of
    * reading a shared persisted set table: A/B-measured at sf0.1
    * (interleaved in one JVM, clean-cache protocol), the share-one-pass
    * variant — persist (doc_id, n_tok, hs, ns, sig0..7) once, feed both
    * the near-dup stage and the readout — ran ~30% SLOWER (median 4.2 s
    * vs 3.2 s for q198's twin): materializing array+string columns
    * through the columnar cache for the whole corpus costs more than the
    * second narrow tokenize, which fuses into the downstream aggregate
    * and reads only parquet. `Corpus.curate` shares ITS pass because
    * FOUR dedup stages consume the same sets; two consumers sit below
    * the break-even. */
  def goldenRecord(docs: DataFrame, idCol: String, textCol: String,
      voteCols: Seq[String], lenCol: String): DataFrame = {
    val comps = nearDupGroups(nearDupPairs(docs, idCol, textCol))
      .select(col("doc_id"), col("keep_id").as("comp"))
    val mem = shared(docs.select(
      Seq(col(idCol).as("doc_id"), col(lenCol).cast("bigint").as("_len"),
        size(tokens(col(textCol))).cast("bigint").as("_tok")) ++
        voteCols.map(col): _*)
      .join(comps, Seq("doc_id")))
    val base = mem.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"),
        // longest member, tie-break lowest id: minimize (-len, id)
        min_by(col("doc_id"), struct((-col("_len")).as("a"),
          col("doc_id").as("b"))).as("longest_doc_id"),
        max(col("_len")).as("max_len"),
        sum(col("_tok")).as("total_tokens"))
    val votes = voteCols.map { vc =>
      mem.groupBy(col("comp"), col(vc))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("comp"))
        // most frequent value, tie-break smallest: minimize (-count, value)
        .agg(min_by(col(vc), struct((-col("c")).as("a"), col(vc).as("b")))
          .as(vc))
    }
    votes.foldLeft(base)((acc, v) => acc.join(v, Seq("comp")))
      .orderBy(col("comp"))
  }

  /** Dedup savings accounting: per source, the token mass before dedup,
    * after exact dedup (keep the lowest doc id per canonical text), and
    * after near-dup dedup on top (keep only component representatives of
    * the MinHash+LSH similarity graph). The cost/benefit readout that
    * decides whether a 100 TB crawl re-dedup is worth the compute: saved
    * ppm per source, per stage.
    *
    * Exact-dup pairs are also near-dup pairs (identical text ⇒ identical
    * signatures ⇒ banded together at Jaccard 1.0) for docs long enough to
    * shingle, so `tokens_after_near <= tokens_after_exact` by
    * construction; sub-shingle-width docs are only ever caught by the
    * exact stage. */
  def dedupSavings(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    // toks deliberately re-tokenizes rather than sharing a persisted set
    // table with the near-dup stage — see goldenRecord's scaladoc for the
    // A/B measurement (share-one-pass ran ~30% slower at sf0.1: columnar
    // caching of array+string columns costs more than this narrow
    // projection, which fuses into the groupBys and reads only parquet).
    val toks = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      size(tokens(col(textCol))).cast("bigint").as("n_tok"),
      md5(normText(col(textCol))).as("ck"))
    val exKeep = toks.groupBy(col("ck")).agg(min(col("doc_id")).as("ex_keep"))
    val comp = nearDupGroups(nearDupPairs(docs, idCol, textCol))
    val flags = toks
      .join(exKeep, Seq("ck"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("source"), col("n_tok"),
        (col("ex_keep") === col("doc_id")).as("is_ex"),
        (coalesce(col("keep_id"), col("doc_id")) === col("doc_id")).as("is_nd"))
    flags.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens_total"),
        sum(when(col("is_ex"), col("n_tok")).otherwise(0L))
          .as("tokens_after_exact"),
        sum(when(col("is_ex") && col("is_nd"), col("n_tok")).otherwise(0L))
          .as("tokens_after_near"))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        col("tokens_after_exact"), col("tokens_after_near"),
        expr("(tokens_total - tokens_after_exact) * 1000000 div tokens_total")
          .as("saved_exact_ppm"),
        expr("(tokens_total - tokens_after_near) * 1000000 div tokens_total")
          .as("saved_near_ppm"))
      .orderBy(col("source"))
  }

  /** Merge a set of duplicated k-gram START positions into maximal token
    * spans and roll them up per doc. Two k-token intervals [p, p+k−1],
    * [q, q+k−1] (p ≤ q) overlap or touch iff q − p ≤ k, so a new span
    * starts exactly when the position gap exceeds k and each span's
    * union length is last − first + k — an exact interval union, no
    * double counting. `posDf` must be (doc_id, pos) with pos 0-based and
    * unique per doc.
    *
    * Scale shape: one shuffle on doc_id; the window and both rollups are
    * per-doc (bounded by doc length), parallel across docs. */
  private[operators] def spanCoverage(posDf: DataFrame, k: Int): DataFrame =
    spanIntervals(posDf, k)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("lp") - col("fp") + 1).as("dup_tokens"))

  /** The maximal spans themselves, as inclusive token-position intervals
    * (doc_id, fp, lp) — the unit [[exciseRepeatedSpans]] removes and
    * [[spanCoverage]] measures. */
  private[operators] def spanIntervals(posDf: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    posDf
      .withColumn("_ni",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("_isl", sum(col("_ni")).over(run))
      .groupBy(col("doc_id"), col("_isl"))
      .agg(min(col("pos")).cast("bigint").as("fp"),
        (max(col("pos")) + k - 1).cast("bigint").as("lp"))
      .select(col("doc_id"), col("fp"), col("lp"))
  }

  /** Per-document duplicated-SPAN coverage: the token-level readout of
    * exact substring deduplication (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better") — for every doc, how many tokens
    * sit inside a word-`k`-gram that also occurs in ≥ `minDocs` distinct
    * documents, merged into maximal spans. Where [[nearDupPairs]] scores
    * whole documents and [[longestSharedSpan]] scores one pair, this is
    * the corpus-internal boilerplate meter: the mass you'd excise with
    * span-level (not doc-level) dedup, per doc.
    *
    * Semantics: a k-gram is duplicated iff it appears in ≥ minDocs
    * DISTINCT docs (within-doc repetition is q241's job); every start
    * position of a duplicated gram is covered; positions merge into
    * spans via the exact interval union of [[spanCoverage]]. All docs
    * appear in the output (zero rows coalesced), `dup_ppm` is integer
    * parts-per-million — bit-identical in any engine.
    *
    * Scale shape: one posexplode (linear in tokens), a distinct +
    * count on (gram, doc) — map-combined, keyed on the gram hash — and
    * one semi-join of positions against the duplicated-gram table (equi
    * on the hash; postings × 1, never postings²). The gram frame is
    * persisted across its two consumers so the corpus is tokenized and
    * md5-hashed once (longs-only frame — cheap to cache, unlike the
    * array/string tables goldenRecord's A/B rejected). */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    val (toks, dupPos) = repeatedGramPositions(docs, idCol, textCol, k, minDocs)
    val lens = toks.select(col("doc_id"), size(col("tok")).cast("bigint").as("n_tokens"))
    lens.join(spanCoverage(dupPos, k), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ppm",
        when(col("n_tokens") > 0,
          expr("dup_tokens * 1000000 div n_tokens")).otherwise(lit(0L)))
  }

  /** Shared front half of [[repeatedSpans]]/[[exciseRepeatedSpans]]:
    * the token arrays and the start positions of every k-gram occurring
    * in ≥ minDocs distinct docs. The gram frame (longs only) is persisted
    * across its two consumers (the ≥minDocs aggregate and the position
    * semi-join) so the corpus tokenizes and hashes once — but the persist
    * is SCOPED to this call: the duplicated positions are materialized
    * eagerly (localCheckpoint — one job, the same work the caller's sink
    * would have triggered) and the gram block is freed before returning,
    * so a long-lived multi-query JVM never carries the corpus-sized gram
    * cache past the call (same free() discipline as
    * [[nearDupGroupsCounted]]). The residual persisted block is the
    * checkpointed dupPos — duplicated-coverage-sized, typically a small
    * fraction of the gram frame — reclaimed by Bench/Verify's
    * between-query cache-drop. */
  private def repeatedGramPositions(docs: DataFrame, idCol: String,
      textCol: String, k: Int, minDocs: Int,
      exemptOwner: Boolean = false): (DataFrame, DataFrame) = {
    require(k >= 2 && minDocs >= 2)
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tok"))
    val sc = docs.sparkSession.sparkContext
    val preIds = sc.getPersistentRDDs.keySet.toSet
    // lazy localCheckpoint, not persist: longs-only rows skip the
    // columnar cache and keep the AQE-coalesced partitioning (see
    // [[shared]]'s round-13 scaladoc); freed below by RDD id — the
    // Dataset-level unpersist only clears the CacheManager entry
    val grams = toks
      .select(col("doc_id"), posexplode(shingles(col("tok"), k)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), hash32(col("s"), 0).as("g"))
      .localCheckpoint(eager = false)
    val gramIds = sc.getPersistentRDDs.keySet.toSet.diff(preIds)
    val dupG = grams.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("_nd"), min(col("doc_id")).as("_own"))
      .filter(col("_nd") >= minDocs)
    // keep-one ownership at the GRAM grain: the lowest doc id holding a
    // duplicated gram owns it, and the owner's occurrences are exempt —
    // deterministic (min over the same distinct doc set the ≥minDocs
    // count uses) and one aggregate wider than the remove-all path.
    val hits =
      if (exemptOwner)
        grams.join(dupG.select(col("g"), col("_own")), Seq("g"))
          .filter(col("doc_id") =!= col("_own"))
          .select(col("doc_id"), col("pos"))
      else
        grams.join(dupG.select(col("g")), Seq("g"), "left_semi")
          .select(col("doc_id"), col("pos"))
    val dupPos = hits.localCheckpoint(eager = true)
    val live = sc.getPersistentRDDs
    gramIds.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    (toks, dupPos)
  }

  /** Span EXCISION: remove every duplicated span [[repeatedSpans]] reports
    * and re-assemble the surviving tokens — the transform step of exact
    * substring dedup after Lee et al. Returns one row per doc (including
    * untouched and fully-excised ones):
    * (doc_id, n_tokens, n_kept, cleaned_text).
    *
    * Two policies, selected by `keepOne`:
    *
    *  - `keepOne = false` (default): ALL occurrences of a duplicated
    *    span are excised, including the last one — no canonical copy
    *    survives. The REMOVE-ALL form is the one whose excised mass is
    *    exactly what [[repeatedSpans]] reports, so the two operators
    *    reconcile row for row. (This diverges from Lee et al.'s
    *    ExactSubstr, which keeps one occurrence so the corpus retains
    *    the content.)
    *  - `keepOne = true`: Lee-et-al-style canonical-copy semantics at
    *    the GRAM grain — each duplicated k-gram is owned by the lowest
    *    doc id holding it, and the owner's occurrences survive. Owner
    *    election is one extra min aggregate over the same distinct
    *    (doc, gram) set the ≥ minDocs count reads (deterministic: ids
    *    are unique, no ties). A doc that is the minimum holder of every
    *    gram in a span keeps the span whole; mixed-ownership overlaps
    *    excise only the non-owned gram positions.
    *
    * Scale shape: the front half is [[repeatedGramPositions]]; tokens
    * then anti-join the span intervals equi on (doc_id, position-bucket)
    * — spans explode to the k-wide buckets they overlap, so a token
    * meets only the spans near it and fanout is O(tokens + span
    * coverage) per doc. (The previous doc_id-only equi key left the
    * range test as a residual: a boilerplate-heavy doc with s disjoint
    * spans and L tokens evaluated L·s predicates — quadratic on
    * pathological docs; DedupSpec's 500-repetition fixture gates the
    * bucketed form.) Reassembly is one per-doc sort_array over the
    * survivors (bounded by doc length). Deterministic: struct sort on
    * (position, token). */
  def exciseRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2, keepOne: Boolean = false): DataFrame = {
    val (toks, dupPos) =
      repeatedGramPositions(docs, idCol, textCol, k, minDocs, exemptOwner = keepOne)
    exciseAtPositions(toks, dupPos, k)
  }

  /** Shared back half of the span excisers ([[exciseRepeatedSpans]],
    * [[Decontaminate.exciseContaminatedSpans]]): merge the width-`k`
    * gram start positions in `posDf` (doc_id, pos) into maximal spans,
    * remove every covered token from `toks` (doc_id, tok), and
    * re-assemble the survivors. Output: (doc_id, n_tokens, n_kept,
    * cleaned_text), one row per doc including untouched and
    * fully-excised ones. */
  private[operators] def exciseAtPositions(toks: DataFrame, posDf: DataFrame,
      k: Int): DataFrame = {
    // explode each span to its overlapped position buckets (width k, the
    // gram granularity): bucket count per span = coverage/k + O(1), and a
    // position p can only fall in a span whose bucket range contains
    // p div k — the bucket equi-key is exact, the range test only
    // discriminates within the bucket
    val spans = spanIntervals(posDf, k)
      .select(col("doc_id").as("_sd"), col("fp"), col("lp"),
        explode(sequence(expr(s"fp div $k"), expr(s"lp div $k"))).as("_sb"))
    val words = toks.select(col("doc_id"),
      posexplode(col("tok")).as(Seq("p", "w")))
    val kept = words
      .withColumn("_pb", expr(s"cast(p as bigint) div $k"))
      .join(spans,
        col("doc_id") === col("_sd") && col("_pb") === col("_sb") &&
          col("p") >= col("fp") && col("p") <= col("lp"), "left_anti")
      .drop("_pb")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("p"), col("w")))),
          x => x.getField("w")), " ").as("cleaned_text"))
    toks.select(col("doc_id"), size(col("tok")).cast("bigint").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }
}
