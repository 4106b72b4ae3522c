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
    val bcast = spark.sparkContext.broadcast(bf)

    // the bloom probe keys ONLY on the (always-bigint) hash column, so doc
    // ids of any type (string, uuid, ...) pass through untouched
    val candidates = trainH.filter((r: org.apache.spark.sql.Row) =>
      bcast.value.mightContainLong(r.getAs[Long]("h")))

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
}
