package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication for training-data pipelines, at lake scale.
  *
  * Pipeline shapes (all operate on a `documents(doc_id, text, ...)` table):
  *
  *  - exact:   fingerprint → groupBy(fingerprint) → keep min doc_id.
  *             One shuffle on a 32-byte key; at 100 TB this is the cheap
  *             first pass that typically removes the bulk of duplicates.
  *  - minhash+LSH: per-row signature (map-side only) → explode band keys →
  *             self-join on band key → exact Jaccard verify on candidates.
  *             The self-join shuffles only (band_key, doc_id, tokens) —
  *             never the full n² pair matrix; bucket sizes are bounded by
  *             band width, and a `maxBucket` guard drops degenerate
  *             buckets (all-identical boilerplate) the way production
  *             dedup jobs do.
  *  - simhash: 16-bit signature per row; near-dup = hamming distance ≤ k
  *             within a bucket (signature itself is the bucket key for
  *             distance 0; rotate-masked keys would extend to k>0 at scale).
  */
object Dedup {

  /** Exact dedup groups: one row per fingerprint with the surviving
    * (minimum) doc id and the group size. */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", md5(normalizeAggressive(col(textCol))))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_docs"))

  /** Surviving rows after exact dedup (keep lowest doc_id per fingerprint). */
  def exactDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fp").orderBy(col("doc_id"))
    docs
      .withColumn("fp", md5(normalizeAggressive(col(textCol))))
      .withColumn("__row", row_number().over(w))
      .filter(col("__row") === 1)
      .drop("__row", "fp")
  }

  /** Per-doc minhash signature (k hashes over word n-gram shingles). */
  def minhashSignatures(
      docs: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      textCol: String = "text"): DataFrame =
    docs
      .filter(size(tokens(col(textCol))) >= shingleSize)
      .withColumn("sig", minhashSignature(wordShingles(col(textCol), shingleSize), k))

  /** LSH candidate pairs (doc_a < doc_b) that share at least one band,
    * verified with exact token-set Jaccard ≥ `threshold`.
    *
    * `maxBucket` drops pathological buckets (boilerplate shared by
    * thousands of docs) whose pair expansion would be quadratic. */
  def lshNearDuplicates(
      docs: DataFrame,
      shingleSize: Int = 3,
      k: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val sigs = minhashSignatures(docs, shingleSize, k, textCol)
      .withColumn("band", explode(lshBands(col("sig"), bands, k / bands)))
      .select(col("band"), col("doc_id"), array_distinct(tokens(col(textCol))).as("toks"))

    val pruned = sigs
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    val a = pruned.select(col("band"), col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = pruned.select(col("band"), col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "toks_a", "toks_b")
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 16-bit simhash per document. */
  def simhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash", simhash16(col(textCol)))

  /** n-gram Jaccard near-duplicates within a blocking key (e.g. source):
    * exact pairwise Jaccard restricted to same-block pairs — the
    * non-probabilistic cousin of LSH for modest block sizes. */
  def blockedJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      threshold: Double,
      textCol: String = "text"): DataFrame = {
    val t = docs.select(col(blockCol).as("blk"), col("doc_id"),
      array_distinct(tokens(col(textCol))).as("toks"))
    val a = t.select(col("blk"), col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = t.select(col("blk"), col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
