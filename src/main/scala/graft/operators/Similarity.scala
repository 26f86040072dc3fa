package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `embeddings(vec_id,
  * embedding array<float>, label)` table.
  *
  *  - `bruteKnn` is the exact baseline: broadcast the (small) query set,
  *    one map-side cosine per (query, corpus) pair, per-query top-k via
  *    window. Corpus is scanned once, never shuffled — at 100 TB the cost
  *    is a single pass, which is the right exact-kNN plan when queries
  *    fit in a broadcast.
  *  - `lshKnn` is the scale path: deterministic random-hyperplane buckets
  *    computed map-side on both sides, equi-join on bucket key, cosine
  *    only within colliding buckets. Probing radius is the number of
  *    planes: fewer planes ⇒ bigger buckets ⇒ higher recall, more work.
  *  - `labelCentroids` is the IVF building block: per-label mean vector
  *    (coarse quantizer trains the same way at scale: agg, not collect).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus` need columns (vec_id, embedding). */
  def bruteKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** ANN top-k: only corpus vectors in the query's LSH bucket are scored.
    * Same contract as bruteKnn minus recall; identical algorithm on the
    * oracle side makes it exactly reproducible. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 6): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Per-label centroid (mean vector), returned with its L2 norm and
    * member count. Aggregates element-wise sums, not collect(). */
  def labelCentroids(embeddings: DataFrame, dim: Int): DataFrame = {
    val byDim = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(
        sqrt(sum(col("sx") / col("n") * (col("sx") / col("n")))).as("centroid_norm"),
        max("n").as("n_vectors"))
    byDim.select(col("label"), round(col("centroid_norm"), 4).as("centroid_norm"),
      col("n_vectors"))
  }
}
