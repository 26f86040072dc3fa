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

  /** Full per-label centroid vectors as `array<double>` (components
    * rounded to 6dp so an external engine reproduces them despite
    * cross-row double-sum ordering). The IVF coarse quantizer: tiny
    * (nlist rows), broadcastable at any corpus size. */
  def labelCentroidVectors(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("c")))),
        s => round(s("c"), 6)).as("centroid"))

  /** IVF ANN top-k: the scale path beyond single-probe LSH.
    *
    *  1. coarse quantizer = per-label centroids (the labels are the
    *     trained cluster ids; at scale k-means training is the same
    *     agg loop);
    *  2. every corpus vector is assigned map-side to its nearest
    *     centroid cell (broadcast nlist×dim table, argmax per row —
    *     one corpus pass, no shuffle of vectors);
    *  3. each query probes its `nprobe` nearest cells, and exact cosine
    *     runs only inside probed cells — recall/cost tunable via nprobe.
    */
  def ivfKnn(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nprobe: Int = 3): DataFrame = {
    val cents = labelCentroidVectors(corpus)
    val byCos = (idCol: String) =>
      Window.partitionBy(idCol).orderBy(desc("cos_c"), col("label"))

    val assigned = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col("cv"), col("centroid")))
      .withColumn("rn", row_number().over(byCos("neighbor_id")))
      .filter(col("rn") === 1)
      .select(col("label").as("cell"), col("neighbor_id"), col("cv"))

    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", cosine(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(byCos("query_id")))
      .filter(col("rn") <= nprobe)
      .select(col("label").as("cell"), col("query_id"), col("qv"))

    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
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
