package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector primitives over `array<float>` embedding columns, as pure
  * higher-order-function expressions (zip_with / aggregate / transform).
  *
  * Scale notes: all per-row, map-side, codegen'd — a cosine between two
  * 64-dim vectors is ~130 fused arithmetic ops, no object churn. The ANN
  * paths (Similarity.scala) shuffle only compact bucket keys + vector
  * payloads, never materialize an n² matrix.
  *
  * Accumulation is sequential left-to-right in both Spark's `aggregate`
  * and the oracle engine's list functions, so doubles agree bit-for-bit
  * per row; cross-row aggregates still get rounded before compare.
  */
object VectorFunctions {

  /** Cast a float vector to double for drift-free arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Σ aᵢ·bᵢ — native fused pass (`graft.expressions.DotProduct`,
    * registered by GraftExtensions). The HOF composition
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is the reference
    * semantics; HOF lambdas are CodegenFallback (interpreted per
    * element), the native loop is codegen'd, results bit-identical. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Same kernel — float and double element types both accepted (kept
    * as a named entry point for the pre-normalized unit-vector verify
    * hot path). */
  def dotDouble(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), _ + _))

  /** Cosine similarity — native ONE-pass kernel
    * (`graft.expressions.CosineSim`): the composed
    * `dot(a,b)/(norm2(a)*norm2(b))` walks the vectors three times
    * through interpreted lambdas; the fused loop accumulates all three
    * sums per element in the same order, so values are bit-identical
    * and ~an order of magnitude cheaper per scored pair. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `i`, in [-1, 1) — pure integer modular arithmetic so any
    * SQL engine reproduces it exactly (no RNG, no float seed drift). */
  def hyperplaneComponent(p: Int, i: Column): Column = {
    val h = (lit(p.toLong * 131071L) + i.cast(LongType) * 524287L) * 2654435761L % 1000003L
    h.cast(DoubleType) / 1000003.0 * 2.0 - 1.0
  }

  /** Sign bit of v · hyperplane(p): the random-hyperplane LSH bit. */
  def hyperplaneBit(v: Column, p: Int): Column = {
    val proj = aggregate(
      zip_with(asDouble(v), sequence(lit(0), size(v) - 1),
        (x, i) => x * hyperplaneComponent(p, i)),
      lit(0.0), _ + _)
    when(proj >= 0, lit("1")).otherwise(lit("0"))
  }

  /** Random-hyperplane LSH bucket key: concatenated sign bits of
    * `planes` projections. Cosine-similar vectors collide with high
    * probability; the ANN search joins on this key. */
  def lshBucket(v: Column, planes: Int): Column = lshBucketFrom(v, planes, 0)

  /** Bucket key over planes [firstPlane, firstPlane + planes): disjoint
    * plane ranges give INDEPENDENT hash tables for multi-table LSH (a
    * vector pair missed by one table collides in another — recall grows
    * with the table count while each table stays selective).
    *
    * Native ONE-pass kernel (`graft.expressions.LshBucket`): the
    * composed form `concat(hyperplaneBit(v, p)*)` runs one interpreted
    * HOF aggregate per plane; the fused loop projects all planes while
    * walking the vector once, emitting identical bucket strings. */
  def lshBucketFrom(v: Column, planes: Int, firstPlane: Int): Column =
    call_function("graft_lsh_bucket", v, lit(planes), lit(firstPlane))

  /** Exact bounded top-k aggregate (`graft.expressions.TopKByScore`,
    * registered by GraftExtensions): k best (score desc, id asc) pairs
    * per group, partial-aggregated map-side. Requires a GraftSession. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    call_function("graft_top_k", score, id, lit(k))

  /** Multi-probe sequence for a bucket key: the exact bucket plus every
    * bucket at Hamming distance 1 (one sign bit flipped). A vector near
    * a hyperplane lands on either side with ~equal probability, so
    * probing the adjacent buckets recovers most of the recall lost to
    * boundary effects at the cost of `planes`+1 lookups instead of one.
    * `bucketCol` should be a MATERIALIZED column — it is referenced
    * 3×planes+1 times below. */
  def probeBuckets(bucketCol: Column, planes: Int): Column =
    array(bucketCol +: (0 until planes).map { i =>
      concat(
        substring(bucketCol, 1, i),
        when(substring(bucketCol, i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(bucketCol, i + 2, planes - i - 1))
    }: _*)
}
