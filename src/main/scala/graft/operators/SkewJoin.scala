package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic key-salting for skew-heavy equi-joins.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most skew at
  * runtime, but only for sort-merge joins it can observe — it cannot
  * help when the hot key feeds a downstream keyed aggregation, a
  * stream-static join, or a storage layout that must co-partition. This
  * is the manual tool for those cases.
  *
  * Shape: left rows get `salt = pmod(hash(saltFrom), buckets)` — salted
  * by a HIGH-CARDINALITY column (a row id), so one hot join key spreads
  * uniformly over `buckets` shuffle partitions. The right (dimension)
  * side is exploded `buckets`× so every (key, salt) pair still matches.
  * The join result is EXACTLY the plain inner equi-join's; only the
  * shuffle key changes, from `key` to `(key, salt)`. Cost: buckets× the
  * dim-side shuffle volume — keep the dim side the small one.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFrom: String,
      buckets: Int = 16): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val salted = left.withColumn("__salt", pmod(hash(col(saltFrom)), lit(buckets)))
    val fanned = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(fanned, salted(leftKey) === fanned(rightKey) &&
        salted("__salt") === fanned("__salt"))
      .drop("__salt")
  }
}
