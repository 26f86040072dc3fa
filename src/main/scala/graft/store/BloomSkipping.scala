package graft.store

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sidecar file skipping for LakeTable point lookups — the
  * Delta-style bloom-filter-index analog (Iceberg gets the same effect
  * from parquet-level bloom filters; a manifest can only carry min/max,
  * so on an append-churned table where every entry spans the full key
  * range, range stats prune NOTHING for a point lookup).
  *
  * Design: each data dir with `write.bloom.columns` configured carries
  * one small sidecar file per (partition leaf, column) under
  * `<location>/blooms/<dir>/...` — sidecars stay OUT of the manifest
  * (a serialized filter for a million keys is ~1 MB; inlining it would
  * bloat every snapshot), and read planning loads them ONLY for the
  * entries that survived min/max pruning and ONLY for the columns the
  * predicate actually probes. At 100 TB a PK lookup opens a few KB–MB
  * of sidecars instead of scanning every overlapping data file.
  *
  * Soundness: pruning drops an entry only when a TOP-LEVEL AND conjunct
  * of the predicate is an equality/IN test on a bloom-indexed column
  * and the filter reports every candidate key ABSENT — no false
  * negatives by the bloom contract, so a dropped entry provably holds
  * no matching row. Missing sidecars, unsupported types, or any parse
  * uncertainty keep the entry (conservative, like [[StatsPruning]]).
  *
  * Key normalization matches [[graft.expressions.BloomBuildAgg]]:
  * integrals widen to long, strings take UTF-8 bytes. Value-preserving
  * casts the analyzer inserted are stripped on both operand sides; any
  * other cast blocks the probe.
  */
object BloomSkipping {

  /** Column types a bloom sidecar can index (build + probe agree). */
  def supportedType(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | _: StringType => true
    case _ => false
  }

  /** Probe key in BloomBuildAgg's normalization. */
  sealed trait Key
  final case class LongKey(v: Long) extends Key
  final case class BytesKey(v: Array[Byte]) extends Key

  def mightContain(bf: BloomFilter, k: Key): Boolean = k match {
    case LongKey(v) => bf.mightContainLong(v)
    case BytesKey(v) => bf.mightContainBinary(v)
  }

  /** Normalize an EXTERNAL-typed value (collect() output) to a probe
    * key — shared with the MoR delete-reach refinement, which probes
    * collected delete-file key values against data-entry sidecars. */
  private[store] def keyOf(raw: Any): Option[Key] = raw match {
    case null => None
    case n: Byte => Some(LongKey(n.toLong))
    case n: Short => Some(LongKey(n.toLong))
    case n: Int => Some(LongKey(n.toLong))
    case n: Long => Some(LongKey(n))
    case s: UTF8String => Some(BytesKey(s.getBytes))
    case s: String => Some(BytesKey(s.getBytes(StandardCharsets.UTF_8)))
    case _ => None
  }

  private def litKey(e: Expression): Option[Key] = StatsPruning.strip(e) match {
    case l: Literal => keyOf(l.value)
    case _ => None
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Top-level AND conjuncts that are bloom-probeable equality tests,
    * as (column, candidate keys): an entry is dead on such a conjunct
    * iff EVERY candidate key is absent from its filter. An IN list with
    * any non-normalizable element contributes nothing (that element
    * might match, so the conjunct proves nothing). */
  def candidates(cond: Expression, schema: StructType): Seq[(String, Seq[Key])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def colOf(e: Expression): Option[String] =
      StatsPruning.attrName(e).filter(n =>
        schema.fields.exists(f => f.name == n && supportedType(f.dataType)))
    def eq(a: Expression, b: Expression): Option[(String, Seq[Key])] =
      colOf(a).flatMap(n => litKey(b).map(k => n -> Seq(k)))
        .orElse(colOf(b).flatMap(n => litKey(a).map(k => n -> Seq(k))))
    conjuncts(cond).flatMap {
      case EqualTo(a, b) => eq(a, b)
      case EqualNullSafe(a, b) => eq(a, b)
      case In(a, vs) if vs.nonEmpty =>
        for { n <- colOf(a); ks <- sequence(vs.map(litKey)) } yield n -> ks
      case InSet(a, vs) if vs.nonEmpty =>
        for { n <- colOf(a); ks <- sequence(vs.toSeq.map(keyOf)) } yield n -> ks
      case _ => None
    }
  }
}
