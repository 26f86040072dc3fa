package graft.store

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-level min/max predicate pruning for LakeTable — the
  * metrics-based file skipping Iceberg performs from its manifest
  * metrics, evaluated here against per-entry column ranges.
  *
  * Strictly CONSERVATIVE: an entry is dropped only when the recorded
  * ranges PROVE no row can satisfy the predicate. Unsupported
  * expressions, missing stats, or type mismatches keep the entry — the
  * row-level filter still runs on everything read, so pruning can only
  * remove IO, never rows.
  */
object StatsPruning {

  /** Types whose parquet footer stats we record and can compare. */
  def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _: StringType => true
    case _ => false
  }

  /** Parquet footer value → comparable (BigDecimal | String). */
  def fromParquet(v: AnyRef, dt: DataType): Option[Any] = (v, dt) match {
    case (n: java.lang.Number, ByteType | ShortType | IntegerType | LongType) =>
      Some(BigDecimal(n.longValue()))
    case (n: java.lang.Number, FloatType | DoubleType) =>
      val d = n.doubleValue()
      if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
    case (b: org.apache.parquet.io.api.Binary, _: StringType) =>
      Some(b.toStringUsingUTF8)
    case _ => None
  }

  def lt(dt: DataType, a: Any, b: Any): Boolean = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x < y
    case (x: String, y: String) => x < y
    case _ => false
  }

  /** ASCII-only guard for string ordering: Java's String.compareTo
    * (UTF-16 units) and Spark's UTF8String binary order agree on ASCII
    * but can DIVERGE beyond the BMP — pruning on non-ASCII bounds could
    * drop matching entries, so those columns simply aren't pruned. */
  private def asciiOnly(s: String): Option[String] =
    if (s.forall(_ < 0x80)) Some(s) else None

  /** Stored manifest string → comparable, by column type. */
  private def parseStat(s: String, dt: DataType): Option[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
    case _: StringType => asciiOnly(s)
    case _ => None
  }

  private def literalValue(l: Literal): Option[Any] = l.value match {
    case null => None
    case n: Byte => Some(BigDecimal(n.toLong))
    case n: Short => Some(BigDecimal(n.toLong))
    case n: Int => Some(BigDecimal(n.toLong))
    case n: Long => Some(BigDecimal(n))
    case n: Float if !n.isNaN && !n.isInfinite => Some(BigDecimal(n.toDouble))
    case n: Double if !n.isNaN && !n.isInfinite => Some(BigDecimal(n))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
    case s: UTF8String => asciiOnly(s.toString)
    case s: String => asciiOnly(s)
    case _ => None
  }

  /** Catalyst-internal value (InSet element) → comparable. */
  private def internalValue(raw: Any): Option[Any] = raw match {
    case null => None
    case u: UTF8String => asciiOnly(u.toString)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
    case other => toComparable(other)
  }

  /** true ⇔ every value of `from` maps to EXACTLY the same numeric value
    * under Cast to `to` — the only condition under which dropping the
    * cast keeps range pruning sound. Deliberately narrower than
    * Cast.canUpCast: int→float and long→float/double are "up" casts but
    * round values past the mantissa, so a stripped predicate could prune
    * an entry whose rows match after rounding. Decimal targets delegate
    * to canUpCast (integral/decimal → wider decimal is exact). */
  private def valuePreserving(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
    case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case (f @ (ByteType | ShortType | IntegerType | LongType), d: DecimalType) =>
      Cast.canUpCast(f, d)
    case (f: DecimalType, d: DecimalType) => Cast.canUpCast(f, d)
    case _ => false
  }

  /** Strip only provably value-preserving widening casts (monotone and
    * exact, so range comparison via BigDecimal is unchanged). Any other
    * cast — narrowing, truncating, or precision-losing like long→double —
    * blocks pruning on that operand: attrName/litVal see the Cast node,
    * match nothing, and the entry is conservatively kept. */
  private[store] def strip(e: Expression): Expression = e match {
    case c: Cast if valuePreserving(c.child.dataType, c.dataType) => strip(c.child)
    case other => other
  }

  private[store] def attrName(e: Expression): Option[String] = strip(e) match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def litVal(e: Expression): Option[Any] = strip(e) match {
    case l: Literal => literalValue(l)
    case _ => None
  }

  /** Range of column `name` in this entry, if recorded and parseable. */
  private def range(
      stats: Map[String, (String, String)],
      schema: StructType,
      name: String): Option[(Any, Any)] =
    for {
      (mnS, mxS) <- stats.get(name)
      f <- schema.fields.find(_.name == name)
      mn <- parseStat(mnS, f.dataType)
      mx <- parseStat(mxS, f.dataType)
    } yield (mn, mx)

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** true ⇔ the ranges prove `e` matches no row of the entry. */
  private def cannotMatch(
      stats: Map[String, (String, String)],
      schema: StructType,
      e: Expression): Boolean = {

    // (attr op literal) in either operand order; None when not that shape
    def pair(x: Expression, y: Expression): Option[(String, Any)] =
      for { n <- attrName(x); v <- litVal(y) } yield (n, v)

    def outside(p: Option[(String, Any)], op: (Int, Int) => Boolean): Boolean =
      p.exists { case (n, v) =>
        range(stats, schema, n).exists { case (lo, hi) =>
          (cmp(lo, v), cmp(hi, v)) match {
            case (Some(cl), Some(ch)) => op(cl, ch)
            case _ => false
          }
        }
      }

    val loGE: (Int, Int) => Boolean = (cl, _) => cl >= 0 // min >= v
    val loGT: (Int, Int) => Boolean = (cl, _) => cl > 0
    val hiLE: (Int, Int) => Boolean = (_, ch) => ch <= 0 // max <= v
    val hiLT: (Int, Int) => Boolean = (_, ch) => ch < 0
    val eqOut: (Int, Int) => Boolean = (cl, ch) => cl > 0 || ch < 0

    e match {
      case And(l, r) =>
        cannotMatch(stats, schema, l) || cannotMatch(stats, schema, r)
      case Or(l, r) =>
        cannotMatch(stats, schema, l) && cannotMatch(stats, schema, r)
      case EqualTo(a, b) =>
        outside(pair(a, b), eqOut) || outside(pair(b, a), eqOut)
      case EqualNullSafe(a, b) =>
        outside(pair(a, b), eqOut) || outside(pair(b, a), eqOut)
      case GreaterThan(a, b) => // attr > v dead iff max <= v; v > attr ⇔ attr < v
        outside(pair(a, b), hiLE) || outside(pair(b, a), loGE)
      case GreaterThanOrEqual(a, b) =>
        outside(pair(a, b), hiLT) || outside(pair(b, a), loGT)
      case LessThan(a, b) =>
        outside(pair(a, b), loGE) || outside(pair(b, a), hiLE)
      case LessThanOrEqual(a, b) =>
        outside(pair(a, b), loGT) || outside(pair(b, a), hiLT)
      case In(a, vs) if vs.nonEmpty =>
        vs.forall(v => outside(pair(a, v), eqOut))
      case InSet(a, vs) if vs.nonEmpty =>
        // InSet carries INTERNAL values (UTF8String for strings, boxed
        // numbers, Decimal) — convert directly; Literal.apply would
        // throw on internal types rather than fail conservatively
        attrName(a).exists { n =>
          vs.forall { raw =>
            internalValue(raw).exists(v =>
              range(stats, schema, n).exists { case (lo, hi) =>
                (cmp(lo, v), cmp(hi, v)) match {
                  case (Some(cl), Some(ch)) => eqOut(cl, ch)
                  case _ => false
                }
              })
          }
        }
      case _ => false
    }
  }

  /** Driver-side value → comparable, for source-batch key ranges. */
  def toComparable(v: Any): Option[Any] = v match {
    case null => None
    case n: Byte => Some(BigDecimal(n.toLong))
    case n: Short => Some(BigDecimal(n.toLong))
    case n: Int => Some(BigDecimal(n.toLong))
    case n: Long => Some(BigDecimal(n))
    case n: Float if !n.isNaN && !n.isInfinite => Some(BigDecimal(n.toDouble))
    case n: Double if !n.isNaN && !n.isInfinite => Some(BigDecimal(n))
    case s: String => asciiOnly(s)
    case _ => None
  }

  /** Disjointness of two STORED stat ranges (both string-encoded, as in
    * manifest entries) — used to prove a delete file cannot touch a data
    * entry. False (may overlap) when either side fails to parse. */
  def rangesDisjointStr(
      dt: DataType, aMnS: String, aMxS: String, bMnS: String, bMxS: String): Boolean =
    (for {
      amn <- parseStat(aMnS, dt)
      amx <- parseStat(aMxS, dt)
      bmn <- parseStat(bMnS, dt)
      bmx <- parseStat(bMxS, dt)
      cHiLo <- cmp(amx, bmn)
      cLoHi <- cmp(amn, bmx)
    } yield cHiLo < 0 || cLoHi > 0).getOrElse(false)

  /** true when the entry range [mnS, mxS] (manifest strings of type
    * `dt`) and the batch range [lo, hi] PROVABLY don't overlap —
    * conservative: any parse/compare failure reports overlap. */
  def rangesDisjoint(dt: DataType, mnS: String, mxS: String, lo: Any, hi: Any): Boolean =
    (for {
      emn <- parseStat(mnS, dt)
      emx <- parseStat(mxS, dt)
      slo <- toComparable(lo)
      shi <- toComparable(hi)
      cHiLo <- cmp(emx, slo)
      cLoHi <- cmp(emn, shi)
    } yield cHiLo < 0 || cLoHi > 0).getOrElse(false)

  /** Conservative gate used by LakeTable.readWhere. */
  def mayMatch(
      stats: Map[String, (String, String)],
      schema: StructType,
      cond: Expression): Boolean =
    stats.isEmpty || !cannotMatch(stats, schema, cond)
}
