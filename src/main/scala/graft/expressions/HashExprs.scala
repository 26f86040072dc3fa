package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-element hashing kernels for the dedup staging columns.
  *
  * The composed forms — `transform(arr, s => conv(substring(md5(s), 1,
  * n), 16, 10))` and the 16 per-bit `aggregate` votes of simhash — run
  * interpreted lambdas around codegen'd crypto: every element pays HOF
  * dispatch, string slicing, and a decimal round-trip (conv emits a
  * STRING that is then cast). These kernels do the md5 once per element
  * and parse the prefix directly, emitting identical values (pure
  * integer math — no floating-point order concerns at all).
  */
object HashKernels {
  // One MessageDigest + 16-byte output buffer per thread, reused across
  // every hash call: the previous DigestUtils.md5Hex path allocated a
  // fresh digest, a 16-byte result array, a 32-char hex string, and a
  // prefix substring PER SHINGLE — at sf0.1 that allocation rate put
  // the shingle-heavy queries (d18/d19/d20) near a 18% GC share of
  // task time. Values are bit-identical: the first nHex hex chars of
  // the digest are exactly its leading 4·nHex bits.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val outLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First `nHex` hex chars of md5(bytes) as an unsigned long value —
    * exactly `conv(substring(md5(s), 1, nHex), 16, 10)` for nHex ≤ 15. */
  def md5PrefixLong(bytes: Array[Byte], nHex: Int): Long =
    md5PrefixLong(bytes, bytes.length, nHex)

  /** Same, over `bytes[0, len)` — lets callers reuse a scratch buffer. */
  def md5PrefixLong(bytes: Array[Byte], len: Int, nHex: Int): Long = {
    // nHex = 16 would shift into the sign bit and silently diverge from
    // the documented conv(substring(md5,1,nHex),16,10) contract (the
    // replaced Long.parseLong path threw instead) — fail loudly
    require(nHex <= 15, s"md5PrefixLong supports nHex <= 15, got $nHex")
    val d = mdLocal.get()
    d.update(bytes, 0, len)
    val out = outLocal.get()
    d.digest(out, 0, 16) // resets the digest for the next call
    var acc = 0L
    var i = 0
    while (i < nHex) {
      val b = out(i >> 1) & 0xff
      acc = (acc << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    acc
  }

  /** First 8 digest bytes of md5(prefix ++ bytes) as a big-endian long
    * — the numeric form of `substring(md5(concat(prefix, s)), 1, 16)`;
    * UNSIGNED long order equals the hex string's lexicographic order.
    * Two-step update: no concatenation buffer. */
  def seededMd5Prefix64(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val d = mdLocal.get()
    d.update(prefix, 0, prefix.length)
    d.update(bytes, 0, bytes.length)
    val out = outLocal.get()
    d.digest(out, 0, 16)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (out(i) & 0xffL); i += 1 }
    acc
  }

  /** The 16-char lowercase zero-padded hex rendering of the 64-bit
    * value above — identical to the md5Hex substring it replaces. */
  def hex16(v: Long): String = {
    val cs = new Array[Char](16)
    var i = 0
    while (i < 16) {
      cs(i) = java.lang.Character.forDigit(
        ((v >>> ((15 - i) * 4)) & 0xf).toInt, 16)
      i += 1
    }
    new String(cs)
  }
}

/** `graft_md5_longs(arr, nHex)` — md5-prefix long per string element,
  * null elements pass through as null (transform semantics). */
case class Md5PrefixLongs(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(_: StringType, _) =>
        if (!right.foldable || right.dataType != IntegerType)
          TypeCheckResult.TypeCheckFailure("graft_md5_longs: nHex must be an INT literal")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("graft_md5_longs: nHex must not be NULL")
        else {
          val n = right.eval().asInstanceOf[Number].intValue()
          if (n < 1 || n > 15)
            TypeCheckResult.TypeCheckFailure(
              s"graft_md5_longs: nHex must be in [1, 15], got $n")
          else TypeCheckResult.TypeCheckSuccess
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_md5_longs requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_md5_longs"

  private lazy val nHex: Int = right.eval().asInstanceOf[Number].intValue()

  protected override def nullSafeEval(arr: Any, nv: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val m = a.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (a.isNullAt(i)) null
        else HashKernels.md5PrefixLong(a.getUTF8String(i).getBytes, nHex)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $m = $arr.numElements();
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $out[$i] = graft.expressions.HashKernels.md5PrefixLong(
         |      $arr.getUTF8String($i).getBytes(), $nHex);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5PrefixLongs =
    copy(left = newLeft, right = newRight)
}

object Md5PrefixLongs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_md5_longs"),
    new ExpressionInfo(classOf[Md5PrefixLongs].getCanonicalName, "graft_md5_longs"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_md5_longs takes (arr, nHex)")
      Md5PrefixLongs(children(0), children(1))
    })
}

/** `graft_seeded_minhash(shingles, k)` — the k seeded-md5 minima of a
  * string array in one pass: element i is the lexicographic minimum
  * over shingles of `substring(md5(concat('<i>|', s)), 1, 16)` —
  * exactly `array((0 until k).map(seed => array_min(transform(...))))`
  * without k interpreted transform passes and k materialized hex
  * arrays per row. Null elements are skipped (array_min semantics);
  * no non-null input ⇒ null minima. The md5 calls themselves are the
  * irreducible cost; this removes the per-seed lambda machinery. */
case class SeededMinhash(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(_: StringType, _) =>
        if (!right.foldable || right.dataType != IntegerType)
          TypeCheckResult.TypeCheckFailure("graft_seeded_minhash: k must be an INT literal")
        else if (right.eval() == null ||
          right.eval().asInstanceOf[Number].intValue() < 1)
          TypeCheckResult.TypeCheckFailure("graft_seeded_minhash: k must be >= 1")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_seeded_minhash requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_seeded_minhash"

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  /** "<seed>|" prefixes, precomputed once per expression instance. */
  private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(s => s"$s|".getBytes("UTF-8"))

  def minima(a: ArrayData): Array[String] = {
    // unsigned-long minima tracked numerically (== the hex strings'
    // lexicographic minima, same 64 bits), rendered to hex ONCE at the
    // end — the per-(element × seed) loop allocates nothing
    val minsV = new Array[Long](k)
    val seen = new Array[Boolean](k)
    val m = a.numElements()
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        val sb = a.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          val v = HashKernels.seededMd5Prefix64(prefixes(s), sb)
          if (!seen(s) || java.lang.Long.compareUnsigned(v, minsV(s)) < 0) {
            minsV(s) = v; seen(s) = true
          }
          s += 1
        }
      }
      i += 1
    }
    Array.tabulate(k)(s => if (seen(s)) HashKernels.hex16(minsV(s)) else null)
  }

  protected override def nullSafeEval(arr: Any, kv: Any): Any =
    new GenericArrayData(minima(arr.asInstanceOf[ArrayData])
      .map(s => if (s == null) null else UTF8String.fromString(s)): Array[Any])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("seededMinhash", this, classOf[SeededMinhash].getName)
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      s"""
         |String[] $mins = $self.minima($arr);
         |Object[] $out = new Object[${k}];
         |for (int $s = 0; $s < ${k}; $s++) {
         |  $out[$s] = $mins[$s] == null ? null
         |    : org.apache.spark.unsafe.types.UTF8String.fromString($mins[$s]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeededMinhash =
    copy(left = newLeft, right = newRight)
}

object SeededMinhash {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_seeded_minhash"),
    new ExpressionInfo(classOf[SeededMinhash].getCanonicalName, "graft_seeded_minhash"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_seeded_minhash takes (shingles, k)")
      SeededMinhash(children(0), children(1))
    })
}

/** `graft_shingle_md5_longs(toks, n, nHex)` — md5-prefix long of every
  * n-token shingle, fusing shingle construction and hashing: the
  * composed `md5PrefixLongs(shinglesFromTokens(toks, n), nHex)` first
  * materializes an array of joined shingle STRINGS via an interpreted
  * transform (concat_ws over a slice per window), then hashes each.
  * This loop joins each window's bytes into a scratch buffer and hashes
  * directly — same values (concat_ws skips null tokens, reproduced
  * here), fewer than-n-tokens input ⇒ empty array. */
case class ShingleMd5Longs(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    first.dataType match {
      case ArrayType(_: StringType, _) =>
        if (!second.foldable || second.dataType != IntegerType ||
          !third.foldable || third.dataType != IntegerType)
          TypeCheckResult.TypeCheckFailure(
            "graft_shingle_md5_longs: n and nHex must be INT literals")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "graft_shingle_md5_longs: n and nHex must not be NULL")
        else {
          val n = second.eval().asInstanceOf[Number].intValue()
          val h = third.eval().asInstanceOf[Number].intValue()
          if (n < 1) TypeCheckResult.TypeCheckFailure(
            s"graft_shingle_md5_longs: n must be >= 1, got $n")
          else if (h < 1 || h > 15) TypeCheckResult.TypeCheckFailure(
            s"graft_shingle_md5_longs: nHex must be in [1, 15], got $h")
          else TypeCheckResult.TypeCheckSuccess
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_md5_longs requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_md5_longs"

  private lazy val n: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val nHex: Int = third.eval().asInstanceOf[Number].intValue()

  def hashes(a: ArrayData): Array[Long] = {
    val m = a.numElements()
    val count = m - n + 1
    if (count <= 0) return Array.empty[Long]
    // token bytes fetched once per element, reused across the n windows
    // that contain it
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      toks(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](count)
    // one scratch buffer per row, grown as needed and reused across all
    // shingles (no per-shingle toByteArray copy)
    var buf = new Array[Byte](64)
    i = 0
    while (i < count) {
      var len = 0
      var j = 0
      var started = false
      while (j < n) {
        val t = toks(i + j)
        if (t != null) { // concat_ws skips null elements
          val extra = t.length + (if (started) 1 else 0)
          if (len + extra > buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.max(buf.length * 2, len + extra))
          if (started) { buf(len) = ' '; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          started = true
        }
        j += 1
      }
      out(i) = HashKernels.md5PrefixLong(buf, len, nHex)
      i += 1
    }
    out
  }

  protected override def nullSafeEval(arr: Any, nv: Any, hv: Any): Any =
    new GenericArrayData(hashes(arr.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleMd5", this, classOf[ShingleMd5Longs].getName)
    nullSafeCodeGen(ctx, ev, (arr, _, _) =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $self.hashes($arr));""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ShingleMd5Longs =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ShingleMd5Longs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_md5_longs"),
    new ExpressionInfo(classOf[ShingleMd5Longs].getCanonicalName, "graft_shingle_md5_longs"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "graft_shingle_md5_longs takes (toks, n, nHex)")
      ShingleMd5Longs(children(0), children(1), children(2))
    })
}

/** `graft_hit_count(toks, words)` — how many elements of `toks` appear
  * in the literal word list, via one hash-set pass. Replaces
  * `size(filter(toks, t => array_contains(words, t)))`: an interpreted
  * filter lambda running a linear scan of the list per token. Null
  * tokens don't count (array_contains(_, null) is null → filtered),
  * and a null input array yields NULL (size-of-null semantics). */
case class HitCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("graft_hit_count: words must be a literal array")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("graft_hit_count: words must not be NULL")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hit_count requires (ARRAY<STRING>, ARRAY<STRING>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hit_count"

  private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val a = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) s.add(a.getUTF8String(i))
      i += 1
    }
    s
  }

  def count(arr: ArrayData): Int = {
    val m = arr.numElements()
    var hits = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  protected override def nullSafeEval(arr: Any, wv: Any): Any =
    Integer.valueOf(count(arr.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hitCount", this, classOf[HitCount].getName)
    nullSafeCodeGen(ctx, ev, (arr, _) => s"${ev.value} = $self.count($arr);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HitCount =
    copy(left = newLeft, right = newRight)
}

object HitCount {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hit_count"),
    new ExpressionInfo(classOf[HitCount].getCanonicalName, "graft_hit_count"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_hit_count takes (toks, words)")
      HitCount(children(0), children(1))
    })
}

/** `graft_simhash16(hashes)` — 16-bit simhash from per-token hashes in
  * ONE pass: bit j set iff more hashes have bit j set than not. The
  * composed form runs 16 interpreted aggregates over the array (one per
  * bit); integer votes are order-independent, so the fused loop is
  * exactly equal.
  *
  * HOF-parity edges: a null ELEMENT votes −1 on every bit —
  * `when((null & mask) > 0, 1).otherwise(-1)` falls to the otherwise
  * branch — which is the same vote h = 0 casts, so nulls read as 0 here.
  * A null INPUT array yields 0 (not null) in the composed form; callers
  * coalesce for that (TextFunctions.simhash16FromHashes). */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash16 requires ARRAY<INT|BIGINT>, got ${other.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash16"

  private lazy val isLong =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  protected override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val m = a.numElements()
    val votes = new Array[Int](16)
    var i = 0
    while (i < m) {
      val h =
        if (a.isNullAt(i)) 0L
        else if (isLong) a.getLong(i)
        else a.getInt(i).toLong
      var j = 0
      while (j < 16) {
        votes(j) += (if ((h & (1L << j)) != 0) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) sig |= 1 << j
      j += 1
    }
    Integer.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      val getter = if (isLong) s"$arr.getLong($i)" else s"(long) $arr.getInt($i)"
      s"""
         |int $m = $arr.numElements();
         |int[] $votes = new int[16];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $getter;
         |  for (int $j = 0; $j < 16; $j++) {
         |    $votes[$j] += (($h & (1L << $j)) != 0) ? 1 : -1;
         |  }
         |}
         |int $sig = 0;
         |for (int $j = 0; $j < 16; $j++) {
         |  if ($votes[$j] > 0) $sig |= 1 << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

object Simhash16 {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash16"),
    new ExpressionInfo(classOf[Simhash16].getCanonicalName, "graft_simhash16"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_simhash16 takes (hashes)")
      Simhash16(children(0))
    })
}
