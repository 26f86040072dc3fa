package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is a pure column expression built from Spark built-ins
  * (split / higher-order array functions / md5) — codegen-friendly, no
  * UDFs, no shuffle. At 100 TB these are embarrassingly parallel map-side
  * work over the documents table; the only shuffles in the dedup pipelines
  * happen later, on compact signatures rather than raw text.
  *
  * Hashes are built from md5 hex substrings so an external SQL engine
  * (the DuckDB oracle) can reproduce them bit-for-bit — fixed-width
  * lowercase hex compares lexicographically exactly like the number it
  * encodes, so `min` over hex strings == numeric min-hash.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer regex, ASCII subset: contraction
    * suffixes, space-prefixed letter/digit runs, punctuation runs,
    * whitespace. Alternation order is meaningful (leftmost-first in
    * both Java regex and the oracle's engine); kept ASCII-only so both
    * engines agree byte-for-byte. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"

  /** BPE-ish pre-tokenization — the token-count estimator training-data
    * pipelines budget with (whitespace tokens undercount code/punct). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Whitespace-collapsed, lowercased canonical form (dedup normalization). */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Aggressive normalization: alphanumerics + single spaces only —
    * collapses near-identical docs onto one fingerprint. */
  def normalizeAggressive(text: Column): Column =
    trim(regexp_replace(lower(regexp_replace(text, "[^a-zA-Z0-9\\s]", " ")), "\\s+", " "))

  /** Document fingerprint: md5 of the canonical form. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Polynomial rolling-hash fingerprint, `h = (h*31 + byte) mod 2^31`
    * over the raw UTF-8 bytes — a native codegen'd Catalyst expression
    * (graft.expressions.RollingHash), registered by GraftExtensions.
    * Requires a GraftSession-built session. */
  def rollingHash(text: Column): Column = call_function("graft_rolling_hash", text)

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val SpanishStopwords: Seq[String] =
    Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las")

  /** Native hash-set membership count (`graft.expressions.HitCount`) —
    * the composed `size(filter(toks, t => array_contains(set, t)))`
    * runs an interpreted lambda with a linear list scan per token.
    * Same values incl. null-token and null-array edges. */
  private def hitCount(toks: Column, words: Seq[String]): Column =
    call_function("graft_hit_count", toks, array(words.map(lit): _*))

  def stopwordCount(text: Column): Column = hitCount(tokens(text), EnglishStopwords)

  def stopwordCountFromTokens(toks: Column): Column = hitCount(toks, EnglishStopwords)

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Quality score in [0,1]: blend of length band, stopword presence and
    * punctuation restraint — the usual cheap pre-filter before expensive
    * model-based scoring. Integer/integer double divisions only, so the
    * value is IEEE-deterministic across engines. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, tokens(text))

  /** Variant taking a MATERIALIZED token column (see the HOF staging
    * note above) — `text` is still needed for the punctuation ratio. */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast(DoubleType)
    val stopRatio = stopwordCountFromTokens(toks).cast(DoubleType) / nTok
    val punctRatio = punctCount(text).cast(DoubleType) / length(text).cast(DoubleType)
    val lengthOk = when(nTok.between(5, 1000), lit(1.0)).otherwise(lit(0.0))
    round(lengthOk * 0.4 + least(stopRatio * lit(2.0), lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * 0.2, 4)
  }

  /** Language ID heuristic: CJK codepoints ⇒ zh, else the larger of the
    * Spanish/English stopword hit counts (ties ⇒ en). */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  def langIdFromTokens(text: Column, toks: Column): Column = {
    val en = hitCount(toks, EnglishStopwords)
    val es = hitCount(toks, SpanishStopwords)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(es > en, lit("es"))
      .otherwise(lit("en"))
  }

  /** Word n-gram shingles: `["a b c", "b c d", ...]`. Empty array when the
    * doc has fewer than n tokens (guards sequence() from descending).
    *
    * PERF: expressions referenced inside a higher-order-function lambda
    * are re-evaluated per array element, and HOF projections are
    * interpreted (no codegen) — so `toksCol` should be a MATERIALIZED
    * column (an attribute), not an inline `tokens(text)` subtree.
    * `shinglesFromTokens`/`minhashSignature` exist for exactly that
    * staging; the pipelines in Dedup keep each stage in its own
    * projection (Catalyst's CollapseProject keeps them separate because
    * the aliases are expensive and multiply-referenced). */
  def shinglesFromTokens(toksCol: Column, n: Int): Column =
    when(size(toksCol) >= n,
      transform(sequence(lit(1), size(toksCol) - (n - 1)),
        i => concat_ws(" ", slice(toksCol, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))

  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Character n-grams — finer-grained than word shingles: robust to
    * word-boundary edits and usable on languages without whitespace
    * tokenization. Empty array when the text is shorter than n.
    * `normCol` must be a MATERIALIZED column (HOF staging note above):
    * it is re-read per element by the lambda. Prefer `charNgramCodes`
    * on hot paths — same set semantics, fused native loop. */
  def charNgramsFromText(normCol: Column, n: Int): Column =
    when(length(normCol) >= n,
      transform(sequence(lit(1), length(normCol) - (n - 1)),
        i => normCol.substr(i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Injective base-257 codes of all length-n byte windows
    * (graft.expressions.NgramHashes, native codegen; n ≤ 7): set ops
    * over the codes ARE exact n-gram set ops. GraftSession required. */
  def charNgramCodes(text: Column, n: Int): Column =
    call_function("graft_ngram_hashes", text, lit(n))

  /** Fused shingle+hash staging: md5-prefix long of every n-token
    * shingle without materializing the shingle strings
    * (graft.expressions.ShingleMd5Longs). GraftSession required. */
  def shingleMd5Longs(toks: Column, n: Int, nHex: Int): Column =
    call_function("graft_shingle_md5_longs", toks, lit(n), lit(nHex))

  /** k-wide minhash signature of a long-array in one fused native pass
    * (graft.expressions.MinhashSketch). GraftSession required. */
  def minhashSketch(hashes: Column, k: Int): Column =
    call_function("graft_minhash_sketch", hashes, lit(k))

  /** One min-hash: lexicographic min over shingles of the seeded md5's
    * first 16 hex chars (== numeric min of the 64-bit prefix). The HOF
    * reference form of one `graft_seeded_minhash` signature slot. */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => substring(md5(concat(lit(s"$seed|"), s)), 1, 16)))

  /** k-wide min-hash signature as an array of hex strings — native
    * fused kernel (`graft.expressions.SeededMinhash`): all k seeded
    * minima in one pass over the shingles instead of k interpreted
    * transform passes. GraftSession required. */
  def minhashSignature(shingles: Column, k: Int): Column =
    call_function("graft_seeded_minhash", shingles, lit(k))

  /** LSH band keys: adjacent pairs of signature entries hashed together.
    * Docs sharing ANY band key become candidate pairs. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r + 1))
      concat_ws("_", lit(b.toString) +: parts: _*)
    }: _*)

  /** Per-token 16-bit hash array (stage this as a column — the simhash
    * vote pass scans it). Native fused md5-prefix kernel
    * (`graft.expressions.Md5PrefixLongs`): same values as
    * `transform(toks, t => conv(substring(md5(t), 1, 4), 16, 10))`
    * without the interpreted lambda or the decimal-string round-trip.
    * GraftSession required. */
  def tokenHashes16(toksCol: Column): Column =
    call_function("graft_md5_longs", toksCol, lit(4))

  /** Md5-prefix long per element — the hash-once staging for minhash
    * sketches (60-bit prefix ⇒ nHex = 15). GraftSession required. */
  def md5PrefixLongs(arr: Column, nHex: Int): Column =
    call_function("graft_md5_longs", arr, lit(nHex))

  /** 16-bit SimHash from a MATERIALIZED per-token hash column: bit j of
    * the result is set iff more token-hashes have bit j set than not.
    * Native ONE-pass kernel (`graft.expressions.Simhash16`) — the
    * composed form runs 16 interpreted aggregate votes over the array.
    * The coalesce preserves the composed form's null-input behavior
    * (null array → all votes fall to otherwise(0) → signature 0). */
  def simhash16FromHashes(hashesCol: Column): Column =
    coalesce(call_function("graft_simhash16", hashesCol), lit(0))

  def simhash16(text: Column): Column =
    simhash16FromHashes(tokenHashes16(tokens(text)))

  /** Hamming distance between two 16-bit simhashes (bit_count of xor). */
  def hamming16(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of the distinct-token sets of two texts. */
  def jaccardTokens(a: Column, b: Column): Column = {
    val da = array_distinct(tokens(a))
    val db = array_distinct(tokens(b))
    size(array_intersect(da, db)).cast(DoubleType) /
      size(array_union(da, db)).cast(DoubleType)
  }
}
