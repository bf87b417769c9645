package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for the LLM-data-pipeline
  * extensions (SURVEY.md §7.4). Everything here is built from codegen'd
  * built-in functions — no UDFs — so whole-stage codegen keeps the hot
  * path fused and Catalyst can prune/push around these expressions.
  *
  * The reference (Rusty-Gopher/randas) has no text operators at all
  * (SURVEY §2.11); these are the north-star additions.
  */
object TextFunctions {

  /** Canonical text normalization used by dedup + fingerprints:
    * lowercase, collapse whitespace runs, trim. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Distinct word n-gram shingles; empty array when the document is
    * shorter than n tokens (sequence() would otherwise run backwards). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Number of tokens that appear in `words` (occurrence count, not set
    * intersection — repeated stopwords count every time). Native
    * hash-set expression; langId evaluates one of these per language,
    * so the per-token lambda scan it replaces multiplied out. */
  def wordHits(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graft.NativeExpressions.markerHits(toks, words)

  /** MD5 content fingerprint over normalized text — the exact-dedup key.
    * Stable across engines (DuckDB md5() agrees), unlike hash/xxhash64. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Engine-portable 64-bit hash: the first 16 hex chars of md5, as a
    * signed long (the bit pattern of the unsigned value — any engine
    * with md5 + a hex fold reproduces it exactly, unlike xxhash64).
    * Built from two 32-bit conv() halves: conv of the full 16-hex
    * string would overflow a signed long for values >= 2^63, while
    * shiftleft is a pure bit op — ANSI-safe, wraps to the intended
    * negative bit patterns. */
  def portableHash64(s: Column): Column =
    shiftleft(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(s), 9, 8), 16, 10).cast("long"))

  // ---- MinHash ------------------------------------------------------------

  /** Mersenne prime 2^31-1: hash values stay < 2^31 so a*h+b fits in a
    * Long without overflow. */
  val MinHashPrime: Long = 2147483647L

  /** Deterministic (a, b) permutation parameters — fixed seed so
    * signatures are reproducible across runs and executors. */
  def minhashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1L + rnd.nextInt((MinHashPrime - 1).toInt).toLong,
      rnd.nextInt(MinHashPrime.toInt).toLong))
  }

  /** Shingle array -> base hash array in [0, P): the one xxhash64 pass
    * every MinHash permutation probes. Materialize this as its OWN
    * column before calling `minhashSignature` — inlining it k times
    * multiplies the expression tree by k and stalls Catalyst/codegen. */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => pmod(xxhash64(s), lit(MinHashPrime)))

  /** k-wide MinHash signature over a pre-hashed shingle column (see
    * `shingleHashes`). The permutation parameters ride along as ONE
    * literal array of (a, b) structs and the signature is a single
    * nested `transform` — a tight double loop in codegen. (The naive
    * formulation — an `array(...)` of k independent array_min lanes —
    * duplicates the probe loop k times in the expression tree; at k=128
    * that stalled Catalyst + Janino for minutes per plan.) Empty shingle
    * sets degrade to the max sentinel P. */
  def minhashSignature(hashes: Column, k: Int): Column = {
    val params = array(minhashParams(k).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    // The size() guard double-references `hashes` so CollapseProject
    // keeps it a materialized column: inlined, the hash array would be
    // recomputed once per permutation (k-fold interpreted re-eval).
    when(size(hashes) >= 0,
      transform(params, p =>
        coalesce(
          array_min(transform(hashes,
            h => pmod(h * p.getField("a") + p.getField("b"), lit(MinHashPrime)))),
          lit(MinHashPrime))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** LSH band keys: the signature is cut into k/r bands of r rows; each
    * band hashes to one bucket key. Two docs are candidates iff they
    * collide in >= 1 band — P(candidate) = 1-(1-J^r)^(k/r).
    *
    * The `when(size(sig) === k)` guard is load-bearing beyond
    * validation: it makes `sig` multi-referenced, which stops
    * CollapseProject from inlining the whole k-wide signature expression
    * into the per-band lambda (interpreted HOF eval would then recompute
    * the signature once PER BAND — a k/r-fold slowdown). */
  def minhashBands(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"band rows $r must divide signature width $k")
    when(size(sig) === k,
      transform(sequence(lit(0), lit(k / r - 1)),
        b => xxhash64(concat_ws(",", transform(slice(sig, b * lit(r) + lit(1), lit(r)), _.cast("string"))))))
      .otherwise(array().cast("array<bigint>"))
  }

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over a pre-hashed token array column (produce it
    * with `transform(toks, xxhash64)` first): per bit, tokens vote +1/-1
    * by their hash bit; the fingerprint sets bits with a positive vote.
    * Expressed as nested higher-order functions so it stays a single
    * codegen'd projection. (At 100 TB a custom Catalyst Expression doing
    * one pass over the tokens instead of 64 would be the upgrade path.)
    *
    * @param tokenHashCol name of an array<bigint> column already in scope
    */
  def simhash64(tokenHashCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), 0L, (fp, i) ->
          fp + CASE WHEN aggregate(`$tokenHashCol`, 0L,
              (acc, h) -> acc + CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1L ELSE -1L END) > 0
            THEN shiftleft(1L, i) ELSE 0L END)""")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit chunks of a 64-bit fingerprint. Pigeonhole: two prints at
    * Hamming distance <= 3 must agree exactly on >= 1 of the 4 chunks, so
    * chunk equality is a recall-1 LSH bucket key for d <= 3. */
  def simhashChunks(fp: Column): Column =
    array((0 until 4).map(i =>
      shiftright(fp, 16 * i).bitwiseAND(lit(65535L))): _*)

  /** BPE-ish subword pre-tokenization (GPT-2-style split, RE2-safe — no
    * lookarounds, so the same pattern runs in other engines verbatim):
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs. NOT a trained BPE merge — the split that precedes
    * one, which is what corpus token-count estimation needs. */
  val BpeishPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  // ---- fingerprinting ------------------------------------------------------

  /** Rolling polynomial (Karp-Rabin) fingerprint over the normalized
    * characters: acc = (acc*31 + codepoint) mod 1e9+7. One sequential
    * `aggregate` pass inside codegen; modulus applied per step keeps the
    * accumulator far from Long overflow. Engine-portable (no xxhash):
    * any system with a fold over codepoints reproduces it exactly. */
  val FingerprintMod: Long = 1000000007L

  def rollingFingerprint(text: Column): Column =
    aggregate(split(normalize(text), ""), lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c), lit(FingerprintMod)))

  // ---- quality ------------------------------------------------------------

  /** Default English-ish stopword list used by quality scoring. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this")

  /** Language marker words for the n-gram/stopword language-ID heuristic.
    * Deterministic scoring; ties resolve by the fixed priority order of
    * the Seq (en first). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他"))

  /** Heuristic language ID: argmax of marker-word hit counts with a
    * deterministic priority-order tiebreak; "und" (undetermined) when no
    * marker hits at all. */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, words) => lang -> wordHits(toks, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s > 0 && s === best, lit(lang)).otherwise(els)
    }
  }
}
