package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, language ID, quality scoring, token counting
  * and document fingerprinting. All pure Catalyst expressions (no UDFs)
  * so the whole pipeline stays inside whole-stage codegen — at 100 TB
  * these run in the scan stage with zero extra shuffles.
  *
  * Every function has an exact SQL mirror (see analytics.TextQueries)
  * so the DuckDB oracle can hash-check it.
  */
object TextFunctions {

  /** Whitespace tokens as an array (order-preserving, duplicates kept). */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("(\\S+)"), lit(1))

  /** Token count without array materialization (codegen-friendly). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a deterministic
    * stand-in for a real BPE vocab that tracks its token count closely.
    */
  def subwordCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Word n-gram shingles from a MATERIALIZED token-array column,
    * empty array when the document has fewer than n tokens.
    * Distinctness is the caller's choice (near-dup setups want set
    * semantics → array_distinct).
    *
    * Take a token column, not text: the expression references the
    * array n+1 times, and if that reference were the tokenizer itself
    * the optimizer would re-run the regex per reference.
    */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(ts, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Convenience form over raw text — only for small inputs/tests;
    * query plans should tokenize into an own projection first.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Language-ID stopword lists (tiny, deterministic n-gram heuristic —
    * the classic "count function words" approach).
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "les", "et"),
    "it" -> Seq("il", "che", "di"))

  private def stopwordRe(words: Seq[String]): String =
    words.mkString("\\b(", "|", ")\\b")

  /** Per-language stopword hit count. */
  def langScore(text: Column, lang: String): Column =
    regexp_count(lower(text),
      lit(stopwordRe(LangStopwords.find(_._1 == lang).get._2)))

  /** Heuristic language ID: argmax of stopword hits with fixed priority
    * order (list order breaks ties); "und" (undetermined) when no
    * stopword hits at all.
    */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (l, _) => l -> langScore(text, l) }
    val total = scores.map(_._2).reduce(_ + _)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), rest) =>
      when(total > 0 && s === best, lit(l)).otherwise(rest)
    }
  }

  /** English stopword ratio — one input to quality scoring. */
  def stopwordCount(text: Column): Column = langScore(text, "en")

  /** Heuristic quality score in [0,1]: length saturation × word-shape
    * plausibility × punctuation sanity. Deterministic double arithmetic,
    * rounded to 4 decimals at the edge by callers.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = tokenCount(text).cast("double")
    val nAlpha = regexp_count(text, lit("[A-Za-z]")).cast("double")
    val nPunct = regexp_count(text, lit("[.,;:!?]")).cast("double")
    val lengthSat = least(lit(1.0), nWords / lit(64.0))
    val alphaRatio = when(nChars > 0, nAlpha / nChars).otherwise(lit(0.0))
    val punctPenalty = when(nChars > 0,
      greatest(lit(0.0), lit(1.0) - (nPunct / nChars) * lit(4.0)))
      .otherwise(lit(0.0))
    lengthSat * alphaRatio * punctPenalty
  }

  /** Document fingerprint: SHA-256 of the whitespace-normalized,
    * lowercased text — the exact-dedup key (case/spacing-insensitive).
    */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(trim(lower(text)), "\\s+", " "), 256)

  /** Rolling-hash base/modulus (exact in 64-bit: intermediate values
    * stay ≤ (P−1)·B ≈ 2⁵¹, so the DuckDB oracle reproduces every value
    * with plain BIGINT arithmetic).
    */
  val RollB: Long = graft.expressions.HashExpressions.RollB
  val RollP: Long = graft.expressions.HashExpressions.P

  /** Rolling (Rabin–Karp) window fingerprints over a MATERIALIZED
    * token-hash array (see SimilarityFunctions.elementHash): one value
    * per 3-token window, `((h₁·B + h₂)·B + h₃) mod P`, reduced mod P at
    * every step. `array_min` of the result is a winnowing-style
    * document fingerprint; the full array feeds containment checks.
    */
  def rollingFingerprints(hashes: Column): Column =
    when(size(hashes) >= 3,
      transform(sequence(lit(1), size(hashes) - 2), i => {
        val h1 = element_at(hashes, i)
        val h2 = element_at(hashes, i + 1)
        val h3 = element_at(hashes, i + 2)
        (((h1 * RollB) % RollP + h2) * RollB % RollP + h3) % RollP
      })).otherwise(array().cast("array<bigint>"))

  /** Precomputed window powers `B^(k-1-j) mod P` for j = 0..k-1 — shared
    * verbatim by [[windowFingerprints]] and the DuckDB oracle SQL so both
    * engines evaluate the identical sum-of-powers form.
    */
  def windowPows(k: Int, base: Long = RollB): IndexedSeq[Long] =
    (0 until k).map(j =>
      Iterator.fill(k - 1 - j)(base).foldLeft(1L)((a, b) => a * b % RollP))

  /** Second independent base (see
    * [[graft.expressions.HashExpressions.RollB2]]) — the span-dedup
    * seed joins on BOTH window polynomials so its chance-collision
    * tail is ~2⁻⁶² per window pair instead of 2⁻³¹.
    */
  val RollB2: Long = graft.expressions.HashExpressions.RollB2

  /** Generalized k-token window fingerprints over a token-hash array:
    * one value per k-token window,
    * `fp(i) = (Σⱼ hᵢ₊ⱼ · B^(k-1-j) mod P) mod P` — the same polynomial
    * as [[rollingFingerprints]] (k=3) but in sum-of-powers form so the
    * DuckDB oracle can replay it without a fold: each term is
    * `(28-bit hash) · (31-bit power) < 2⁵⁹` and the k-term sum of
    * mod-P residues stays < k·2³¹, all exact in BIGINT. This is the
    * substring-span dedup seed (Lee et al. 2022): two docs sharing a
    * k-token run share the window fingerprint at the aligned positions.
    *
    * Codegen'd single-loop kernel
    * ([[graft.expressions.WindowFingerprints]]) — the HOF formulation
    * (`transform(sequence, i => Σⱼ element_at(hashes, i+j)·powⱼ)`)
    * inlines the hash-array child once per `element_at`, re-running
    * the tokenizer+SHA pipeline k times per window.
    */
  def windowFingerprints(hashes: Column, k: Int): Column =
    graft.expressions.HashExpressions.windowFingerprints(hashes, k)

  /** The B2-base twin of [[windowFingerprints]]. */
  def windowFingerprints2(hashes: Column, k: Int): Column =
    graft.expressions.HashExpressions.windowFingerprints2(hashes, k)

  /** Both polynomials in one pass, packed `fp_B·2³¹ + fp_B2` — the
    * span-dedup seed key ([[graft.expressions.WindowFingerprints]]).
    */
  def windowFingerprintsPacked(hashes: Column, k: Int): Column =
    graft.expressions.HashExpressions.windowFingerprintsPacked(hashes, k)
}
