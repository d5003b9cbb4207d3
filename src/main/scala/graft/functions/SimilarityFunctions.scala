package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.VectorExpressions

/** Similarity / near-duplicate primitives for large-scale training-data
  * pipelines: vector math over `array<float>` embedding columns, MinHash
  * signatures, SimHash, and n-gram Jaccard.
  *
  * Everything here is per-row — evaluated inside the scan stage with NO
  * explode and NO extra shuffle. At 100 TB the signature computation is
  * embarrassingly parallel; only the tiny (bucket-key, id) candidate
  * streams ever hit an exchange.
  *
  * Cost model (this drove the design):
  *  - Vector dot products use a custom codegen'd Catalyst expression
  *    ([[graft.expressions.FloatVectorDot]]) — Spark higher-order
  *    functions are CodegenFallback (interpreted lambda + boxing per
  *    element), which is 100×+ slower on 64-float vectors.
  *  - Hashing does ONE SHA-256 per shingle/token, then derives the k
  *    MinHash permutations with universal-hash arithmetic
  *    `(aᵢ·v + bᵢ) mod p` — exact in 64-bit integers, so the DuckDB
  *    oracle reproduces every signature bit (a murmur3/xxhash would be
  *    Spark-private; k SHA invocations per element would be k× the IO).
  */
object SimilarityFunctions {

  // ------------------------------------------------------------ vectors

  /** Dot product in double precision; strict left-to-right accumulation
    * (deterministic, engine-portable). Codegen'd native expression.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotF(a, b)

  /** L2 norm. Precompute per side before a pairwise join — norms are
    * per-vector, not per-pair.
    */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null/NaN when either vector has zero norm.
    * For pairwise use, prefer `dot(a,b) / (normA * normB)` with
    * precomputed norm columns.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** int8 scalar-quantized dot product (exact BIGINT): coordinates
    * quantized round-half-up to [−127, 127] codes, products summed in
    * 64-bit integers — the cheap candidate-ranking pass of quantized
    * ANN ([[graft.expressions.QuantizedDotI8]]; the exact float cosine
    * re-ranks survivors).
    */
  def quantizedDotI8(a: Column, b: Column): Column =
    VectorExpressions.quantizedDotI8(a, b)

  /** Sign-LSH bucket for an embedding: `nBits` sign tests of coordinate
    * differences e[2i+1] − e[2i+2] (1-based), packed into a long. A
    * deterministic random-hyperplane family (hyperplanes = ±1 on two
    * coordinates): cosine-close vectors land in the same bucket with
    * high probability. The scale path for ANN — candidates are joined on
    * this key (hash exchange on a small int) instead of all-pairs.
    */
  def signBucket(vec: Column, nBits: Int = 8): Column =
    signBucketAt(vec, 0, nBits)

  /** [[signBucket]] over the coordinate window starting at `offset`
    * (0-based): sign tests on pairs (offset+2i+1, offset+2i+2). Distinct
    * offsets give INDEPENDENT hyperplane families over disjoint
    * coordinates — the banding primitive for embedding near-dup
    * blocking (agree on any band ⇒ candidate), exactly the minhash-LSH
    * band construction transplanted to cosine space.
    */
  def signBucketAt(vec: Column, offset: Int, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(vec, offset + 2 * i + 1) > element_at(vec, offset + 2 * i + 2),
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Pinned ±1 hyperplane sign at (band, bit, coord) — see
    * [[graft.expressions.HashExpressions.hyperplaneSign]] (splitmix64
    * finalizer; an LCG's linearity measurably collapses the buckets).
    */
  def hyperplaneSign(band: Int, bit: Int, coord: Int): Int =
    graft.expressions.HashExpressions.hyperplaneSign(band, bit, coord)

  /** The (band, bit) hyperplane as a ±1 float vector. */
  def hyperplane(band: Int, bit: Int, dim: Int): Seq[Float] =
    (0 until dim).map(c => hyperplaneSign(band, bit, c).toFloat)

  /** DENSE random-hyperplane sign buckets, one per band: bit i of band
    * b is the sign of `vec · h(b,i)` where h is a pinned ±1 vector over
    * ALL `dim` coordinates. All bands·nBits sign tests run in ONE
    * codegen'd kernel pass ([[graft.expressions.SignBuckets]], sign
    * masks packed as longs) — the per-bit `when(dot(vec, ±1-literal))`
    * composition it replaces is the equivalence oracle in
    * `ExpressionsSpec`.
    *
    * This is the TUNABLE family for 100 TB embedding dedup, unlike
    * [[signBucketAt]]'s coordinate-pair hyperplanes which cap at dim/2
    * total bits: dense hyperplanes are unlimited and independent, so
    * collision noise scales as bands · n²/2^nBits — crank `nBits` (16,
    * 24, …) as the corpus grows and add bands to hold recall
    * (p_collide = 1 − (1 − p_bit^nBits)^bands, p_bit = 1 − θ/π).
    * Multiplying by ±1 is exact, and the per-hyperplane accumulation is
    * the left-to-right signed sum, so DuckDB's `0.0 + v[1] - v[2] …`
    * fold is bit-identical.
    */
  def denseSignBuckets(vec: Column, bands: Int, nBits: Int, dim: Int): Column =
    VectorExpressions.signBuckets(vec, bands, nBits, dim)

  // ------------------------------------------------------------ MinHash

  /** Mersenne prime 2³¹−1: `a·v + b` stays < 2⁶² for a,v < p — exact in
    * a 64-bit long on both Spark and DuckDB.
    */
  val MinhashP: Long = graft.expressions.HashExpressions.P

  /** Deterministic permutation constants (LCG-generated, pinned — the
    * DuckDB oracle embeds the same values).
    */
  def minhashA(i: Int): Long = graft.expressions.HashExpressions.A(i)
  def minhashB(i: Int): Long = graft.expressions.HashExpressions.B(i)

  /** 28-bit base hash of an element: first 7 hex chars of its SHA-256.
    * One digest per element; the k permutations are arithmetic.
    */
  def elementHash(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 7), 16, 10).cast(LongType)

  /** MinHash signature from a pre-hashed element array (`array<long>`,
    * see [[elementHash]]): element i is min over values of
    * `(aᵢ·v + bᵢ) mod p`. Codegen'd single-loop kernel
    * ([[graft.expressions.MinHashSignature]]).
    */
  def minhashSignatureFromHashes(hashes: Column, k: Int): Column =
    graft.expressions.HashExpressions.minhash(hashes, k)

  /** Convenience: shingle strings → signature (one SHA per shingle). */
  def minhashSignature(shingles: Column, k: Int): Column =
    minhashSignatureFromHashes(transform(shingles, elementHash(_)), k)

  /** Estimated Jaccard from two equal-length MinHash signatures:
    * fraction of agreeing positions.
    */
  def minhashEstJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x) / lit(k.toDouble)

  /** LSH band signature: rows `[band·r+1, band·r+r]` (1-based) of the
    * signature joined as a string key. Two docs with Jaccard j collide
    * on some band with p = 1−(1−j^r)^b.
    */
  def bandSignature(sig: Column, band: Column, rowsPerBand: Int): Column =
    concat_ws("|", (1 to rowsPerBand).map(k =>
      element_at(sig, band * rowsPerBand + k)): _*)

  // ------------------------------------------------------------ SimHash

  /** 32-bit feature hash for SimHash: first 8 hex chars of SHA-256 as
    * a long (full 32 bits of signal, vs 28 for [[elementHash]]).
    */
  def elementHash32(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 8), 16, 10).cast(LongType)

  /** Unigram-feature hashes for SimHash. NOTE: prefer shingle features
    * ([[elementHash32]] over n-gram shingles) for corpora where
    * documents share a vocabulary — unigram token SETS collapse to
    * near-equality there and SimHash degenerates to one dense cluster.
    * Materialize (own projection) before [[simhash32FromHashes]].
    */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(TextFunctions.tokens(lower(text))),
      elementHash32(_))

  /** 32-bit SimHash from pre-hashed tokens: for each bit position, sums
    * ±1 votes from each token hash; bit = 1 iff the weight is positive.
    * Near-identical token sets → small Hamming distance. One codegen'd
    * pass over the hash array per row ([[graft.expressions.SimHash32]]);
    * no shuffle.
    */
  def simhash32FromHashes(hashes: Column): Column =
    graft.expressions.HashExpressions.simhash32(hashes)

  /** 60-bit feature hash for the 64-bit SimHash: first 15 hex chars of
    * SHA-256 (the 16th would overflow signed-BIGINT arithmetic in the
    * DuckDB oracle's hex fold; 60 bits of signal leave the sketch's top
    * 4 bits constant-zero, which costs nothing at hamming ≤ 6).
    */
  def elementHash60(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 15), 16, 10).cast(LongType)

  /** 64-bit SimHash from pre-hashed tokens — the wide-sketch variant
    * whose chance-collision background at hamming ≤ 6 is ~5e-11 per
    * pair with [[elementHash60]] features (Σ₀⁶C(60,k)/2⁶⁰ — 60
    * significant bits, vs 2.7e-4 for 32-bit): the scale knob for
    * >10⁴-doc corpora.
    */
  def simhash64FromHashes(hashes: Column): Column =
    graft.expressions.HashExpressions.simhash64(hashes)

  /** Text → 32-bit SimHash (token hashing fused; prefer the two-step
    * form in query plans).
    */
  def simhash32(text: Column): Column =
    simhash32FromHashes(tokenHashes(text))

  /** Hamming distance between two packed bit vectors. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Byte `k` (0 = least significant) of a packed simhash — the
    * standard blocking key, width-generic: any pair within Hamming
    * radius r of a simhash agrees on at least one of n > r blocked
    * bytes (pigeonhole), so joining on (k, byte) for k < n finds all
    * such pairs with n small shuffles instead of an all-pairs
    * comparison. Sketch bits above 8·n may go unblocked without losing
    * recall — unblocked differences only add to a pair's hamming. The
    * 32-bit catalog query uses n=4 (radius 3); the 64-bit one n=7
    * (radius 6 over the 60 significant bits).
    */
  def simhashByte(sim: Column, k: Int): Column =
    shiftright(sim, 8 * k) % 256

  // ------------------------------------------------------------ Jaccard

  /** Exact Jaccard similarity of two array-encoded sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }
}
