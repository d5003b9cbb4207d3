package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity / near-duplicate primitives for large-scale training-data
  * pipelines: vector math over `array<float>` embedding columns, MinHash
  * signatures, SimHash, and n-gram Jaccard.
  *
  * Everything here is built from Catalyst higher-order functions
  * (`transform` / `aggregate` / `zip_with`) — evaluated per-row inside
  * the scan stage with NO explode and NO extra shuffle. At 100 TB the
  * signature computation is embarrassingly parallel; only the tiny
  * (bucket-key, id) candidate streams ever hit an exchange.
  *
  * Hash choice: SHA-256 rendered as lowercase hex. A fixed-width hex
  * string compares lexicographically exactly like the underlying 256-bit
  * integer, so `array_min` over hex strings IS MinHash — and every SQL
  * engine with a sha256() agrees on the value, which keeps the DuckDB
  * oracle bit-exact (a murmur3/xxhash would be Spark-private).
  */
object SimilarityFunctions {

  // ------------------------------------------------------------ vectors

  /** Dot product of two numeric arrays in double precision; strict
    * left-to-right accumulation (deterministic, engine-portable).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null/NaN when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-LSH bucket for an embedding: `nBits` sign tests of coordinate
    * differences e[2i+1] − e[2i+2] (1-based), packed into a long. A
    * deterministic random-hyperplane family (hyperplanes = ±1 on two
    * coordinates): cosine-close vectors land in the same bucket with
    * high probability. The scale path for ANN — candidates are joined on
    * this key (hash exchange on a small int) instead of all-pairs.
    */
  def signBucket(vec: Column, nBits: Int = 8): Column =
    (0 until nBits).map { i =>
      when(element_at(vec, 2 * i + 1) > element_at(vec, 2 * i + 2),
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ------------------------------------------------------------ MinHash

  /** MinHash signature of a shingle set: k independent permutations
    * approximated by seed-prefixed SHA-256; element i is
    * min over shingles of sha256("<i>|<shingle>") as hex.
    * Empty input → null elements (callers filter size ≥ 1 upstream).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingles, s =>
        sha2(concat(i.cast(StringType), lit("|"), s), 256))))

  /** Estimated Jaccard from two equal-length MinHash signatures:
    * fraction of agreeing positions.
    */
  def minhashEstJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x) / lit(k.toDouble)

  /** LSH band signature: concatenation of rows `[band*rowsPerBand+1,
    * band*rowsPerBand+rowsPerBand]` (1-based) of the signature. Two docs
    * with Jaccard j collide on some band with p = 1−(1−j^r)^b.
    */
  def bandSignature(sig: Column, band: Column, rowsPerBand: Int): Column =
    concat_ws("|", (1 to rowsPerBand).map(k =>
      element_at(sig, band * rowsPerBand + k)): _*)

  // ------------------------------------------------------------ SimHash

  /** Bit `j` (0 = most significant of the first hex digit) of a
    * lowercase-hex hash string, as 0/1. Pure arithmetic on the hex
    * rendering — stays inside codegen.
    */
  private def hexBit(h: Column, j: Column): Column = {
    val digit = h.substr((j / 4).cast(IntegerType) + 1, lit(1))
    val v = conv(digit, 16, 10).cast(IntegerType)
    floor(v / pow(lit(2.0), (lit(3) - j % 4).cast(DoubleType))).cast(LongType) % 2
  }

  /** 32-bit SimHash over the document's distinct lowercase whitespace
    * tokens. For each bit position, sums ±1 votes from each token's
    * SHA-256-derived 32-bit hash; bit = 1 iff the weight is positive.
    * Near-identical token sets → near-identical simhash (small Hamming
    * distance). One pass over the token array per row; no shuffle.
    */
  def simhash32(text: Column): Column = {
    val toks = array_distinct(TextFunctions.tokens(lower(text)))
    val hs = transform(toks, t => substring(sha2(t, 256), 1, 8))
    val bits = transform(sequence(lit(0), lit(31)), j =>
      when(aggregate(hs, lit(0L), (acc, h) => acc + (hexBit(h, j) * 2 - 1)) > 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Hamming distance between two packed bit vectors. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Byte `k` (0 = least significant) of a packed simhash — the
    * standard blocking key: any pair within Hamming distance ≤ 3 of a
    * 32-bit simhash agrees on at least one of its 4 bytes (pigeonhole),
    * so joining on (k, byte) finds all such pairs with 4 small shuffles
    * instead of an all-pairs comparison.
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
