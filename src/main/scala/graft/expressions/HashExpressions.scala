package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch kernels over pre-hashed element arrays
  * (`array<long>`, one SHA-256-derived value per shingle/token — see
  * [[graft.functions.SimilarityFunctions.elementHash]]).
  *
  * The naive higher-order-function formulation costs k (or 32)
  * interpreted lambda invocations PER ELEMENT; these expressions do the
  * whole sketch in one primitive loop inside whole-stage codegen. The
  * arithmetic is exactly the HOF/DuckDB-oracle formulation — same
  * constants, same mod-prime permutations, same bit order — so results
  * are bit-identical across all three implementations.
  */
object HashExpressions {

  /** Mersenne prime 2³¹−1 (fits `a·v + b` in a long for a,v < p). */
  val P: Long = 2147483647L

  def A(i: Int): Long = (1103515245L * (i + 1) + 12345L) % P
  def B(i: Int): Long = (69069L * (i + 1) + 1234567L) % P

  /** Pinned ±1 sign for the dense random-hyperplane family at
    * (band, bit, coord): a splitmix64-style finalizer over a mixed
    * seed. The mixer must be NONLINEAR (xor-shift + multiply): an LCG
    * is linear in its seed, so signs over the arithmetic (band, bit,
    * coord) seed progression come out correlated and the sign-LSH
    * bucket distribution collapses (measured: 40× the uniform
    * collision rate). Only the resulting ±1 constants are embedded in
    * the DuckDB oracle SQL.
    */
  def hyperplaneSign(band: Int, bit: Int, coord: Int): Int = {
    var x = band.toLong * 0x9E3779B97F4A7C15L + bit.toLong * 0xC2B2AE3D27D4EB4FL +
      coord.toLong * 0x165667B19E3779F9L + 0x27D4EB2F165667C5L
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    if ((x & 1L) == 1L) 1 else -1
  }

  /** Rabin–Karp window base (see
    * [[graft.functions.TextFunctions.RollB]], which aliases this).
    */
  val RollB: Long = 1000003L

  def minhash(hashes: Column, k: Int): Column =
    graftbridge.column(MinHashSignature(graftbridge.expression(hashes), k))

  /** Second, independent Rabin–Karp base for the span-dedup double
    * fingerprint: joining on BOTH (B, B2) window polynomials makes a
    * chance collision require two simultaneous 31-bit collisions
    * (~2⁻⁶² per pair) — the single-base form's chance-match tail grows
    * as C(windows, 2)/2³¹, measured ~150k false spans at a 26M-window
    * corpus (SCALING.md round 9).
    */
  val RollB2: Long = 1000033L

  def windowFingerprints(hashes: Column, k: Int): Column =
    graftbridge.column(WindowFingerprints(graftbridge.expression(hashes), k))

  def windowFingerprints2(hashes: Column, k: Int): Column =
    graftbridge.column(
      WindowFingerprints(graftbridge.expression(hashes), k, RollB2))

  /** Both polynomials in ONE pass over the hash array, packed
    * `fp_B · 2³¹ + fp_B2` — what the span seed joins on. Halves the
    * per-row tokenizer+SHA work vs zip_with over two kernels (each
    * kernel would evaluate its own copy of the hash-array child).
    */
  def windowFingerprintsPacked(hashes: Column, k: Int): Column =
    graftbridge.column(
      WindowFingerprints(graftbridge.expression(hashes), k, RollB, RollB2))

  def simhash32(hashes: Column): Column =
    graftbridge.column(SimHash32(graftbridge.expression(hashes)))

  def simhash64(hashes: Column): Column =
    graftbridge.column(SimHash64(graftbridge.expression(hashes)))
}

/** k-permutation MinHash signature: element i = min over values v of
  * `(Aᵢ·v + Bᵢ) mod p`. Null for empty input (callers filter upstream);
  * null elements are skipped.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  import HashExpressions.{A, B, P}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"minhash_signature_$k"

  private lazy val as: Array[Long] = Array.tabulate(k)(A)
  private lazy val bs: Array[Long] = Array.tabulate(k)(B)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = (v * as(j) + bs(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$arr.isNullAt($i)) {
         |      long $v = $arr.getLong($i);
         |      for (int $j = 0; $j < $k; $j++) {
         |        long $h = ($v * $aRef[$j] + $bRef[$j]) % ${P}L;
         |        if ($h < $mins[$j]) $mins[$j] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-token rolling window fingerprints over a pre-hashed token array:
  * output element i (0-based) is `(Σⱼ h[i+j] · B^(k-1-j) mod P) mod P`
  * for j = 0..k-1 — one value per k-token window, n−k+1 windows, empty
  * array when the document is shorter than k. The substring-span dedup
  * seed (see [[graft.functions.TextFunctions.windowFingerprints]] for
  * the arithmetic contract shared with the DuckDB oracle).
  *
  * Why an expression and not the HOF form: `transform(sequence(...))`
  * with k `element_at(hashes, i+j)` references INLINES the child array
  * expression once per reference — when `hashes` is itself
  * `transform(tokens, sha2…)`, Catalyst re-tokenizes and re-hashes the
  * whole document k times per window (measured: 20.6 s vs sub-second
  * at sf0.001 for q_dedup_spans). Here the child is evaluated once and
  * the k·(n−k+1) window terms are one primitive loop in codegen.
  * Null elements read as 0 (the catalog feeds non-null SHA-derived
  * hashes; the guard only pins determinism).
  */
case class WindowFingerprints(child: Expression, k: Int,
    base: Long = HashExpressions.RollB, base2: Long = 0L)
    extends UnaryExpression {
  import HashExpressions.P
  require(k >= 1, s"window width must be >= 1, got $k")

  /** INPUT CONTRACT (enforced, not just documented on the
    * TextFunctions wrapper): every element must fit in 32 unsigned
    * bits. The kernel computes `h * pow % P` with pow < P < 2³¹, so
    * h < 2³² keeps the product under 2⁶³ — one more bit and the
    * multiply silently wraps and every downstream fingerprint is
    * corrupt with no error. A caller feeding e.g. elementHash60
    * output (60-bit values) now fails loudly per element instead.
    */
  private def badElement(h: Long): Nothing =
    throw new IllegalArgumentException(
      s"window_fingerprints element $h exceeds 32 bits — the rolling " +
        "kernel's h*pow would overflow long; feed <=32-bit hashes " +
        "(e.g. elementHash28), not 60-bit ones")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_fingerprints requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    s"window_fingerprints_${k}_b$base" + (if (base2 != 0) s"_$base2" else "")

  /** `B^(k-1-j) mod P` — identical to TextFunctions.windowPows. */
  private def powsOf(b: Long): Array[Long] = {
    val out = new Array[Long](k)
    var j = k - 1
    var p = 1L
    while (j >= 0) { out(j) = p; p = p * b % P; j -= 1 }
    out
  }
  private lazy val pows: Array[Long] = powsOf(base)
  private lazy val pows2: Array[Long] =
    if (base2 != 0) powsOf(base2) else Array.emptyLongArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val packed = base2 != 0
    var i = 0
    while (i < m) {
      var s = 0L
      var s2 = 0L
      var j = 0
      while (j < k) {
        val h = if (arr.isNullAt(i + j)) 0L else arr.getLong(i + j)
        if ((h >>> 32) != 0L) badElement(h)
        s += h * pows(j) % P
        if (packed) s2 += h * pows2(j) % P
        j += 1
      }
      out(i) = if (packed) (s % P << 31) + s2 % P else s % P
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val powRef = ctx.addReferenceObj("windowPows", pows, "long[]")
    val pow2Ref =
      if (base2 != 0) ctx.addReferenceObj("windowPows2", pows2, "long[]")
      else ""
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val s2 = ctx.freshName("s2")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      // the >>> 32 guard mirrors nullSafeEval's input contract: a
      // predictable never-taken branch, ~free next to the mul+mod
      val guard =
        s"""if (($h >>> 32) != 0L) throw new IllegalArgumentException(
           |      "window_fingerprints element " + $h + " exceeds 32 bits — the rolling kernel's h*pow would overflow long; feed <=32-bit hashes (e.g. elementHash28), not 60-bit ones");""".stripMargin
      val inner =
        if (base2 != 0)
          s"""|  long $s = 0L; long $s2 = 0L;
              |  for (int $j = 0; $j < $k; $j++) {
              |    long $h = $arr.isNullAt($i + $j) ? 0L : $arr.getLong($i + $j);
              |    $guard
              |    $s += $h * $powRef[$j] % ${P}L;
              |    $s2 += $h * $pow2Ref[$j] % ${P}L;
              |  }
              |  $out[$i] = (($s % ${P}L) << 31) + $s2 % ${P}L;""".stripMargin
        else
          s"""|  long $s = 0L;
              |  for (int $j = 0; $j < $k; $j++) {
              |    long $h = $arr.isNullAt($i + $j) ? 0L : $arr.getLong($i + $j);
              |    $guard
              |    $s += $h * $powRef[$j] % ${P}L;
              |  }
              |  $out[$i] = $s % ${P}L;""".stripMargin
      s"""
         |int $n = $arr.numElements();
         |int $m = $n - $k + 1;
         |if ($m <= 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |$inner
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Width-parametric SimHash from token hash values: bit j (MSB-first
  * within `width`) is 1 iff the ±1 votes of all hashes' bit `width−1−j`
  * sum positive. Empty input → 0 (matches the fold-from-zero HOF
  * semantics). Shared by the 32- and 64-bit concrete expressions so the
  * vote/packing semantics cannot drift between widths.
  */
abstract class SimHashExpr extends UnaryExpression {

  /** Sketch width in bits (a def, not a constructor parameter — a ctor
    * arg on the abstract parent breaks Java deserialization of the
    * concrete case classes when tasks ship the expression).
    */
  protected def width: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val w = new Array[Int](width)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        var j = 0
        while (j < width) {
          w(j) += (if (((v >> (width - 1 - j)) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < width) {
      if (w(j) > 0) sh |= 1L << (width - 1 - j)
      j += 1
    }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      val sh = ctx.freshName("sh")
      s"""
         |int $n = $arr.numElements();
         |int[] $w = new int[$width];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $v = $arr.getLong($i);
         |    for (int $j = 0; $j < $width; $j++) {
         |      $w[$j] += ((($v >> (${width - 1} - $j)) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sh = 0L;
         |for (int $j = 0; $j < $width; $j++) {
         |  if ($w[$j] > 0) $sh |= 1L << (${width - 1} - $j);
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })
}

case class SimHash32(child: Expression) extends SimHashExpr {
  override protected def width: Int = 32
  override def prettyName: String = "simhash32"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash: same votes, 64 packed bits. The wider sketch is the
  * scale knob SCALING.md round 6 quantifies — at hamming ≤ 6 the CHANCE
  * collision tail drops from Σ₀⁶C(32,k)/2³² ≈ 2.7e-4 per unrelated
  * pair to Σ₀⁶C(60,k)/2⁶⁰ ≈ 5e-11 (60 bits, because the catalog feeds
  * 60-bit feature hashes, leaving sketch bits 60-63 constant zero), so
  * the n² background that dominates a 32-bit sketch past ~10⁴ docs is
  * gone until far beyond 100 TB corpus sizes, while true near-dups
  * (whose hamming reflects edit distance, not sketch width) still
  * collide.
  */
case class SimHash64(child: Expression) extends SimHashExpr {
  override protected def width: Int = 64
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
