package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * are CodegenFallback — every element costs an interpreted lambda
  * invocation plus boxing, which turns a 64-float dot product into
  * ~200 object allocations. This expression compiles to a tight
  * primitive loop inside whole-stage codegen: the 100 TB ANN path does
  * per-row work proportional to the vector length and nothing else.
  *
  * Semantics are IDENTICAL to the HOF formulation the DuckDB oracle
  * mirrors: floats widened to double, strict left-to-right
  * accumulation (deterministic, engine-portable). Mismatched lengths
  * use the shorter prefix; null elements contribute 0.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"float_vector_dot requires two array<float> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `bands` dense sign-LSH bucket values of an `array<float>` vector
  * in ONE codegen'd pass: hyperplane (band, bit) has pinned ±1 signs
  * ([[HashExpressions.hyperplaneSign]]) packed as a long bitmask over
  * coords (dim ≤ 64); bit `bit` of bucket `band` is set iff the
  * left-to-right signed sum Σ ±v[c] is positive.
  *
  * Why a kernel: the composed form (`bands·bits` separate
  * when(dot(vec, ±1-literal)) expressions) costs an expression-tree
  * walk per sign test and blows past whole-stage codegen size limits at
  * 128+ hyperplanes (measured ~50× slower at (8,16)). The accumulation
  * order is EXACTLY the composed form's and the DuckDB oracle's
  * `0.0 + v[1] - v[2] …` fold (±1 products are exact), so all three
  * agree bit-for-bit; null elements contribute 0 like
  * [[FloatVectorDot]].
  */
case class SignBuckets(child: Expression, bands: Int, bits: Int, dim: Int)
    extends UnaryExpression {
  require(dim <= 64, "sign masks pack one long per hyperplane (dim <= 64)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_buckets requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"sign_buckets_${bands}x$bits"

  /** masks(band·bits + bit): bit c set ⇔ sign(band, bit, c) = +1. */
  private lazy val masks: Array[Long] = Array.tabulate(bands * bits) { h =>
    val (band, bit) = (h / bits, h % bits)
    (0 until dim).foldLeft(0L) { (m, c) =>
      if (HashExpressions.hyperplaneSign(band, bit, c) > 0) m | (1L << c) else m
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var bucket = 0L
      var bit = 0
      while (bit < bits) {
        val mask = masks(band * bits + bit)
        var acc = 0.0
        var c = 0
        while (c < n) {
          val x = if (v.isNullAt(c)) 0.0 else v.getFloat(c).toDouble
          acc += (if (((mask >> c) & 1L) == 1L) x else -x)
          c += 1
        }
        if (acc > 0) bucket |= 1L << bit
        bit += 1
      }
      out(band) = bucket
      band += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("signMasks", masks, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val band = ctx.freshName("band")
      val bit = ctx.freshName("bit")
      val c = ctx.freshName("c")
      val mask = ctx.freshName("mask")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |long[] $out = new long[$bands];
         |for (int $band = 0; $band < $bands; $band++) {
         |  long $bucket = 0L;
         |  for (int $bit = 0; $bit < $bits; $bit++) {
         |    long $mask = $mRef[$band * $bits + $bit];
         |    double $acc = 0.0;
         |    for (int $c = 0; $c < $n; $c++) {
         |      double $x = $arr.isNullAt($c) ? 0.0 : (double) $arr.getFloat($c);
         |      $acc += ((($mask >> $c) & 1L) == 1L) ? $x : -$x;
         |    }
         |    if ($acc > 0) $bucket |= 1L << $bit;
         |  }
         |  $out[$band] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8 scalar-quantized dot product over two `array<float>` columns:
  * each coordinate is quantized to `round-half-up(x·127)` (exact for
  * unit-norm embeddings: |x| ≤ 1 ⇒ code ∈ [−127, 127]) and the products
  * accumulate in a 64-bit integer — EXACT arithmetic, so the DuckDB
  * oracle's `CAST(floor(v[i]*127.0 + 0.5) AS BIGINT)` fold reproduces
  * every value bit-for-bit.
  *
  * This is the cheap first pass of quantized ANN: at 100 TB the corpus
  * stores 1-byte codes (4× less scan IO than float32, SIMD-friendly
  * integer MACs), the int dot ranks candidates, and the exact float
  * cosine re-ranks only the survivors. Quantization here is on-the-fly
  * (the fixtures store floats); a production layout would materialize
  * the code arrays once — same semantics, one fewer multiply per use.
  * Null elements contribute 0, mismatched lengths use the shorter
  * prefix, as [[FloatVectorDot]].
  */
case class QuantizedDotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"quantized_dot_i8 requires two array<float> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "quantized_dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val qx = math.floor(x.getFloat(i).toDouble * 127.0 + 0.5).toLong
        val qy = math.floor(y.getFloat(i).toDouble * 127.0 + 0.5).toLong
        acc += qx * qy
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $qx = (long) java.lang.Math.floor((double) $a.getFloat($i) * 127.0 + 0.5);
         |    long $qy = (long) java.lang.Math.floor((double) $b.getFloat($i) * 127.0 + 0.5);
         |    $acc += $qx * $qy;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Codegen'd `Σ aᵢ·bᵢ` in double precision over float arrays. */
  def dotF(a: Column, b: Column): Column =
    graftbridge.column(
      FloatVectorDot(graftbridge.expression(a), graftbridge.expression(b)))

  /** Codegen'd int8-quantized `Σ q(aᵢ)·q(bᵢ)` (exact BIGINT). */
  def quantizedDotI8(a: Column, b: Column): Column =
    graftbridge.column(
      QuantizedDotI8(graftbridge.expression(a), graftbridge.expression(b)))

  /** Codegen'd dense sign-LSH buckets, one long per band. */
  def signBuckets(vec: Column, bands: Int, bits: Int, dim: Int): Column =
    graftbridge.column(
      SignBuckets(graftbridge.expression(vec), bands, bits, dim))
}
