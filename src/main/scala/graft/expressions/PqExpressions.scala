package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Scan-stage product-quantization / IVF kernels.
  *
  * The codebook (k coarse or sub-quantizer centroids) is a MODEL
  * PARAMETER, not data: a few KiB collected once on the driver and
  * compiled into the expression as a reference object — exactly how a
  * production ANN index ships its trained centroids to every executor.
  * That turns PQ encode and IVF cell assignment into pure per-row
  * projections inside whole-stage codegen: the corpus is scanned once
  * and NOTHING about it shuffles until the (tiny) candidate keys do.
  *
  * The previous formulation materialized corpus × centroids × subspaces
  * rows (an explode + two groupBys = a 128×-inflated exchange per
  * corpus vector) to compute the same argmins; these kernels compute
  * them in registers.
  *
  * Determinism (the DuckDB oracle reproduces every value bit-for-bit):
  * all distances are float→double casts combined left-to-right in
  * IEEE double ops, identical to the SQL `(a[i]-b[i])*(a[i]-b[i])`
  * folds; argmin/argmax ties break toward the smaller centroid id by
  * strict-inequality updates over ascending ids.
  */
object PqExpressions {

  /** Flat row-major codebook: entry(c*dim + i) = centroid c, coord i. */
  type Codebook = Array[Double]

  /** Per-subspace squared L2 to one centroid's subspace slice:
    * Σ_{i∈subspace j} (v[i] − cb[i])², strict left-to-right. Null /
    * missing coords contribute a 0.0 coordinate value.
    */
  private[expressions] def subDist(
      v: ArrayData, cb: Codebook, cBase: Int, j: Int, subDim: Int): Double = {
    val n = v.numElements()
    var acc = 0.0
    var i = j * subDim
    val end = i + subDim
    while (i < end) {
      val x = (if (i < n && !v.isNullAt(i)) v.getFloat(i).toDouble else 0.0) -
        cb(cBase + i)
      acc += x * x
      i += 1
    }
    acc
  }

  /** Codegen'd PQ encode. */
  def pqEncode(vec: Column, cb: Codebook, subspaces: Int, subDim: Int): Column =
    graftbridge.column(
      PqEncode(graftbridge.expression(vec), cb, subspaces, subDim))

  /** Codegen'd full (centroid × subspace) distance table. */
  def pqSubDists(vec: Column, cb: Codebook, subspaces: Int, subDim: Int): Column =
    graftbridge.column(
      PqSubDists(graftbridge.expression(vec), cb, subspaces, subDim))

  /** Codegen'd top-k nearest centroids by dot product. */
  def nearestCells(vec: Column, cb: Codebook, dim: Int, k: Int): Column =
    graftbridge.column(
      NearestCells(graftbridge.expression(vec), cb, dim, k))

  /** Codegen'd single nearest centroid (scalar int: usable as a join
    * key without the nullable-element indirection of
    * `element_at(nearest_cells(...), 1)` — a nullable join key makes
    * Catalyst infer an `isnotnull` filter that INLINES the whole
    * kernel a second time below the join).
    */
  def nearestCell(vec: Column, cb: Codebook, dim: Int): Column =
    graftbridge.column(NearestCell(graftbridge.expression(vec), cb, dim))

  /** Codegen'd ADC lookup-table score. */
  def adcScore(codes: Column, table: Column, subspaces: Int): Column =
    graftbridge.column(AdcScore(
      graftbridge.expression(codes), graftbridge.expression(table), subspaces))
}

/** PQ codes of an `array<float>` vector against a compiled codebook:
  * for each subspace j, the id of the nearest (squared-L2, tie → lower
  * id) of the `numCent` sub-centroids — `subspaces` ints per row, in
  * one codegen'd pass with zero data movement.
  */
case class PqEncode(
    child: Expression, codebook: Array[Double], subspaces: Int, subDim: Int)
    extends UnaryExpression {
  require(codebook.length % (subspaces * subDim) == 0,
    "codebook length must be a multiple of subspaces*subDim")
  private val dim = subspaces * subDim
  private val numCent = codebook.length / dim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = s"pq_encode_${numCent}x$subspaces"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](subspaces)
    var j = 0
    while (j < subspaces) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < numCent) {
        val d = PqExpressions.subDist(v, codebook, c * dim, j, subDim)
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int[] $out = new int[$subspaces];
         |for (int $j = 0; $j < $subspaces; $j++) {
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $numCent; $c++) {
         |    double $acc = 0.0;
         |    int $end = $j * $subDim + $subDim;
         |    for (int $i = $j * $subDim; $i < $end; $i++) {
         |      double $x = (($i < $n && !$arr.isNullAt($i))
         |          ? (double) $arr.getFloat($i) : 0.0) - $cb[$c * $dim + $i];
         |      $acc += $x * $x;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The full (centroid × subspace) squared-L2 table of a vector against
  * the codebook, flattened in `c*subspaces + j` order — the per-QUERY
  * ADC lookup table ([[AdcScore]] indexes it by `code*subspaces + j`).
  * Only ever evaluated on the tiny query set.
  */
case class PqSubDists(
    child: Expression, codebook: Array[Double], subspaces: Int, subDim: Int)
    extends UnaryExpression {
  require(codebook.length % (subspaces * subDim) == 0,
    "codebook length must be a multiple of subspaces*subDim")
  private val dim = subspaces * subDim
  private val numCent = codebook.length / dim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_sub_dists requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = s"pq_sub_dists_${numCent}x$subspaces"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](numCent * subspaces)
    var c = 0
    while (c < numCent) {
      var j = 0
      while (j < subspaces) {
        out(c * subspaces + j) = PqExpressions.subDist(v, codebook, c * dim, j, subDim)
        j += 1
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |double[] $out = new double[${numCent * subspaces}];
         |for (int $c = 0; $c < $numCent; $c++) {
         |  for (int $j = 0; $j < $subspaces; $j++) {
         |    double $acc = 0.0;
         |    int $end = $j * $subDim + $subDim;
         |    for (int $i = $j * $subDim; $i < $end; $i++) {
         |      double $x = (($i < $n && !$arr.isNullAt($i))
         |          ? (double) $arr.getFloat($i) : 0.0) - $cb[$c * $dim + $i];
         |      $acc += $x * $x;
         |    }
         |    $out[$c * $subspaces + $j] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`k` centroid ids of a vector ranked by dot product (descending,
  * tie → lower id) against the compiled codebook — IVF coarse
  * assignment (k=1 for corpus vectors, k=nprobe for queries) as a pure
  * scan-stage projection. Dot terms skip null coords exactly as
  * [[FloatVectorDot]], so values match the composed `dot(v, cv)` form.
  */
case class NearestCells(child: Expression, codebook: Array[Double], dim: Int, k: Int)
    extends UnaryExpression {
  require(codebook.length % dim == 0, "codebook length must be a multiple of dim")
  private val numCent = codebook.length / dim
  private val kk = math.min(k, numCent)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = s"nearest_cells_${numCent}top$kk"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val ids = new Array[Int](kk)
    val dots = new Array[Double](kk)
    var size = 0
    var c = 0
    while (c < numCent) {
      var d = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) d += v.getFloat(i).toDouble * codebook(c * dim + i)
        i += 1
      }
      // first slot this dot strictly beats; ties keep the earlier
      // (lower) id already in place
      var pos = 0
      while (pos < size && d <= dots(pos)) pos += 1
      if (pos < kk) {
        var m = math.min(size, kk - 1)
        while (m > pos) { ids(m) = ids(m - 1); dots(m) = dots(m - 1); m -= 1 }
        ids(pos) = c
        dots(pos) = d
        if (size < kk) size += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ids, size))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("ivfCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val ids = ctx.freshName("ids")
      val dots = ctx.freshName("dots")
      val size = ctx.freshName("size")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |int[] $ids = new int[$kk];
         |double[] $dots = new double[$kk];
         |int $size = 0;
         |for (int $c = 0; $c < $numCent; $c++) {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$arr.isNullAt($i)) {
         |      $d += (double) $arr.getFloat($i) * $cb[$c * $dim + $i];
         |    }
         |  }
         |  int $pos = 0;
         |  while ($pos < $size && $d <= $dots[$pos]) $pos++;
         |  if ($pos < $kk) {
         |    for (int $m = java.lang.Math.min($size, $kk - 1); $m > $pos; $m--) {
         |      $ids[$m] = $ids[$m - 1];
         |      $dots[$m] = $dots[$m - 1];
         |    }
         |    $ids[$pos] = $c;
         |    $dots[$pos] = $d;
         |    if ($size < $kk) $size++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($ids, $size));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The single nearest centroid id by dot product (tie → lower id):
  * the IVF cell of a corpus vector. Scalar INT, non-nullable given a
  * non-null child — so a join on it infers no `isnotnull` filter and
  * the kernel runs exactly once per row. Dot semantics as
  * [[NearestCells]].
  */
case class NearestCell(child: Expression, codebook: Array[Double], dim: Int)
    extends UnaryExpression {
  require(codebook.length % dim == 0 && codebook.length >= dim,
    "codebook must hold at least one dim-sized centroid")
  private val numCent = codebook.length / dim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"nearest_cell_$numCent"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var bestD = Double.NegativeInfinity
    var bestC = 0
    var c = 0
    while (c < numCent) {
      var d = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) d += v.getFloat(i).toDouble * codebook(c * dim + i)
        i += 1
      }
      if (d > bestD) { bestD = d; bestC = c }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("ivfCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double $bestD = Double.NEGATIVE_INFINITY;
         |int $bestC = 0;
         |for (int $c = 0; $c < $numCent; $c++) {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$arr.isNullAt($i)) {
         |      $d += (double) $arr.getFloat($i) * $cb[$c * $dim + $i];
         |    }
         |  }
         |  if ($d > $bestD) { $bestD = $d; $bestC = $c; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_j table[codes[j]·subspaces + j], folded in ascending
  * subspace order — 8 array probes per (query, candidate) pair, the
  * whole per-pair cost of PQ scoring. Out-of-range codes contribute
  * 0.0 (the bounds guard prevents unsafe ArrayData reads; our encoders
  * can't produce them).
  */
case class AdcScore(left: Expression, right: Expression, subspaces: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score requires (array<int> codes, array<double> table), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val nj = math.min(subspaces, codes.numElements())
    val nt = table.numElements()
    var acc = 0.0
    var j = 0
    while (j < nj) {
      val idx = codes.getInt(j) * subspaces + j
      if (idx >= 0 && idx < nt) acc += table.getDouble(idx)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nj = ctx.freshName("nj")
      val nt = ctx.freshName("nt")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $nj = java.lang.Math.min($subspaces, $a.numElements());
         |int $nt = $b.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $nj; $j++) {
         |  int $idx = $a.getInt($j) * $subspaces + $j;
         |  if ($idx >= 0 && $idx < $nt) $acc += $b.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
