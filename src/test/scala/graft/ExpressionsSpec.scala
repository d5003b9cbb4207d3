package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.HashExpressions
import graft.functions.SimilarityFunctions._

/** The custom codegen expressions vs (a) interpreted eval, (b) the
  * HOF/arithmetic formulations they replaced — all three must agree
  * bit-for-bit, since the DuckDB oracle mirrors the HOF arithmetic.
  */
class ExpressionsSpec extends SparkSpec {

  private val rnd = new Random(7)

  test("FloatVectorDot: codegen == interpreted == HOF fold, incl. edges") {
    import spark.implicits._
    val vecs = (0 until 50).map { _ =>
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    } :+ ((Seq.empty[Float], Seq.empty[Float]))
    val df = vecs.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    // mismatched lengths: native sums the shorter prefix (zip_with would
    // null-pad and poison the fold — a deliberate semantic improvement)
    val m = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(m == 5.0)
  }

  test("QuantizedDotI8: codegen == interpreted == Scala round-half-up oracle") {
    import spark.implicits._
    val vecs = (0 until 50).map { _ =>
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    } :+ ((Seq.empty[Float], Seq.empty[Float]))
    val df = vecs.toDF("a", "b")
    val got = df.select(quantizedDotI8(col("a"), col("b"))).collect().map(_.getLong(0))
    vecs.zip(got).foreach { case ((a, b), g) =>
      def q(x: Float): Long = math.floor(x.toDouble * 127.0 + 0.5).toLong
      val oracle = a.zip(b).map { case (x, y) => q(x) * q(y) }.sum
      assert(g == oracle, s"codegen=$g oracle=$oracle")
    }
    // interpreted path and boundary codes: ±1.0 quantizes to ±127,
    // -0.5/127 rounds half UP (to 0), mismatched lengths use the prefix
    import org.apache.spark.sql.catalyst.expressions.Literal
    def interp(a: Seq[Float], b: Seq[Float]): Long =
      graft.expressions.QuantizedDotI8(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType))).eval(null).asInstanceOf[Long]
    assert(interp(Seq(1f, -1f), Seq(1f, -1f)) == 127L * 127 * 2)
    assert(interp(Seq(-0.5f / 127f), Seq(1f)) == 0L)
    assert(interp(Seq(1f, 1f, 1f), Seq(1f)) == 127L * 127)
    val viaSql = Seq((Seq(1f, -1f), Seq(1f, -1f))).toDF("a", "b")
      .select(quantizedDotI8(col("a"), col("b"))).collect().head.getLong(0)
    assert(viaSql == interp(Seq(1f, -1f), Seq(1f, -1f)), "codegen != interpreted")
  }

  test("SignBuckets: kernel == composed when(dot(±1-literal)) form == Scala oracle") {
    import spark.implicits._
    val (bands, bits, dim) = (8, 16, 64)
    val vecs = (0 until 60).map(_ => Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.toDF("embedding")
    // the composed Column form the kernel replaced (per-bit codegen'd
    // dot against a ±1 literal) — the cross-engine-shape oracle
    def composedBucket(band: Int): org.apache.spark.sql.Column =
      (0 until bits).map { i =>
        when(dot(col("embedding"), typedLit(hyperplane(band, i, dim))) > 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    val rows = df.select(
      denseSignBuckets(col("embedding"), bands, bits, dim).as("kernel"),
      array((0 until bands).map(composedBucket): _*).as("composed")).collect()
    rows.zip(vecs).foreach { case (r, v) =>
      val kernel = r.getSeq[Long](0)
      assert(kernel == r.getSeq[Long](1), "kernel != composed dots")
      // plain-Scala oracle: left-to-right ±v sum per hyperplane
      val oracle = (0 until bands).map { band =>
        (0 until bits).foldLeft(0L) { (bucket, bit) =>
          val acc = (0 until dim).foldLeft(0.0) { (a, c) =>
            a + (if (HashExpressions.hyperplaneSign(band, bit, c) > 0)
              v(c).toDouble else -v(c).toDouble)
          }
          if (acc > 0) bucket | (1L << bit) else bucket
        }
      }
      assert(kernel == oracle, "kernel != Scala oracle")
    }
    // interpreted path (nullSafeEval) agrees with the codegen'd results
    import org.apache.spark.sql.catalyst.expressions.Literal
    vecs.take(5).zip(rows).foreach { case (v, r) =>
      val interp = graft.expressions.SignBuckets(
          Literal.create(v, ArrayType(FloatType)), bands, bits, dim)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(interp == r.getSeq[Long](0), "interpreted != codegen")
    }
  }

  test("MinHashSignature: codegen == Scala oracle; empty → null") {
    import spark.implicits._
    val data = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong().abs % (1L << 28))) :+ Seq.empty[Long]
    val df = data.toDF("hv")
    val got = df.select(minhashSignatureFromHashes(col("hv"), 16)).collect()
    data.zip(got).foreach { case (hv, row) =>
      if (hv.isEmpty) assert(row.isNullAt(0))
      else {
        val oracle = (0 until 16).map { i =>
          hv.map(v => (v * minhashA(i) + minhashB(i)) % MinhashP).min
        }
        assert(row.getSeq[Long](0) == oracle)
      }
    }
  }

  test("WindowFingerprints: codegen == Scala oracle; short input → empty") {
    import spark.implicits._
    import graft.functions.TextFunctions.{windowFingerprints, windowPows, RollP}
    val k = 8
    val data = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong().abs % (1L << 28))) ++
      Seq(Seq.empty[Long], Seq.fill(k - 1)(5L), Seq.fill(k)(7L))
    val df = data.toDF("hv")
    val got = df.select(windowFingerprints(col("hv"), k)).collect()
    val pows = windowPows(k)
    data.zip(got).foreach { case (hv, row) =>
      val oracle = (0 to hv.length - k).map { i =>
        (0 until k).map(j => hv(i + j) * pows(j) % RollP).sum % RollP
      }
      assert(row.getSeq[Long](0) == oracle, s"hv=$hv")
    }
    // matches rollingFingerprints (Horner form) at k=3: same polynomial
    val r3 = df.select(
      windowFingerprints(col("hv"), 3).as("sum"),
      graft.functions.TextFunctions.rollingFingerprints(col("hv")).as("horner"))
      .collect()
    r3.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // packed one-pass kernel == fp_B·2³¹ + fp_B2 from the two singles
    import graft.functions.TextFunctions.{windowFingerprints2, windowFingerprintsPacked}
    val rp = df.select(
      windowFingerprintsPacked(col("hv"), k).as("packed"),
      zip_with(windowFingerprints(col("hv"), k),
        windowFingerprints2(col("hv"), k),
        (a, b) => a * lit(1L << 31) + b).as("zipped"))
      .collect()
    rp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("WindowFingerprints rejects >32-bit elements loudly (both paths)") {
    import spark.implicits._
    import graft.functions.TextFunctions.windowFingerprints
    // a 60-bit element (the elementHash60 shape) must FAIL, not wrap:
    // h*pow would silently overflow long and corrupt every fingerprint
    val bad = Seq(Seq(1L, 2L, 1L << 40, 4L)).toDF("hv")
    val eCodegen = intercept[Exception] {
      bad.select(windowFingerprints(col("hv"), 3)).collect()
    }
    assert(eCodegen.getMessage.contains("exceeds 32 bits") ||
      Option(eCodegen.getCause).exists(_.getMessage.contains("exceeds 32 bits")))
    // boundary: 2^32-1 is the largest legal element — must succeed
    val edge = Seq(Seq((1L << 32) - 1, (1L << 32) - 1, 0L)).toDF("hv")
    assert(edge.select(windowFingerprints(col("hv"), 3)).collect()
      .head.getSeq[Long](0).nonEmpty)
  }

  test("SimHash32: codegen == Scala oracle; empty → 0; near-dup close") {
    import spark.implicits._
    val data = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong().abs % (1L << 32))) :+ Seq.empty[Long]
    val df = data.toDF("hv")
    val got = df.select(simhash32FromHashes(col("hv"))).collect().map(_.getLong(0))
    data.zip(got).foreach { case (hv, g) =>
      val w = new Array[Int](32)
      hv.foreach { v =>
        (0 until 32).foreach(j => w(j) += (if (((v >> (31 - j)) & 1L) == 1L) 1 else -1))
      }
      val oracle = (0 until 32).map(j => if (w(j) > 0) 1L << (31 - j) else 0L).sum
      assert(g == oracle)
    }
  }

  test("SimHash64: codegen == Scala oracle; agrees with SimHash32 semantics") {
    import spark.implicits._
    val data = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong().abs % (1L << 60))) :+ Seq.empty[Long]
    val df = data.toDF("hv")
    val got = df.select(simhash64FromHashes(col("hv"))).collect().map(_.getLong(0))
    data.zip(got).foreach { case (hv, g) =>
      val w = new Array[Int](64)
      hv.foreach { v =>
        (0 until 64).foreach(j => w(j) += (if (((v >> (63 - j)) & 1L) == 1L) 1 else -1))
      }
      val oracle = (0 until 64).map(j => if (w(j) > 0) 1L << (63 - j) else 0L).sum
      assert(g == oracle)
      // 60-bit feature hashes leave the sketch's top 4 bits clear
      assert((g >>> 60) == 0L)
    }
  }

  test("PQ/IVF kernels: codegen == interpreted == Scala oracle") {
    import spark.implicits._
    import graft.expressions.PqExpressions
    val (subspaces, subDim, numCent) = (8, 8, 16)
    val dim = subspaces * subDim
    val cb: Array[Double] =
      Array.fill(numCent * dim)((rnd.nextFloat() * 2 - 1).toDouble)
    val vecs = (0 until 40).map(_ => Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.toDF("v")

    // plain-Scala oracles with the kernels' exact fold orders
    def subD(v: Seq[Float], c: Int, j: Int): Double =
      (j * subDim until j * subDim + subDim).foldLeft(0.0) { (a, i) =>
        val x = v(i).toDouble - cb(c * dim + i); a + x * x
      }
    def dotC(v: Seq[Float], c: Int): Double =
      (0 until dim).foldLeft(0.0)((a, i) => a + v(i).toDouble * cb(c * dim + i))
    def encode(v: Seq[Float]): Seq[Int] =
      (0 until subspaces).map(j => (0 until numCent).minBy(c => (subD(v, c, j), c)))
    def topCells(v: Seq[Float], k: Int): Seq[Int] =
      (0 until numCent).sortBy(c => (-dotC(v, c), c)).take(k)

    val rows = df.select(
      PqExpressions.pqEncode(col("v"), cb, subspaces, subDim).as("codes"),
      PqExpressions.pqSubDists(col("v"), cb, subspaces, subDim).as("dl"),
      PqExpressions.nearestCell(col("v"), cb, dim).as("cell"),
      PqExpressions.nearestCells(col("v"), cb, dim, 3).as("cells")).collect()
    rows.zip(vecs).foreach { case (r, v) =>
      val codes = r.getSeq[Int](0)
      assert(codes == encode(v), "pq_encode != Scala argmin")
      val dl = r.getSeq[Double](1)
      for (c <- 0 until numCent; j <- 0 until subspaces)
        assert(java.lang.Double.compare(
          dl(c * subspaces + j), subD(v, c, j)) == 0, "sub-dist mismatch")
      assert(r.getInt(2) == topCells(v, 1).head, "nearest_cell != Scala argmax")
      assert(r.getSeq[Int](3) == topCells(v, 3), "nearest_cells != Scala top-3")
      // ADC identity: score of your own codes == Σ_j min_c d²(j)
      val adc = (0 until subspaces)
        .foldLeft(0.0)((a, j) => a + dl(codes(j) * subspaces + j))
      val minSum = (0 until subspaces)
        .foldLeft(0.0)((a, j) => a + (0 until numCent).map(subD(v, _, j)).min)
      assert(java.lang.Double.compare(adc, minSum) == 0)
    }
    // AdcScore kernel matches the manual fold (codegen path via select)
    val scored = df.select(PqExpressions.adcScore(
        PqExpressions.pqEncode(col("v"), cb, subspaces, subDim),
        PqExpressions.pqSubDists(col("v"), cb, subspaces, subDim),
        subspaces)).collect().map(_.getDouble(0))
    scored.zip(vecs).foreach { case (g, v) =>
      val e = encode(v)
      val oracle = (0 until subspaces).foldLeft(0.0)((a, j) => a + subD(v, e(j), j))
      assert(java.lang.Double.compare(g, oracle) == 0, s"adc=$g oracle=$oracle")
    }
    // interpreted paths (nullSafeEval) agree with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    vecs.take(5).zip(rows).foreach { case (v, r) =>
      val lit = Literal.create(v, ArrayType(FloatType))
      val ienc = graft.expressions.PqEncode(lit, cb, subspaces, subDim)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      assert(ienc == r.getSeq[Int](0), "PqEncode interpreted != codegen")
      val icell = graft.expressions.NearestCell(lit, cb, dim).eval(null)
      assert(icell == r.getInt(2), "NearestCell interpreted != codegen")
      val icells = graft.expressions.NearestCells(lit, cb, dim, 3)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      assert(icells == r.getSeq[Int](3), "NearestCells interpreted != codegen")
      val idl = graft.expressions.PqSubDists(lit, cb, subspaces, subDim)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq
      assert(idl == r.getSeq[Double](1), "PqSubDists interpreted != codegen")
    }
    // edge: k larger than centroid count truncates; short vector = 0-pad
    val shortV = Literal.create(Seq(1f), ArrayType(FloatType))
    val all = graft.expressions.NearestCells(shortV, cb, dim, 99)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray()
    assert(all.length == numCent && all.toSet == (0 until numCent).toSet)
  }

  test("pinned permutation constants (oracle SQL embeds these)") {
    assert(HashExpressions.P == 2147483647L)
    assert(minhashA(0) == 1103527590L % HashExpressions.P)
    assert(minhashB(0) == (69069L + 1234567L) % HashExpressions.P)
  }
}
