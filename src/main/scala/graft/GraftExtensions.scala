package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{AdcScore, FloatVectorDot, MinHashSignature, NearestCell, PqEncode, QuantizedDotI8, SignBuckets, SimHash32, SimHash64, ZOrderLong}
import graft.operators.BloomMightContain

/** SparkSessionExtensions entry point: registers graft's custom
  * codegen expressions as SQL functions, so `spark.sql` users (and
  * spark-submit deployments via
  * `--conf spark.sql.extensions=graft.GraftExtensions`) get
  * `float_vector_dot`, `minhash_signature`, `simhash32`, `simhash64`,
  * `sign_buckets` without touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "float_vector_dot(arrayA, arrayB)")
        FloatVectorDot(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(hashes, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        }
        MinHashSignature(args(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash32(hashes)")
        SimHash32(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(hashes)")
        SimHash64(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "sign_buckets(vec, bands, bits, dim)")
        def intArg(e: Expression): Int = e.eval().asInstanceOf[Int]
        SignBuckets(args(0), intArg(args(1)), intArg(args(2)), intArg(args(3)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantized_dot_i8"),
      new ExpressionInfo(classOf[QuantizedDotI8].getName, "quantized_dot_i8"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantized_dot_i8(arrayA, arrayB)")
        QuantizedDotI8(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "bloom_might_contain(bloom, h1, h2, bits, probes)")
        def intArg(e: Expression): Int = e.eval().asInstanceOf[Int]
        BloomMightContain(args(0), args(1), args(2), intArg(args(3)), intArg(args(4)))
      }))
    def intArg0(e: Expression): Int = e.eval().asInstanceOf[Int]
    // SQL numeric array literals parse as array<decimal>/array<int>, so
    // cast to array<double> before evaluating — toDoubleArray() on the
    // raw literal would ClassCastException on the most natural call
    def codebookArg(e: Expression): Array[Double] =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
        .eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "pq_encode(vec, codebook, subspaces, subDim)")
        PqEncode(args(0), codebookArg(args(1)), intArg0(args(2)), intArg0(args(3)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "nearest_cell"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "nearest_cell(vec, codebook, dim)")
        NearestCell(args(0), codebookArg(args(1)), intArg0(args(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("adc_score"),
      new ExpressionInfo(classOf[AdcScore].getName, "adc_score"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "adc_score(codes, table, subspaces)")
        AdcScore(args(0), args(1), intArg0(args(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrderLong].getName, "zorder2"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "zorder2(xBucket, yBucket)")
        ZOrderLong(args(0), args(1))
      }))
  }
}
