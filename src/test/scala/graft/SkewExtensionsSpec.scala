package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted skew-join correctness (result-equivalence with the plain
  * forms) and the SparkSessionExtensions SQL function surface.
  */
class SkewExtensionsSpec extends SparkSpec {

  test("saltedInner == plain inner join, hot key spread over salts") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInner(left, right, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == "hot") == 900)
  }

  test("saltedCountSum == plain groupBy aggregation") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin.saltedCountSum(df, "k", "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("extensions: custom expressions callable from SQL") {
    val dot = spark.sql(
      "SELECT float_vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql("SELECT simhash32(array(4294967295L)) AS s")
      .collect().head.getLong(0)
    assert(sh == 4294967295L) // all bits vote +1
    val sh64 = spark.sql(
      "SELECT simhash64(array(1152921504606846975L)) AS s") // 2^60 - 1
      .collect().head.getLong(0)
    assert(sh64 == 1152921504606846975L) // bits 0-59 vote +1, 60-63 -1
    val sig = spark.sql("SELECT minhash_signature(array(7L, 99L), 4) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 4)
    import graft.functions.SimilarityFunctions.{minhashA, minhashB, MinhashP}
    assert(sig(0) == Seq(7L, 99L).map(v => (v * minhashA(0) + minhashB(0)) % MinhashP).min)
    val buckets = spark.sql(
      "SELECT sign_buckets(array(0.5F, -0.5F, 1.0F, 0.25F), 2, 4, 4) AS b")
      .collect().head.getSeq[Long](0)
    assert(buckets.length == 2)
    // matches the pinned-constant Scala oracle
    import graft.functions.SimilarityFunctions.hyperplaneSign
    val v = Seq(0.5, -0.5, 1.0, 0.25)
    val oracle = (0 until 2).map { band =>
      (0 until 4).foldLeft(0L) { (b, bit) =>
        val acc = (0 until 4).foldLeft(0.0)((a, c) =>
          a + (if (hyperplaneSign(band, bit, c) > 0) v(c) else -v(c)))
        if (acc > 0) b | (1L << bit) else b
      }
    }
    assert(buckets == oracle)
    val z = spark.sql("SELECT zorder2(3L, 5L) AS z").collect().head.getLong(0)
    assert(z == graft.expressions.ZOrder.interleave(3L, 5L))
    val qd = spark.sql(
      "SELECT quantized_dot_i8(array(1.0F, -1.0F), array(1.0F, -1.0F)) AS q")
      .collect().head.getLong(0)
    assert(qd == 127L * 127 * 2)
    // 64-bit bloom with bit (h1 + j*h2) % 64 set for h1=1, h2=2, j<2:
    // bits 1 and 3 -> word 0b1010 = 10
    val bm = spark.sql(
      "SELECT bloom_might_contain(array(10L), 1L, 2L, 64, 2) AS hit, " +
        "bloom_might_contain(array(10L), 2L, 2L, 64, 2) AS miss")
      .collect().head
    assert(bm.getBoolean(0) && !bm.getBoolean(1))
  }
}
