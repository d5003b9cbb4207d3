package graft

import org.apache.spark.sql.functions._

import graft.functions.SimilarityFunctions._
import graft.functions.TextFunctions._

/** Unit coverage for the text-analysis and similarity primitives. */
class TextSimilaritySpec extends SparkSpec {

  test("tokenCount / subwordCount / tokens") {
    assert(evalStr(Seq("a  b\tc"))(tokenCount) == Seq(3))
    // lower("Ab12!cd") → "ab12!cd" → [ab][12][!][cd]
    assert(evalStr(Seq("Ab12!cd"))(subwordCount) == Seq(4))
    assert(evalStr(Seq("x y z"))(tokens).head ==
      scala.collection.mutable.ArraySeq("x", "y", "z"))
    assert(evalStr(Seq(""))(tokenCount) == Seq(0))
  }

  test("shingles: n-grams in order; short docs → empty") {
    val out = evalStr(Seq("a b c d"))(shingles(_, 3)).head
    assert(out == scala.collection.mutable.ArraySeq("a b c", "b c d"))
    assert(evalStr(Seq("a b"))(shingles(_, 3)).head ==
      scala.collection.mutable.ArraySeq.empty[String])
  }

  test("langId: stopword votes, priority tiebreak, und fallback") {
    val out = evalStr(Seq(
      "the cat and the dog is here",
      "der hund und die katze",
      "zz qq ww",
      "the der")) (langId)
    assert(out == Seq("en", "de", "und", "en"))
  }

  test("qualityScore stays in [0,1] and is 0 for empty text") {
    val vals = evalStr(Seq("", "Good plain text with words.",
      "!!!!!!....;;;;", "a" * 500))(qualityScore)
      .map(_.asInstanceOf[Double])
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
    assert(vals.head == 0.0)
  }

  test("fingerprint is case- and whitespace-insensitive") {
    val out = evalStr(Seq("Hello  World", "hello world ", "other"))(fingerprint)
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("dot / cosine on known vectors") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(2f, 0f), Seq(5f, 0f))).toDF("a", "b")
    val rows = df.select(dot(col("a"), col("b")), cosine(col("a"), col("b")))
      .collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(1) == 0.0)
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)
  }

  test("minhash: identical sets → identical signatures, est jaccard 1") {
    import spark.implicits._
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d")),
      (Seq("a b c"), Seq("x y z"))).toDF("s1", "s2")
    val est = df.select(
      minhashEstJaccard(
        minhashSignature(col("s1"), 16),
        minhashSignature(col("s2"), 16), 16)).collect()
    assert(est(0).getDouble(0) == 1.0)
    assert(est(1).getDouble(0) == 0.0)
  }

  test("simhash32: deterministic, near-dup texts land at small hamming") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = (1 to 29).map(i => s"tok$i").mkString(" ")
    val far = (100 to 130).map(i => s"w$i").mkString(" ")
    import spark.implicits._
    val df = Seq((base, base), (base, near), (base, far)).toDF("t1", "t2")
    val hs = df.select(hamming(simhash32(col("t1")), simhash32(col("t2"))))
      .collect().map(_.getInt(0))
    assert(hs(0) == 0)
    assert(hs(1) <= 8, s"near-dup hamming ${hs(1)}")
    assert(hs(2) > hs(1))
  }

  test("jaccard on array sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    assert(df.select(jaccard(col("a"), col("b"))).collect().head.getDouble(0) == 0.5)
  }

  test("signBucket: stable and within [0, 255]") {
    import spark.implicits._
    val v = (1 to 16).map(i => (i % 3).toFloat)
    val df = Seq(Tuple1(v), Tuple1(v)).toDF("e")
    val buckets = df.select(signBucket(col("e"), 8)).collect().map(_.getLong(0))
    assert(buckets(0) == buckets(1))
    assert(buckets(0) >= 0 && buckets(0) <= 255)
  }
}
