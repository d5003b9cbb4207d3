package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.QuantizedLr

/** The deterministic LR trainer behind q_quality_classifier (the
  * catalog gate pins the whole training run against the unrolled
  * DuckDB oracle; these tests pin the properties the gate can't see).
  */
class QuantizedLrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def feat = {
    import graft.functions.TextFunctions._
    val docs = Tables.load(spark, dir, "documents")
    val q20 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1048576.0)) / lit(1048576.0)
    val len = length(col("text")).cast("double")
    val tokCap = q20(least(lit(1.0), tokenCount(col("text")).cast("double") / 64.0))
    val alpha = q20(when(length(col("text")) > 0,
      regexp_count(col("text"), lit("[A-Za-z]")).cast("double") / len)
      .otherwise(0.0))
    docs.select(
      array(lit(1.0), tokCap, alpha, q20(tokCap * alpha)).as("x"),
      when(qualityScore(col("text")) >= 0.6, 1.0).otherwise(0.0).as("y"))
  }

  test("training is bit-identical under any partitioning") {
    // integer gradient sums + dyadic-grid updates: the whole point of
    // the quantization ladder is that parallelism cannot change the
    // model (a float gradient sum would differ per partitioning)
    val w1 = QuantizedLr.train(feat.repartition(1), 4, 10, 2.0)
    val w7 = QuantizedLr.train(feat.repartition(7), 4, 10, 2.0)
    assert(w1.toSeq == w7.toSeq, s"${w1.toSeq} != ${w7.toSeq}")
    assert(w1.exists(_ != 0.0), "training moved no weight")
  }

  test("distillation reaches the teacher rule (accuracy floor)") {
    val rows = feat.collect().map(r =>
      (r.getAs[scala.collection.Seq[Double]]("x"), r.getDouble(1)))
    val w = QuantizedLr.train(feat, 4, 40, 8.0)
    val acc = rows.count { case (x, y) =>
      val z = (0 until 4).map(j => w(j) * x(j)).sum
      val s = 1.0 / (1.0 + math.exp(-z))
      (if (s >= 0.5) 1.0 else 0.0) == y
    }.toDouble / rows.length
    info(s"distillation accuracy $acc")
    assert(acc >= 0.9, s"distillation accuracy $acc under 0.9")
  }

  test("a non-power-of-two step size is rejected (exactness guard)") {
    intercept[IllegalArgumentException] {
      QuantizedLr.train(feat, 4, 1, 0.3)
    }
  }

  test("gradient sums stay exact past the old BIGINT→double bound " +
      "(wide feature grid)") {
    // x = 2^20 makes each first-iteration gradient term
    // floor((0.5 − 1)·2^20·2^30) = −2^49, so 20k docs put
    // |g| = 20000·2^49 ≈ 1.13e19 PAST Long.MaxValue (9.22e18): the
    // pre-round-14 BIGINT sum would silently WRAP (and had already lost
    // exact double convertibility past 2^53 ≈ 8.4M ordinary docs). The
    // decimal(38,0) sum is exact at any magnitude, so the one-iteration
    // update is computable by hand: w = (−1·g/2^30/20000)·1 = 2^19,
    // every division landing exactly (g = −625·2^54).
    val feat = spark.range(20000)
      .select(array(lit(1048576.0)).as("x"), lit(1.0).as("y"))
    val w1 = QuantizedLr.train(feat.repartition(1), 1, 1, 1.0)
    val w13 = QuantizedLr.train(feat.repartition(13), 1, 1, 1.0)
    assert(w1.toSeq == w13.toSeq, s"${w1.toSeq} != ${w13.toSeq}")
    assert(w1(0) == 524288.0, s"expected exact 2^19, got ${w1(0)}")
  }
}
