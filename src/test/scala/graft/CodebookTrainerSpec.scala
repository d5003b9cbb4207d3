package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.CodebookTrainer

/** Determinism of distributed k-means: the quantized-sum design must
  * give BIT-IDENTICAL codebooks under any partitioning (float sums
  * would not — shuffle-merge order varies run to run), and training
  * must actually move the centroids off the init vectors.
  */
class CodebookTrainerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val e = Tables.load(spark, dir, "embeddings")

  test("spherical IVF training is bit-identical across partitionings") {
    val a = CodebookTrainer.trainSphericalIvf(e.repartition(3), 16, 64, 2)
    val b = CodebookTrainer.trainSphericalIvf(e.repartition(17), 16, 64, 2)
    assert(a.length == 16 * 64)
    assert(a.zip(b).forall { case (x, y) => java.lang.Double.compare(x, y) == 0 },
      "IVF codebooks diverged across partitionings")
    val init = CodebookTrainer.initCodebook(e, 16, normalize = true)
    assert(a.zip(init).exists { case (x, y) => x != y },
      "training never moved a centroid")
    // trained centroids stay unit-norm (spherical update)
    val n0 = math.sqrt(a.take(64).foldLeft(0.0)((s, x) => s + x * x))
    assert(math.abs(n0 - 1.0) < 1e-12, s"centroid 0 norm $n0")
  }

  test("PQ sub-quantizer training is bit-identical across partitionings") {
    val a = CodebookTrainer.trainPq(e.repartition(3), 8, 8, 16, 2)
    val b = CodebookTrainer.trainPq(e.repartition(17), 8, 8, 16, 2)
    assert(a.length == 16 * 64)
    assert(a.zip(b).forall { case (x, y) => java.lang.Double.compare(x, y) == 0 },
      "PQ codebooks diverged across partitionings")
    val init = CodebookTrainer.initCodebook(e, 16, normalize = false)
    assert(a.zip(init).exists { case (x, y) => x != y },
      "training never moved a sub-centroid")
  }

  test("farthest-point seeding is bit-identical across partitionings") {
    val ia = CodebookTrainer.farthestPointInitIvf(e.repartition(3), 16, 64)
    val ib = CodebookTrainer.farthestPointInitIvf(e.repartition(17), 16, 64)
    assert(ia.zip(ib).forall { case (x, y) => java.lang.Double.compare(x, y) == 0 })
    val pa = CodebookTrainer.farthestPointInitPq(e.repartition(3), 8, 8, 16)
    val pb = CodebookTrainer.farthestPointInitPq(e.repartition(17), 8, 8, 16)
    assert(pa.zip(pb).forall { case (x, y) => java.lang.Double.compare(x, y) == 0 })
    // and the seeds genuinely spread: no two IVF seeds are the same
    // vector (first-k can collide on duplicated embeddings)
    val rows = ia.grouped(64).map(_.toSeq).toSeq
    assert(rows.distinct.size == 16, "farthest-point picked duplicate seeds")
  }

  test("training reduces PQ quantization error vs the pinned codebook") {
    import graft.expressions.PqExpressions
    def mse(cb: Array[Double]): Double = {
      val emb = coalesce(col("embedding"), typedlit(Array.empty[Float]))
      // Σ over subspaces of d²(v_j, centroid(code_j)) == ADC self-score
      e.select(PqExpressions.adcScore(
          PqExpressions.pqEncode(emb, cb, 8, 8),
          PqExpressions.pqSubDists(emb, cb, 8, 8), 8).as("err"))
        .agg(avg(col("err"))).collect().head.getDouble(0)
    }
    val pinned = mse(CodebookTrainer.initCodebook(e, 16, normalize = false))
    val trained = mse(CodebookTrainer.trainPq(e, 8, 8, 16, 2))
    assert(trained < pinned,
      s"k-means did not reduce quantization error: $trained >= $pinned")
  }
}
